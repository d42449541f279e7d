"""BN254 optimal ate pairing (curves/pairing.py)."""

import random

from mira_tpu.curves.host import BN254_G1, AffinePoint, G2Point, Tuple12
from mira_tpu.curves.pairing import final_exponentiation, miller_loop, pairing
from mira_tpu.fields.host import field

F = field(BN254_G1.base_modulus)


def test_pairing_generator_anchor():
    """e(G1 gen, G2 gen) must equal the reference's hard-coded Gt generator
    constants (fp12.rs:150-172) coefficient for coefficient."""
    e = pairing(AffinePoint.generator(BN254_G1), G2Point.generator(F))
    gen = Tuple12.generator(F)
    assert [c.v for c in e.elements] == [c.v for c in gen.elements]


def test_pairing_bilinearity():
    rng = random.Random(5)
    g1 = AffinePoint.generator(BN254_G1)
    g2 = G2Point.generator(F)
    a = rng.randrange(1, BN254_G1.scalar_modulus)
    b = rng.randrange(1, BN254_G1.scalar_modulus)
    lhs = pairing(g1.scalar_mul(a), g2.scalar_mul(b))
    rhs = pairing(g1, g2).scalar_mul(a * b % BN254_G1.scalar_modulus)
    assert [c.v for c in lhs.elements] == [c.v for c in rhs.elements]


def test_pairing_identity_inputs():
    g1 = AffinePoint.generator(BN254_G1)
    g2 = G2Point.generator(F)
    one = Tuple12.one(F)
    e1 = pairing(AffinePoint.identity(BN254_G1), g2)
    e2 = pairing(g1, G2Point.identity(F))
    assert [c.v for c in e1.elements] == [c.v for c in one.elements]
    assert [c.v for c in e2.elements] == [c.v for c in one.elements]


def test_miller_loop_nondegenerate():
    g1 = AffinePoint.generator(BN254_G1)
    g2 = G2Point.generator(F)
    f = miller_loop(g1, g2)
    one = Tuple12.one(F)
    assert [c.v for c in f.elements] != [c.v for c in one.elements]
    assert [
        c.v for c in final_exponentiation(f).elements
    ] != [c.v for c in one.elements]


def test_native_pairing_matches_host():
    """native/pairing.cpp must be bit-identical to the host python path
    (pairing, Gt multiply, Gt exponentiation)."""
    import os
    import random

    from mira_tpu.utils.native_lib import pairing_available

    if not pairing_available():
        import pytest

        pytest.skip("no native toolchain")
    from mira_tpu.curves.host import BN254_G1, AffinePoint, G2Point, Tuple12
    from mira_tpu.curves.pairing import gt_mul_native, gt_pow_native, pairing
    from mira_tpu.fields.host import field

    rng = random.Random(99)
    Fb = field(BN254_G1.base_modulus)
    a = AffinePoint.random(BN254_G1, rng)
    b = G2Point.random(rng, Fb)

    os.environ["MIRA_PAIRING"] = "host"
    try:
        e_host = pairing(a, b)
        g = Tuple12.generator(Fb)
        k = rng.randrange(1 << 254)
        p_host = g.scalar_mul(k)
        m_host = e_host.mul(g)
    finally:
        os.environ.pop("MIRA_PAIRING")

    assert pairing(a, b) == e_host
    assert gt_pow_native(g, k) == p_host
    assert gt_mul_native(e_host, g) == m_host

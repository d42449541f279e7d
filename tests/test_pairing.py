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

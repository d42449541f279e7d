"""Host field layer tests: constants and arithmetic identities."""

import random

from mira_tpu.fields.host import field, fe_to_fe
from mira_tpu.fields.params import BN254_FR, BN254_FQ, PALLAS_BASE


Fr = field(BN254_FR)
Fq = field(BN254_FQ)


def test_fr_constants():
    p = Fr.PARAMS
    assert p.num_bits == 254
    assert p.s == 28
    # primitive 2^28 root of unity
    w = p.root_of_unity
    assert pow(w, 1 << 28, BN254_FR) == 1
    assert pow(w, 1 << 27, BN254_FR) != 1
    assert (p.root_of_unity * p.root_of_unity_inv) % BN254_FR == 1
    assert (2 * p.two_inv) % BN254_FR == 1
    z = p.zeta
    assert pow(z, 3, BN254_FR) == 1 and z != 1


def test_fq_constants():
    p = Fq.PARAMS
    assert p.num_bits == 254
    assert p.s == 1


def test_arithmetic_identities():
    rng = random.Random(0)
    for _ in range(20):
        a, b = Fr.random(rng), Fr.random(rng)
        assert a + b == b + a
        assert a * b == b * a
        assert (a - b) + b == a
        if not b.is_zero():
            assert (a * b) * b.invert() == a
        assert a.square() == a * a
        assert (-a) + a == Fr.zero()
        assert a ** 5 == a.square().square() * a


def test_sqrt():
    rng = random.Random(1)
    for cls in (Fr, Fq, field(PALLAS_BASE)):
        for _ in range(5):
            a = cls.random(rng)
            sq = a.square()
            r = sq.sqrt()
            assert r is not None and r.square() == sq


def test_bits_roundtrip():
    rng = random.Random(2)
    a = Fr.random(rng)
    bits = a.to_bits_le()
    v = sum(1 << i for i, b in enumerate(bits) if b)
    assert v == a.v


def test_fe_to_fe():
    # value larger than Fq->Fr direction reduces mod target modulus
    a = Fq(BN254_FR + 5)  # valid in Fq (Fq modulus > Fr modulus)
    assert fe_to_fe(a, Fr).v == 5

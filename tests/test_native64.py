"""Native 4x64 Montgomery kernels (fields/native64.py, native/evaluator.cpp)
vs python bigint arithmetic."""

import random

import pytest

from mira_tpu.fields.params import BN254_FR
from mira_tpu.fields.native64 import (
    available,
    from_mont,
    inner_product_mont,
    ints_to_64,
    limbs16_to_64,
    limbs64_to_16,
    lincomb_mont,
    rlc_mont,
    to_mont,
    u64_to_int,
)

pytestmark = pytest.mark.skipif(
    not available(), reason="no native toolchain"
)

P = BN254_FR
R = 1 << 256


def _vals(n, seed=0):
    rng = random.Random(seed)
    return [rng.randrange(P) for _ in range(n)]


def test_to_from_mont_roundtrip():
    vals = _vals(100, 1)
    m = to_mont(P, ints_to_64(vals))
    for i, v in enumerate(vals):
        assert u64_to_int(m[i]) == v * R % P
    back = from_mont(P, m)
    assert [u64_to_int(x) for x in back] == vals


def test_limb_views_roundtrip():
    vals = _vals(50, 2)
    a64 = ints_to_64(vals)
    assert (limbs16_to_64(limbs64_to_16(a64)) == a64).all()


def test_inner_product():
    w, v = _vals(300, 3), _vals(300, 4)
    vm = to_mont(P, ints_to_64(v))
    got = inner_product_mont(P, ints_to_64(w), vm)
    assert got == sum(a * b for a, b in zip(w, v)) % P


def test_rlc():
    a, b = _vals(200, 5), _vals(200, 6)
    r = random.Random(7).randrange(P)
    out = rlc_mont(P, to_mont(P, ints_to_64(a)), to_mont(P, ints_to_64(b)), r)
    plain = from_mont(P, out)
    for i in range(200):
        assert u64_to_int(plain[i]) == (a[i] + r * b[i]) % P


def test_lincomb():
    import numpy as np

    rows = [_vals(64, 10 + i) for i in range(3)]
    ins = np.stack([to_mont(P, ints_to_64(r)) for r in rows])
    coefs = [[5, 7, 11], [0, 1, P - 1]]
    out = lincomb_mont(P, ins, coefs)
    for k, crow in enumerate(coefs):
        plain = from_mont(P, out[k])
        for i in range(64):
            want = sum(c * rows[j][i] for j, c in enumerate(crow)) % P
            assert u64_to_int(plain[i]) == want

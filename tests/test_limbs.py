"""Limb-field (device) arithmetic vs the host golden implementation."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mira_tpu.fields.host import field
from mira_tpu.fields.limbs import limb_field, ints_to_limbs, limbs_to_ints
from mira_tpu.fields.params import BN254_FR, BN254_FQ

LF = limb_field(BN254_FR)
Fr = field(BN254_FR)


def rand_ints(rng, n, p=BN254_FR):
    return [rng.randrange(p) for _ in range(n)]


def test_limb_roundtrip():
    rng = random.Random(0)
    vals = rand_ints(rng, 8)
    arr = ints_to_limbs(vals)
    assert limbs_to_ints(arr) == vals


def test_encode_decode():
    rng = random.Random(1)
    vals = rand_ints(rng, 8)
    assert LF.decode(LF.encode(vals)) == vals


@pytest.mark.parametrize("op", ["add", "sub", "mul", "neg", "double", "square"])
def test_ops_vs_host(op):
    rng = random.Random(hash(op) % 2**31)
    n = 64
    avals = rand_ints(rng, n)
    bvals = rand_ints(rng, n)
    # include edge cases
    avals[:4] = [0, 1, BN254_FR - 1, BN254_FR - 2]
    bvals[:4] = [0, BN254_FR - 1, BN254_FR - 1, 1]
    a, b = LF.encode(avals), LF.encode(bvals)
    if op in ("add", "sub", "mul"):
        got = LF.decode(getattr(LF, op)(a, b))
        pyop = {"add": lambda x, y: x + y, "sub": lambda x, y: x - y, "mul": lambda x, y: x * y}[op]
        want = [pyop(x, y) % BN254_FR for x, y in zip(avals, bvals)]
    else:
        got = LF.decode(getattr(LF, op)(a))
        pyop = {"neg": lambda x: -x, "double": lambda x: 2 * x, "square": lambda x: x * x}[op]
        want = [pyop(x) % BN254_FR for x in avals]
    assert got == want


def test_inv():
    rng = random.Random(7)
    vals = [0] + rand_ints(rng, 7)
    a = LF.encode(vals)
    got = LF.decode(LF.inv(a))
    want = [0] + [pow(v, -1, BN254_FR) for v in vals[1:]]
    assert got == want


def test_pow_int():
    rng = random.Random(8)
    vals = rand_ints(rng, 4)
    e = rng.randrange(1 << 64)
    got = LF.decode(LF.pow_int(LF.encode(vals), e))
    assert got == [pow(v, e, BN254_FR) for v in vals]


def test_sum():
    rng = random.Random(9)
    for n in (1, 2, 7, 100):
        vals = rand_ints(rng, n)
        got = LF.decode(LF.sum(LF.encode(vals), axis=0)[None, :])
        assert got == [sum(vals) % BN254_FR]


def test_fq_field():
    lfq = limb_field(BN254_FQ)
    rng = random.Random(10)
    vals = rand_ints(rng, 8, BN254_FQ)
    w = rand_ints(rng, 8, BN254_FQ)
    got = lfq.decode(lfq.mul(lfq.encode(vals), lfq.encode(w)))
    assert got == [(x * y) % BN254_FQ for x, y in zip(vals, w)]


def test_jit_and_vmap():
    rng = random.Random(11)
    vals = rand_ints(rng, 16)
    w = rand_ints(rng, 16)
    mul = jax.jit(LF.mul)
    got = LF.decode(mul(LF.encode(vals), LF.encode(w)))
    assert got == [(x * y) % BN254_FR for x, y in zip(vals, w)]


def test_select_eq_iszero():
    a = LF.encode([5, 0, 7])
    b = LF.encode([1, 2, 3])
    assert list(np.asarray(LF.is_zero(a))) == [False, True, False]
    assert list(np.asarray(LF.eq(a, a))) == [True, True, True]
    mask = jnp.array([True, False, True])
    assert LF.decode(LF.select(mask, a, b)) == [5, 2, 7]

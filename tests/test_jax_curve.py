"""Device Jacobian curve ops + MSM vs the host golden implementation."""

import random

import pytest

from mira_tpu.curves.host import BN254_G1, GRUMPKIN, AffinePoint, msm_host
from mira_tpu.curves.jax_curve import jacobian_ops
from mira_tpu.ops.msm import msm_from_host


@pytest.mark.parametrize("curve", [BN254_G1, GRUMPKIN], ids=["bn254", "grumpkin"])
def test_add_double_vs_host(curve):
    rng = random.Random(1)
    ops = jacobian_ops(curve.name)
    pts_a = [AffinePoint.random(curve, rng) for _ in range(4)]
    pts_b = [AffinePoint.random(curve, rng) for _ in range(4)]
    # exercise the special cases: identity operands, doubling, inverses
    pts_a += [AffinePoint.identity(curve), pts_b[0], pts_b[1], pts_b[2].neg()]
    pts_b += [pts_b[0], AffinePoint.identity(curve), pts_b[1], pts_b[2]]

    A = ops.encode_points(pts_a)
    B = ops.encode_points(pts_b)
    got_add = ops.decode_points(ops.add(A, B))
    want_add = [a.add(b) for a, b in zip(pts_a, pts_b)]
    assert got_add == want_add

    got_dbl = ops.decode_points(ops.double(A))
    want_dbl = [a.double() for a in pts_a]
    assert got_dbl == want_dbl


def test_tree_sum():
    rng = random.Random(2)
    ops = jacobian_ops("bn254")
    pts = [AffinePoint.random(BN254_G1, rng) for _ in range(7)]
    enc = ops.encode_points(pts)
    got = ops.decode_points(tuple(c[None] for c in ops.tree_sum(enc)))[0]
    want = AffinePoint.identity(BN254_G1)
    for p in pts:
        want = want.add(p)
    assert got == want


@pytest.mark.parametrize("curve", [BN254_G1, GRUMPKIN], ids=["bn254", "grumpkin"])
def test_msm_vs_host(curve):
    """One shape per curve (compiles are expensive); edge scalars 0, 1, p-1
    and an identity point are folded into the batch."""
    n = 8
    rng = random.Random(n)
    pts = [AffinePoint.random(curve, rng) for _ in range(n - 1)]
    pts.append(AffinePoint.identity(curve))
    scalars = [rng.randrange(curve.scalar_modulus) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = curve.scalar_modulus - 1
    got = msm_from_host(scalars, pts, curve)
    want = msm_host(scalars, pts)
    assert got == want

"""Pallas fused-MSM kernel (runs in interpret mode on CPU).

The same kernel executes compiled on TPU (the default commitment backend for
large MSMs, ops/commitment.py); interpret mode traces the identical jnp body,
so this covers the field/curve tile math end to end.
"""

import os
import random

import pytest

from mira_tpu.curves.host import BN254_G1, GRUMPKIN, AffinePoint, msm_host
from mira_tpu.curves.jax_curve import jacobian_ops
from mira_tpu.ops.msm import encode_scalars
from mira_tpu.ops.pallas_msm import msm_pallas


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("MIRA_RUN_SLOW"),
    reason="~7min in CPU interpret mode; set MIRA_RUN_SLOW=1 "
    "(verified green in round 1; runs compiled on TPU)",
)
@pytest.mark.parametrize("method", ["window", "pippenger"])
@pytest.mark.parametrize("curve", [BN254_G1, GRUMPKIN], ids=["bn254", "grumpkin"])
def test_msm_pallas_matches_host(curve, method):
    rng = random.Random(7)
    n = 8
    pts = [AffinePoint.random(curve, rng) for _ in range(n)]
    svals = [rng.randrange(curve.scalar_modulus) for _ in range(n)]
    # edge lanes: zero scalar, scalar 1
    svals[0] = 0
    svals[1] = 1
    ops = jacobian_ops(curve.name)
    sc = encode_scalars(svals, curve.scalar_modulus)
    enc = ops.encode_points(pts)
    out = msm_pallas(sc, enc, curve, block=8, method=method)
    got = ops.decode_points(tuple(c[None] for c in out))[0]
    want = msm_host(svals, pts)
    assert got == want

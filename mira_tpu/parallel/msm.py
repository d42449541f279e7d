"""Multi-chip MSM: points/scalars sharded across the mesh, per-shard partial
MSMs combined with an all-gather + local Jacobian tree reduction.

This is the distribution layer BASELINE.json mandates (bucket partitioning
across chips, sums reduced over ICI); the per-shard kernel defaults to the
shared-Horner Pippenger Pallas kernel (ops/pallas_msm), with the lane-parallel
double-and-add from ops/msm as a fallback.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..curves.host import CurveParams
from ..curves.jax_curve import jacobian_ops
from ..fields.limbs import LIMB_BITS, NUM_LIMBS
from .mesh import AXIS


def _lane_msm(ops, scalars, pts, num_bits):
    """Per-shard lane double-and-add (same algorithm as ops/msm._msm_jit)."""
    n = pts[0].shape[0]

    def bit_of(b):
        limb = jax.lax.dynamic_index_in_dim(
            scalars, b // LIMB_BITS, axis=1, keepdims=False
        )
        return (limb >> (b % LIMB_BITS)) & 1

    def body(i, acc):
        b = num_bits - 1 - i
        acc = ops.double(acc)
        added = ops.add(acc, pts)
        take = bit_of(b) > 0
        return ops.select(take, added, acc)

    acc = jax.lax.fori_loop(0, num_bits, body, ops.identity((n,)))

    log_n = max((n - 1).bit_length(), 1)

    def red(k, a):
        half = jnp.left_shift(jnp.int32(1), log_n - 1 - k)
        idx = jnp.arange(n, dtype=jnp.int32)
        partner = tuple(c[jnp.minimum(idx + half, n - 1)] for c in a)
        merged = ops.add(a, partner)
        keep = idx < half
        return ops.select(keep, merged, a)

    acc = jax.lax.fori_loop(0, log_n, red, acc)
    return tuple(c[:1] for c in acc)


@lru_cache(maxsize=None)
def _sharded_msm_jit(curve_name: str, num_bits: int, mesh: Mesh,
                     method: str, block: int):
    ops = jacobian_ops(curve_name)
    if method == "pippenger":
        from ..curves.host import BN254_G1, GRUMPKIN
        from ..ops.pallas_msm import msm_pallas

        curve = BN254_G1 if curve_name == "bn254" else GRUMPKIN

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(AXIS), (P(AXIS), P(AXIS), P(AXIS))),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def run(scalars, pts):
        if method == "pippenger":
            # per-shard bucketed MSM on-device; result is one Jacobian point
            part = tuple(
                c[None]
                for c in msm_pallas(scalars, pts, curve, block=block,
                                    method="pippenger")
            )  # triple of (1, L)
        else:
            part = _lane_msm(ops, scalars, pts, num_bits)  # triple of (1, L)
        # gather all shards' partials and tree-reduce locally (point addition
        # is not a psum-able monoid for XLA, so gather + local combine)
        gathered = tuple(
            jax.lax.all_gather(c[0], AXIS, tiled=False) for c in part
        )  # (ndev, L)
        return ops.tree_sum(gathered)

    return jax.jit(run)


def sharded_msm(scalars, points, curve: CurveParams, mesh: Mesh,
                method: str = "auto", block: int = 256):
    """scalars: (N,16) plain limbs; points: (X,Y,Z) Montgomery limb arrays.
    N must divide evenly across the mesh. Returns a Jacobian triple.

    method="pippenger" runs the shared-Horner Pippenger Pallas kernel per
    shard; "lane" is the pure-XLA double-and-add. "auto" picks Pippenger on
    TPU and the lane method elsewhere (interpret-mode Pallas on a CPU mesh is
    correct but slow — only the dedicated test exercises it)."""
    import jax

    if method == "auto":
        # axon/tpu backends report non-"cpu"; mirror pallas_msm's detection
        method = "lane" if jax.default_backend() == "cpu" else "pippenger"
    num_bits = curve.scalar_modulus.bit_length()
    return _sharded_msm_jit(curve.name, num_bits, mesh, method, block)(
        scalars, points
    )

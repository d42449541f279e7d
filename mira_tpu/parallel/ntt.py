"""Multi-chip NTT: four-step decomposition with all_to_all transposes.

n = n1 * n2 with the array sharded across the mesh; local batched NTTs per
device, a twiddle scaling, and two all_to_all transposes over ICI — the
distributed analog of the reference's shared-memory recursive FFT
(SURVEY.md §5 "long dimension" sharding).

Index derivation: with i = i2*n1 + i1, k = k1*n2 + k2,
  X[k1*n2 + k2] = DFT_{n1,i1}( w_n^{i1*k2} * DFT_{n2,i2}(x[i2*n1+i1])[k2] )[k1]
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..fields.limbs import NUM_LIMBS, limb_field
from ..ops.ntt import _bitrev_perm, _twiddle_table, get_omega
from .mesh import AXIS


def _local_ntt_batch(lf, modulus, log_n, inverse, a):
    """Batched in-place NTT along axis 1 of a (B, n, L) array."""
    n = 1 << log_n
    tw_table, perm = _twiddle_table(modulus, log_n, inverse)
    iota = jnp.arange(n, dtype=jnp.int32)

    def stage(s, x):
        half = jnp.left_shift(jnp.int32(1), s)
        low_mask = half - 1
        lo = x[:, iota & ~half]
        hi = x[:, iota | half]
        tw_idx = (iota & low_mask) << (log_n - 1 - s)
        prod = lf.mul(hi, tw_table[tw_idx][None])
        is_high = jnp.broadcast_to((iota & half) > 0, x.shape[:2])
        return lf.add(lo, lf.select(is_high, lf.neg(prod), prod))

    a = a[:, perm]
    return jax.lax.fori_loop(0, log_n, stage, a)


@lru_cache(maxsize=None)
def _dist_ntt_jit(modulus: int, log_n: int, mesh: Mesh, inverse: bool):
    lf = limb_field(modulus)
    ndev = mesh.devices.size
    n = 1 << log_n
    log_ndev = ndev.bit_length() - 1
    # n1: outer (DFT over i1), n2: inner
    log_n1 = log_n // 2
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2
    assert n1 % ndev == 0 and n2 % ndev == 0, "mesh must divide both factors"

    # twiddles w_n^{i1*k2} as (n1, n2) table, Montgomery
    w = get_omega(modulus, log_n, inverse)
    col = [pow(w, i1, modulus) for i1 in range(n1)]
    tw_rows = []
    for i1 in range(n1):
        base = col[i1]
        row = [1] * n2
        for k2 in range(1, n2):
            row[k2] = row[k2 - 1] * base % modulus
        tw_rows.append(row)
    tw_flat = lf.encode([v for row in tw_rows for v in row]).reshape(n1, n2, NUM_LIMBS)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS)),
        out_specs=P(AXIS),
        check_vma=False,
    )
    def run(x_block, tw_block):
        # x_block: (n2/ndev, n1, L) -- this device's block of rows i2
        # transpose shards: now hold ALL i2 for a 1/ndev slice of i1
        b = jax.lax.all_to_all(
            x_block, AXIS, split_axis=1, concat_axis=0, tiled=True
        )  # (n2, n1/ndev, L)
        bt = jnp.swapaxes(b, 0, 1)  # (n1/ndev, n2, L): batch i1_local, axis1 i2
        inner = _local_ntt_batch(lf, modulus, log_n2, inverse, bt)  # B[i1_loc, k2]
        scaled = lf.mul(inner, tw_block)  # w_n^{i1*k2}
        # transpose shards again: hold ALL i1 for a 1/ndev slice of k2
        c = jax.lax.all_to_all(
            scaled, AXIS, split_axis=1, concat_axis=0, tiled=True
        )  # (n1, n2/ndev, L)
        ct = jnp.swapaxes(c, 0, 1)  # (n2/ndev, n1, L): batch k2_local, axis1 i1
        outer = _local_ntt_batch(lf, modulus, log_n1, inverse, ct)  # C[k2_loc, k1]
        if inverse:
            divisor = pow(n, -1, modulus)
            outer = lf.mul(outer, lf.const(divisor, (1, 1)))
        return outer

    def wrapper(x):
        # x: (n, L) natural order; view as (n2, n1): x[i2*n1 + i1]
        mat = x.reshape(n2, n1, NUM_LIMBS)
        out = run(mat, tw_flat)  # (n2, n1): out[k2, k1] = X[k1*n2 + k2]
        # natural order: X[k] with k = k1*n2+k2 -> transpose
        return jnp.swapaxes(out, 0, 1).reshape(n, NUM_LIMBS)

    return jax.jit(wrapper)


def distributed_ntt(a, modulus: int, mesh: Mesh, inverse: bool = False):
    """NTT of (n, L) Montgomery limb array across the mesh; natural order
    in and out."""
    n = a.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    return _dist_ntt_jit(modulus, log_n, mesh, inverse)(a)

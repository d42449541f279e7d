"""Batched Poseidon on device (TPU) — §2.3 item 4 of SURVEY.md.

The transcript sponge is inherently sequential (host: ops/poseidon.py), but
batch hashing — Merkle levels, leaf commitments, witness preparation — is
embarrassingly parallel: N independent states ride the vector lanes while
the optimized-constant schedule (start / sparse-partial / end, identical to
the host permutation and therefore to the reference
/root/reference/src/poseidon/poseidon_hash.rs:174-254) unrolls statically.

Field elements are LimbField Montgomery (N, 16) uint32 arrays; constants are
Montgomery-encoded once per Spec and broadcast.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from ..fields.limbs import limb_field
from .poseidon import get_spec


@lru_cache(maxsize=None)
def _hash_batch_jit(modulus: int, t: int, rate: int, r_f: int, r_p: int,
                    num_inputs: int):
    """Batched fixed-length sponge hash: (N, num_inputs, 16) Montgomery
    inputs -> (N, 16) Montgomery output (state[1], untruncated)."""
    spec = get_spec(modulus, t, rate, r_f, r_p)
    lf = limb_field(modulus)
    half = r_f // 2

    enc1 = lambda v: jnp.asarray(lf.encode([v.v if hasattr(v, "v") else v]))[0]
    c_start = [[enc1(c) for c in row] for row in spec.constants_start]
    c_partial = [enc1(c) for c in spec.constants_partial]
    c_end = [[enc1(c) for c in row] for row in spec.constants_end]
    mds = [[enc1(c) for c in row] for row in spec.mds]
    pre_sparse = [[enc1(c) for c in row] for row in spec.pre_sparse_mds]
    sparse_rows = [[enc1(c) for c in m.row] for m in spec.sparse_matrices]
    sparse_cols = [[enc1(c) for c in m.col_hat] for m in spec.sparse_matrices]
    iv = enc1(1 << 64)
    one = enc1(1)

    def pow5(x):
        s = lf.mul(x, x)
        return lf.mul(lf.mul(s, s), x)

    def mat_vec(m, state):
        return [
            _tree_sum([lf.mul(_b(mij, state[0].shape[0]), sj)
                       for mij, sj in zip(row, state)], lf)
            for row in m
        ]

    def _b(c, n):
        return jnp.broadcast_to(c, (n, c.shape[0]))

    def _tree_sum(vals, lf):
        while len(vals) > 1:
            nxt = [lf.add(vals[i], vals[i + 1]) for i in range(0, len(vals) - 1, 2)]
            if len(vals) % 2:
                nxt.append(vals[-1])
            vals = nxt
        return vals[0]

    def permutation(state, inputs):
        """inputs: list of (N,16) or None entries, length < t."""
        n = state[0].shape[0]
        pre = c_start[0]
        state[0] = lf.add(state[0], _b(pre[0], n))
        k = len(inputs)
        for i in range(k):
            state[1 + i] = lf.add(lf.add(state[1 + i], inputs[i]), _b(pre[1 + i], n))
        for idx, j in enumerate(range(1 + k, t)):
            pad = _b(one, n) if idx == 0 else None
            s = lf.add(state[j], _b(pre[j], n))
            state[j] = lf.add(s, pad) if pad is not None else s

        for consts in c_start[1:half]:
            state = [lf.add(pow5(s), _b(c, n)) for s, c in zip(state, consts)]
            state = mat_vec(mds, state)
        state = [lf.add(pow5(s), _b(c, n)) for s, c in zip(state, c_start[half])]
        state = mat_vec(pre_sparse, state)

        for const, row, col in zip(c_partial, sparse_rows, sparse_cols):
            state[0] = lf.add(pow5(state[0]), _b(const, n))
            new0 = _tree_sum(
                [lf.mul(_b(ri, n), si) for ri, si in zip(row, state)], lf
            )
            state = [new0] + [
                lf.add(lf.mul(_b(ch, n), state[0]), state[i + 1])
                for i, ch in enumerate(col)
            ]

        for consts in c_end:
            state = [lf.add(pow5(s), _b(c, n)) for s, c in zip(state, consts)]
            state = mat_vec(mds, state)
        state = [pow5(s) for s in state]
        state = mat_vec(mds, state)
        return state

    def run(inputs):  # (N, num_inputs, 16)
        n = inputs.shape[0]
        zero = jnp.zeros((n, inputs.shape[2]), jnp.uint32)
        state = [_b(iv, n)] + [zero] * (t - 1)
        exact = num_inputs % rate == 0
        for i in range(0, num_inputs, rate):
            chunk = [inputs[:, j] for j in range(i, min(i + rate, num_inputs))]
            state = permutation(state, chunk)
        if exact:
            state = permutation(state, [])
        return state[1]

    return jax.jit(run)


def poseidon_hash_batch(values, modulus: int, t: int = 3, rate: int = 2,
                        r_f: int = 10, r_p: int = 10):
    """values: (N, L, 16) Montgomery limb array (or nested ints via encode).
    Returns (N, 16) Montgomery state[1] outputs — the same field elements the
    host sponge produces before bit truncation."""
    return _hash_batch_jit(modulus, t, rate, r_f, r_p, int(values.shape[1]))(
        values
    )

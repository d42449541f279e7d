"""Fused Pallas Poseidon kernel: the whole sponge runs in VMEM.

The XLA batched version (ops/poseidon_device.py) materializes every CIOS
step of every round to HBM (~260 Montgomery muls/hash, each a round-trip
over the (N, 16) arrays) — HBM-bound.  Here a block of B lanes keeps the
(t, 16, B) state resident across all rounds; constants ride along as tiny
VMEM inputs and round loops are `fori_loop`s whose bodies are one Poseidon
round (~18 muls — small enough for Mosaic), so HBM traffic is one pass over
inputs + outputs.

Schedule and constants are identical to the host sponge
(ops/poseidon.py, mirroring the reference
/root/reference/src/poseidon/poseidon_hash.rs:174-254): start constants,
pre-sparse MDS, sparse partial rounds, end constants, final bare MDS.

The sponge body (`_sponge`) is written against a tiny accessor shim so the
SAME code runs (a) inside a Pallas kernel over VMEM refs and (b) as plain
jnp on stacked arrays — the latter is what the fast CI test compiles
(interpret-mode Pallas takes minutes to compile even tiny round counts;
see tests/test_pallas_poseidon.py).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from ..fields.limbs import NUM_LIMBS, limb_field
from .pallas_field import tfield
from .poseidon import get_spec

DEFAULT_BLOCK = 512


def _sponge(tf, t, rate, r_f, r_p, num_inputs, B, read_in, c, dynread):
    """Run the full sponge; returns the (16, B) state[1] tile.

    read_in(j) -> (16, B) absorbed input j; c[name][i, j] static reads;
    dynread(c[name], r) -> row r of a stacked constant array (traced r).

    Layout: the t state elements are CONCATENATED ALONG LANES into one
    (16, t*B) tile (element i in lanes [i*B, (i+1)*B)).  A full-round MDS
    multiply is then ONE Montgomery mul on a (16, t*t*B) tile plus t-1
    modular adds — the compiled graph holds ~16 CIOS instances per
    permutation instead of the ~t*t per mat_vec a per-element formulation
    pays (hundreds of unrolled CIOS muls take 10+ minutes to compile on
    both XLA:CPU and Mosaic)."""
    half = r_f // 2

    def bc(v16, n=1):  # (16,) const limbs -> (16, n*B)
        return jnp.broadcast_to(v16[:, None], (NUM_LIMBS, n * B))

    def bc_rows(rows, idxs):  # rows[(i)] for i in idxs -> (16, len*B)
        return jnp.concatenate([bc(rows[i]) for i in idxs], axis=1)

    def pow5(x):
        s = tf.square(x)
        return tf.mul(tf.square(s), x)

    def slot(st, i):  # element i of the packed state
        return st[:, i * B:(i + 1) * B]

    def mat_vec(m, st):
        # m: (t, t, 16) ref/array; st: (16, t*B) packed.
        # Lane block (j*t + i) of the product holds m[i,j] * s_j, so the
        # sum over j of the t contiguous (16, t*B) slices lands out_i in
        # slot i directly.
        mflat = jnp.concatenate(
            [bc(m[i, j]) for j in range(t) for i in range(t)], axis=1
        )  # (16, t*t*B)
        stiled = jnp.concatenate(
            [jnp.concatenate([slot(st, j)] * t, axis=1) for j in range(t)],
            axis=1,
        )  # block (j*t+i) = s_j
        prod = tf.mul(mflat, stiled)
        acc = prod[:, : t * B]
        for j in range(1, t):
            acc = tf.add(acc, prod[:, j * t * B:(j + 1) * t * B])
        return acc

    def full_round(st, consts, m):  # consts: (t, 16) array
        s = tf.add(pow5(st), bc_rows(consts, range(t)))
        return mat_vec(m, s)

    state = jnp.concatenate(
        [tf._tile(c["iv_limbs"], B),
         jnp.zeros((NUM_LIMBS, (t - 1) * B), jnp.uint32)], axis=1
    )

    def permutation(state, chunk):
        """chunk: list of (16, B) absorbed inputs, len k < t."""
        k = len(chunk)
        # one packed add covers the start constant, the absorbed chunk and
        # the `1` pad marker (disjoint slots, all < p so a single modular
        # add per slot is exact)
        addend = [bc(c["start"][0, i]) for i in range(t)]
        state = tf.add(state, jnp.concatenate(addend, axis=1))
        inj = list(chunk)
        if 1 + k < t:
            inj.append(tf._tile(c["one_limbs"], B))
        if inj:
            pad = (t - 1 - len(inj)) * B
            parts = [jnp.zeros((NUM_LIMBS, B), jnp.uint32)] + inj
            if pad:
                parts.append(jnp.zeros((NUM_LIMBS, pad), jnp.uint32))
            state = tf.add(state, jnp.concatenate(parts, axis=1))

        def start_body(r, st):
            return full_round(st, dynread(c["start"], r), c["mds"])

        state = jax.lax.fori_loop(1, half, start_body, state)

        # pre-sparse full round
        state = full_round(
            state,
            [c["start"][half, i] for i in range(t)],
            c["pre_sparse"],
        )

        def partial_body(r, st):
            const = dynread(c["partial"], r)      # (16,)
            row = dynread(c["sp_rows"], r)        # (t, 16)
            col = dynread(c["sp_cols"], r)        # (t-1, 16)
            s0 = tf.add(pow5(slot(st, 0)), bc(const))
            st = jnp.concatenate([s0, st[:, B:]], axis=1)
            # new0 = <row, st>: one mul on (16, t*B), then fold the t slots
            rprod = tf.mul(bc_rows(row, range(t)), st)
            new0 = rprod[:, :B]
            for i in range(1, t):
                new0 = tf.add(new0, slot(rprod, i))
            # rest_i = col[i]*s0 + st[i+1]: one mul on (16, (t-1)*B)
            cprod = tf.mul(
                bc_rows(col, range(t - 1)),
                jnp.concatenate([s0] * (t - 1), axis=1),
            )
            rest = tf.add(cprod, st[:, B:])
            return jnp.concatenate([new0, rest], axis=1)

        state = jax.lax.fori_loop(0, r_p, partial_body, state)

        def end_body(r, st):
            return full_round(st, dynread(c["end"], r), c["mds"])

        state = jax.lax.fori_loop(0, half - 1, end_body, state)
        return mat_vec(c["mds"], pow5(state))

    for i in range(0, num_inputs, rate):
        chunk = [read_in(j) for j in range(i, min(i + rate, num_inputs))]
        state = permutation(state, chunk)
    if num_inputs % rate == 0:
        state = permutation(state, [])
    return slot(state, 1)


def _const_arrays(modulus: int, t: int, rate: int, r_f: int, r_p: int):
    spec = get_spec(modulus, t, rate, r_f, r_p)
    lf = limb_field(modulus)

    def enc_rows(rows):  # rows of host field elems -> (R, t, 16) device
        flat = [c.v for row in rows for c in row]
        return jnp.asarray(lf.encode(flat)).reshape(len(rows), -1, NUM_LIMBS)

    return {
        "start": enc_rows(spec.constants_start),           # (half+1, t, 16)
        "partial": jnp.asarray(
            lf.encode([c.v for c in spec.constants_partial])
        ).reshape(max(r_p, 1), NUM_LIMBS),                 # (r_p, 16)
        "end": enc_rows(spec.constants_end),               # (half-1, t, 16)
        "mds": enc_rows(spec.mds),                         # (t, t, 16)
        "pre_sparse": enc_rows(spec.pre_sparse_mds),       # (t, t, 16)
        "sp_rows": enc_rows([m.row for m in spec.sparse_matrices]),
        "sp_cols": enc_rows([m.col_hat for m in spec.sparse_matrices]),
        "iv_limbs": [int(v) for v in lf.encode([1 << 64])[0]],
        "one_limbs": [int(v) for v in lf.encode([1])[0]],
    }


_CONST_ORDER = ("start", "partial", "end", "mds", "pre_sparse", "sp_rows",
                "sp_cols")


@lru_cache(maxsize=None)
def _poseidon_pallas_jit(modulus: int, t: int, rate: int, r_f: int,
                         r_p: int, num_inputs: int, block: int,
                         interpret: bool):
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu

        memory_space = pltpu.VMEM
    except Exception:  # pragma: no cover
        memory_space = None

    tf = tfield(modulus, interpret)
    consts = _const_arrays(modulus, t, rate, r_f, r_p)

    def kernel(in_ref, *refs):
        out_ref = refs[-1]
        c = dict(zip(_CONST_ORDER, refs[:-1]))
        c["iv_limbs"], c["one_limbs"] = consts["iv_limbs"], consts["one_limbs"]
        B = in_ref.shape[2]
        out_ref[...] = _sponge(
            tf, t, rate, r_f, r_p, num_inputs, B,
            read_in=lambda j: in_ref[j], c=c,
            dynread=lambda ref, r: ref[pl.ds(r, 1)][0],
        )

    def run(inputs):  # (num_inputs, 16, N) limbs-major
        n = inputs.shape[2]
        grid = (n // block,)

        def spec3(shape, imap):
            if memory_space is None:
                return pl.BlockSpec(shape, imap)
            return pl.BlockSpec(shape, imap, memory_space=memory_space)

        in_spec = spec3(
            (num_inputs, NUM_LIMBS, block), lambda i: (0, 0, i)
        )
        const_specs = [
            spec3(consts[k].shape, (lambda i: (0, 0)) if consts[k].ndim == 2
                  else (lambda i: (0, 0, 0)))
            for k in _CONST_ORDER
        ]
        out_spec = spec3((NUM_LIMBS, block), lambda i: (0, i))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, n), jnp.uint32),
            grid=grid,
            in_specs=[in_spec] + const_specs,
            out_specs=out_spec,
            interpret=interpret,
        )(inputs, *[consts[k] for k in _CONST_ORDER])

    return jax.jit(run)


@lru_cache(maxsize=None)
def _poseidon_jnp_jit(modulus: int, t: int, rate: int, r_f: int, r_p: int,
                      num_inputs: int):
    """The same sponge body as plain jnp over stacked arrays — used by the
    fast CI test (and as a no-Pallas fallback path)."""
    tf = tfield(modulus, interpret=True)
    consts = _const_arrays(modulus, t, rate, r_f, r_p)

    def run(inputs):  # (num_inputs, 16, N)
        B = inputs.shape[2]
        return _sponge(
            tf, t, rate, r_f, r_p, num_inputs, B,
            read_in=lambda j: inputs[j], c=consts,
            dynread=lambda arr, r: jax.lax.dynamic_index_in_dim(
                arr, r, axis=0, keepdims=False
            ),
        )

    return jax.jit(run)


def poseidon_hash_batch_pallas(values, modulus: int, t: int = 3,
                               rate: int = 2, r_f: int = 10, r_p: int = 10,
                               block: int | None = None,
                               impl: str = "pallas"):
    """values: (N, L, 16) Montgomery limb array (same API as
    ops/poseidon_device.poseidon_hash_batch).  Returns (N, 16) Montgomery
    state[1] outputs.  impl="jnp" runs the identical sponge body as plain
    XLA (no Pallas) — the CI-testable path."""
    if block is None:
        block = DEFAULT_BLOCK
    interpret = jax.default_backend() == "cpu"
    n, num_inputs = int(values.shape[0]), int(values.shape[1])
    vt = jnp.swapaxes(jnp.swapaxes(values, 0, 1), 1, 2)  # (L, 16, N)
    if impl == "jnp":
        out = _poseidon_jnp_jit(modulus, t, rate, r_f, r_p, num_inputs)(vt)
        return out.T
    pad = (-n) % block
    if pad:
        vt = jnp.concatenate(
            [vt, jnp.zeros((num_inputs, NUM_LIMBS, pad), jnp.uint32)], axis=2
        )
    out = _poseidon_pallas_jit(
        modulus, t, rate, r_f, r_p, num_inputs, block, interpret
    )(vt)
    return out[:, :n].T

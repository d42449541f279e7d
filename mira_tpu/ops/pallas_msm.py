"""Fused Pallas MSM kernel.

One kernel instance processes a block of B lanes: the Jacobian accumulators
live in VMEM/registers across ALL scalar bits, so HBM traffic is a single
pass over points+scalars (~450 B/lane) while compute is ~650k uint32 ops per
lane — compute-bound on the VPU, vs the XLA lane method whose every small op
round-tripped HBM (~100x more traffic).

Layout: limbs-major (16, N): lanes ride the 128-wide vector lanes.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.host import CurveParams
from ..curves.jax_curve import jacobian_ops
from ..fields.limbs import LIMB_BITS, NUM_LIMBS
from .pallas_field import tfield

DEFAULT_BLOCK = 512


WINDOW = 4  # divides LIMB_BITS: digits never straddle a limb


@lru_cache(maxsize=None)
def _msm_pallas_window_jit(modulus: int, num_bits: int, block: int,
                           interpret: bool):
    """Windowed double-and-add: per block, build the odd multiples table
    [1P..15P] once in VMEM, then 64 windows of (4 doubles + 1 masked
    table-add) — ~1.8x less field-mul work than the bit-serial kernel."""
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu

        memory_space = pltpu.VMEM
    except Exception:  # pragma: no cover
        memory_space = None

    tf = tfield(modulus, interpret)
    nwin = (num_bits + WINDOW - 1) // WINDOW
    ndig = (1 << WINDOW) - 1

    def kernel(sc_ref, x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref):
        pt = (x_ref[...], y_ref[...], z_ref[...])
        B = pt[0].shape[1]
        zero = jnp.zeros((NUM_LIMBS, B), jnp.uint32)
        one = tf.one_tile(B)

        # table[d] = (d+1) * P, d = 0..14
        table = [pt]
        for d in range(1, ndig):
            table.append(
                tf.jac_double(table[d // 2])
                if d % 2 == 1
                else tf.jac_add(table[d - 1], pt)
            )

        def body(i, acc):
            w = nwin - 1 - i
            bit = w * WINDOW
            limb = sc_ref[pl.ds(bit // LIMB_BITS, 1), :][0]
            digit = (limb >> (bit % LIMB_BITS).astype(jnp.uint32)) & ndig
            for _ in range(WINDOW):
                acc = tf.jac_double(acc)
            # select table[digit-1] via masked accumulation
            selX, selY, selZ = zero, one, zero
            for d in range(ndig):
                m = jnp.where(digit == d + 1, jnp.uint32(1), jnp.uint32(0))
                selX = tf.select(m, table[d][0], selX)
                selY = tf.select(m, table[d][1], selY)
                selZ = tf.select(m, table[d][2], selZ)
            added = tf.jac_add(acc, (selX, selY, selZ))
            take = jnp.where(digit > 0, jnp.uint32(1), jnp.uint32(0))
            return (
                tf.select(take, added[0], acc[0]),
                tf.select(take, added[1], acc[1]),
                tf.select(take, added[2], acc[2]),
            )

        acc0 = (zero, one, zero)
        accX, accY, accZ = jax.lax.fori_loop(0, nwin, body, acc0)
        ox_ref[...] = accX
        oy_ref[...] = accY
        oz_ref[...] = accZ

    def run(sc, X, Y, Z):
        n = sc.shape[1]
        grid = (n // block,)
        spec = (
            pl.BlockSpec((NUM_LIMBS, block), lambda i: (0, i))
            if memory_space is None
            else pl.BlockSpec(
                (NUM_LIMBS, block), lambda i: (0, i), memory_space=memory_space
            )
        )
        out_shape = [
            jax.ShapeDtypeStruct((NUM_LIMBS, n), jnp.uint32) for _ in range(3)
        ]
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=grid,
            in_specs=[spec] * 4,
            out_specs=[spec] * 3,
            interpret=interpret,
        )(sc, X, Y, Z)

    return jax.jit(run)


@lru_cache(maxsize=None)
def _msm_pallas_pippenger_jit(modulus: int, num_bits: int, block: int,
                              interpret: bool):
    """Shared-Horner Pippenger: 64 per-window Jacobian accumulators live in
    VMEM scratch across the whole grid.  Each block of B lanes builds its
    [1P..15P] table once, then does ONE masked table-select + ONE width-wide
    jac_add per window — the 4-per-window doubles of the windowed kernel are
    hoisted out of the per-lane path entirely and run once, at the end, in
    the Horner combine (255 point-ops total for the whole MSM).

    Per-lane work drops from ~256 doubles + 64 adds to ~14 (table) + 64 adds
    => ~2.5x fewer element-ops than the windowed kernel.

    Replaces the reference's CPU Pippenger `best_multiexp`
    (/root/reference/src/commitment.rs:78-87) with a scatter-free,
    SIMD-complete bucket scheme: window digits select from a per-lane table
    (masks, not data-dependent gathers), and bucket accumulation is a
    width-wide add into per-window accumulators."""
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu

        memory_space = pltpu.VMEM
    except Exception:  # pragma: no cover
        pltpu = None
        memory_space = None

    # lazy half-reduced arithmetic: no conditional subtraction per mul —
    # values live in [0, 2p) through the whole kernel and are canonicalized
    # once at the output write
    tf = tfield(modulus, interpret, lazy=True)
    nwin = (num_bits + WINDOW - 1) // WINDOW
    ndig = (1 << WINDOW) - 1

    def _lane_roll(x, s):
        if interpret:
            return jnp.roll(x, -s, axis=1)
        return pltpu.roll(x, shift=(-s) % x.shape[1], axis=1)

    def kernel(sc_ref, x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref,
               accX, accY, accZ, tabX, tabY, tabZ):
        step = pl.program_id(0)
        nsteps = pl.num_programs(0)
        B = x_ref.shape[1]
        zero = jnp.zeros((NUM_LIMBS, B), jnp.uint32)
        one = tf.one_tile(B)

        @pl.when(step == 0)
        def _init():
            accX[...] = jnp.zeros((nwin, NUM_LIMBS, B), jnp.uint32)
            accY[...] = jnp.broadcast_to(one[None], (nwin, NUM_LIMBS, B))
            accZ[...] = jnp.zeros((nwin, NUM_LIMBS, B), jnp.uint32)

        pt = (x_ref[...], y_ref[...], z_ref[...])
        # table[d] = (d+1)P via a chain of adds in scratch: the fori body is
        # one jac_add, keeping the Mosaic program small (unrolling 14 point
        # ops pushed compile time past 10 min).  All adds after the explicit
        # 2P = double(P) are INCOMPLETE (dP + P with 2 <= d+1 <= 15 can never
        # be a doubling or an inverse pair) — ~16 field muls each instead of
        # the complete add's ~23.
        tabX[pl.ds(0, 1)] = pt[0][None]
        tabY[pl.ds(0, 1)] = pt[1][None]
        tabZ[pl.ds(0, 1)] = pt[2][None]
        dX, dY, dZ = tf.jac_double(pt)
        tabX[pl.ds(1, 1)] = dX[None]
        tabY[pl.ds(1, 1)] = dY[None]
        tabZ[pl.ds(1, 1)] = dZ[None]

        def tbody(d, carry):
            prev = (tabX[pl.ds(d - 1, 1)][0], tabY[pl.ds(d - 1, 1)][0],
                    tabZ[pl.ds(d - 1, 1)][0])
            nX, nY, nZ = tf.jac_add_incomplete(prev, pt)
            tabX[pl.ds(d, 1)] = nX[None]
            tabY[pl.ds(d, 1)] = nY[None]
            tabZ[pl.ds(d, 1)] = nZ[None]
            return carry

        jax.lax.fori_loop(2, ndig, tbody, 0)

        def wbody(w, carry):
            bit = w * WINDOW
            limb = sc_ref[pl.ds(bit // LIMB_BITS, 1), :][0]
            digit = (limb >> (bit % LIMB_BITS).astype(jnp.uint32)) & ndig
            selX, selY, selZ = zero, one, zero
            for d in range(ndig):
                m = jnp.where(digit == d + 1, jnp.uint32(1), jnp.uint32(0))
                selX = tf.select(m, tabX[d], selX)
                selY = tf.select(m, tabY[d], selY)
                selZ = tf.select(m, tabZ[d], selZ)
            acc = (accX[pl.ds(w, 1)][0], accY[pl.ds(w, 1)][0],
                   accZ[pl.ds(w, 1)][0])
            nX, nY, nZ = tf.jac_add_incomplete(acc, (selX, selY, selZ))
            accX[pl.ds(w, 1)] = nX[None]
            accY[pl.ds(w, 1)] = nY[None]
            accZ[pl.ds(w, 1)] = nZ[None]
            return carry

        jax.lax.fori_loop(0, nwin, wbody, 0)

        @pl.when(step == nsteps - 1)
        def _final():
            # 1) recursive-doubling lane reduction: every lane of window w
            #    ends up holding the full cross-lane sum W_w
            def rbody(w, carry):
                acc = (accX[pl.ds(w, 1)][0], accY[pl.ds(w, 1)][0],
                       accZ[pl.ds(w, 1)][0])
                s = B // 2
                while s >= 1:
                    rolled = tuple(_lane_roll(c, s) for c in acc)
                    acc = tf.jac_add_incomplete(acc, rolled)
                    s //= 2
                accX[pl.ds(w, 1)] = acc[0][None]
                accY[pl.ds(w, 1)] = acc[1][None]
                accZ[pl.ds(w, 1)] = acc[2][None]
                return carry

            jax.lax.fori_loop(0, nwin, rbody, 0)

            # 2) Horner over windows: S = sum_w 16^w W_w
            S0 = (accX[pl.ds(nwin - 1, 1)][0], accY[pl.ds(nwin - 1, 1)][0],
                  accZ[pl.ds(nwin - 1, 1)][0])

            def hbody(i, S):
                w = nwin - 2 - i
                for _ in range(WINDOW):
                    S = tf.jac_double(S)
                Ww = (accX[pl.ds(w, 1)][0], accY[pl.ds(w, 1)][0],
                      accZ[pl.ds(w, 1)][0])
                return tf.jac_add_incomplete(S, Ww)

            S = jax.lax.fori_loop(0, nwin - 1, hbody, S0)
            ox_ref[...] = tf.canon(S[0])
            oy_ref[...] = tf.canon(S[1])
            oz_ref[...] = tf.canon(S[2])

    def run(sc, X, Y, Z):
        n = sc.shape[1]
        grid = (n // block,)
        in_spec = (
            pl.BlockSpec((NUM_LIMBS, block), lambda i: (0, i))
            if memory_space is None
            else pl.BlockSpec((NUM_LIMBS, block), lambda i: (0, i),
                              memory_space=memory_space)
        )
        out_spec = (
            pl.BlockSpec((NUM_LIMBS, block), lambda i: (0, 0))
            if memory_space is None
            else pl.BlockSpec((NUM_LIMBS, block), lambda i: (0, 0),
                              memory_space=memory_space)
        )
        out_shape = [
            jax.ShapeDtypeStruct((NUM_LIMBS, block), jnp.uint32)
            for _ in range(3)
        ]
        scratch = [
            pltpu.VMEM((nwin, NUM_LIMBS, block), jnp.uint32)
            for _ in range(3)
        ] + [
            pltpu.VMEM((ndig, NUM_LIMBS, block), jnp.uint32)
            for _ in range(3)
        ]
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=grid,
            in_specs=[in_spec] * 4,
            out_specs=[out_spec] * 3,
            scratch_shapes=scratch,
            interpret=interpret,
        )(sc, X, Y, Z)

    return jax.jit(run)


SWINDOW = 5  # signed-digit window width


@lru_cache(maxsize=None)
def _msm_pallas_pippenger_signed_jit(modulus: int, num_bits: int, block: int,
                                     interpret: bool):
    """Signed-digit shared-Horner Pippenger (5-bit windows).

    Scalars are recoded on the fly into digits in [-16, 15] (carry threaded
    through the ascending window loop), so the per-block table only needs
    [1P..16P] — negation is a cheap Y := 2p-Y select — and 254-bit scalars
    take 52 windows instead of the unsigned 4-bit kernel's 64.  Per-point
    cost drops from ~14 table adds + 64 bucket adds to ~8 doubles + 8 table
    adds + 52 bucket adds (~20% fewer field muls), with all adds incomplete
    (see TField.jac_add_incomplete)."""
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu

        memory_space = pltpu.VMEM
    except Exception:  # pragma: no cover
        pltpu = None
        memory_space = None

    tf = tfield(modulus, interpret, lazy=True)
    # +1 window absorbs the final recoding carry (top raw digit can reach 16)
    nwin = (num_bits + SWINDOW - 1) // SWINDOW + 1
    ntab = 1 << (SWINDOW - 1)  # table holds 1P..16P

    def _lane_roll(x, s):
        if interpret:
            return jnp.roll(x, -s, axis=1)
        return pltpu.roll(x, shift=(-s) % x.shape[1], axis=1)

    def kernel(sc_ref, x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref,
               accX, accY, accZ, tabX, tabY, tabZ):
        step = pl.program_id(0)
        nsteps = pl.num_programs(0)
        B = x_ref.shape[1]
        zero = jnp.zeros((NUM_LIMBS, B), jnp.uint32)
        one = tf.one_tile(B)

        @pl.when(step == 0)
        def _init():
            accX[...] = jnp.zeros((nwin, NUM_LIMBS, B), jnp.uint32)
            accY[...] = jnp.broadcast_to(one[None], (nwin, NUM_LIMBS, B))
            accZ[...] = jnp.zeros((nwin, NUM_LIMBS, B), jnp.uint32)

        pt = (x_ref[...], y_ref[...], z_ref[...])
        # table[v-1] = vP for v = 1..16: odds chain off 2P (incomplete adds:
        # (v-2)P + 2P can never be a doubling or inverse pair for v <= 15),
        # evens double their halves (fori bodies stay one point-op each to
        # keep the Mosaic program small)
        tabX[pl.ds(0, 1)] = pt[0][None]
        tabY[pl.ds(0, 1)] = pt[1][None]
        tabZ[pl.ds(0, 1)] = pt[2][None]
        dX, dY, dZ = tf.jac_double(pt)
        tabX[pl.ds(1, 1)] = dX[None]
        tabY[pl.ds(1, 1)] = dY[None]
        tabZ[pl.ds(1, 1)] = dZ[None]
        twoP = (dX, dY, dZ)

        def obody(i, carry):
            v = 3 + 2 * i  # 3, 5, ..., 15
            prev = (tabX[pl.ds(v - 3, 1)][0], tabY[pl.ds(v - 3, 1)][0],
                    tabZ[pl.ds(v - 3, 1)][0])
            nX, nY, nZ = tf.jac_add_incomplete(prev, twoP)
            tabX[pl.ds(v - 1, 1)] = nX[None]
            tabY[pl.ds(v - 1, 1)] = nY[None]
            tabZ[pl.ds(v - 1, 1)] = nZ[None]
            return carry

        jax.lax.fori_loop(0, (ntab - 2) // 2, obody, 0)

        def ebody(i, carry):
            v = 4 + 2 * i  # 4, 6, ..., 16 (ascending: v/2 already built)
            half = (tabX[pl.ds(v // 2 - 1, 1)][0],
                    tabY[pl.ds(v // 2 - 1, 1)][0],
                    tabZ[pl.ds(v // 2 - 1, 1)][0])
            nX, nY, nZ = tf.jac_double(half)
            tabX[pl.ds(v - 1, 1)] = nX[None]
            tabY[pl.ds(v - 1, 1)] = nY[None]
            tabZ[pl.ds(v - 1, 1)] = nZ[None]
            return carry

        jax.lax.fori_loop(0, (ntab - 2) // 2, ebody, 0)

        half = jnp.uint32(ntab)          # 16
        base = jnp.uint32(2 * ntab)      # 32
        dmask = jnp.uint32(base - 1)

        def wbody(w, c):
            # raw 5-bit digit starting at bit 5w of the 16x16-bit-limb scalar
            bit = w * SWINDOW
            l0 = bit // LIMB_BITS
            r = (bit % LIMB_BITS).astype(jnp.uint32)
            low = sc_ref[pl.ds(l0, 1), :][0] >> r
            l1 = jnp.minimum(l0 + 1, NUM_LIMBS - 1)
            hi = sc_ref[pl.ds(l1, 1), :][0] << (jnp.uint32(LIMB_BITS) - r)
            # the clamped l1 == l0 case only occurs in the top limb, where
            # the contribution must be zero (scalars < 2^254): mask it
            valid = jnp.where(l0 + 1 <= NUM_LIMBS - 1,
                              jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
            raw = (low | (hi & valid)) & dmask
            t = raw + c
            c_out = jnp.where(t >= half, jnp.uint32(1), jnp.uint32(0))
            # digit = t - 32*c_out in [-16, 15]; magnitude in [0, 16]
            mag = jnp.where(c_out == 1, base - t, t)
            negf = jnp.where((c_out == 1) & (mag > 0),
                             jnp.uint32(1), jnp.uint32(0))
            selX, selY, selZ = zero, one, zero
            for v in range(1, ntab + 1):
                m = jnp.where(mag == v, jnp.uint32(1), jnp.uint32(0))
                selX = tf.select(m, tabX[v - 1], selX)
                selY = tf.select(m, tabY[v - 1], selY)
                selZ = tf.select(m, tabZ[v - 1], selZ)
            selY = tf.select(negf, tf.neg(selY), selY)
            acc = (accX[pl.ds(w, 1)][0], accY[pl.ds(w, 1)][0],
                   accZ[pl.ds(w, 1)][0])
            nX, nY, nZ = tf.jac_add_incomplete(acc, (selX, selY, selZ))
            accX[pl.ds(w, 1)] = nX[None]
            accY[pl.ds(w, 1)] = nY[None]
            accZ[pl.ds(w, 1)] = nZ[None]
            return c_out

        jax.lax.fori_loop(0, nwin, wbody, jnp.zeros((B,), jnp.uint32))

        @pl.when(step == nsteps - 1)
        def _final():
            def rbody(w, carry):
                acc = (accX[pl.ds(w, 1)][0], accY[pl.ds(w, 1)][0],
                       accZ[pl.ds(w, 1)][0])
                s = B // 2
                while s >= 1:
                    rolled = tuple(_lane_roll(c, s) for c in acc)
                    acc = tf.jac_add_incomplete(acc, rolled)
                    s //= 2
                accX[pl.ds(w, 1)] = acc[0][None]
                accY[pl.ds(w, 1)] = acc[1][None]
                accZ[pl.ds(w, 1)] = acc[2][None]
                return carry

            jax.lax.fori_loop(0, nwin, rbody, 0)

            S0 = (accX[pl.ds(nwin - 1, 1)][0], accY[pl.ds(nwin - 1, 1)][0],
                  accZ[pl.ds(nwin - 1, 1)][0])

            def hbody(i, S):
                w = nwin - 2 - i
                for _ in range(SWINDOW):
                    S = tf.jac_double(S)
                Ww = (accX[pl.ds(w, 1)][0], accY[pl.ds(w, 1)][0],
                      accZ[pl.ds(w, 1)][0])
                return tf.jac_add_incomplete(S, Ww)

            S = jax.lax.fori_loop(0, nwin - 1, hbody, S0)
            ox_ref[...] = tf.canon(S[0])
            oy_ref[...] = tf.canon(S[1])
            oz_ref[...] = tf.canon(S[2])

    def run(sc, X, Y, Z):
        n = sc.shape[1]
        grid = (n // block,)
        in_spec = (
            pl.BlockSpec((NUM_LIMBS, block), lambda i: (0, i))
            if memory_space is None
            else pl.BlockSpec((NUM_LIMBS, block), lambda i: (0, i),
                              memory_space=memory_space)
        )
        out_spec = (
            pl.BlockSpec((NUM_LIMBS, block), lambda i: (0, 0))
            if memory_space is None
            else pl.BlockSpec((NUM_LIMBS, block), lambda i: (0, 0),
                              memory_space=memory_space)
        )
        out_shape = [
            jax.ShapeDtypeStruct((NUM_LIMBS, block), jnp.uint32)
            for _ in range(3)
        ]
        scratch = [
            pltpu.VMEM((nwin, NUM_LIMBS, block), jnp.uint32)
            for _ in range(3)
        ] + [
            pltpu.VMEM((ntab, NUM_LIMBS, block), jnp.uint32)
            for _ in range(3)
        ]
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=grid,
            in_specs=[in_spec] * 4,
            out_specs=[out_spec] * 3,
            scratch_shapes=scratch,
            interpret=interpret,
        )(sc, X, Y, Z)

    return jax.jit(run)


@lru_cache(maxsize=None)
def _msm_pallas_jit(modulus: int, num_bits: int, block: int, interpret: bool):
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu

        memory_space = pltpu.VMEM
    except Exception:  # pragma: no cover
        memory_space = None

    tf = tfield(modulus, interpret)

    def kernel(sc_ref, x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref):
        pt = (x_ref[...], y_ref[...], z_ref[...])
        B = pt[0].shape[1]
        zero = jnp.zeros((NUM_LIMBS, B), jnp.uint32)
        one = tf.one_tile(B)
        acc0 = (zero, one, zero)

        def body(i, acc):
            b = num_bits - 1 - i
            acc = tf.jac_double(acc)
            added = tf.jac_add(acc, pt)
            limb = sc_ref[pl.ds(b // LIMB_BITS, 1), :][0]
            take = (limb >> (b % LIMB_BITS).astype(jnp.uint32)) & 1
            return (
                tf.select(take, added[0], acc[0]),
                tf.select(take, added[1], acc[1]),
                tf.select(take, added[2], acc[2]),
            )

        accX, accY, accZ = jax.lax.fori_loop(0, num_bits, body, acc0)
        ox_ref[...] = accX
        oy_ref[...] = accY
        oz_ref[...] = accZ

    def run(sc, X, Y, Z):
        n = sc.shape[1]
        grid = (n // block,)
        spec = (
            pl.BlockSpec((NUM_LIMBS, block), lambda i: (0, i))
            if memory_space is None
            else pl.BlockSpec(
                (NUM_LIMBS, block), lambda i: (0, i), memory_space=memory_space
            )
        )
        out_shape = [
            jax.ShapeDtypeStruct((NUM_LIMBS, n), jnp.uint32) for _ in range(3)
        ]
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=grid,
            in_specs=[spec] * 4,
            out_specs=[spec] * 3,
            interpret=interpret,
        )(sc, X, Y, Z)

    return jax.jit(run)


def msm_pallas(scalars, points, curve: CurveParams, block: int | None = None,
               method: str = "pippenger"):
    """scalars: (N, 16) plain limbs; points: (X, Y, Z) Montgomery (N, 16).
    Returns a Jacobian triple of (16,) arrays (the reduced sum)."""
    import jax

    if block is None:
        block = 256 if method.startswith("pippenger") else DEFAULT_BLOCK

    interpret = jax.default_backend() == "cpu"
    num_bits = curve.scalar_modulus.bit_length()
    n = scalars.shape[0]
    pad = (-n) % block
    ops = jacobian_ops(curve.name)
    X, Y, Z = points
    if pad:
        zpad = jnp.zeros((pad, NUM_LIMBS), jnp.uint32)
        scalars = jnp.concatenate([scalars, zpad], axis=0)
        X = jnp.concatenate([X, zpad], axis=0)
        Y = jnp.concatenate([Y, zpad], axis=0)
        Z = jnp.concatenate([Z, zpad], axis=0)

    sc_t = scalars.T.copy()
    Xt, Yt, Zt = X.T.copy(), Y.T.copy(), Z.T.copy()
    if method.startswith("pippenger"):
        # default = signed 5-bit digits; "pippenger-u4" keeps the unsigned
        # 4-bit kernel available for comparison
        jit_fn = (
            _msm_pallas_pippenger_jit
            if method == "pippenger-u4"
            else _msm_pallas_pippenger_signed_jit
        )
        ox, oy, oz = jit_fn(
            curve.base_modulus, num_bits, block, interpret
        )(sc_t, Xt, Yt, Zt)
        # the kernel finishes the reduction; every lane holds the result
        return (ox[:, 0], oy[:, 0], oz[:, 0])
    jit_fn = (
        _msm_pallas_window_jit if method == "window" else _msm_pallas_jit
    )
    ox, oy, oz = jit_fn(
        curve.base_modulus, num_bits, block, interpret
    )(sc_t, Xt, Yt, Zt)
    # back to lane-major; masked-halving reduction (small fixed graph)
    from .msm import reduce_points

    lanes = (ox.T, oy.T, oz.T)
    return reduce_points(lanes, curve)

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

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.host import CurveParams
from ..curves.jax_curve import jacobian_ops
from ..fields.limbs import LIMB_BITS, NUM_LIMBS, int_to_limbs
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

    # digit extraction reads limb bit//16 and its successor; the top window
    # of a 254-bit scalar starts at bit 255 -> limb 15 (in range).  A wider
    # curve would index limb 16 out of bounds — fail loudly instead.
    assert num_bits <= 255, "signed-digit kernel assumes scalars < 2^255"
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
def _bucket_carry_tables(num_bits: int, window: int):
    """Closed-form signed-digit recoding carries for window-major iteration.

    The usual recoding threads a carry through ASCENDING windows
    (c_{w+1} = [raw_w + c_w >= 2^(window-1)]); the bucket kernel iterates
    windows as the OUTER grid axis (descending, Horner-style), so each
    window recomputes its incoming carry directly:
        c_w = [ (s mod 2^(window*w))  >  (2^(window-1)-1) * (2^(window*w)-1)
                                                          / (2^window - 1) ]
    i.e. the low bits exceed the largest value representable by digits
    d_0..d_{w-1} in [-2^(window-1), 2^(window-1)-1].  Returns per-window
    threshold and low-bits-mask limb arrays, shaped (nwin, NUM_LIMBS); the
    kernel receives row w via its SMEM BlockSpec index_map."""
    nwin = (num_bits + window - 1) // window + 1
    thr = np.zeros((nwin, NUM_LIMBS), np.uint32)
    msk = np.zeros((nwin, NUM_LIMBS), np.uint32)
    for w in range(nwin):
        bits = window * w
        T = ((1 << (window - 1)) - 1) * ((1 << bits) - 1) // ((1 << window) - 1)
        for i in range(NUM_LIMBS):
            thr[w, i] = (T >> (LIMB_BITS * i)) & 0xFFFF
            nb = min(max(bits - LIMB_BITS * i, 0), LIMB_BITS)
            msk[w, i] = (1 << nb) - 1
    return thr, msk


@lru_cache(maxsize=None)
def _msm_pallas_bucket_jit(curve_name: str, num_bits: int, block: int,
                           interpret: bool, kw: int, window: int = SWINDOW):
    """True-bucket Pippenger, two kernels.

    ACCUMULATE: grid (nwin/kw, n/block); each cell recodes kw windows'
    signed digits (closed-form carries — no serial recode chain, see
    _bucket_carry_tables) and mixed-adds each point RAW into its
    per-(window, magnitude) XYZZ bucket, held in the OUTPUT buffer which
    stays VMEM-resident for a whole window group (revisit pattern).  kw > 1
    gives the scheduler independent madd chains to interleave: consecutive
    points in ONE window form a serial dependency through the bucket
    read-modify-write, which otherwise bounds throughput by chain latency.
    vs the table kernel (_msm_pallas_pippenger_signed_jit): no 16-point-op
    per-point multiples table, and the window adds are 8M+2S affine madds
    instead of 12M+4S Jacobian adds — ~600 muls/pt vs ~1100.

    FINALIZE: grid (nwin,) over the bucket arrays — per window a
    suffix-summed bucket reduction (sum_v v*B_v), Horner-combined into a
    running accumulator (windows stored most-significant first), then one
    cross-lane reduction.  Kept OUT of the accumulate kernel: Mosaic
    executes @pl.when bodies predicated (masked stores, real compute), so
    an embedded finalize was paying ~1100 muls in EVERY grid cell — 8x the
    whole kernel.

    Completeness by OFFSET BUCKETS: every bucket starts at a fixed
    nothing-up-my-sleeve point R (hash-to-curve of "mira/bucket-offset/v1")
    instead of the identity, so the incomplete madd's unsupported
    acc == P doubling case requires a known discrete-log relation to R —
    impossible to hit accidentally even with duplicate bases, zero
    scalars, or all-identical lanes (and a deliberate hit only corrupts
    the caller's own commitment).  The aggregate bias K*R
    (K = 136 * sum_w 32^w) is cancelled by ONE precomputed -K*R madd in
    the emit step.  This keeps the hot loop at the incomplete madd's
    8M+2S — the naive completeness fixes cost 2x (unconditional double)
    or stalled Mosaic (lax.cond per cell).  Identity and opposite
    operands are exact as always.  Points must be affine-or-infinity
    (Z in {0, 1}) — every commitment-key caller satisfies this.

    HARD PRECONDITION: bases must be fixed nothing-up-my-sleeve points with
    no known discrete-log relation to R ("mira/bucket-offset/v1") or to each
    other.  R is a public constant, so an adversary-SUPPLIED base set can
    deliberately hit the incomplete madd's acc == P case (e.g. P2 = R + P1)
    and silently corrupt the sum.  All current call sites are prover-side
    hash-derived commitment keys, which satisfy this by construction; do NOT
    route untrusted points (e.g. verifier-side aggregation) through this
    kernel.

    Reference counterpart: halo2's best_multiexp bucket loop
    (/root/reference/src/commitment.rs:78-87)."""
    from jax.experimental import pallas as pl
    # no pltpu-less fallback: run() uses pltpu.SMEM BlockSpecs, pltpu.VMEM
    # scratch and (compiled) pltpu.roll unconditionally — a None fallback
    # would only trade ImportError for AttributeError (ADVICE r4)
    from jax.experimental.pallas import tpu as pltpu

    memory_space = pltpu.VMEM

    assert num_bits <= 255, "signed-digit kernel assumes scalars < 2^255"
    import hashlib

    from ..curves.host import BN254_G1, GRUMPKIN
    from .commitment import map_to_curve

    curve = BN254_G1 if curve_name == "bn254" else GRUMPKIN
    modulus = curve.base_modulus
    tf = tfield(modulus, interpret, lazy=True)
    W = window  # SWINDOW in production; tests shrink it (fewer buckets)
    nwin = (num_bits + W - 1) // W + 1
    ntab = 1 << (W - 1)  # bucket magnitudes 1..16
    if nwin % kw:
        kw = 1
    ngrp = nwin // kw
    thr_np, msk_np = _bucket_carry_tables(num_bits, W)

    # offset point R and its cancellation -K*R (see docstring)
    r_mod = curve.scalar_modulus
    R_pt = map_to_curve(
        curve, hashlib.sha3_256(b"mira/bucket-offset/v1").digest()
    )
    # every one of the `block` lanes carries its own R-initialized bucket
    # set, so the aggregate bias after the cross-lane reduction is
    # block * K * R
    K = (ntab * (ntab + 1) // 2) * (((1 << (W * nwin)) - 1) // ((1 << W) - 1))
    C_pt = R_pt.scalar_mul((-K * block) % r_mod)

    def _mont_limbs(v):
        return [int(x) for x in
                int_to_limbs((v << (LIMB_BITS * NUM_LIMBS)) % modulus)]

    Rx_limbs = _mont_limbs(R_pt.x.v)
    Ry_limbs = _mont_limbs(R_pt.y.v)
    Cx_limbs = _mont_limbs(C_pt.x.v)
    Cy_limbs = _mont_limbs(C_pt.y.v)
    # rows in w_idx (descending-window) order so SMEM blocks slice directly
    thr_rev = thr_np[::-1, None, :].copy()
    msk_rev = msk_np[::-1, None, :].copy()

    def _lane_roll(x, s):
        if interpret:
            return jnp.roll(x, -s, axis=1)
        return pltpu.roll(x, shift=(-s) % x.shape[1], axis=1)

    def acc_kernel(thr_ref, msk_ref, sc_ref, x_ref, y_ref, z_ref,
                   bX, bY, bZZ, bZZZ):
        g = pl.program_id(0)
        step = pl.program_id(1)
        B = x_ref.shape[1]
        zero = jnp.zeros((NUM_LIMBS, B), jnp.uint32)
        one = tf.one_tile(B)
        half = jnp.uint32(ntab)
        base = jnp.uint32(2 * ntab)
        dmask = jnp.uint32(2 * ntab - 1)

        @pl.when(step == 0)
        def _init():
            # every bucket starts at the offset point R = (Rx, Ry, 1, 1)
            shape = (kw * ntab, NUM_LIMBS, B)
            bX[...] = jnp.broadcast_to(tf._tile(Rx_limbs, B)[None], shape)
            bY[...] = jnp.broadcast_to(tf._tile(Ry_limbs, B)[None], shape)
            bZZ[...] = jnp.broadcast_to(one[None], shape)
            bZZZ[...] = jnp.broadcast_to(one[None], shape)

        sc = sc_ref[...]
        xq = x_ref[...]
        yq = y_ref[...]
        q_inf = tf.is_zero(z_ref[...])

        for k in range(kw):
            w = nwin - 1 - (g * kw + k)  # descending windows
            bit = w * W
            l0 = bit // LIMB_BITS
            r = (bit % LIMB_BITS).astype(jnp.uint32)
            low = sc_ref[pl.ds(l0, 1), :][0] >> r
            l1 = jnp.minimum(l0 + 1, NUM_LIMBS - 1)
            hi = sc_ref[pl.ds(l1, 1), :][0] << (jnp.uint32(LIMB_BITS) - r)
            valid = jnp.where(l0 + 1 <= NUM_LIMBS - 1,
                              jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
            raw = (low | (hi & valid)) & dmask

            c = jnp.zeros((B,), jnp.uint32)
            for i in range(NUM_LIMBS):  # most significant differing limb wins
                s_low_i = sc[i] & msk_ref[k, 0, i]
                gt = s_low_i > thr_ref[k, 0, i]
                lt = s_low_i < thr_ref[k, 0, i]
                c = jnp.where(gt, jnp.uint32(1),
                              jnp.where(lt, jnp.uint32(0), c))

            t = raw + c
            c_out = jnp.where(t >= half, jnp.uint32(1), jnp.uint32(0))
            mag = jnp.where(c_out == 1, base - t, t)  # |digit| in [0, 16]
            negf = jnp.where((c_out == 1) & (mag > 0),
                             jnp.uint32(1), jnp.uint32(0))
            y2 = tf.select(negf, tf.neg(yq), yq)
            take = jnp.where((mag > 0) & (q_inf == 0),
                             jnp.uint32(1), jnp.uint32(0))

            row0 = k * ntab
            aX, aY, aZZ, aZZZ = zero, one, zero, one
            for v in range(1, ntab + 1):
                m = jnp.where(mag == v, jnp.uint32(1), jnp.uint32(0))
                aX = tf.select(m, bX[row0 + v - 1], aX)
                aY = tf.select(m, bY[row0 + v - 1], aY)
                aZZ = tf.select(m, bZZ[row0 + v - 1], aZZ)
                aZZZ = tf.select(m, bZZZ[row0 + v - 1], aZZZ)

            # incomplete madd is exact here: acc is never the identity
            # (offset R) and acc == (xq, y2) needs a dlog relation to R
            nX, nY, nZZ, nZZZ = tf.xyzz_madd(
                (aX, aY, aZZ, aZZZ), (xq, y2), take
            )

            for v in range(1, ntab + 1):
                m2 = jnp.where((mag == v) & (take == 1),
                               jnp.uint32(1), jnp.uint32(0))
                bX[pl.ds(row0 + v - 1, 1)] = (
                    tf.select(m2, nX, bX[row0 + v - 1])[None])
                bY[pl.ds(row0 + v - 1, 1)] = (
                    tf.select(m2, nY, bY[row0 + v - 1])[None])
                bZZ[pl.ds(row0 + v - 1, 1)] = (
                    tf.select(m2, nZZ, bZZ[row0 + v - 1])[None])
                bZZZ[pl.ds(row0 + v - 1, 1)] = (
                    tf.select(m2, nZZZ, bZZZ[row0 + v - 1])[None])

    def fin_kernel(bX_ref, bY_ref, bZZ_ref, bZZZ_ref,
                   ox_ref, oy_ref, oz_ref, sX, sY, sZZ, sZZZ):
        i = pl.program_id(0)  # i-th window group row = descending window
        B = bX_ref.shape[2]
        zero = jnp.zeros((NUM_LIMBS, B), jnp.uint32)
        one = tf.one_tile(B)

        def vbody(v_i, carry):
            v = ntab - 1 - v_i  # descending magnitudes
            rX, rY, rZZ, rZZZ, tX, tY, tZZ, tZZZ = carry
            bkt = (bX_ref[pl.ds(v, 1)][0], bY_ref[pl.ds(v, 1)][0],
                   bZZ_ref[pl.ds(v, 1)][0], bZZZ_ref[pl.ds(v, 1)][0])
            # suffix-sum collisions are STRUCTURAL (tot == run whenever a
            # run value repeats across empty buckets), not adversarial —
            # the finalize always pays the complete add; it runs on 52
            # cells, not per point.
            run = tf.xyzz_add_complete((rX, rY, rZZ, rZZZ), bkt,
                                       mode="always")
            tot = tf.xyzz_add_complete((tX, tY, tZZ, tZZZ), run,
                                       mode="always")
            return (*run, *tot)

        init = (zero, one, zero, one, zero, one, zero, one)
        out = jax.lax.fori_loop(0, ntab, vbody, init)
        tot = out[4:]

        @pl.when(i == 0)
        def _first():
            sX[...], sY[...], sZZ[...], sZZZ[...] = tot

        @pl.when(i > 0)
        def _horner():
            S = (sX[...], sY[...], sZZ[...], sZZZ[...])
            for _ in range(W):
                S = tf.xyzz_double(S)
            S = tf.xyzz_add_complete(S, tot, mode="always")
            sX[...], sY[...], sZZ[...], sZZZ[...] = S

        @pl.when(i == pl.num_programs(0) - 1)
        def _emit():
            acc = (sX[...], sY[...], sZZ[...], sZZZ[...])
            s = B // 2
            while s >= 1:
                rolled = tuple(_lane_roll(cc, s) for cc in acc)
                acc = tf.xyzz_add_complete(acc, rolled, mode="always")
                s //= 2
            # cancel the aggregate bucket offset: S += (-K * R)
            ones_take = jnp.ones((B,), jnp.uint32)
            acc = tf.xyzz_madd_complete(
                acc, (tf._tile(Cx_limbs, B), tf._tile(Cy_limbs, B)),
                ones_take, mode="always",
            )
            jac = tf.xyzz_to_jac(acc)
            ox_ref[...] = tf.canon(jac[0])
            oy_ref[...] = tf.canon(jac[1])
            oz_ref[...] = tf.canon(jac[2])

    def run(sc, X, Y, Z):
        n = sc.shape[1]
        kwargs = {} if memory_space is None else {"memory_space": memory_space}
        skw = {} if memory_space is None else {"memory_space": pltpu.SMEM}
        blk = pl.BlockSpec((NUM_LIMBS, block), lambda g, s: (0, s), **kwargs)
        tab = pl.BlockSpec((kw, 1, NUM_LIMBS), lambda g, s: (g, 0, 0), **skw)
        bkt_out = pl.BlockSpec(
            (kw * ntab, NUM_LIMBS, block), lambda g, s: (g, 0, 0), **kwargs
        )
        bkt_shape = jax.ShapeDtypeStruct(
            (nwin * ntab, NUM_LIMBS, block), jnp.uint32
        )
        thr = jnp.asarray(thr_rev)
        msk = jnp.asarray(msk_rev)
        buckets = pl.pallas_call(
            acc_kernel,
            out_shape=[bkt_shape] * 4,
            grid=(ngrp, n // block),
            in_specs=[tab, tab] + [blk] * 4,
            out_specs=[bkt_out] * 4,
            interpret=interpret,
        )(thr, msk, sc, X, Y, Z)

        bkt_in = pl.BlockSpec(
            (ntab, NUM_LIMBS, block), lambda i: (i, 0, 0), **kwargs
        )
        osp = pl.BlockSpec((NUM_LIMBS, block), lambda i: (0, 0), **kwargs)
        out_shape = [
            jax.ShapeDtypeStruct((NUM_LIMBS, block), jnp.uint32)
            for _ in range(3)
        ]
        scratch = [pltpu.VMEM((NUM_LIMBS, block), jnp.uint32)
                   for _ in range(4)]
        return pl.pallas_call(
            fin_kernel,
            out_shape=out_shape,
            grid=(nwin,),
            in_specs=[bkt_in] * 4,
            out_specs=[osp] * 3,
            scratch_shapes=scratch,
            interpret=interpret,
        )(*buckets)

    return jax.jit(run)


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


@lru_cache(maxsize=None)
def _table_step_jits(curve_name: str):
    """Small reusable jit pieces for the table build.  One monolithic graph
    (ntab chained point-adds + a 254-bit inversion) takes minutes to compile
    (XLA:CPU) or OOMs the remote TPU compile helper; a handful of tiny
    programs compiled once and dispatched ntab times costs neither."""
    ops = jacobian_ops(curve_name)
    lf = ops.lf
    add = jax.jit(lambda p, q: ops.add(p, q))
    dbl = jax.jit(ops.double)
    mul = jax.jit(lf.mul)
    inv = jax.jit(lf.inv)

    def _affine(Xm, Ym, zi):
        zi2 = lf.square(zi)
        return lf.mul(Xm, zi2), lf.mul(Ym, lf.mul(zi2, zi))

    affine = jax.jit(_affine)
    return add, dbl, mul, inv, affine


def precompute_fixed_table(points, curve: CurveParams, window: int,
                           chunk: int = 1 << 18):
    """(X, Y, Z) Montgomery (n, 16) -> (2*ntab, 16, n) affine multiples table
    [x(1P)..x(vP), y(1P)..y(vP)], v = ntab = 2^(w-1), built in chunks to
    bound transient HBM.  Lanes with Z = 0 (padding) produce garbage entries
    that are never selected (their scalars are 0 => every digit is a no-op)."""
    add, dbl, mul, inv, affine = _table_step_jits(curve.name)
    ntab = 1 << (window - 1)
    X, Y, Z = points
    n = X.shape[0]
    parts = []
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        pt = (X[lo:hi], Y[lo:hi], Z[lo:hi])
        mults = [pt]
        if ntab >= 2:
            mults.append(dbl(pt))
        for _ in range(3, ntab + 1):
            mults.append(add(mults[-1], pt))
        # Montgomery batch inversion of the ntab Z coords per lane
        Zs = [m[2] for m in mults]
        prefix = [Zs[0]]
        for v in range(1, ntab):
            prefix.append(mul(prefix[-1], Zs[v]))
        run = inv(prefix[-1])
        invs = [None] * ntab
        for v in range(ntab - 1, 0, -1):
            invs[v] = mul(run, prefix[v - 1])
            run = mul(run, Zs[v])
        invs[0] = run
        xs, ys = [], []
        for v in range(ntab):
            ax, ay = affine(mults[v][0], mults[v][1], invs[v])
            xs.append(ax)
            ys.append(ay)
        parts.append(
            jnp.stack([c.T for c in xs] + [c.T for c in ys], axis=0)
        )
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)
    return jax.block_until_ready(out)


@lru_cache(maxsize=None)
def _msm_pallas_fixed_jit(modulus: int, num_bits: int, block: int,
                          window: int, interpret: bool):
    """Fixed-base signed-digit Pippenger over a PRECOMPUTED affine table.

    The per-block table build of the generic kernels (8 doubles + 8 adds per
    point) disappears: multiples v*P for v = 1..2^(w-1) are streamed from
    HBM (precompute_fixed_table) as affine (x, y), and every bucket add is a
    mixed XYZZ madd (8M+2S) instead of a Jacobian incomplete add (12M+4S).
    Per-point cost drops from ~68 point-ops to ~nwin mixed adds — ~2x fewer
    field muls than the signed Jacobian kernel for w=6.  HBM traffic is
    2*ntab*64 B/point (4 KB at w=6) against v5e's 819 GB/s — still
    compute-bound by >100x.

    Commitment MSMs reuse one key across every fold step
    (/root/reference/src/commitment.rs:78-87 recomputes nothing either —
    halo2's best_multiexp is given the fixed bases), so the table amortizes
    to noise; CommitmentKey caches it per MSM width."""
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu

        memory_space = pltpu.VMEM
    except Exception:  # pragma: no cover
        pltpu = None
        memory_space = None

    assert num_bits <= 255, "digit extraction assumes scalars < 2^255"
    tf = tfield(modulus, interpret, lazy=True)
    nwin = (num_bits + window - 1) // window + 1
    ntab = 1 << (window - 1)

    def _lane_roll(x, s):
        if interpret:
            return jnp.roll(x, -s, axis=1)
        return pltpu.roll(x, shift=(-s) % x.shape[1], axis=1)

    def kernel(sc_ref, tab_ref, ox_ref, oy_ref, oz_ref,
               accX, accY, accZZ, accZZZ):
        step = pl.program_id(0)
        nsteps = pl.num_programs(0)
        B = sc_ref.shape[1]
        zero = jnp.zeros((NUM_LIMBS, B), jnp.uint32)
        one = tf.one_tile(B)

        @pl.when(step == 0)
        def _init():
            accX[...] = jnp.zeros((nwin, NUM_LIMBS, B), jnp.uint32)
            accY[...] = jnp.broadcast_to(one[None], (nwin, NUM_LIMBS, B))
            accZZ[...] = jnp.zeros((nwin, NUM_LIMBS, B), jnp.uint32)
            accZZZ[...] = jnp.broadcast_to(one[None], (nwin, NUM_LIMBS, B))

        half = jnp.uint32(ntab)
        base = jnp.uint32(2 * ntab)
        dmask = jnp.uint32(base - 1)

        def one_window(w, c):
            bit = w * window
            l0 = bit // LIMB_BITS
            r = (bit % LIMB_BITS).astype(jnp.uint32)
            # windows whose start bit is past the scalar width contribute
            # only their incoming carry (w=6: window 43 starts at bit 258)
            valid0 = jnp.where(l0 <= NUM_LIMBS - 1,
                               jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
            l0c = jnp.minimum(l0, NUM_LIMBS - 1)
            low = sc_ref[pl.ds(l0c, 1), :][0] >> r
            l1 = jnp.minimum(l0 + 1, NUM_LIMBS - 1)
            hi = sc_ref[pl.ds(l1, 1), :][0] << (jnp.uint32(LIMB_BITS) - r)
            valid = jnp.where(l0 + 1 <= NUM_LIMBS - 1,
                              jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
            raw = ((low & valid0) | (hi & valid)) & dmask
            t = raw + c
            c_out = jnp.where(t >= half, jnp.uint32(1), jnp.uint32(0))
            mag = jnp.where(c_out == 1, base - t, t)
            negf = jnp.where((c_out == 1) & (mag > 0),
                             jnp.uint32(1), jnp.uint32(0))
            selX, selY = zero, one
            for v in range(1, ntab + 1):
                m = jnp.where(mag == v, jnp.uint32(1), jnp.uint32(0))
                selX = tf.select(m, tab_ref[pl.ds(v - 1, 1)][0], selX)
                selY = tf.select(m, tab_ref[pl.ds(ntab + v - 1, 1)][0], selY)
            selY = tf.select(negf, tf.neg(selY), selY)
            take = jnp.where(mag > 0, jnp.uint32(1), jnp.uint32(0))
            acc = (accX[pl.ds(w, 1)][0], accY[pl.ds(w, 1)][0],
                   accZZ[pl.ds(w, 1)][0], accZZZ[pl.ds(w, 1)][0])
            nX, nY, nZZ, nZZZ = tf.xyzz_madd(acc, (selX, selY), take)
            accX[pl.ds(w, 1)] = nX[None]
            accY[pl.ds(w, 1)] = nY[None]
            accZZ[pl.ds(w, 1)] = nZZ[None]
            accZZZ[pl.ds(w, 1)] = nZZZ[None]
            return c_out

        # KW windows per fori iteration: iterations run strictly serially
        # in Mosaic, so a 1-window body leaves the madd chain latency-bound
        # (same finding as the bucket kernel); unrolling gives the scheduler
        # independent madd chains, threaded only by the cheap digit carry.
        KW_FB = 4 if nwin % 4 == 0 else (2 if nwin % 2 == 0 else 1)

        def wbody(g, c):
            w0 = g * KW_FB
            for k in range(KW_FB):
                c = one_window(w0 + k, c)
            return c

        jax.lax.fori_loop(0, nwin // KW_FB, wbody,
                          jnp.zeros((B,), jnp.uint32))

        @pl.when(step == nsteps - 1)
        def _final():
            def rbody(w, carry):
                acc = (accX[pl.ds(w, 1)][0], accY[pl.ds(w, 1)][0],
                       accZZ[pl.ds(w, 1)][0], accZZZ[pl.ds(w, 1)][0])
                s = B // 2
                while s >= 1:
                    rolled = tuple(_lane_roll(c, s) for c in acc)
                    acc = tf.xyzz_add(acc, rolled)
                    s //= 2
                accX[pl.ds(w, 1)] = acc[0][None]
                accY[pl.ds(w, 1)] = acc[1][None]
                accZZ[pl.ds(w, 1)] = acc[2][None]
                accZZZ[pl.ds(w, 1)] = acc[3][None]
                return carry

            jax.lax.fori_loop(0, nwin, rbody, 0)

            S0 = (accX[pl.ds(nwin - 1, 1)][0], accY[pl.ds(nwin - 1, 1)][0],
                  accZZ[pl.ds(nwin - 1, 1)][0], accZZZ[pl.ds(nwin - 1, 1)][0])

            def hbody(i, S):
                w = nwin - 2 - i
                for _ in range(window):
                    S = tf.xyzz_double(S)
                Ww = (accX[pl.ds(w, 1)][0], accY[pl.ds(w, 1)][0],
                      accZZ[pl.ds(w, 1)][0], accZZZ[pl.ds(w, 1)][0])
                return tf.xyzz_add(S, Ww)

            S = jax.lax.fori_loop(0, nwin - 1, hbody, S0)
            Xj, Yj, Zj = tf.xyzz_to_jac(S)
            ox_ref[...] = tf.canon(Xj)
            oy_ref[...] = tf.canon(Yj)
            oz_ref[...] = tf.canon(Zj)

    def run(sc, tab):
        n = sc.shape[1]
        grid = (n // block,)
        sc_spec = (
            pl.BlockSpec((NUM_LIMBS, block), lambda i: (0, i))
            if memory_space is None
            else pl.BlockSpec((NUM_LIMBS, block), lambda i: (0, i),
                              memory_space=memory_space)
        )
        tab_spec = (
            pl.BlockSpec((2 * ntab, NUM_LIMBS, block), lambda i: (0, 0, i))
            if memory_space is None
            else pl.BlockSpec((2 * ntab, NUM_LIMBS, block),
                              lambda i: (0, 0, i), memory_space=memory_space)
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
            for _ in range(4)
        ]
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=grid,
            in_specs=[sc_spec, tab_spec],
            out_specs=[out_spec] * 3,
            scratch_shapes=scratch,
            interpret=interpret,
        )(sc, tab)

    return jax.jit(run)


def fixed_base_window(n: int) -> int:
    """Table window for a fixed-base MSM of width n.  w=6 measured 1.38M
    pts/s @2^20 vs w=5's 1.22M on one v5e (table 4 KB/point = 4 GB at 2^20);
    w=5 halves the table for 2^21."""
    return 6 if n <= (1 << 20) else 5


def msm_pallas_fixed(scalars, table, curve: CurveParams, window: int,
                     block: int = 256):
    """Fixed-base MSM: scalars (N, 16) plain limbs; table from
    precompute_fixed_table (2*ntab, 16, N).  Returns a Jacobian limb triple."""
    interpret = jax.default_backend() == "cpu"
    num_bits = curve.scalar_modulus.bit_length()
    n = scalars.shape[0]
    assert table.shape[2] == n and table.shape[0] == 2 << (window - 1)
    assert n % block == 0, "caller pads to the block multiple"
    sc_t = scalars.T
    ox, oy, oz = _msm_pallas_fixed_jit(
        curve.base_modulus, num_bits, block, window, interpret
    )(sc_t, table)
    return (ox[:, 0], oy[:, 0], oz[:, 0])


def msm_pallas(scalars, points, curve: CurveParams, block: int | None = None,
               method: str = "pippenger"):
    """scalars: (N, 16) plain limbs; points: (X, Y, Z) Montgomery (N, 16).
    Returns a Jacobian triple of (16,) arrays (the reduced sum).

    PRECONDITION (pippenger methods): bases must be pairwise DISTINCT
    non-identity points — the kernels use incomplete adds whose unsupported
    P == Q case silently yields infinity, so duplicate (scalar, point)
    pairs (same lane position a block apart, or meeting in the lane/Horner
    reduction) corrupt the result.  Hash-derived commitment keys
    (/root/reference/src/commitment.rs:52-76) satisfy this by construction;
    for arbitrary possibly-duplicated bases use ops.msm.msm (complete adds)
    or dedup on the host first.  Zero scalars and infinity padding lanes
    are exact.

    PRECONDITION (method="bucket"): duplicates ARE complete (offset
    buckets), but bases must still be fixed nothing-up-my-sleeve points
    with no known dlog relation to the public offset point R or to each
    other — adversary-chosen bases (P2 = R + P1) can deliberately hit the
    incomplete madd's acc == P case.  Prover-side hash-derived keys
    qualify; untrusted verifier-side point sets do not (see
    _msm_pallas_bucket_jit)."""
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
    if method == "bucket":
        # true-bucket kernel: no distinct-bases precondition (complete on
        # duplicates), but requires affine-or-infinity inputs (Z in {0,1})
        kw = int(os.environ.get("MIRA_MSM_BUCKET_KW", "2"))
        ox, oy, oz = _msm_pallas_bucket_jit(
            curve.name, num_bits, block, interpret, kw
        )(sc_t, Xt, Yt, Zt)
        return (ox[:, 0], oy[:, 0], oz[:, 0])
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

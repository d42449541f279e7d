"""Pallas-kernel field/curve primitives in limbs-major (16, B) layout.

These are pure jnp functions designed to run INSIDE Pallas kernels: the lane
axis B is minor (maps onto the 128-wide vector lanes), limbs are rows, all
control flow is static.  A Montgomery multiplication is ~300 tile ops on
VMEM-resident data — fusing a whole Jacobian double-and-add step (or a full
MSM) into one kernel turns the HBM-bound XLA graph into a compute-bound
kernel (see ops/pallas_msm.py).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.limbs import LIMB_BITS, MASK, NUM_LIMBS, int_to_limbs


def _roll_rows(x, shift: int, interpret: bool):
    """Circular shift along the sublane (row) axis.

    Compiled Mosaic gets the native sublane rotate (pltpu.roll); interpret
    mode (CPU tests) falls back to jnp.roll which Mosaic cannot lower."""
    if interpret:
        return jnp.roll(x, shift, axis=0)
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll(x, shift=shift % x.shape[0], axis=0)


class TField:
    """Field constants + ops for the transposed (16, B) layout.

    lazy=True keeps values in the half-reduced domain [0, 2p) — the final
    conditional subtraction is dropped from every Montgomery mul (inputs
    < 2p give T = (ab+mp)/R < 4p^2/R + p < 2p for p <= 2^254), adds reduce
    mod 2p, and zero tests accept both residues {0, p}.  ~20% fewer vector
    ops per mul; call canon() before results leave the kernel."""

    def __init__(self, modulus: int, interpret: bool = False,
                 mul_impl: str = "roll", lazy: bool = False):
        # constants kept as NUMPY so Pallas kernels see literals, not
        # captured device arrays
        assert modulus < 1 << (LIMB_BITS * NUM_LIMBS - 2), "need 4p <= R"
        self.modulus = modulus
        self.interpret = interpret
        self.mul_impl = mul_impl
        self.lazy = lazy
        # per-limb python ints: tiles are built inside kernels from scalar
        # literals (Pallas rejects captured array constants)
        self.p_limbs = [int(v) for v in int_to_limbs(modulus)]
        self.twop_limbs = [int(v) for v in int_to_limbs(2 * modulus)]
        self.n0inv = np.uint32((-pow(modulus, -1, 1 << LIMB_BITS)) & MASK)
        r = 1 << (LIMB_BITS * NUM_LIMBS)
        self.one_mont_limbs = [int(v) for v in int_to_limbs(r % modulus)]

    def _tile(self, limbs, B):
        shape = (B,) if isinstance(B, int) else tuple(B)
        return jnp.stack(
            [jnp.full(shape, v, jnp.uint32) for v in limbs], axis=0
        )

    def p_tile(self, B):
        return self._tile(self.p_limbs, B)

    def one_tile(self, B):
        return self._tile(self.one_mont_limbs, B)

    # -- helpers -------------------------------------------------------------
    def _normalize17(self, acc):
        """(17, B) lazy columns -> rippled (17, B) with rows < 2^16."""
        rows = [acc[i] for i in range(17)]
        for i in range(16):
            carry = rows[i] >> LIMB_BITS
            rows[i] = rows[i] & MASK
            rows[i + 1] = rows[i + 1] + carry
        return jnp.stack(rows, axis=0)

    def _geq(self, a, b):
        """(16, B) >= (16, B) lexicographically -> (B,) uint32 0/1 flag.

        Flags are uint32 throughout the kernel helpers: Mosaic's bool-vector
        lowering (i8->i1 trunc) crashes on some shapes, and mask arithmetic
        is cheaper anyway."""
        res = jnp.ones(a.shape[1:], dtype=jnp.uint32)
        for i in range(NUM_LIMBS):
            res = jnp.where(a[i] > b[i], jnp.uint32(1),
                            jnp.where(a[i] < b[i], jnp.uint32(0), res))
        return res

    def _sub16(self, a, b):
        """(a - b) rows, assuming a >= b."""
        rows = []
        borrow = jnp.zeros(a.shape[1:], dtype=jnp.uint32)
        for i in range(a.shape[0]):
            d = a[i] + (MASK + 1) - b[i] - borrow
            rows.append(d & MASK)
            borrow = 1 - (d >> LIMB_BITS)
        return jnp.stack(rows, axis=0)

    def _cond_sub_p(self, acc17):
        B = acc17.shape[1:]
        p17 = jnp.concatenate(
            [self.p_tile(B), jnp.zeros((1,) + B, jnp.uint32)], axis=0
        )
        # One round suffices: every caller maintains inputs < p, so sums are
        # < 2p and Montgomery outputs T = (ab + mp)/R < p^2/R + p < 2p.
        ge = self._geq(acc17, p17)
        sub = self._sub16(acc17, p17)
        m = (jnp.uint32(0) - ge)[None, :]
        acc17 = (sub & m) | (acc17 & ~m)
        return acc17[:NUM_LIMBS]

    def _cond_sub_2p(self, acc17):
        """(17, B) normalized value < 4p -> (16, B) value < 2p."""
        B = acc17.shape[1:]
        t17 = jnp.concatenate(
            [self._tile(self.twop_limbs, B),
             jnp.zeros((1,) + B, jnp.uint32)],
            axis=0,
        )
        ge = self._geq(acc17, t17)
        sub = self._sub16(acc17, t17)
        m = (jnp.uint32(0) - ge)[None, :]
        acc17 = (sub & m) | (acc17 & ~m)
        return acc17[:NUM_LIMBS]

    def canon(self, a):
        """Half-reduced [0, 2p) -> canonical [0, p) (one cond-sub)."""
        acc17 = jnp.concatenate(
            [a, jnp.zeros((1,) + a.shape[1:], jnp.uint32)], axis=0
        )
        return self._cond_sub_p(acc17)

    # -- ring ops ------------------------------------------------------------
    def add(self, a, b):
        acc = jnp.concatenate(
            [a + b, jnp.zeros((1,) + a.shape[1:], jnp.uint32)], axis=0
        )
        acc = self._normalize17(acc)
        if self.lazy:
            return self._cond_sub_2p(acc)
        return self._cond_sub_p(acc)

    def neg(self, a):
        if self.lazy:
            # 2p - a for a in [0, 2p); a = 0 maps to 2p, folded back by the
            # conditional subtraction
            B = a.shape[1:]
            d = self._sub16(self._tile(self.twop_limbs, B), a)
            acc17 = jnp.concatenate(
                [d, jnp.zeros((1,) + B, jnp.uint32)], axis=0
            )
            return self._cond_sub_2p(acc17)
        z = self.is_zero(a)
        d = self._sub16(self.p_tile(a.shape[1:]), a)
        return self.select(z, a, d)

    def sub(self, a, b):
        if self.lazy:
            # a + (2p - b) < 4p, one normalize + one cond-sub-2p
            B = a.shape[1:]
            d = self._sub16(self._tile(self.twop_limbs, B), b)
            acc = jnp.concatenate(
                [a + d, jnp.zeros((1,) + B, jnp.uint32)], axis=0
            )
            return self._cond_sub_2p(self._normalize17(acc))
        return self.add(a, self.neg(b))

    def double(self, a):
        return self.add(a, a)

    def mul(self, a, b):
        """CIOS Montgomery on (16, B) tiles; fully unrolled."""
        if self.mul_impl == "roll":
            return self._mul_roll(a, b)
        return self._mul_concat(a, b)

    def _mul_roll(self, a, b):
        """Copy-free CIOS: the accumulator stays a fixed (16, B) tile; the
        per-iteration limb shift is a sublane rotate (pltpu.roll) plus two
        row-masked fixups instead of five (17, B) concatenate copies.

        Row bounds: each row gains < 2^18 per iteration and lives <= 16
        shifts, so rows stay < 2^23 — comfortably inside uint32."""
        shp = jnp.broadcast_shapes(a.shape, b.shape)[1:]
        acc = jnp.zeros((NUM_LIMBS,) + shp, jnp.uint32)
        p = self.p_tile(shp)
        row = jax.lax.broadcasted_iota(jnp.uint32, (NUM_LIMBS,) + shp, 0)
        not_row0 = jnp.where(row != 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        for i in range(NUM_LIMBS):
            prod = a[i][None, :] * b
            acc = acc + (prod & MASK)
            m = (acc[0] * self.n0inv) & MASK
            qp = m[None, :] * p
            acc = acc + (qp & MASK)
            hpq = (prod >> LIMB_BITS) + (qp >> LIMB_BITS)
            hi = hpq[NUM_LIMBS - 1]
            acc = acc + (_roll_rows(hpq, 1, self.interpret) & not_row0)
            carry = acc[0] >> LIMB_BITS
            acc = _roll_rows(acc, -1, self.interpret)
            acc = jnp.where(row == NUM_LIMBS - 1, hi[None, :], acc)
            acc = acc + jnp.where(row == 0, carry[None, :], jnp.uint32(0))
        acc17 = jnp.concatenate(
            [acc, jnp.zeros((1,) + shp, jnp.uint32)], axis=0
        )
        acc17 = self._normalize17(acc17)
        if self.lazy:
            # T = (ab + mp)/R < 4p^2/R + p < 2p for p <= R/4: stays in the
            # half-reduced domain with NO conditional subtraction
            return acc17[:NUM_LIMBS]
        return self._cond_sub_p(acc17)

    def _mul_concat(self, a, b):
        B = a.shape[1]
        acc = jnp.zeros((NUM_LIMBS + 1, B), jnp.uint32)
        zero_row = jnp.zeros((1, B), jnp.uint32)
        p = self.p_tile(B)
        for i in range(NUM_LIMBS):
            prod = a[i][None, :] * b  # (16, B)
            acc = jnp.concatenate(
                [acc[:NUM_LIMBS] + (prod & MASK), acc[NUM_LIMBS:]], axis=0
            )
            acc = jnp.concatenate(
                [acc[:1], acc[1:] + (prod >> LIMB_BITS)], axis=0
            )
            m = (acc[0] * self.n0inv) & MASK
            q = m[None, :] * p
            acc = jnp.concatenate(
                [acc[:NUM_LIMBS] + (q & MASK), acc[NUM_LIMBS:]], axis=0
            )
            acc = jnp.concatenate(
                [acc[:1], acc[1:] + (q >> LIMB_BITS)], axis=0
            )
            carry = acc[0] >> LIMB_BITS
            acc = jnp.concatenate([acc[1:], zero_row], axis=0)
            acc = jnp.concatenate([acc[:1] + carry[None, :], acc[1:]], axis=0)
        acc = self._normalize17(acc)
        if self.lazy:
            return acc[:NUM_LIMBS]
        return self._cond_sub_p(acc)

    def square(self, a):
        return self.mul(a, a)

    def select(self, mask, a, b):
        """mask: (B,) uint32 0/1 flag; a, b: (16, B)."""
        m = (jnp.uint32(0) - mask)[None, :]
        return (a & m) | (b & ~m)

    def is_zero(self, a):
        """(B,) uint32 flag: 1 where the value is zero (in lazy mode the
        residues 0 and p both represent zero)."""
        nz = a[0]
        for i in range(1, NUM_LIMBS):
            nz = nz | a[i]
        z = jnp.where(nz == 0, jnp.uint32(1), jnp.uint32(0))
        if not self.lazy:
            return z
        B = a.shape[1]
        pt = self.p_tile(B)
        ne = a[0] ^ pt[0]
        for i in range(1, NUM_LIMBS):
            ne = ne | (a[i] ^ pt[i])
        zp = jnp.where(ne == 0, jnp.uint32(1), jnp.uint32(0))
        return z | zp

    # -- jacobian curve ops (a = 0) -----------------------------------------
    def jac_double(self, pt):
        X, Y, Z = pt
        A = self.square(X)
        Bb = self.square(Y)
        C = self.square(Bb)
        t = self.square(self.add(X, Bb))
        D = self.double(self.sub(self.sub(t, A), C))
        E = self.add(self.double(A), A)
        F = self.square(E)
        X3 = self.sub(F, self.double(D))
        Y3 = self.sub(
            self.mul(E, self.sub(D, X3)),
            self.double(self.double(self.double(C))),
        )
        Z3 = self.double(self.mul(Y, Z))
        return (X3, Y3, Z3)

    def jac_add_incomplete(self, p, q):
        """Jacobian add WITHOUT the embedded doubling branch: ~16 field muls
        instead of jac_add's ~23 (which pays a full jac_double for the
        P == Q completeness case).  Infinity operands and P == -Q are still
        handled exactly; P == Q (both non-infinity) yields the point at
        infinity instead of 2P.

        Safe wherever operands being equal non-infinity points would imply
        a discrete-log relation between independent generators — Pippenger
        bucket accumulation, lane reductions, Horner combines (probability
        ~2^-254 for honest inputs; an adversarial collision only corrupts
        the prover's own commitment, never soundness)."""
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        Z1Z1 = self.square(Z1)
        Z2Z2 = self.square(Z2)
        U1 = self.mul(X1, Z2Z2)
        U2 = self.mul(X2, Z1Z1)
        S1 = self.mul(self.mul(Y1, Z2), Z2Z2)
        S2 = self.mul(self.mul(Y2, Z1), Z1Z1)
        H = self.sub(U2, U1)
        R = self.sub(S2, S1)
        HH = self.square(H)
        HHH = self.mul(H, HH)
        V = self.mul(U1, HH)
        X3 = self.sub(self.sub(self.square(R), HHH), self.double(V))
        Y3 = self.sub(self.mul(R, self.sub(V, X3)), self.mul(S1, HHH))
        Z3 = self.mul(self.mul(Z1, Z2), H)

        p_inf = self.is_zero(Z1)
        q_inf = self.is_zero(Z2)
        h_zero = self.is_zero(H)
        not_inf = (1 - p_inf) * (1 - q_inf)
        # H == 0 (opposite OR the unsupported equal case) -> infinity
        to_inf = h_zero * not_inf
        B = X3.shape[1]
        zero = jnp.zeros((NUM_LIMBS, B), jnp.uint32)
        one = self.one_tile(B)
        X3 = self.select(to_inf, zero, X3)
        Y3 = self.select(to_inf, one, Y3)
        Z3 = self.select(to_inf, zero, Z3)
        X3 = self.select(p_inf, X2, self.select(q_inf, X1, X3))
        Y3 = self.select(p_inf, Y2, self.select(q_inf, Y1, Y3))
        Z3 = self.select(p_inf, Z2, self.select(q_inf, Z1, Z3))
        return (X3, Y3, Z3)

    # -- XYZZ curve ops (a = 0) ----------------------------------------------
    # Representation (X, Y, ZZ, ZZZ): affine x = X/ZZ, y = Y/ZZZ with the
    # invariant ZZ^3 == ZZZ^2; identity encoded as ZZ == 0 (ZZZ is then
    # unspecified — every identity check here uses ZZ only).  Mixed addition
    # with an affine operand is 8M+2S vs the Jacobian incomplete add's
    # 12M+4S — the win that makes the precomputed-affine-table MSM kernel
    # (ops/pallas_msm.py fixed-base path) ~1.5x the Jacobian kernel.

    def xyzz_identity(self, B):
        zero = jnp.zeros((NUM_LIMBS, B), jnp.uint32)
        one = self.one_tile(B)
        return (zero, one, zero, one)

    def xyzz_madd(self, acc, xy, take):
        """acc (XYZZ) += affine (x2, y2), masked by take ((B,) uint32 0/1).

        Incomplete in the same sense as jac_add_incomplete: the unsupported
        acc == (x2, y2) doubling case yields identity (a DL collision between
        independent generators for honest inputs); acc == -(x2, y2) and
        acc == identity are exact.  madd-2008-s: 8M+2S."""
        X1, Y1, ZZ1, ZZZ1 = acc
        x2, y2 = xy
        U2 = self.mul(x2, ZZ1)
        S2 = self.mul(y2, ZZZ1)
        P = self.sub(U2, X1)
        R = self.sub(S2, Y1)
        PP = self.square(P)
        PPP = self.mul(P, PP)
        Q = self.mul(X1, PP)
        X3 = self.sub(self.sub(self.square(R), PPP), self.double(Q))
        Y3 = self.sub(self.mul(R, self.sub(Q, X3)), self.mul(Y1, PPP))
        ZZ3 = self.mul(ZZ1, PP)
        ZZZ3 = self.mul(ZZZ1, PPP)

        acc_id = self.is_zero(ZZ1)
        p_zero = self.is_zero(P)
        to_inf = p_zero * (1 - acc_id)  # opposite (or unsupported equal)
        B = X1.shape[1]
        zero = jnp.zeros((NUM_LIMBS, B), jnp.uint32)
        one = self.one_tile(B)
        ZZ3 = self.select(to_inf, zero, ZZ3)
        # acc identity -> result is the affine point itself
        X3 = self.select(acc_id, x2, X3)
        Y3 = self.select(acc_id, y2, Y3)
        ZZ3 = self.select(acc_id, one, ZZ3)
        ZZZ3 = self.select(acc_id, one, ZZZ3)
        return (
            self.select(take, X3, X1),
            self.select(take, Y3, Y1),
            self.select(take, ZZ3, ZZ1),
            self.select(take, ZZZ3, ZZZ1),
        )

    def xyzz_madd_complete(self, acc, xy, take, mode=None):
        """xyzz_madd plus the doubling case: acc == (x2, y2) yields 2*acc
        instead of identity.  The fix-up (one xyzz_double + selects) runs
        under a lax.cond predicated on ANY lane colliding, so honest
        distinct-base inputs pay only the detection compares — this is what
        lets the bucket-accumulation MSM kernel stay exact on adversarial
        duplicate-base inputs without paying a complete add per point."""
        X1, Y1, ZZ1, ZZZ1 = acc
        x2, y2 = xy
        U2 = self.mul(x2, ZZ1)
        S2 = self.mul(y2, ZZZ1)
        P = self.sub(U2, X1)
        R = self.sub(S2, Y1)
        PP = self.square(P)
        PPP = self.mul(P, PP)
        Q = self.mul(X1, PP)
        X3 = self.sub(self.sub(self.square(R), PPP), self.double(Q))
        Y3 = self.sub(self.mul(R, self.sub(Q, X3)), self.mul(Y1, PPP))
        ZZ3 = self.mul(ZZ1, PP)
        ZZZ3 = self.mul(ZZZ1, PPP)

        acc_id = self.is_zero(ZZ1)
        p_zero = self.is_zero(P)
        r_zero = self.is_zero(R)
        to_inf = p_zero * (1 - r_zero) * (1 - acc_id)  # exact opposite
        B = X1.shape[1]
        zero = jnp.zeros((NUM_LIMBS, B), jnp.uint32)
        one = self.one_tile(B)
        ZZ3 = self.select(to_inf, zero, ZZ3)
        X3 = self.select(acc_id, x2, X3)
        Y3 = self.select(acc_id, y2, Y3)
        ZZ3 = self.select(acc_id, one, ZZ3)
        ZZZ3 = self.select(acc_id, one, ZZZ3)
        res = (X3, Y3, ZZ3, ZZZ3)

        collide = p_zero * r_zero * (1 - acc_id) * take

        def fix(r):
            d = self.xyzz_double(acc)
            return tuple(
                self.select(collide, dc, rc) for dc, rc in zip(d, r)
            )

        import os

        if mode is None:
            mode = os.environ.get("MIRA_MSM_BUCKET_COMPLETE", "always")
        if mode == "cond":
            res = jax.lax.cond(jnp.any(collide > 0), fix, lambda r: r, res)
        elif mode == "always":
            # unconditional double+select: +6M+3S per madd but no control
            # flow — Mosaic pipelines it, where lax.cond stalls the vector
            # pipeline (measured 50x slower per grid cell)
            res = fix(res)
        # mode == "off": incomplete (distinct-bases precondition)
        return tuple(
            self.select(take, rc, ac) for rc, ac in zip(res, acc)
        )

    def xyzz_add_complete(self, p, q, mode=None):
        """General XYZZ add with the equal-points case fixed up to 2*p via
        a rarely-taken lax.cond (cf. xyzz_madd_complete)."""
        X1, Y1, ZZ1, ZZZ1 = p
        X2, Y2, ZZ2, ZZZ2 = q
        U1 = self.mul(X1, ZZ2)
        U2 = self.mul(X2, ZZ1)
        S1 = self.mul(Y1, ZZZ2)
        S2 = self.mul(Y2, ZZZ1)
        P = self.sub(U2, U1)
        R = self.sub(S2, S1)
        PP = self.square(P)
        PPP = self.mul(P, PP)
        Q = self.mul(U1, PP)
        X3 = self.sub(self.sub(self.square(R), PPP), self.double(Q))
        Y3 = self.sub(self.mul(R, self.sub(Q, X3)), self.mul(S1, PPP))
        ZZ3 = self.mul(self.mul(ZZ1, ZZ2), PP)
        ZZZ3 = self.mul(self.mul(ZZZ1, ZZZ2), PPP)

        p_id = self.is_zero(ZZ1)
        q_id = self.is_zero(ZZ2)
        p_zero = self.is_zero(P)
        r_zero = self.is_zero(R)
        not_id = (1 - p_id) * (1 - q_id)
        to_inf = p_zero * (1 - r_zero) * not_id
        B = X1.shape[1]
        zero = jnp.zeros((NUM_LIMBS, B), jnp.uint32)
        ZZ3 = self.select(to_inf, zero, ZZ3)
        X3 = self.select(p_id, X2, self.select(q_id, X1, X3))
        Y3 = self.select(p_id, Y2, self.select(q_id, Y1, Y3))
        ZZ3 = self.select(p_id, ZZ2, self.select(q_id, ZZ1, ZZ3))
        ZZZ3 = self.select(p_id, ZZZ2, self.select(q_id, ZZZ1, ZZZ3))
        res = (X3, Y3, ZZ3, ZZZ3)

        collide = p_zero * r_zero * not_id

        def fix(r):
            d = self.xyzz_double(p)
            return tuple(
                self.select(collide, dc, rc) for dc, rc in zip(d, r)
            )

        import os

        if mode is None:
            mode = os.environ.get("MIRA_MSM_BUCKET_COMPLETE", "always")
        if mode == "cond":
            return jax.lax.cond(jnp.any(collide > 0), fix, lambda r: r, res)
        if mode == "always":
            return fix(res)
        return res

    def xyzz_add(self, p, q):
        """General XYZZ + XYZZ (add-2008-s, 12M+2S), incomplete: the equal-
        points case yields identity; identity operands and opposites exact."""
        X1, Y1, ZZ1, ZZZ1 = p
        X2, Y2, ZZ2, ZZZ2 = q
        U1 = self.mul(X1, ZZ2)
        U2 = self.mul(X2, ZZ1)
        S1 = self.mul(Y1, ZZZ2)
        S2 = self.mul(Y2, ZZZ1)
        P = self.sub(U2, U1)
        R = self.sub(S2, S1)
        PP = self.square(P)
        PPP = self.mul(P, PP)
        Q = self.mul(U1, PP)
        X3 = self.sub(self.sub(self.square(R), PPP), self.double(Q))
        Y3 = self.sub(self.mul(R, self.sub(Q, X3)), self.mul(S1, PPP))
        ZZ3 = self.mul(self.mul(ZZ1, ZZ2), PP)
        ZZZ3 = self.mul(self.mul(ZZZ1, ZZZ2), PPP)

        p_id = self.is_zero(ZZ1)
        q_id = self.is_zero(ZZ2)
        p_zero = self.is_zero(P)
        to_inf = p_zero * (1 - p_id) * (1 - q_id)
        B = X1.shape[1]
        zero = jnp.zeros((NUM_LIMBS, B), jnp.uint32)
        ZZ3 = self.select(to_inf, zero, ZZ3)
        X3 = self.select(p_id, X2, self.select(q_id, X1, X3))
        Y3 = self.select(p_id, Y2, self.select(q_id, Y1, Y3))
        ZZ3 = self.select(p_id, ZZ2, self.select(q_id, ZZ1, ZZ3))
        ZZZ3 = self.select(p_id, ZZZ2, self.select(q_id, ZZZ1, ZZZ3))
        return (X3, Y3, ZZ3, ZZZ3)

    def xyzz_double(self, p):
        """XYZZ doubling (dbl-2008-s, a = 0): 6M+3S. Identity stays identity
        (ZZ3 = V*ZZ1 = 0)."""
        X1, Y1, ZZ1, ZZZ1 = p
        U = self.double(Y1)
        V = self.square(U)
        W = self.mul(U, V)
        S = self.mul(X1, V)
        XX = self.square(X1)
        M = self.add(self.double(XX), XX)
        X3 = self.sub(self.square(M), self.double(S))
        Y3 = self.sub(self.mul(M, self.sub(S, X3)), self.mul(W, Y1))
        ZZ3 = self.mul(V, ZZ1)
        ZZZ3 = self.mul(W, ZZZ1)
        return (X3, Y3, ZZ3, ZZZ3)

    def xyzz_to_jac(self, p):
        """(X, Y, ZZ, ZZZ) -> Jacobian (X_j, Y_j, Z_j) with Z_j = ZZ*ZZZ:
        X_j = X*ZZ*ZZZ^2, Y_j = Y*ZZ^3*ZZZ^2.  Identity (ZZ=0) -> Z_j=0."""
        X, Y, ZZ, ZZZ = p
        Zj = self.mul(ZZ, ZZZ)
        ZZZ2 = self.square(ZZZ)
        ZZ2 = self.square(ZZ)
        ZZ3 = self.mul(ZZ2, ZZ)
        Xj = self.mul(self.mul(X, ZZ), ZZZ2)
        Yj = self.mul(self.mul(Y, ZZ3), ZZZ2)
        return (Xj, Yj, Zj)

    def jac_add(self, p, q):
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        Z1Z1 = self.square(Z1)
        Z2Z2 = self.square(Z2)
        U1 = self.mul(X1, Z2Z2)
        U2 = self.mul(X2, Z1Z1)
        S1 = self.mul(self.mul(Y1, Z2), Z2Z2)
        S2 = self.mul(self.mul(Y2, Z1), Z1Z1)
        H = self.sub(U2, U1)
        R = self.sub(S2, S1)
        HH = self.square(H)
        HHH = self.mul(H, HH)
        V = self.mul(U1, HH)
        X3 = self.sub(self.sub(self.square(R), HHH), self.double(V))
        Y3 = self.sub(self.mul(R, self.sub(V, X3)), self.mul(S1, HHH))
        Z3 = self.mul(self.mul(Z1, Z2), H)

        p_inf = self.is_zero(Z1)
        q_inf = self.is_zero(Z2)
        h_zero = self.is_zero(H)
        r_zero = self.is_zero(R)
        not_inf = (1 - p_inf) * (1 - q_inf)
        is_double = h_zero * r_zero * not_inf
        is_opposite = h_zero * (1 - r_zero) * not_inf

        dX, dY, dZ = self.jac_double(p)
        B = X3.shape[1]
        zero = jnp.zeros((NUM_LIMBS, B), jnp.uint32)
        one = self.one_tile(B)

        X3 = self.select(is_opposite, zero, self.select(is_double, dX, X3))
        Y3 = self.select(is_opposite, one, self.select(is_double, dY, Y3))
        Z3 = self.select(is_opposite, zero, self.select(is_double, dZ, Z3))
        X3 = self.select(p_inf, X2, self.select(q_inf, X1, X3))
        Y3 = self.select(p_inf, Y2, self.select(q_inf, Y1, Y3))
        Z3 = self.select(p_inf, Z2, self.select(q_inf, Z1, Z3))
        return (X3, Y3, Z3)


@lru_cache(maxsize=None)
def tfield(modulus: int, interpret: bool = False,
           mul_impl: str = "roll", lazy: bool = False) -> TField:
    return TField(modulus, interpret, mul_impl, lazy)

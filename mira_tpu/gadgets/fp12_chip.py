"""In-circuit Fp12/Gt tuple operations (reference /root/reference/src/gadgets/fp12.rs
in-circuit half) and the G2 point container (ecc2.rs).

The full G2 in-circuit scalar-mul arrives with the SnarkStar workload; the
trivial/poseidon/merkle IVC slice needs assignment, absorption and
conditional-select only (gt cross terms empty => fold_gt is a no-op chain).
"""

from __future__ import annotations

import dataclasses
from typing import List

from ..curves.host import XI_0
from ..table.circuit import AssignedValue, RegionCtx
from .main_gate import MainGate, MainGateConfig


@dataclasses.dataclass
class AssignedTuple12:
    elements: List[AssignedValue]  # 12 cells


@dataclasses.dataclass
class AssignedG2Point:
    x: tuple  # (c0 cell, c1 cell)
    y: tuple


class Fp12Chip:
    def __init__(self, config: MainGateConfig):
        self.main_gate = MainGate(config)

    def conditional_select(self, ctx, lhs: AssignedTuple12, rhs: AssignedTuple12, cond):
        mg = self.main_gate
        return AssignedTuple12(
            [
                mg.conditional_select(ctx, a, b, cond)
                for a, b in zip(lhs.elements, rhs.elements)
            ]
        )

    def mul(self, ctx, a: AssignedTuple12, b: AssignedTuple12) -> AssignedTuple12:
        """Schoolbook 6x6 with xi0 reduction, mirroring the off-circuit
        algorithm (fp12.rs:65-117) with one MainGate row per mul/add."""
        mg = self.main_gate
        s, t = a.elements, b.elements
        zero = mg.assign_value(ctx, 0)

        def addc(x, y):
            return mg.add(ctx, x, y)

        def subc(x, y):
            return mg.sub(ctx, x, y)

        def mulc(x, y):
            return mg.mul(ctx, x, y)

        a0b0 = [zero] * 11
        a0b1 = [zero] * 11
        a1b0 = [zero] * 11
        a1b1 = [zero] * 11
        for i in range(6):
            for j in range(6):
                a0b0[i + j] = addc(a0b0[i + j], mulc(s[i], t[j]))
                a0b1[i + j] = addc(a0b1[i + j], mulc(s[i], t[j + 6]))
                a1b0[i + j] = addc(a1b0[i + j], mulc(s[i + 6], t[j]))
                a1b1[i + j] = addc(a1b1[i + j], mulc(s[i + 6], t[j + 6]))
        sub = [subc(a0b0[i], a1b1[i]) for i in range(11)]
        add = [addc(a0b1[i], a1b0[i]) for i in range(11)]
        out = [zero] * 12
        for i in range(6):
            if i < 5:
                xi_term = mg.mul_by_const(ctx, sub[i + 6], XI_0)
                out[i] = subc(addc(xi_term, sub[i]), add[i + 6])
            else:
                out[i] = sub[i]
        for i in range(6):
            if i < 5:
                xi_term = mg.mul_by_const(ctx, add[i + 6], XI_0)
                out[i + 6] = addc(addc(add[i], sub[i + 6]), xi_term)
            else:
                out[i + 6] = add[i]
        return AssignedTuple12(out)

    def one(self, ctx) -> AssignedTuple12:
        mg = self.main_gate
        one = mg.assign_value(ctx, 1)
        mg.assert_equal_const(ctx, one, 1)
        zeros = []
        for _ in range(11):
            z = mg.assign_value(ctx, 0)
            mg.assert_equal_const(ctx, z, 0)
            zeros.append(z)
        return AssignedTuple12([one] + zeros)

    def scalar_mul(self, ctx, base: AssignedTuple12, scalar_bits) -> AssignedTuple12:
        """LSB-first square-and-multiply over assigned bits
        (fp12.rs in-circuit scalar_mul)."""
        acc = self.one(ctx)
        p = base
        for i, bit in enumerate(scalar_bits):
            mult = self.mul(ctx, acc, p)
            acc = self.conditional_select(ctx, mult, acc, bit)
            if i + 1 < len(scalar_bits):
                p = self.mul(ctx, p, p)
        return acc


class G2EccChip:
    """Placeholder for the full G2 on-circuit arithmetic (ecc2.rs); the
    trivial slice only selects/assigns."""

    def __init__(self, config: MainGateConfig):
        self.main_gate = MainGate(config)

    def conditional_select_g2(self, ctx, lhs: AssignedG2Point, rhs: AssignedG2Point, cond):
        mg = self.main_gate
        return AssignedG2Point(
            x=(
                mg.conditional_select(ctx, lhs.x[0], rhs.x[0], cond),
                mg.conditional_select(ctx, lhs.x[1], rhs.x[1], cond),
            ),
            y=(
                mg.conditional_select(ctx, lhs.y[0], rhs.y[0], cond),
                mg.conditional_select(ctx, lhs.y[1], rhs.y[1], cond),
            ),
        )

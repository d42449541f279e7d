"""Real Groth16 proofs flowing through the NIFS pipeline: SPS instances carry
actual proof elements, VanillaFS emits true pairing cross terms, and the
decider checks the folded Gt invariant with real pairings.

The reference cannot do any of this (random placeholders at
plonk/mod.rs:690-703 and vanilla/mod.rs:130-134; no Gt decider check).
"""

import random

import pytest

from mira_tpu.curves.host import BN254_G1, AffinePoint, Tuple12
from mira_tpu.fields.host import field
from mira_tpu.fields.params import BN254_FQ
from mira_tpu.nifs.vanilla import VanillaFS
from mira_tpu.ops.commitment import CommitmentKey
from mira_tpu.ops.poseidon import create_ro
from mira_tpu.plonk.structure import (
    RelaxedPlonkInstance,
    RelaxedPlonkTrace,
    RelaxedPlonkWitness,
    SatError,
)
from mira_tpu.snark.groth16 import (
    Groth16FoldContext,
    benchmark_r1cs,
    prove,
    setup as g16_setup,
    verify as g16_verify,
)
from mira_tpu.table.runner import CircuitRunner

from test_nifs import K, MulCircuit, ro


def test_real_proofs_through_nifs():
    rng = random.Random(3)
    r1cs, z = benchmark_r1cs(20)
    pk = g16_setup(r1cs, rng)
    pub = z[1 : r1cs.num_public + 1]
    proofs = [(prove(pk, r1cs, z, rng), list(pub)) for _ in range(2)]
    assert g16_verify(pk.vk, proofs[0][0], pub)

    ctx = Groth16FoldContext(pk.vk, batch_size=1)
    ctx.push_proofs(proofs)

    runner = CircuitRunner(
        K, MulCircuit(1), [], BN254_G1,
        ctx.num_g1, ctx.num_g2, ctx.gt_degree, ctx.num_gt_cross_terms,
    )
    S = runner.collect_structure()
    S.groth16_ctx = ctx
    advice1 = runner.collect_witness()
    runner2 = CircuitRunner(
        K, MulCircuit(2), [], BN254_G1,
        ctx.num_g1, ctx.num_g2, ctx.gt_degree, ctx.num_gt_cross_terms,
    )
    advice2 = runner2.collect_witness()
    ck = CommitmentKey.setup(BN254_G1, K + 2, b"test")

    pp, vp = VanillaFS.setup_params(AffinePoint.generator(BN254_G1), S)
    trace1 = VanillaFS.generate_plonk_trace(ck, [], advice1, pp, ro())
    trace2 = VanillaFS.generate_plonk_trace(ck, [], advice2, pp, ro())
    # fresh instances carry the actual proof elements
    assert trace1.u.g1_elements[0] == proofs[0][0].a
    assert trace1.u.g2_elements[0] == proofs[0][0].b

    acc = RelaxedPlonkTrace(
        RelaxedPlonkInstance.new(
            S.curve, S.num_io, S.num_challenges, len(S.round_sizes),
            S.num_g1_elems, S.num_g2_elems,
        ),
        RelaxedPlonkWitness.zeros(S.lf, S.k, S.round_sizes),
    )
    S.is_sat_relaxed(ck, acc.U, acc.W)  # zero acc: u=0, gt=1, R=K^0=1

    rng2 = random.Random(7)
    acc1, proof1 = VanillaFS.prove(ck, pp, ro(), acc, trace1, rng=rng2)
    S.is_sat_relaxed(ck, acc1.U, acc1.W)  # includes real-pairing gt check
    U_v = VanillaFS.verify(vp, ro(), ro(), acc.U, trace1.u, proof1)
    assert U_v == acc1.U

    acc2, proof2 = VanillaFS.prove(ck, pp, ro(), acc1, trace2, rng=rng2)
    S.is_sat_relaxed(ck, acc2.U, acc2.W)

    # tampering with the folded gt element must break the decider
    Fb = field(BN254_FQ)
    acc2.U.gt_element = acc2.U.gt_element.mul(Tuple12.generator(Fb))
    with pytest.raises(SatError):
        S.is_sat_relaxed(ck, acc2.U, acc2.W)


@pytest.mark.slow
@pytest.mark.skipif(
    not __import__("os").environ.get("MIRA_RUN_SLOW"),
    reason="~3min e2e; set MIRA_RUN_SLOW=1",
)
def test_snarkstar_real_proofs_two_steps():
    """Full IVC with real Groth16 proofs over TWO fold steps: exercises the
    Gt pairing decider and on/off-circuit consistency with a non-trivial
    accumulator (u1 != 0).  Regression for the field-placement bug where
    pairing data rode the secondary (Fr-base) side and real Fq elements
    were silently reduced."""
    from mira_tpu.workloads import snarkstar

    # k=19 (the batch-1 ladder size): the step-folding circuit with
    # fold_g1/g2/gt gadget rows does not fit smaller tables
    snarkstar.run(steps=2, batch_size=1,
                  real_proofs=True, num_constraints=20)

"""ProtoGalaxy folding: reference property tests (zero_f / zero_g), the
lagrange parity vector, and the G = F(alpha)*L_0 + K*Z identity."""

import random

from mira_tpu.curves.host import BN254_G1, AffinePoint
from mira_tpu.fields.params import BN254_FQ, BN254_FR
from mira_tpu.nifs.protogalaxy import ProtoGalaxy, ProtoGalaxyProverParam
from mira_tpu.ops.commitment import CommitmentKey
from mira_tpu.ops.poseidon import create_ro
from mira_tpu.polynomial.univariate import (
    eval_lagrange_polys_for_cyclic_group,
    eval_vanish_polynomial,
)
from mira_tpu.table.runner import CircuitRunner

K = 4


class TwoGate:
    def __init__(self, seed=0):
        self.seed = seed

    def configure(self, cs):
        q1, q2 = cs.fixed_column(), cs.fixed_column()
        a, b, c = (cs.advice_column() for _ in range(3))
        q1e, q2e, ae, be, ce = (cs.query(x) for x in (q1, q2, a, b, c))
        cs.create_gate("mul", [q1e * (ae * be - ce)])
        cs.create_gate("add", [q2e * (ae + be - ce)])
        return (q1, q2, a, b, c)

    def synthesize(self, config, ctx):
        q1, q2, a, b, c = config
        rng = random.Random(self.seed)
        t = ctx.table
        p = t.modulus
        for row in range(t.nrow):
            av, bv = rng.randrange(p), rng.randrange(p)
            t.assign_advice(a, row, av)
            t.assign_advice(b, row, bv)
            if row % 2 == 0:
                t.assign_fixed(q1, row, 1)
                t.assign_advice(c, row, av * bv % p)
            else:
                t.assign_fixed(q2, row, 1)
                t.assign_advice(c, row, (av + bv) % p)


def make_trace(seed):
    runner = CircuitRunner(K, TwoGate(seed), [], BN254_G1)
    S = runner.collect_structure()
    ck = CommitmentKey.setup(BN254_G1, K + 2, b"pg")
    trace = S.run_sps_protocol(ck, [], runner.collect_witness(), create_ro(BN254_FQ))
    return S, ck, trace


def test_lagrange_parity_vector():
    """Hard-coded Fr values from reference lagrange.rs basic_lagrange_test."""
    got = eval_lagrange_polys_for_cyclic_group(BN254_FR, 2, 2)
    assert got == [
        5472060717959818805561601436314318772137091100104008585924551046643952123908,
        5472060717959818798949719980869953008325120142272090480018905346516323946831,
        5472060717959818805561601436314318772137091100104008585924551046643952123903,
        5472060717959818812173482891758684535949062057935926691830196746771580300976,
    ]


def test_zero_f_for_satisfied_trace():
    S, ck, trace = make_trace(0)
    rng = random.Random(1)
    betas = [rng.randrange(BN254_FR) for _ in range(20)]
    delta = rng.randrange(BN254_FR)
    rel = trace.to_relax(S.k)
    poly = ProtoGalaxy.compute_F(betas, delta, S, rel)
    assert all(c == 0 for c in poly)


def test_nonzero_f_for_garbage_trace():
    S, ck, trace = make_trace(0)
    rng = random.Random(2)
    rel = trace.to_relax(S.k)
    # corrupt the witness
    rel.W.W = [S.lf.encode([rng.randrange(BN254_FR) for _ in range(w.shape[0])])
               for w in rel.W.W]
    betas = [rng.randrange(BN254_FR) for _ in range(20)]
    poly = ProtoGalaxy.compute_F(betas, rng.randrange(BN254_FR), S, rel)
    assert any(c != 0 for c in poly)


def test_zero_g_for_satisfied_traces():
    S, ck, trace = make_trace(0)
    rng = random.Random(3)
    rel = trace.to_relax(S.k)
    betas = [rng.randrange(BN254_FR) for _ in range(20)]
    poly = ProtoGalaxy.compute_G(S, betas, rel, [trace])
    assert all(c == 0 for c in poly)


def test_prove_fold_and_verify_instance_match():
    """Full PG prove over one incoming trace: accumulator updates, and the
    verifier's instance-side fold matches the prover's."""
    S, ck, trace1 = make_trace(4)
    pp, vp = ProtoGalaxy.setup_params(AffinePoint.generator(BN254_G1), S)
    acc = ProtoGalaxy.new_accumulator(S, pp, create_ro(BN254_FQ))

    new_acc, proof = ProtoGalaxy.prove(ck, pp, create_ro(BN254_FQ), acc, [trace1])

    betas_v, e_v, U_v = ProtoGalaxy.verify(
        vp, create_ro(BN254_FQ), create_ro(BN254_FQ), acc, [trace1.u], proof
    )
    assert betas_v == new_acc.betas
    assert e_v == new_acc.e
    assert U_v == new_acc.trace.U

    # the folded witness satisfies the PG invariant: evaluating F over the
    # folded trace with betas' must equal e
    evals_poly = ProtoGalaxy.compute_F(new_acc.betas, 0, S, new_acc.trace)
    # F(X) with delta=0 is the constant poly sum_i pow_i(betas')*f_i = e
    assert evals_poly.eval(0) == new_acc.e

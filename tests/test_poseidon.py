"""Poseidon bit-exactness anchors.

- Grain LFSR constants vs the public hadeshash `poseidonperm_x5_254_3` vector
  (same generation the reference's poseidon fork uses).
- The reference's own sponge known-answer test
  (/root/reference/src/poseidon/poseidon_hash.rs:263-281).
- Optimized-schedule equivalence against the canonical permutation.
"""

import random

import pytest

from mira_tpu.fields.host import field
from mira_tpu.fields.params import BN254_FR, PALLAS_BASE, VESTA_BASE
from mira_tpu.ops.poseidon import Grain, PoseidonHash, Spec, get_spec, mat_vec

Fr = field(BN254_FR)
Fp = field(PALLAS_BASE)  # pallas base field
Fq = field(VESTA_BASE)  # pallas scalar field


def _canonical_permutation(constants, mds, r_f, r_p, state):
    def pow5(x):
        s = x.square()
        return s.square() * x

    half = r_f // 2
    for r in range(r_f + r_p):
        state = [s + c for s, c in zip(state, constants[r])]
        if half <= r < half + r_p:
            state = [pow5(state[0])] + state[1:]
        else:
            state = [pow5(s) for s in state]
        state = mat_vec(mds, state)
    return state


def test_grain_hadeshash_vector():
    """poseidonperm_x5_254_3 from the hadeshash reference test vectors:
    permutation of (0,1,2) over bn254 Fr with t=3, R_F=8, R_P=57."""
    t, r_f, r_p = 3, 8, 57
    g = Grain(Fr.PARAMS.num_bits, t, r_f, r_p)
    constants = [[g.next_field_element(Fr) for _ in range(t)] for _ in range(r_f + r_p)]
    while True:
        vals = [g.next_field_element_without_rejection(Fr) for _ in range(2 * t)]
        if len({v.v for v in vals}) == len(vals):
            xs, ys = vals[:t], vals[t:]
            break
    mds = [[(xs[i] + ys[j]).invert() for j in range(t)] for i in range(t)]

    assert (
        constants[0][0].v
        == 0x0EE9A592BA9A9518D05986D656F40C2114C4993C11BB29938D21D47304CD8E6E
    )
    out = _canonical_permutation(constants, mds, r_f, r_p, [Fr(0), Fr(1), Fr(2)])
    assert out[0].v == 0x115CC0F5E7D690413DF64C6B9662E9CF2A3617F2743245519E19607A4417189A
    assert out[1].v == 0x0FCA49B798923AB0239DE1C9E7A4A9A2210312B6A2F616D18B5A87F9B628AE29
    assert out[2].v == 0x0E7AE82E40091E63CBD4F16A6D16310B3729D4B6E138FCF54110E2867045A30C


def test_reference_sponge_vector():
    """Reference mira poseidon_hash.rs test: absorb pallas-base 0..5 with
    T=3/RATE=2/R_F=4/R_P=3, squeeze 128 bits into the scalar field."""
    h = PoseidonHash(Spec(Fp, 3, 2, 4, 3))
    for i in range(5):
        h.absorb_field(Fp(i))
    out = h.squeeze(Fq, 128)
    assert out.v == 277726250230731218669330566268314254439


@pytest.mark.parametrize("t,r_f,r_p", [(3, 4, 3), (5, 10, 10), (4, 8, 6)])
def test_optimized_equals_canonical(t, r_f, r_p):
    spec = Spec(Fp, t, t - 1, r_f, r_p)
    g = Grain(Fp.PARAMS.num_bits, t, r_f, r_p)
    constants = [[g.next_field_element(Fp) for _ in range(t)] for _ in range(r_f + r_p)]

    rng = random.Random(42)
    init = [Fp(rng.randrange(Fp.P)) for _ in range(t)]
    inputs = [Fp(rng.randrange(Fp.P)) for _ in range(t - 2)]

    # canonical: state absorbed manually (inputs at 1.., pad marker after)
    absorbed = list(init)
    for i, x in enumerate(inputs):
        absorbed[1 + i] = absorbed[1 + i] + x
    absorbed[1 + len(inputs)] = absorbed[1 + len(inputs)] + Fp(1)
    want = _canonical_permutation(constants, spec.mds, r_f, r_p, absorbed)

    h = PoseidonHash(spec)
    h.state = list(init)
    h.permutation(inputs)
    assert [s.v for s in h.state] == [w.v for w in want]


def test_ivc_spec_shape():
    """The IVC uses T=5/RATE=4/R_F=10/R_P=10 over bn254
    (reference examples/trivial/main.rs:24-25)."""
    spec = get_spec(BN254_FR, 5, 4, 10, 10)
    assert len(spec.constants_start) == 6
    assert len(spec.constants_partial) == 10
    assert len(spec.constants_end) == 4
    assert len(spec.sparse_matrices) == 10

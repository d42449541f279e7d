"""KZG (pairing-verified) and IPA polynomial commitment schemes (pcs/)."""

import dataclasses
import random

from mira_tpu.curves.host import BN254_G1, GRUMPKIN
from mira_tpu.pcs.ipa import IpaSrs, ipa_commit, ipa_open, ipa_verify
from mira_tpu.pcs.kzg import KzgSrs, kzg_commit, kzg_open, kzg_verify

R = BN254_G1.scalar_modulus


def test_kzg_commit_open_verify():
    rng = random.Random(0)
    srs = KzgSrs.setup(32)
    coeffs = [rng.randrange(R) for _ in range(17)]
    C = kzg_commit(srs, coeffs)
    z = rng.randrange(R)
    y, pi = kzg_open(srs, coeffs, z)
    assert kzg_verify(srs, C, z, y, pi)
    assert not kzg_verify(srs, C, z, (y + 1) % R, pi)
    assert not kzg_verify(srs, C, z, y, srs.g1_powers[3])
    # constant polynomial: identity witness
    y0, pi0 = kzg_open(srs, [5], z)
    assert y0 == 5 and kzg_verify(srs, kzg_commit(srs, [5]), z, y0, pi0)


def test_ipa_commit_open_verify():
    rng = random.Random(1)
    rg = GRUMPKIN.scalar_modulus
    srs = IpaSrs.setup(GRUMPKIN, 5)
    coeffs = [rng.randrange(rg) for _ in range(29)]
    C = ipa_commit(srs, coeffs)
    z = rng.randrange(rg)
    y, pf = ipa_open(srs, coeffs, z)
    assert ipa_verify(srs, C, z, y, pf, len(coeffs))
    assert not ipa_verify(srs, C, z, (y + 1) % rg, pf, len(coeffs))
    bad = dataclasses.replace(pf, a_final=(pf.a_final + 1) % rg)
    assert not ipa_verify(srs, C, z, y, bad, len(coeffs))

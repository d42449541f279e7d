"""SVDW hash-to-curve (curves/svdw.py): RFC 9380 anchors + map properties.

Mirrors the derivation the reference uses for commitment keys
(/root/reference/src/commitment.rs:52-76 -> halo2curves
hash_to_curve("from_uniform_bytes")).
"""

import hashlib

from mira_tpu.curves.host import BN254_G1, GRUMPKIN
from mira_tpu.curves.svdw import (
    expand_message_xmd,
    find_z_svdw,
    hash_to_curve,
    map_to_curve_svdw,
    svdw_constants,
)


def test_expand_message_xmd_rfc9380_vectors():
    # RFC 9380 Appendix K.1 (SHA-256, len_in_bytes = 0x20)
    dst = b"QUUX-V01-CS02-with-expander-SHA256-128"
    assert (
        expand_message_xmd(b"", dst, 0x20).hex()
        == "68a985b87eb6b46952128911f2a4412bbc302a9d759667f87f7a21d803f07235"
    )
    assert (
        expand_message_xmd(b"abc", dst, 0x20).hex()
        == "d8ccab23b5985ccea865c6c97b6e5b8350e794e603b4b97902f53a8a0d605615"
    )
    assert expand_message_xmd(b"abcdef0123456789", dst, 0x20).hex() == (
        "eff31487c770a893cfb36f912fbfcbff40d5661771ca4b2cb4eafe524333f5c1"
    )
    # len_in_bytes = 0x80 exercises the multi-block xor chain
    long = expand_message_xmd(b"", dst, 0x80)
    assert long.hex().startswith("af84c27ccfd45d41914fdff5df25293e")


def test_svdw_z_is_one_for_both_curves():
    assert find_z_svdw(BN254_G1.base_modulus, 0, BN254_G1.b) == 1
    assert find_z_svdw(GRUMPKIN.base_modulus, 0, GRUMPKIN.b) == 1


def test_svdw_constants_consistent():
    for curve in (BN254_G1, GRUMPKIN):
        p = curve.base_modulus
        Z, c1, c2, c3, c4 = svdw_constants(p, 0, curve.b)
        assert c1 == (Z * Z * Z + curve.b) % p
        assert (c2 * 2) % p == (-Z) % p
        # c3^2 == -g(Z) * (3Z^2)
        assert (c3 * c3) % p == (-c1 * 3 * Z * Z) % p
        assert c3 % 2 == 0  # sgn0(c3) == 0
        assert (c4 * 3 * Z * Z) % p == (-4 * c1) % p


def test_map_to_curve_svdw_on_curve_and_deterministic():
    for curve in (BN254_G1, GRUMPKIN):
        for u in (0, 1, 2, 12345678901234567890):
            pt = map_to_curve_svdw(curve, u % curve.base_modulus)
            assert pt.is_on_curve()
        f = hash_to_curve(curve, "from_uniform_bytes")
        seeds = [
            hashlib.shake_256(b"x").digest(32),
            b"\x00" * 32,
            b"\xff" * 32,
        ]
        pts = [f(s) for s in seeds]
        assert all(p.is_on_curve() for p in pts)
        assert pts[0] == f(seeds[0])  # deterministic
        assert pts[0] != pts[1]


def test_commitment_key_uses_svdw(monkeypatch):
    monkeypatch.setenv("MIRA_HTC", "svdw")
    from mira_tpu.ops.commitment import map_to_curve

    f = hash_to_curve(BN254_G1, "from_uniform_bytes")
    seed = hashlib.shake_256(b"bn256").digest(32)
    assert map_to_curve(BN254_G1, seed) == f(seed)

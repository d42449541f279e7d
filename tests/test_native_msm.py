"""Native C++ host Pippenger (native/msm.cpp via ctypes)."""

import random

import pytest

from mira_tpu.curves.host import BN254_G1, GRUMPKIN, AffinePoint, msm_host
from mira_tpu.ops.native_msm import available, msm_native

pytestmark = pytest.mark.skipif(
    not available(), reason="no g++ toolchain to build native/msm.cpp"
)


@pytest.mark.parametrize("curve", [BN254_G1, GRUMPKIN], ids=["bn254", "grumpkin"])
def test_native_msm_matches_host(curve):
    rng = random.Random(11)
    n = 200
    pts = [AffinePoint.random(curve, rng) for _ in range(n)]
    pts[3] = AffinePoint.identity(curve)
    svals = [rng.randrange(curve.scalar_modulus) for _ in range(n)]
    svals[0] = 0
    svals[1] = 1
    svals[2] = curve.scalar_modulus - 1
    assert msm_native(svals, pts) == msm_host(svals, pts)


def test_native_msm_single_and_doubling_paths():
    rng = random.Random(12)
    p = AffinePoint.random(BN254_G1, rng)
    # scalar 2/3 exercise the aliased pt_double path in bucket reduction
    for s in (1, 2, 3, 7, 1 << 64, 1 << 128):
        assert msm_native([s], [p]) == msm_host([s], [p])
    # identical points across lanes exercise the H==0 doubling branch
    assert msm_native([1, 1], [p, p]) == msm_host([2], [p])


def test_native_msm_window_sweep():
    rng = random.Random(13)
    n = 64
    pts = [AffinePoint.random(GRUMPKIN, rng) for _ in range(n)]
    svals = [rng.randrange(GRUMPKIN.scalar_modulus) for _ in range(n)]
    want = msm_host(svals, pts)
    for window in (1, 4, 8, 13, 16):
        assert msm_native(svals, pts, window=window) == want

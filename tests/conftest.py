"""Test configuration: force a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware.

NOTE: the environment exports JAX_PLATFORMS=axon (remote TPU tunnel); tests
must override it -- remote compiles are slow and flaky for the CI-style suite.
Benchmarks (bench.py) intentionally keep the axon TPU platform.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # The VM live-migrates between physical hosts MID-PROCESS; /proc/cpuinfo
    # reflects the boot host while LLVM re-detects via CPUID, so host-tuned
    # XLA:CPU code (and persisted AOT cache entries) can hit a different
    # micro-architecture and crash (observed: segfaults in cache
    # read/write/compile paths of long suite runs; "machine type ...
    # doesn't match" AOT loader warnings).  Cap codegen at AVX2 — portable
    # across the fleet.
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

# The axon (remote TPU tunnel) PJRT plugin registers itself in every python
# process via sitecustomize; merely having it registered makes the first
# device->host transfer stall for ~100s intermittently. Deregister it for the
# CPU test suite before any backend is initialized.
try:
    import jax
    from jax._src import xla_bridge

    jax.config.update("jax_platforms", "cpu")
    xla_bridge._backend_factories.pop("axon", None)
    xla_bridge._backend_factories.pop("tpu", None)
    # keep "tpu" a *known* platform name (checkify/pallas register tpu
    # lowering rules at import and assert the name is known) without keeping
    # the axon-backed factory that causes the device-transfer stall
    xla_bridge._platform_aliases.setdefault("tpu", "tpu")

    # persistent compile cache: the big limb-arithmetic graphs (MSM bodies)
    # take minutes to compile on XLA:CPU; pay once per machine.  The dir is
    # namespaced by host CPU fingerprint — cross-machine XLA:CPU AOT loads
    # SIGILL/segfault (utils/compile_cache.py).
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from mira_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    )
except Exception:
    pass


# Protocol tests don't care which backend computes commitments/encodes;
# on the CPU suite the native/host runtime is both the real CPU path and
# ~free of XLA:CPU compiles (a cold suite run was minutes of compiling lane
# MSM programs at K=4 sizes the runtime never uses).  Backend-specific
# tests (test_jax_curve, test_pallas_*, test_ntt, test_parallel,
# test_nifs[xla/pallas]) call the device kernels directly or override these
# with monkeypatch.
os.environ.setdefault("MIRA_MSM", "host")
os.environ.setdefault("MIRA_NATIVE_ENCODE_MIN", "1")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    A single long pytest process accumulates hundreds of live XLA:CPU
    executables; past a cumulative threshold, the NEXT big
    compile/serialize/deserialize segfaults inside XLA (observed repeatedly
    at the same suite position regardless of which test lands there; every
    test passes standalone).  Dropping the jit caches per module keeps the
    live-executable volume bounded; the persistent disk cache makes the
    recompiles cheap."""
    yield
    try:
        import jax

        jax.clear_caches()
    except Exception:
        pass

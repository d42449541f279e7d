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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
    # take minutes to compile on XLA:CPU; pay once per machine.
    _cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

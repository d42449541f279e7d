"""mira_tpu: TPU-native folding framework (see SURVEY.md).

Set MIRA_FORCE_CPU=1 to run any entry point on the host CPU backend even
when the environment exports JAX_PLATFORMS=axon (remote TPU tunnel).  The
axon PJRT plugin registers itself in every python process; merely having it
registered makes the first device->host transfer stall (indefinitely when
the tunnel is down), so the factory must be deregistered before any backend
initializes — same dance as tests/conftest.py.
"""

import os as _os

if _os.environ.get("MIRA_FORCE_CPU") == "1":
    _os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = _os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_max_isa" not in _flags:
        # the VM live-migrates between hosts mid-process; cap codegen at
        # AVX2 so jitted code and cache entries survive the move
        _flags = (_flags + " --xla_cpu_max_isa=AVX2").strip()
    _os.environ["XLA_FLAGS"] = _flags
    try:
        import jax as _jax
        from jax._src import xla_bridge as _xb

        _jax.config.update("jax_platforms", "cpu")
        _xb._backend_factories.pop("axon", None)
        _xb._backend_factories.pop("tpu", None)
        # keep "tpu" a known platform name: checkify/pallas register tpu
        # lowering rules at import and assert the name is known
        _xb._platform_aliases.setdefault("tpu", "tpu")
    except Exception:
        pass

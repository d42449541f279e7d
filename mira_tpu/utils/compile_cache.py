"""Machine-fingerprinted persistent compile cache directory.

JAX's persistent compilation-cache key does NOT include the host CPU's
feature set, but XLA:CPU emits AOT code tuned to it.  This environment
migrates between physical hosts with differing features (avx512*/amx*
subsets), and loading a cross-machine entry triggers
"Machine type used for XLA:CPU compilation doesn't match the machine type
for execution ... SIGILL" — observed as hard segfaults mid-suite.

Namespace the cache dir by a digest of /proc/cpuinfo flags so each host
family gets its own entries; same-host sessions still amortize compiles.
"""

from __future__ import annotations

import hashlib
import os
import re


def machine_fingerprint() -> str:
    """Digest of CPU flags AND family/model/stepping/name.

    Flags alone are not enough: two hosts here expose identical flag lists
    but different model numbers, and LLVM's -mcpu tuning (e.g.
    prefer-no-gather) differs — the AOT result still mismatches."""
    try:
        with open("/proc/cpuinfo") as f:
            txt = f.read()
        keys = ("flags", "model name", "cpu family", "model", "stepping",
                "vendor_id")
        parts = []
        for key in keys:
            vals = sorted(set(re.findall(
                rf"^{re.escape(key)}\s*:\s*(.*)$", txt, re.M)))
            parts.append(f"{key}={';'.join(vals)}")
        if not any(parts):
            return "unknown"
        return hashlib.sha256("\n".join(parts).encode()).hexdigest()[:12]
    except OSError:  # pragma: no cover
        return "unknown"


def machine_cache_dir(base: str) -> str:
    path = os.path.join(os.path.abspath(base), machine_fingerprint())
    os.makedirs(path, exist_ok=True)
    return path


def enable_persistent_cache(base: str = None) -> None:
    """Point jax at the per-machine persistent cache (idempotent)."""
    import jax

    if base is None:
        base = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", machine_cache_dir(base))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

"""Per-machine persistent-cache namespacing (utils/compile_cache.py).

Cross-machine XLA:CPU AOT cache loads SIGILL (the cache key omits host CPU
features); the cache dir must therefore be fingerprinted per host.
"""

import os

from mira_tpu.utils.compile_cache import (
    machine_cache_dir,
    machine_fingerprint,
)


def test_fingerprint_stable_and_hexlike():
    a, b = machine_fingerprint(), machine_fingerprint()
    assert a == b
    assert a == "unknown" or (len(a) == 12 and int(a, 16) >= 0)


def test_cache_dir_created_under_fingerprint(tmp_path):
    d = machine_cache_dir(str(tmp_path / "cache"))
    assert os.path.isdir(d)
    assert os.path.basename(d) == machine_fingerprint()

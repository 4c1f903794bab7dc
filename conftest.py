"""Root conftest: force tests onto a virtual 8-device CPU mesh.

The real TPU chip is reserved for bench.py / training; all unit and
integration tests run on CPU so they are host-portable and can exercise
multi-device sharding via a fake 8-device mesh (the TPU-native analog of a
fake distributed backend, SURVEY.md §4).

NOTE: the environment's TPU plugin overrides the JAX_PLATFORMS env var, so
we must set the platform through jax.config AFTER import (verified: env-var
form is ignored here, config.update works).
"""

import os

# Persistent compilation cache: this box has 2 slow vCPUs and the jitted env/
# train programs are large; caching makes repeat test runs fast.
_cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# CAT_TPU_TESTS=1 leaves the real backend in place so the backend-gated
# smoke tests (tests/test_tpu_smoke.py) exercise the PRODUCTION lanes+Pallas
# path on the chip; everything else still runs (on TPU, slower compiles).
if not os.environ.get("CAT_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")

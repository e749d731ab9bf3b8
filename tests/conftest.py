"""Test configuration: force CPU with 8 virtual devices so sharding tests
run without TPU hardware (SURVEY.md section 4 — fake-mesh testing strategy),
and persist compiled executables across test runs (XLA:CPU compiles of the
engine's scatter/gather loops are expensive; the cache makes re-runs fast)."""

import os

# force CPU even when the ambient environment selects a TPU platform —
# tests rely on 8 virtual devices and must not contend for the real chip
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/transgo_tpu_jax_cache"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# the hosted environment pins JAX_PLATFORMS=axon through a sitecustomize
# that shadows the env var — override through the config instead
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

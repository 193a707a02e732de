"""Test configuration: force an 8-device CPU mesh before JAX initializes.

Multi-device SPMD paths are tested on virtual CPU devices
(``xla_force_host_platform_device_count``), per SURVEY.md §4. The host
environment may point JAX at a real accelerator (JAX_PLATFORMS=axon) and may
pre-import jax at interpreter startup, so both the env vars and the config
API are forced here (the backend must not be initialized yet — conftest runs
before any test code touches devices).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
# SUBPROCESSES spawned by e2e tests must not share a cache dir: concurrent
# cache writes from parallel processes intermittently SEGFAULT inside jax's
# executable serializer (observed in train-CLI e2e: put_executable_and_time
# -> hard crash), and tests/test_distributed.py runs two jax processes at
# once. enable_persistent_cache() honors this env var, so children stay off.
os.environ.setdefault("T5GEMMA_TTS_COMPILE_CACHE", "off")

# jax may already be imported (but not initialized) at interpreter startup;
# force flags through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache for the TEST WORKERS themselves (VERDICT r3 #10:
# suite wall time): each xdist worker gets its OWN dir — writes are then
# strictly sequential per dir, dodging the concurrent-write segfault above.
# Measured on tests/test_decode_engine.py: 142 s cold -> 53 s warm.
# Opt out with T5G_TEST_COMPILE_CACHE=off.
_tcc = os.environ.get("T5G_TEST_COMPILE_CACHE", "")
if _tcc.lower() not in ("off", "0"):
    _worker = os.environ.get("PYTEST_XDIST_WORKER", "main")
    _cache_dir = os.path.join(
        _tcc or os.path.join(os.path.dirname(__file__), os.pardir,
                             ".pytest_xla_cache"),
        _worker)
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# JAX's default matmul precision is bf16-based even for f32 inputs; parity
# tests need true fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

assert not jax._src.xla_bridge.backends_are_initialized(), (
    "JAX backends initialized before conftest could configure them; "
    "tests would not run on the virtual CPU mesh"
)

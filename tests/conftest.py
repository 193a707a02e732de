"""Test configuration: force an 8-device CPU mesh before JAX initializes.

Multi-device SPMD paths are tested on virtual CPU devices
(``xla_force_host_platform_device_count``), per SURVEY.md §4.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# determinism + quieter logs
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
# JAX's default matmul precision is bf16-based even for f32 inputs; parity
# tests need true fp32 accumulation. jax may already be imported at
# interpreter startup here, so set the flag through the config API.
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

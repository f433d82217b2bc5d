"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run anywhere (the JAX analog of a fake distributed backend — the reference
had none; see SURVEY.md §4)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Parity tests compare against float64 oracles; allow 64-bit types (float32
# inputs still compute in float32 — production paths pass f32/bf16 anyway).
import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run anywhere (the JAX analog of a fake distributed backend — the reference
had none; see SURVEY.md §4)."""
import os

# force CPU (the session env pins JAX_PLATFORMS=axon for the real chip;
# tests want the virtual 8-device CPU mesh and float64 oracles)
os.environ["JAX_PLATFORMS"] = os.environ.get("HOIGEN_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Parity tests compare against float64 oracles; allow 64-bit types (float32
# inputs still compute in float32 — production paths pass f32/bf16 anyway).
import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# this JAX build defaults f32 matmuls to bf16 MXU precision even on the CPU
# backend; parity tests need true f32 accumulation
jax.config.update("jax_default_matmul_precision", "highest")

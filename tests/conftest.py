"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the JAX analog of a fake
distributed backend — the reference had none; see SURVEY.md §4) with
float64 + highest matmul precision enabled for oracle comparisons.

This environment's sitecustomize (in /root/.axon_site, on PYTHONPATH)
imports jax at interpreter startup and pins the axon TPU backend — it
ignores later JAX_PLATFORMS changes, routes even CPU compiles through a
remote service (~1s each), and breaks xla_force_host_platform_device_count.
The only reliable escape is to relaunch the interpreter without that path,
so pytest_configure re-execs pytest once with a cleaned environment (after
releasing pytest's fd capture so output still reaches the caller).
Set HOIGEN_TEST_PLATFORM=axon to run tests on the real chip instead.
"""
import os
import sys

_PLATFORM = os.environ.get("HOIGEN_TEST_PLATFORM", "cpu")
_NEEDS_REEXEC = (_PLATFORM == "cpu" and "axon" in sys.modules
                 and os.environ.get("_HOIGEN_TEST_REEXEC") != "1")


def pytest_configure(config):
    if not _NEEDS_REEXEC:
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()   # restore the caller's stdout fds
    env = dict(os.environ)
    env["_HOIGEN_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


if not _NEEDS_REEXEC:
    os.environ.setdefault("JAX_PLATFORMS", _PLATFORM)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_enable_x64", True)
    # this JAX build defaults f32 matmuls to bf16 MXU precision even on the
    # CPU backend; parity tests need true f32 accumulation
    jax.config.update("jax_default_matmul_precision", "highest")

"""Test configuration: run the suite on a virtual 8-device CPU backend.

Multi-chip TPU hardware is not available in CI; sharding tests emulate an
8-device mesh on CPU via `xla_force_host_platform_device_count`, and the
physics tests run fine on CPU.

The container's sitecustomize registers the axon TPU PJRT plugin (with
remote compilation) at interpreter boot — before any conftest runs — which
routes even CPU-backend XLA compiles through a slow RPC (~15s per unique
kernel). We therefore re-exec pytest once with the axon registration
disabled and the CPU backend forced. The re-exec happens in
`pytest_configure`, after stopping pytest's global fd capture so the child
process inherits the real stdout/stderr.
"""

import os
import sys

_MARK = "_YOFC_TEST_REEXEC"


def _needs_reexec() -> bool:
    return os.environ.get(_MARK) != "1" and bool(os.environ.get("PALLAS_AXON_POOL_IPS"))


if not _needs_reexec():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    if not _needs_reexec():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.stop_global_capturing()
        except Exception:
            pass
    env = dict(os.environ)
    env[_MARK] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""  # sitecustomize skips axon registration
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

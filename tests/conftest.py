"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
tests work without TPU hardware.

The environment may preset a TPU platform (e.g. 'axon', registered by a
sitecustomize hook that also overrides JAX_PLATFORMS programmatically), so
setting the env var is not enough — the jax config must be updated before
any backend initialization. Tests must never round-trip through the TPU
tunnel; override with ARRIBA_TPU_TEST_PLATFORM=axon to test on hardware.
"""

import os

platform = os.environ.get("ARRIBA_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = platform
if platform == "cpu":
    # drop the TPU-tunnel PJRT registration (a sitecustomize hook keyed on
    # this variable): plugin discovery can block on a busy/wedged tunnel
    # even under JAX_PLATFORMS=cpu, and every pipeline subprocess spawned
    # by a test inherits this environment
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", platform)


# build the native extension when missing so a fresh checkout tests the
# native fast paths, not just the pure-Python fallback
def _ensure_native_built() -> None:
    import importlib
    import pathlib
    import subprocess

    repo = pathlib.Path(__file__).resolve().parent.parent
    try:
        importlib.import_module("arriba_tpu._native")
        return
    except ImportError:
        pass
    build = repo / "native" / "build.sh"
    if not build.exists():
        return
    try:
        subprocess.run(["bash", str(build)], cwd=repo, check=True,
                       capture_output=True, timeout=600)
    except Exception:
        return  # tests still run on the Python parity reference


_ensure_native_built()

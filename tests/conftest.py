"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment's TPU plugin ("axon") overrides the JAX_PLATFORMS env
var, so we must also force the platform through jax.config. XLA_FLAGS
must be set before the CPU backend is first used.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Full-suite runs accumulate hundreds of live CPU executables and
    have twice segfaulted inside XLA's backend_compile ~25 min in
    (always in whichever heavy-compile test runs around the 70% mark);
    per-module cache clearing keeps the compiler's live-state footprint
    bounded. Individual modules are unaffected (they recompile their own
    programs anyway)."""
    yield
    import jax

    jax.clear_caches()

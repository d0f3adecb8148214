"""Test config: force CPU backend with 8 virtual devices (mesh tests run
on a simulated 8-chip topology, per SURVEY §4's test strategy)."""

import os

# Force CPU with 8 virtual devices. The box's sitecustomize eagerly
# registers the axon TPU backend and pins JAX_PLATFORMS=axon, so env vars
# alone are not enough: XLA_FLAGS must land before the CPU client exists,
# and the platform override must go through jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the suite is compile-bound on this 1-core
# box (~16 min cold); warm re-runs skip every unchanged jit compile
jax.config.update("jax_compilation_cache_dir", "/tmp/ry_test_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import pathlib

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden_dir():
    if not GOLDEN.exists():
        pytest.skip("golden fixtures not generated (run tools/gen_goldens.py)")
    return GOLDEN


def load_golden(name: str) -> dict:
    with np.load(GOLDEN / f"{name}.npz") as z:
        return {k: z[k] for k in z.files}

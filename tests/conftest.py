"""Test env: force CPU with a virtual 8-device mesh before JAX initializes."""

import os

# The shell env pre-sets JAX_PLATFORMS=axon (the real-TPU tunnel with remote
# compilation); tests must run on the local CPU backend, so override, don't default.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config key works.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_frame(rng, h, w, is_hdr=False):
    """Random NV12/P010-style planar frame (y, uv-interleaved)."""
    if is_hdr:
        y = rng.integers(0, 65536, (h, w), dtype=np.uint16)
        uv = rng.integers(0, 65536, (h // 2, w), dtype=np.uint16)
    else:
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        uv = rng.integers(0, 256, (h // 2, w), dtype=np.uint8)
    return y, uv


def make_flow(rng, low_h, low_w, max_mag=8):
    return rng.integers(-max_mag, max_mag + 1, (2, low_h, low_w)).astype(np.int16)


# --- Test tiering (VERDICT r3 weak #6) -------------------------------------
# The exhaustive interpret-mode Pallas grids and fuzz sweeps push the full
# suite past a bounded CI window. For each test function in the modules below,
# the FIRST parametrize combo stays in the smoke tier; every further combo is
# marked `exhaustive`. `pytest -m "not exhaustive"` therefore still executes
# every test function at least once, while `pytest` (no -m) runs everything.
_EXHAUSTIVE_MODULES = {
    "test_warp_band",
    "test_fuzz_engine",
    "test_golden_vs_scalar",
    "test_flow_strip",
    "test_warp_strip",
    "test_flow_planned",
    "test_round4",
}


def pytest_collection_modifyitems(config, items):
    seen: set = set()
    for item in items:
        mod = getattr(item.module, "__name__", "")
        if mod not in _EXHAUSTIVE_MODULES:
            continue
        key = (mod, getattr(item, "originalname", None) or item.name)
        if key in seen:
            item.add_marker(pytest.mark.exhaustive)
        else:
            seen.add(key)

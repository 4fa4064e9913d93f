"""Pallas kernels (interpret mode on CPU) vs the golden model — exact equality."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_flow
from hopperrender_tpu.ops import golden
from hopperrender_tpu.ops.pallas_kernels import blur_flow_pallas


@pytest.mark.parametrize("low_h,low_w", [(11, 13), (34, 48), (270, 480)])
def test_blur_flow_pallas_matches_golden(rng, low_h, low_w):
    offsets = make_flow(rng, low_h, low_w, max_mag=500)
    got = blur_flow_pallas(jnp.asarray(offsets), interpret=True)
    want = golden.blur_flow(offsets)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_blur_flow_pallas_truncating_division(rng):
    offsets = np.full((2, 16, 16), -3, dtype=np.int16)
    got = blur_flow_pallas(jnp.asarray(offsets), interpret=True)
    assert (np.asarray(got) == -3).all()


def test_blur_backend_dispatch(rng):
    """blur_flow(backend=...) must agree across backends."""
    from hopperrender_tpu.ops import flow as flow_ops

    offsets = jnp.asarray(make_flow(rng, 17, 23, max_mag=300))
    xla = flow_ops.blur_flow(offsets, backend="xla")
    auto = flow_ops.blur_flow(offsets, backend="auto")  # cpu -> xla
    np.testing.assert_array_equal(np.asarray(xla), np.asarray(auto))

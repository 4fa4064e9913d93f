"""EXPERIMENTAL Pallas band warp (interpret mode) vs the strip warp — Y plane mode 2."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_flow, make_frame
from hopperrender_tpu.ops import warp_band, warp_strip


@pytest.mark.parametrize("is_hdr", [False, True])
@pytest.mark.parametrize("rs,h,w", [(1, 32, 64), (2, 64, 96)])
def test_band_matches_strip_y(rng, is_hdr, rs, h, w):
    low_h, low_w = h >> rs, w >> rs
    s12y, s12uv = make_frame(rng, h, w, is_hdr)
    s21y, s21uv = make_frame(rng, h, w, is_hdr)
    fl = make_flow(rng, low_h, low_w, max_mag=12)
    apron = 32
    t = 0.375
    black, white = (2.0 * 256, 250.0 * 256) if is_hdr else (2.0, 250.0)
    c12 = warp_strip.build_warp_context(jnp.asarray(s12y), jnp.asarray(s12uv),
                                        apron=apron, is_hdr=is_hdr)
    c21 = warp_strip.build_warp_context(jnp.asarray(s21y), jnp.asarray(s21uv),
                                        apron=apron, is_hdr=is_hdr)
    got = warp_band.warp_band_y(
        c12, c21, jnp.asarray(fl), t, black, white,
        res_scalar=rs, is_hdr=is_hdr, dim_y=h, dim_x=w, apron=apron, interpret=True)
    want_y, _ = warp_strip.warp_frame_strip(
        c12, c21, jnp.asarray(fl), t, black, white,
        res_scalar=rs, mode=2, is_hdr=is_hdr, dim_y=h, dim_x=w, apron=apron)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want_y))

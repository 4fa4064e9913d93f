"""Strip-mined warp vs the reference formulation — modes 0/1 exact, mode 2 within
1 LSB (float blend/levels, same contract as test_jax_ops)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_flow, make_frame
from hopperrender_tpu.ops import warp as warp_ops
from hopperrender_tpu.ops import warp_strip


def build(y, uv, apron, is_hdr):
    return warp_strip.build_warp_context(
        jnp.asarray(y), jnp.asarray(uv), apron=apron, is_hdr=is_hdr)


@pytest.mark.parametrize("is_hdr", [False, True])
@pytest.mark.parametrize("mode", [0, 1, 2])
@pytest.mark.parametrize("rs,h,w", [(1, 32, 64), (2, 64, 96), (3, 64, 128)])
@pytest.mark.parametrize("max_mag", [6, 60])
def test_warp_strip_matches_reference(rng, is_hdr, mode, rs, h, w, max_mag):
    low_h, low_w = h >> rs, w >> rs
    s12y, s12uv = make_frame(rng, h, w, is_hdr)
    s21y, s21uv = make_frame(rng, h, w, is_hdr)
    fl = make_flow(rng, low_h, low_w, max_mag=max_mag)
    t = 0.375
    black, white = (2.0 * 256, 250.0 * 256) if is_hdr else (2.0, 250.0)
    apron = 80
    c12 = build(s12y, s12uv, apron, is_hdr)
    c21 = build(s21y, s21uv, apron, is_hdr)
    gy, guv = warp_strip.warp_frame_strip(
        c12, c21, jnp.asarray(fl), t, black, white,
        res_scalar=rs, mode=mode, is_hdr=is_hdr, dim_y=h, dim_x=w, apron=apron)
    wy, wuv = warp_ops.warp_frame(
        jnp.asarray(s12y), jnp.asarray(s12uv), jnp.asarray(s21y), jnp.asarray(s21uv),
        jnp.asarray(fl), t, black, white, res_scalar=rs, mode=mode, is_hdr=is_hdr)
    if mode in (0, 1):
        np.testing.assert_array_equal(np.asarray(gy), np.asarray(wy))
        np.testing.assert_array_equal(np.asarray(guv), np.asarray(wuv))
    else:
        assert np.abs(np.asarray(gy).astype(np.int64)
                      - np.asarray(wy).astype(np.int64)).max() <= 1
        assert np.abs(np.asarray(guv).astype(np.int64)
                      - np.asarray(wuv).astype(np.int64)).max() <= 1


@pytest.mark.parametrize("t", [0.0, 0.2, 0.8, 1.0])
def test_warp_strip_blend_sweep(rng, t):
    h, w, rs = 32, 64, 1
    s12y, s12uv = make_frame(rng, h, w)
    s21y, s21uv = make_frame(rng, h, w)
    fl = make_flow(rng, 16, 32, max_mag=10)
    apron = 48
    c12 = build(s12y, s12uv, apron, False)
    c21 = build(s21y, s21uv, apron, False)
    gy, guv = warp_strip.warp_frame_strip(
        c12, c21, jnp.asarray(fl), t, 0.0, 255.0,
        res_scalar=rs, mode=2, is_hdr=False, dim_y=h, dim_x=w, apron=apron)
    wy, wuv = warp_ops.warp_frame(
        jnp.asarray(s12y), jnp.asarray(s12uv), jnp.asarray(s21y), jnp.asarray(s21uv),
        jnp.asarray(fl), t, 0.0, 255.0, res_scalar=rs, mode=2, is_hdr=False)
    assert np.abs(np.asarray(gy).astype(np.int64)
                  - np.asarray(wy).astype(np.int64)).max() <= 1
    assert np.abs(np.asarray(guv).astype(np.int64)
                  - np.asarray(wuv).astype(np.int64)).max() <= 1


def test_warp_strip_extreme_offsets(rng):
    """Displacements beyond the frame: mirror + clamp regions of the padded planes."""
    h, w, rs = 32, 64, 1
    s12y, s12uv = make_frame(rng, h, w)
    s21y, s21uv = make_frame(rng, h, w)
    fl = (make_flow(rng, 16, 32, max_mag=1) * 0
          + np.array([70, -90], np.int16)[:, None, None]).astype(np.int16)
    apron = 96
    c12 = build(s12y, s12uv, apron, False)
    c21 = build(s21y, s21uv, apron, False)
    for mode in (0, 1):
        gy, guv = warp_strip.warp_frame_strip(
            c12, c21, jnp.asarray(fl), 0.9, 0.0, 255.0,
            res_scalar=rs, mode=mode, is_hdr=False, dim_y=h, dim_x=w, apron=apron)
        wy, wuv = warp_ops.warp_frame(
            jnp.asarray(s12y), jnp.asarray(s12uv), jnp.asarray(s21y),
            jnp.asarray(s21uv), jnp.asarray(fl), 0.9, 0.0, 255.0,
            res_scalar=rs, mode=mode, is_hdr=False)
        np.testing.assert_array_equal(np.asarray(gy), np.asarray(wy))
        np.testing.assert_array_equal(np.asarray(guv), np.asarray(wuv))

"""Pallas row-band warp kernel vs the strip-mined twin: bit-exact equality in
interpret mode across modes, bit depths, res scalars, and displacement extremes
(ref behavior: warpFrameKernelSDR.h:116-184)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hopperrender_tpu.ops import warp_band, warp_strip

from conftest import make_frame


def build_inputs(rng, h, w, rs, is_hdr, apron, max_mag):
    low_h, low_w = h >> rs, w >> rs
    y1, uv1 = make_frame(rng, h, w, is_hdr)
    y2, uv2 = make_frame(rng, h, w, is_hdr)
    flow = rng.integers(-max_mag, max_mag + 1, (2, low_h, low_w)).astype(np.int16)
    c1 = warp_strip.build_warp_context(jnp.asarray(y1), jnp.asarray(uv1),
                                       apron=apron, is_hdr=is_hdr)
    c2 = warp_strip.build_warp_context(jnp.asarray(y2), jnp.asarray(uv2),
                                       apron=apron, is_hdr=is_hdr)
    return c1, c2, jnp.asarray(flow)


def run_both(c1, c2, flow, t, black, white, *, rs, mode, is_hdr, h, w, apron):
    ys, uvs = warp_strip.warp_frame_strip(
        c1, c2, flow, jnp.float32(t), jnp.float32(black), jnp.float32(white),
        res_scalar=rs, mode=mode, is_hdr=is_hdr, dim_y=h, dim_x=w, apron=apron)
    yb, uvb = warp_band.warp_frame_band(
        c1, c2, flow, jnp.float32(t), jnp.float32(black), jnp.float32(white),
        res_scalar=rs, mode=mode, is_hdr=is_hdr, dim_y=h, dim_x=w, apron=apron,
        interpret=True)
    return (np.asarray(ys), np.asarray(uvs)), (np.asarray(yb), np.asarray(uvb))


@pytest.mark.parametrize("is_hdr", [False, True])
@pytest.mark.parametrize("rs", [2, 3])
@pytest.mark.parametrize("mode", [0, 1, 2])
def test_band_matches_strip(rng, is_hdr, rs, mode):
    h, w, apron = 64, 128, 32
    c1, c2, flow = build_inputs(rng, h, w, rs, is_hdr, apron, max_mag=25)
    black = 16.0 * (256 if is_hdr else 1)
    white = 235.0 * (256 if is_hdr else 1)
    (ys, uvs), (yb, uvb) = run_both(c1, c2, flow, 0.375, black, white,
                                    rs=rs, mode=mode, is_hdr=is_hdr,
                                    h=h, w=w, apron=apron)
    np.testing.assert_array_equal(yb, ys)
    np.testing.assert_array_equal(uvb, uvs)


@pytest.mark.parametrize("t", [0.0, 0.5, 0.96875])
def test_band_blending_scalars(rng, t):
    h, w, apron = 64, 128, 32
    c1, c2, flow = build_inputs(rng, h, w, 2, False, apron, max_mag=10)
    (ys, uvs), (yb, uvb) = run_both(c1, c2, flow, t, 0.0, 255.0,
                                    rs=2, mode=2, is_hdr=False,
                                    h=h, w=w, apron=apron)
    np.testing.assert_array_equal(yb, ys)
    np.testing.assert_array_equal(uvb, uvs)


def test_band_extreme_displacements(rng):
    """Displacements at the apron bound exercise the clamped lane window and
    both sub-element parities."""
    h, w, apron = 64, 128, 48
    rs = 2
    low_h, low_w = h >> rs, w >> rs
    y1, uv1 = make_frame(rng, h, w, False)
    y2, uv2 = make_frame(rng, h, w, False)
    # All-corners flow: +/- apron-1 plus odd values for parity coverage.
    vals = np.array([-(apron - 1), -(apron - 2), -1, 0, 1, apron - 2, apron - 1])
    flow = rng.choice(vals, (2, low_h, low_w)).astype(np.int16)
    c1 = warp_strip.build_warp_context(jnp.asarray(y1), jnp.asarray(uv1),
                                       apron=apron, is_hdr=False)
    c2 = warp_strip.build_warp_context(jnp.asarray(y2), jnp.asarray(uv2),
                                       apron=apron, is_hdr=False)
    (ys, uvs), (yb, uvb) = run_both(c1, c2, jnp.asarray(flow), 1.0, 0.0, 255.0,
                                    rs=rs, mode=2, is_hdr=False,
                                    h=h, w=w, apron=apron)
    np.testing.assert_array_equal(yb, ys)
    np.testing.assert_array_equal(uvb, uvs)


def test_band_geometry_predicate():
    ok = warp_band.band_geometry_ok
    # The production configs must be band-compatible.
    assert ok(res_scalar=3, is_hdr=True, dim_y=2160, dim_x=3840, apron=576)
    assert ok(res_scalar=3, is_hdr=False, dim_y=2160, dim_x=3840, apron=576)
    assert ok(res_scalar=2, is_hdr=False, dim_y=1080, dim_x=1920, apron=576)
    # res_scalar < 2 keeps the strip path.
    assert not ok(res_scalar=1, is_hdr=False, dim_y=480, dim_x=854, apron=576)

"""JAX ops vs the golden NumPy model — exact equality (except HSV mode, 1-value tol
for transcendental last-ulp differences)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_flow, make_frame
from hopperrender_tpu.ops import flow as jflow
from hopperrender_tpu.ops import golden
from hopperrender_tpu.ops import warp as jwarp


def _compact_vs_golden(sums_jax, sums_gold, radius):
    """JAX output has MAX_R layers (masked above radius); golden has exactly radius."""
    np.testing.assert_array_equal(np.asarray(sums_jax)[:radius], sums_gold)
    assert (np.asarray(sums_jax)[radius:] == 0xFFFFFFFF).all()


@pytest.mark.parametrize("is_hdr", [False, True])
@pytest.mark.parametrize("radius", [5, 11, 16])
@pytest.mark.parametrize("step,iteration,window", [(0, 0, 8), (1, 2, 4), (0, 5, 2), (1, 4, 4)])
def test_delta_window_sums(rng, is_hdr, radius, step, iteration, window):
    h, w = 24, 32
    rs = 1
    low_h, low_w = 12, 16
    f1y, f1uv = make_frame(rng, h, w, is_hdr)
    f2y, f2uv = make_frame(rng, h, w, is_hdr)
    offsets = make_flow(rng, low_h, low_w, max_mag=7)
    got = jflow.delta_window_sums(
        jnp.asarray(f1y), jnp.asarray(f1uv), jnp.asarray(f2y), jnp.asarray(f2uv),
        jnp.asarray(offsets), jnp.int32(radius), jnp.int32(8), jnp.int32(6),
        window_size=window, res_scalar=rs, iteration=iteration, step=step, is_hdr=is_hdr)
    want = golden.calc_delta_sums(f1y, f1uv, f2y, f2uv, offsets, window, radius, rs,
                                  iteration, step, 8, 6, is_hdr)
    _compact_vs_golden(got, want, radius)


def test_delta_window_sums_odd_dims(rng):
    h, w = 14, 18
    low_h, low_w = 7, 9
    f1y, f1uv = make_frame(rng, h, w)
    f2y, f2uv = make_frame(rng, h, w)
    offsets = make_flow(rng, low_h, low_w, max_mag=20)
    got = jflow.delta_window_sums(
        jnp.asarray(f1y), jnp.asarray(f1uv), jnp.asarray(f2y), jnp.asarray(f2uv),
        jnp.asarray(offsets), jnp.int32(16), jnp.int32(3), jnp.int32(2),
        window_size=4, res_scalar=1, iteration=4, step=1, is_hdr=False)
    want = golden.calc_delta_sums(f1y, f1uv, f2y, f2uv, offsets, 4, 16, 1, 4, 1, 3, 2, False)
    _compact_vs_golden(got, want, 16)


@pytest.mark.parametrize("step", [0, 1])
def test_adjust_offsets(rng, step):
    low_h, low_w = 7, 9
    window, radius = 4, 11
    offsets = make_flow(rng, low_h, low_w, max_mag=100)
    winners = rng.integers(0, radius, (2, 3)).astype(np.uint8)
    got = jflow.adjust_offsets(jnp.asarray(offsets), jnp.asarray(winners, jnp.int32),
                               jnp.int32(radius), window_size=window, step=step)
    want = golden.adjust_offset_array(offsets, winners, window, radius, step)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_lowest_layer_ties(rng):
    sums = rng.integers(0, 50, (16, 4, 4)).astype(np.uint32)
    got = jflow.lowest_layer(jnp.asarray(sums))
    want = golden.determine_lowest_layer(sums, 16)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_blur_flow(rng):
    offsets = make_flow(rng, 13, 17, max_mag=500)
    got = jflow.blur_flow(jnp.asarray(offsets))
    want = golden.blur_flow(offsets)
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("is_hdr", [False, True])
@pytest.mark.parametrize("radius", [5, 16])
def test_pyramid_flow_full(rng, is_hdr, radius):
    h, w = 32, 48
    rs = 1
    low_h, low_w = 16, 24
    f1y, f1uv = make_frame(rng, h, w, is_hdr)
    f2y, f2uv = make_frame(rng, h, w, is_hdr)
    offsets, blurred, raw = jflow.pyramid_flow(
        jnp.asarray(f1y), jnp.asarray(f1uv), jnp.asarray(f2y), jnp.asarray(f2uv),
        jnp.int32(radius), jnp.int32(8), jnp.int32(6),
        low_h=low_h, low_w=low_w, res_scalar=rs, is_hdr=is_hdr)
    params = golden.FlowParams(search_radius=radius, res_scalar=rs, delta_scalar=8,
                               neighbor_bias_scalar=6, is_hdr=is_hdr)
    g_off, g_blur, g_delta = golden.calculate_optical_flow(
        f1y, f1uv, f2y, f2uv, low_h, low_w, params)
    np.testing.assert_array_equal(np.asarray(offsets), g_off)
    np.testing.assert_array_equal(np.asarray(blurred), g_blur)
    norm = low_h * low_w * (6 if is_hdr else 10)
    assert int(raw) // norm == g_delta


@pytest.mark.parametrize("is_hdr", [False, True])
@pytest.mark.parametrize("mode", [0, 1, 2, 4, 5, 6])
def test_warp_frame_modes(rng, is_hdr, mode):
    h, w = 16, 24
    rs = 1
    s12y, s12uv = make_frame(rng, h, w, is_hdr)
    s21y, s21uv = make_frame(rng, h, w, is_hdr)
    fl = make_flow(rng, 8, 12, max_mag=6)
    t = 0.375
    black, white = (2.0 * 256, 250.0 * 256) if is_hdr else (2.0, 250.0)
    gy, guv = jwarp.warp_frame(
        jnp.asarray(s12y), jnp.asarray(s12uv), jnp.asarray(s21y), jnp.asarray(s21uv),
        jnp.asarray(fl), t, black, white, res_scalar=rs, mode=mode, is_hdr=is_hdr)
    wy, wuv = golden.warp_frame(s12y, s12uv, s21y, s21uv, fl, t, rs, mode, black, white, is_hdr)
    if mode in (0, 1, 4):
        # Pure integer paths: exact.
        np.testing.assert_array_equal(np.asarray(gy), wy)
        np.testing.assert_array_equal(np.asarray(guv), wuv)
    else:
        # Blend + levels involve float32 mul/div; XLA's op fusion (FMA, div*mul
        # contraction) can shift the truncation boundary by one code value. The
        # baseline contract is "within 1 LSB of the OpenCL reference" (BASELINE.md),
        # and OpenCL itself allows 2.5 ulp on float division.
        assert np.abs(np.asarray(gy).astype(np.int64) - wy.astype(np.int64)).max() <= 1
        assert np.abs(np.asarray(guv).astype(np.int64) - wuv.astype(np.int64)).max() <= 1


@pytest.mark.parametrize("is_hdr", [False, True])
def test_warp_frame_hsv_mode_close(rng, is_hdr):
    """Mode 3 uses atan2/fmod; allow tiny deviation from transcendental ulp noise."""
    h, w = 16, 24
    s12y, s12uv = make_frame(rng, h, w, is_hdr)
    s21y, s21uv = make_frame(rng, h, w, is_hdr)
    fl = make_flow(rng, 8, 12, max_mag=6)
    black, white = (0.0, 65280.0) if is_hdr else (0.0, 255.0)
    gy, guv = jwarp.warp_frame(
        jnp.asarray(s12y), jnp.asarray(s12uv), jnp.asarray(s21y), jnp.asarray(s21uv),
        jnp.asarray(fl), 0.5, black, white, res_scalar=1, mode=3, is_hdr=is_hdr)
    wy, wuv = golden.warp_frame(s12y, s12uv, s21y, s21uv, fl, 0.5, 1, 3, black, white, is_hdr)
    tol = 600 if is_hdr else 3  # HDR shifts left by 7/8 bits
    assert np.abs(np.asarray(gy).astype(np.int64) - wy.astype(np.int64)).max() <= tol
    assert np.abs(np.asarray(guv).astype(np.int64) - wuv.astype(np.int64)).max() <= tol


@pytest.mark.parametrize("is_hdr", [False, True])
def test_copy_frame(rng, is_hdr):
    h, w = 10, 12
    y, uv = make_frame(rng, h, w, is_hdr)
    black, white = (5.0 * 256, 240.0 * 256) if is_hdr else (5.0, 240.0)
    gy, guv = jwarp.copy_frame(jnp.asarray(y), jnp.asarray(uv), black, white, is_hdr=is_hdr)
    wy, wuv = golden.copy_frame(y, uv, black, white, is_hdr)
    # Levels are float32 math; see test_warp_frame_modes for the 1-LSB rationale.
    assert np.abs(np.asarray(gy).astype(np.int64) - wy.astype(np.int64)).max() <= 1
    assert np.abs(np.asarray(guv).astype(np.int64) - wuv.astype(np.int64)).max() <= 1


def test_pyramid_flow_no_rejit_on_radius_change(rng):
    """The auto quality scaler changes radius per frame; the trace must be reused."""
    h, w = 16, 16
    f1y, f1uv = make_frame(rng, h, w)
    f2y, f2uv = make_frame(rng, h, w)
    args = (jnp.asarray(f1y), jnp.asarray(f1uv), jnp.asarray(f2y), jnp.asarray(f2uv))
    kw = dict(low_h=8, low_w=8, res_scalar=1, is_hdr=False)
    jflow.pyramid_flow(*args, jnp.int32(5), jnp.int32(8), jnp.int32(6), **kw)
    before = jflow.pyramid_flow._cache_size()
    jflow.pyramid_flow(*args, jnp.int32(6), jnp.int32(8), jnp.int32(6), **kw)
    jflow.pyramid_flow(*args, jnp.int32(16), jnp.int32(8), jnp.int32(6), **kw)
    assert jflow.pyramid_flow._cache_size() == before


@pytest.mark.parametrize("radius", [5, 8])
def test_pyramid_flow_bucketed_layers(rng, radius):
    """num_layers=8 bucket must be bit-identical to the full 16-layer volume for
    radius <= 8 (masked layers can never win the argmin)."""
    h, w = 32, 48
    f1y, f1uv = make_frame(rng, h, w)
    f2y, f2uv = make_frame(rng, h, w)
    args = (jnp.asarray(f1y), jnp.asarray(f1uv), jnp.asarray(f2y), jnp.asarray(f2uv),
            jnp.int32(radius), jnp.int32(8), jnp.int32(6))
    kw = dict(low_h=16, low_w=24, res_scalar=1, is_hdr=False)
    off8, blur8, raw8 = jflow.pyramid_flow(*args, num_layers=8, **kw)
    off16, blur16, raw16 = jflow.pyramid_flow(*args, num_layers=16, **kw)
    np.testing.assert_array_equal(np.asarray(off8), np.asarray(off16))
    np.testing.assert_array_equal(np.asarray(blur8), np.asarray(blur16))
    assert int(raw8) == int(raw16)

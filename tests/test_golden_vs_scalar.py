"""Validate the vectorized golden model against the literal scalar translation of the
reference OpenCL kernels (tests/reference_scalar.py). Exact equality required."""

import numpy as np
import pytest

import reference_scalar as ref
from conftest import make_flow, make_frame
from hopperrender_tpu.ops import golden


@pytest.mark.parametrize("is_hdr", [False, True])
@pytest.mark.parametrize("step", [0, 1])
@pytest.mark.parametrize("window_size,iteration", [(4, 0), (2, 1), (4, 4), (1, 5)])
def test_calc_delta_sums(rng, is_hdr, step, window_size, iteration):
    h, w = 16, 20
    rs = 1
    low_h, low_w = -(-h // 2), -(-w // 2)  # 8 x 10
    f1y, f1uv = make_frame(rng, h, w, is_hdr)
    f2y, f2uv = make_frame(rng, h, w, is_hdr)
    offsets = make_flow(rng, low_h, low_w, max_mag=5)
    radius = 5
    got = golden.calc_delta_sums(f1y, f1uv, f2y, f2uv, offsets, window_size, radius,
                                 rs, iteration, step, 8, 6, is_hdr)
    want = ref.calc_delta_sums_scalar(f1y, f1uv, f2y, f2uv, offsets, window_size, radius,
                                      rs, iteration, step, 8, 6, is_hdr)
    np.testing.assert_array_equal(got, want)


def test_calc_delta_sums_nonpow2_dims_and_radius16(rng):
    # Odd low dims + max radius + res_scalar 0 (scaled coords can exceed frame).
    h, w = 14, 18
    low_h, low_w = 7, 9
    f1y, f1uv = make_frame(rng, h, w)
    f2y, f2uv = make_frame(rng, h, w)
    offsets = make_flow(rng, low_h, low_w, max_mag=20)
    got = golden.calc_delta_sums(f1y, f1uv, f2y, f2uv, offsets, 4, 16, 1, 4, 1, 3, 2, False)
    want = ref.calc_delta_sums_scalar(f1y, f1uv, f2y, f2uv, offsets, 4, 16, 1, 4, 1, 3, 2, False)
    np.testing.assert_array_equal(got, want)


def test_determine_lowest_layer_first_min_wins(rng):
    sums = rng.integers(0, 100, (7, 3, 4)).astype(np.uint32)
    sums[2] = sums[5]  # create ties
    got = golden.determine_lowest_layer(sums, 7)
    want = ref.determine_lowest_layer_scalar(sums, 7)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("step", [0, 1])
def test_adjust_offset_array(rng, step):
    low_h, low_w = 7, 9
    window = 4
    radius = 11
    offsets = make_flow(rng, low_h, low_w, max_mag=100)
    lowest = rng.integers(0, radius, (-(-low_h // window), -(-low_w // window))).astype(np.uint8)
    got = golden.adjust_offset_array(offsets, lowest, window, radius, step)
    want = ref.adjust_offset_array_scalar(offsets, lowest, window, radius, step)
    np.testing.assert_array_equal(got, want)


def test_adjust_offset_array_int16_wrap():
    offsets = np.full((2, 2, 2), 32760, dtype=np.int16)
    lowest = np.array([[15]], dtype=np.uint8)  # rel = 15%16 - 8 = 7 -> +49
    got = golden.adjust_offset_array(offsets, lowest, 2, 16, 0)
    want = ref.adjust_offset_array_scalar(offsets, lowest, 2, 16, 0)
    np.testing.assert_array_equal(got, want)
    assert got[0, 0, 0] == np.array(32760 + 49, dtype=np.int64).astype(np.int16)  # wrapped


def test_blur_flow(rng):
    offsets = make_flow(rng, 11, 13, max_mag=300)
    got = golden.blur_flow(offsets)
    want = ref.blur_flow_scalar(offsets)
    np.testing.assert_array_equal(got, want)


def test_blur_flow_truncating_division():
    # Negative sums must divide toward zero, not floor.
    offsets = np.full((2, 9, 9), -3, dtype=np.int16)
    got = golden.blur_flow(offsets)
    # sum = -3 * 64 = -192; -192/64 = -3 exact
    assert (got == -3).all()
    offsets[:, :, :] = -1
    got = golden.blur_flow(offsets)
    # sum = -64, /64 = -1
    assert (got == -1).all()


@pytest.mark.parametrize("is_hdr", [False, True])
@pytest.mark.parametrize("mode", [0, 1, 2, 3, 4, 5, 6])
def test_warp_frame_modes(rng, is_hdr, mode):
    h, w = 16, 24
    rs = 1
    low_h, low_w = 8, 12
    s12y, s12uv = make_frame(rng, h, w, is_hdr)
    s21y, s21uv = make_frame(rng, h, w, is_hdr)
    flow = make_flow(rng, low_h, low_w, max_mag=6)
    t = 0.375
    black, white = (2.0 * 256, 250.0 * 256) if is_hdr else (2.0, 250.0)
    for cz in (0, 1):
        got = golden.warp_frame_plane(s12y, s12uv, s21y, s21uv, flow, t, 1.0 - t, rs,
                                      mode, black, white, cz, is_hdr)
        want = ref.warp_frame_plane_scalar(s12y, s12uv, s21y, s21uv, flow, t, 1.0 - t, rs,
                                           mode, black, white, cz, is_hdr)
        np.testing.assert_array_equal(got, want, err_msg=f"mode={mode} cz={cz} hdr={is_hdr}")


@pytest.mark.parametrize("t", [0.0, 0.5, 1.0])
def test_warp_frame_blend_extremes(rng, t):
    h, w = 8, 16
    s12y, s12uv = make_frame(rng, h, w)
    s21y, s21uv = make_frame(rng, h, w)
    flow = make_flow(rng, 4, 8, max_mag=3)
    for cz in (0, 1):
        got = golden.warp_frame_plane(s12y, s12uv, s21y, s21uv, flow, t, 1.0 - t, 1,
                                      2, 0.0, 255.0, cz, False)
        want = ref.warp_frame_plane_scalar(s12y, s12uv, s21y, s21uv, flow, t, 1.0 - t, 1,
                                           2, 0.0, 255.0, cz, False)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("is_hdr", [False, True])
def test_copy_frame(rng, is_hdr):
    h, w = 10, 12
    y, uv = make_frame(rng, h, w, is_hdr)
    black, white = (5.0 * 256, 240.0 * 256) if is_hdr else (5.0, 240.0)
    got = golden.copy_frame(y, uv, black, white, is_hdr)
    want = ref.copy_frame_scalar(y, uv, black, white, is_hdr)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_full_flow_loop_runs(rng):
    """Pyramid driver sanity: zero motion on identical frames must give zero flow."""
    h, w = 32, 32
    y, uv = make_frame(rng, h, w)
    params = golden.FlowParams(search_radius=5, res_scalar=1)
    offsets, blurred, delta = golden.calculate_optical_flow(y, uv, y, uv, 16, 16, params)
    # Identical frames: zero-offset candidate has delta 0 + bias 0, so flow is 0.
    # (total_frame_delta reads layer r/2-1 = the -1-offset candidate, ref:
    # opticalFlowCalcSDR.cpp:92, so it is NOT zero even for identical frames.)
    assert delta >= 0
    np.testing.assert_array_equal(offsets, 0)
    np.testing.assert_array_equal(blurred, 0)


def test_flow_recovers_global_shift(rng):
    """Sign convention: delta compares frame1[pos + offset] against frame2[pos]
    (ref: calcDeltaSumsKernelSDR.h:98-100), so frame1 content at source x+4 yields
    offset -4."""
    h, w = 64, 64
    y = (rng.integers(0, 256, (h, w + 16), dtype=np.uint8))
    uv = (rng.integers(0, 256, (h // 2, w + 16), dtype=np.uint8))
    f2y, f2uv = y[:, :w].copy(), uv[:, :w].copy()
    f1y, f1uv = y[:, 4:w + 4].copy(), uv[:, 4:w + 4].copy()
    params = golden.FlowParams(search_radius=9, res_scalar=0, delta_scalar=8,
                               neighbor_bias_scalar=0)
    offsets, _, _ = golden.calculate_optical_flow(f1y, f1uv, f2y, f2uv, h, w, params)
    interior = offsets[0, 16:-16, 16:-16]
    # Most of the interior should find the shift.
    assert np.median(interior) == -4
    assert np.median(offsets[1]) == 0

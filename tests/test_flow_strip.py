"""Strip-mined cost volume vs the reference formulation — exact equality."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_flow, make_frame
from hopperrender_tpu.ops import flow as flow_ops
from hopperrender_tpu.ops import flow_strip, golden


def ctx_for(y, uv, apron, is_hdr):
    return flow_strip.build_frame_context(
        jnp.asarray(y), jnp.asarray(uv), apron=apron, is_hdr=is_hdr)


@pytest.mark.parametrize("is_hdr", [False, True])
@pytest.mark.parametrize("step", [0, 1])
@pytest.mark.parametrize("window,iteration", [(8, 0), (4, 2), (2, 5), (4, 4)])
@pytest.mark.parametrize("radius,num_layers", [(5, 8), (8, 8), (9, 16), (16, 16)])
def test_strip_matches_reference_kernel(rng, is_hdr, step, window, iteration,
                                        radius, num_layers):
    h, w = 32, 48
    rs = 1
    low_h, low_w = 16, 24
    f1y, f1uv = make_frame(rng, h, w, is_hdr)
    f2y, f2uv = make_frame(rng, h, w, is_hdr)
    # Offsets must be WINDOW-CONSTANT (the pyramid invariant the strip kernel
    # exploits): build from a window-grid.
    grid = make_flow(rng, -(-low_h // window), -(-low_w // window), max_mag=12)
    offsets = np.repeat(np.repeat(grid, window, 1), window, 2)[:, :low_h, :low_w]
    apron = flow_strip.apron_for(low_h, low_w)
    ctx = ctx_for(f1y, f1uv, apron, is_hdr)
    got = flow_strip.delta_window_sums_strip(
        ctx, jnp.asarray(f2y), jnp.asarray(f2uv), jnp.asarray(offsets),
        jnp.int32(radius), jnp.int32(8), jnp.int32(6),
        window_size=window, res_scalar=rs, iteration=iteration, step=step,
        is_hdr=is_hdr, num_layers=num_layers, apron=apron, dim_y=h, dim_x=w)
    want = flow_ops.delta_window_sums(
        jnp.asarray(f1y), jnp.asarray(f1uv), jnp.asarray(f2y), jnp.asarray(f2uv),
        jnp.asarray(offsets), jnp.int32(radius), jnp.int32(8), jnp.int32(6),
        window_size=window, res_scalar=rs, iteration=iteration, step=step,
        is_hdr=is_hdr, num_layers=num_layers)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("is_hdr", [False, True])
@pytest.mark.parametrize("rs,h,w,low_h,low_w", [(1, 32, 48, 16, 24),
                                                (2, 64, 96, 16, 24),
                                                (3, 64, 128, 8, 16)])
def test_strip_pyramid_matches_golden(rng, is_hdr, rs, h, w, low_h, low_w):
    f1y, f1uv = make_frame(rng, h, w, is_hdr)
    f2y, f2uv = make_frame(rng, h, w, is_hdr)
    apron = flow_strip.apron_for(low_h, low_w)
    ctx = ctx_for(f1y, f1uv, apron, is_hdr)
    offsets, blurred, raw = flow_strip.pyramid_flow_strip(
        ctx, jnp.asarray(f2y), jnp.asarray(f2uv),
        jnp.int32(9), jnp.int32(8), jnp.int32(6),
        low_h=low_h, low_w=low_w, res_scalar=rs, is_hdr=is_hdr,
        apron=apron, dim_y=h, dim_x=w)
    params = golden.FlowParams(search_radius=9, res_scalar=rs, is_hdr=is_hdr)
    g_off, g_blur, g_delta = golden.calculate_optical_flow(
        f1y, f1uv, f2y, f2uv, low_h, low_w, params)
    np.testing.assert_array_equal(np.asarray(offsets), g_off)
    np.testing.assert_array_equal(np.asarray(blurred), g_blur)
    norm = low_h * low_w * (6 if is_hdr else 10)
    assert int(raw) // norm == g_delta


def test_strip_odd_low_dims(rng):
    """Non-multiple-of-window low dims exercise the padded-window masking."""
    h, w = 30, 44
    rs = 1
    low_h, low_w = 15, 22
    f1y, f1uv = make_frame(rng, h, w)
    f2y, f2uv = make_frame(rng, h, w)
    apron = flow_strip.apron_for(low_h, low_w)
    ctx = ctx_for(f1y, f1uv, apron, False)
    offsets, blurred, raw = flow_strip.pyramid_flow_strip(
        ctx, jnp.asarray(f2y), jnp.asarray(f2uv),
        jnp.int32(16), jnp.int32(8), jnp.int32(6),
        low_h=low_h, low_w=low_w, res_scalar=rs, is_hdr=False,
        apron=apron, dim_y=h, dim_x=w)
    o2, b2, r2 = flow_ops.pyramid_flow(
        jnp.asarray(f1y), jnp.asarray(f1uv), jnp.asarray(f2y), jnp.asarray(f2uv),
        jnp.int32(16), jnp.int32(8), jnp.int32(6),
        low_h=low_h, low_w=low_w, res_scalar=rs, is_hdr=False)
    np.testing.assert_array_equal(np.asarray(offsets), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(blurred), np.asarray(b2))
    assert int(raw) == int(r2)


@pytest.mark.parametrize("radius,bucket", [(5, 5), (6, 8), (8, 8), (11, 12), (13, 16)])
def test_strip_bucket_bit_identity(rng, radius, bucket):
    """Any bucket >= radius must be bit-identical to the full 16-layer volume."""
    h, w = 32, 48
    rs, low_h, low_w = 1, 16, 24
    f1y, f1uv = make_frame(rng, h, w)
    f2y, f2uv = make_frame(rng, h, w)
    apron = flow_strip.apron_for(low_h, low_w)
    ctx = ctx_for(f1y, f1uv, apron, False)
    args = (ctx, jnp.asarray(f2y), jnp.asarray(f2uv), jnp.int32(radius),
            jnp.int32(8), jnp.int32(6))
    kw = dict(low_h=low_h, low_w=low_w, res_scalar=rs, is_hdr=False,
              apron=apron, dim_y=h, dim_x=w)
    o1, b1, r1 = flow_strip.pyramid_flow_strip(*args, num_layers=bucket, **kw)
    o2, b2, r2 = flow_strip.pyramid_flow_strip(*args, num_layers=16, **kw)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    assert int(r1) == int(r2)


@pytest.mark.parametrize("is_hdr", [False, True])
@pytest.mark.parametrize("step", [0, 1])
@pytest.mark.parametrize("window", [4, 8, 16])
@pytest.mark.parametrize("rs", [1, 2])
def test_patch_kernel_matches_reference(rng, is_hdr, step, window, rs):
    """Coarse-window patch gather vs the reference formulation — exact."""
    h, w = 32 << (rs - 1), 48 << (rs - 1)
    low_h, low_w = 16, 24
    f1y, f1uv = make_frame(rng, h, w, is_hdr)
    f2y, f2uv = make_frame(rng, h, w, is_hdr)
    grid = make_flow(rng, -(-low_h // window), -(-low_w // window), max_mag=12)
    offsets = np.repeat(np.repeat(grid, window, 1), window, 2)[:, :low_h, :low_w]
    apron = flow_strip.apron_for(low_h, low_w)
    ctx = flow_strip.build_frame_context(
        jnp.asarray(f1y), jnp.asarray(f1uv), apron=apron, is_hdr=is_hdr,
        res_scalar=rs)
    got = flow_strip.delta_window_sums_patch(
        ctx, jnp.asarray(f2y), jnp.asarray(f2uv), jnp.asarray(offsets),
        jnp.int32(9), jnp.int32(8), jnp.int32(6),
        window_size=window, res_scalar=rs, iteration=4, step=step,
        is_hdr=is_hdr, num_layers=16, apron=apron, dim_y=h, dim_x=w)
    want = flow_ops.delta_window_sums(
        jnp.asarray(f1y), jnp.asarray(f1uv), jnp.asarray(f2y), jnp.asarray(f2uv),
        jnp.asarray(offsets), jnp.int32(9), jnp.int32(8), jnp.int32(6),
        window_size=window, res_scalar=rs, iteration=4, step=step,
        is_hdr=is_hdr, num_layers=16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pyramid_with_patch_routing_matches_golden(rng):
    """Full pyramid with dec planes present (patch kernels on coarse windows)."""
    h, w = 64, 96
    rs, low_h, low_w = 2, 16, 24
    f1y, f1uv = make_frame(rng, h, w)
    f2y, f2uv = make_frame(rng, h, w)
    apron = flow_strip.apron_for(low_h, low_w)
    ctx = flow_strip.build_frame_context(
        jnp.asarray(f1y), jnp.asarray(f1uv), apron=apron, is_hdr=False,
        res_scalar=rs)
    assert "dec_y" in ctx
    offsets, blurred, raw = flow_strip.pyramid_flow_strip(
        ctx, jnp.asarray(f2y), jnp.asarray(f2uv),
        jnp.int32(9), jnp.int32(8), jnp.int32(6),
        low_h=low_h, low_w=low_w, res_scalar=rs, is_hdr=False,
        apron=apron, dim_y=h, dim_x=w)
    params = golden.FlowParams(search_radius=9, res_scalar=rs)
    g_off, g_blur, g_delta = golden.calculate_optical_flow(
        f1y, f1uv, f2y, f2uv, low_h, low_w, params)
    np.testing.assert_array_equal(np.asarray(offsets), g_off)
    np.testing.assert_array_equal(np.asarray(blurred), g_blur)
    norm = low_h * low_w * 10
    assert int(raw) // norm == g_delta


@pytest.mark.parametrize("axis", [0, 1])
def test_patch_kernel_clip_free_at_extreme_offsets(rng, axis):
    """Regression: offsets near the apron bound push overhanging windows' patch
    starts past the decimated planes; lax.gather CLIP then SHIFTS the patch,
    corrupting real pixels. With low_dims padding + the patch_fits gate the
    patch path must stay exact at the worst-case offsets."""
    h, w = 80, 144
    rs, low_h, low_w = 2, 20, 36
    window = 32                      # lw_pad 64 > low_w: overhanging window col
    bucket = 8
    apron = flow_strip.apron_for(low_h, low_w, bucket)
    f1y, f1uv = make_frame(rng, h, w)
    f2y, f2uv = make_frame(rng, h, w)
    # Window-constant offsets at the pyramid's legal extreme (apron - max_rel).
    bound = apron - flow_strip.max_rel(bucket)
    offsets = np.zeros((2, low_h, low_w), np.int16)
    offsets[axis] = bound
    offsets[1 - axis] = -bound
    ctx = flow_strip.build_frame_context(
        jnp.asarray(f1y), jnp.asarray(f1uv), apron=apron, is_hdr=False,
        res_scalar=rs, low_dims=(low_h, low_w))
    assert flow_strip.patch_fits(ctx, low_h=low_h, low_w=low_w, window=window,
                                 res_scalar=rs, apron=apron)
    got = flow_strip.delta_window_sums_patch(
        ctx, jnp.asarray(f2y), jnp.asarray(f2uv), jnp.asarray(offsets),
        jnp.int32(7), jnp.int32(8), jnp.int32(6),
        window_size=window, res_scalar=rs, iteration=0, step=0,
        is_hdr=False, num_layers=bucket, apron=apron, dim_y=h, dim_x=w)
    want = flow_ops.delta_window_sums(
        jnp.asarray(f1y), jnp.asarray(f1uv), jnp.asarray(f2y), jnp.asarray(f2uv),
        jnp.asarray(offsets), jnp.int32(7), jnp.int32(8), jnp.int32(6),
        window_size=window, res_scalar=rs, iteration=0, step=0,
        is_hdr=False, num_layers=bucket)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_patch_fits_rejects_unpadded_overhang(rng):
    """Without low_dims padding, the gate must reject the hazardous window."""
    h, w = 80, 144
    rs, low_h, low_w = 2, 20, 36
    apron = flow_strip.apron_for(low_h, low_w, 8)
    f1y, f1uv = make_frame(rng, h, w)
    ctx = flow_strip.build_frame_context(
        jnp.asarray(f1y), jnp.asarray(f1uv), apron=apron, is_hdr=False,
        res_scalar=rs)
    assert not flow_strip.patch_fits(ctx, low_h=low_h, low_w=low_w, window=32,
                                     res_scalar=rs, apron=apron)


@pytest.mark.parametrize("is_hdr", [False, True])
@pytest.mark.parametrize("step", [0, 1])
@pytest.mark.parametrize("iteration", [0, 5])
def test_mode_tier_matches_reference(rng, is_hdr, step, iteration):
    """Mode-dominant tier (dense base + deviant-window corrections) vs the
    reference kernel — exact, including neighbor-bias iterations, edge
    windows, and odd parities."""
    h, w = 80, 144
    rs, low_h, low_w = 2, 20, 36
    window = 2
    bucket = 8
    apron = flow_strip.apron_for(low_h, low_w, bucket)
    f1y, f1uv = make_frame(rng, h, w, is_hdr)
    f2y, f2uv = make_frame(rng, h, w, is_hdr)
    # Dominant offset + a scattering of deviants (incl. odd values and a
    # frame-corner window).
    offsets = np.zeros((2, low_h, low_w), np.int16)
    offsets[0] = 7
    offsets[1] = -6
    n_wy, n_wx = low_h // window, low_w // window
    dev = [(0, 0), (3, 5), (9, 17), (n_wy - 1, n_wx - 1), (4, 4)]
    vals = [(-15, 9), (8, -5), (-1, 2), (13, 13), (0, 0)]
    for (wy, wx), (vx, vy) in zip(dev, vals):
        offsets[0, wy * window:(wy + 1) * window,
                wx * window:(wx + 1) * window] = vx
        offsets[1, wy * window:(wy + 1) * window,
                wx * window:(wx + 1) * window] = vy
    ctx = flow_strip.build_frame_context(
        jnp.asarray(f1y), jnp.asarray(f1uv), apron=apron, is_hdr=is_hdr,
        res_scalar=rs, low_dims=(low_h, low_w))
    got = flow_strip.delta_window_sums_mode(
        ctx, jnp.asarray(f2y), jnp.asarray(f2uv), jnp.asarray(offsets),
        jnp.int32(7), jnp.int32(8), jnp.int32(6),
        window_size=window, res_scalar=rs, iteration=iteration, step=step,
        is_hdr=is_hdr, num_layers=bucket, apron=apron, dim_y=h, dim_x=w)
    want = flow_ops.delta_window_sums(
        jnp.asarray(f1y), jnp.asarray(f1uv), jnp.asarray(f2y),
        jnp.asarray(f2uv), jnp.asarray(offsets), jnp.int32(7), jnp.int32(8),
        jnp.int32(6), window_size=window, res_scalar=rs, iteration=iteration,
        step=step, is_hdr=is_hdr, num_layers=bucket)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mode_tier_wider_windows(rng):
    """Mode tier at a coarser window with overhanging grid (lw_pad > low_w)."""
    h, w = 80, 144
    rs, low_h, low_w = 2, 20, 36
    window = 8                       # n_wx = 5 -> lw_pad 40 > 36
    apron = flow_strip.apron_for(low_h, low_w, 8)
    f1y, f1uv = make_frame(rng, h, w)
    f2y, f2uv = make_frame(rng, h, w)
    offsets = np.full((2, low_h, low_w), 3, np.int16)
    # Deviant window at the overhanging right edge (whole window: offsets are
    # window-constant by pyramid invariant).
    offsets[:, :window, 4 * window:] = -9
    ctx = flow_strip.build_frame_context(
        jnp.asarray(f1y), jnp.asarray(f1uv), apron=apron, is_hdr=False,
        res_scalar=rs, low_dims=(low_h, low_w))
    for step in (0, 1):
        got = flow_strip.delta_window_sums_mode(
            ctx, jnp.asarray(f2y), jnp.asarray(f2uv), jnp.asarray(offsets),
            jnp.int32(8), jnp.int32(8), jnp.int32(6),
            window_size=window, res_scalar=rs, iteration=4, step=step,
            is_hdr=False, num_layers=8, apron=apron, dim_y=h, dim_x=w)
        want = flow_ops.delta_window_sums(
            jnp.asarray(f1y), jnp.asarray(f1uv), jnp.asarray(f2y),
            jnp.asarray(f2uv), jnp.asarray(offsets), jnp.int32(8),
            jnp.int32(8), jnp.int32(6), window_size=window, res_scalar=rs,
            iteration=4, step=step, is_hdr=False, num_layers=8)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

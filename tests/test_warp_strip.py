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


# --- Visualization modes on the fast formulations (round 4) -----------------
# Mode 3 rides the strip twin (blended samples + structured flow upsample);
# mode 4 is pure structured math; modes 5/6 compose from the fast mode-2
# output (ops/warp_viz.py). All are bit-exact twins of ops/warp.py.

@pytest.mark.parametrize("is_hdr", [False, True])
@pytest.mark.parametrize("h,w,rs", [(64, 128, 2), (32, 64, 1), (64, 64, 3),
                                    (32, 70, 1)])  # w = 2 mod 4: odd half
def test_viz_modes_match_reference(rng, is_hdr, h, w, rs):
    import jax.numpy as jnp
    from hopperrender_tpu.ops import warp as warp_ops
    from hopperrender_tpu.ops import warp_viz

    low_h, low_w = h >> rs, w >> rs
    f1 = make_frame(rng, h, w, is_hdr)
    f2 = make_frame(rng, h, w, is_hdr)
    fl = jnp.asarray(make_flow(rng, low_h, low_w, max_mag=9))
    apron = 32
    c1 = warp_strip.build_warp_context(jnp.asarray(f1[0]), jnp.asarray(f1[1]),
                                       apron=apron, is_hdr=is_hdr)
    c2 = warp_strip.build_warp_context(jnp.asarray(f2[0]), jnp.asarray(f2[1]),
                                       apron=apron, is_hdr=is_hdr)
    t = jnp.float32(0.375)
    scale = 256 if is_hdr else 1
    black, white = jnp.float32(16 * scale), jnp.float32(235 * scale)
    kw = dict(res_scalar=rs, is_hdr=is_hdr)

    w2y, w2uv = warp_strip.warp_frame_strip(
        c1, c2, fl, t, black, white, mode=2, dim_y=h, dim_x=w, apron=apron, **kw)

    def ref(mode):
        return warp_ops.warp_frame(
            jnp.asarray(f1[0]), jnp.asarray(f1[1]), jnp.asarray(f2[0]),
            jnp.asarray(f2[1]), fl, t, black, white, mode=mode, **kw)

    # mode 3: HSV flow on the strip twin
    gy, guv = warp_strip.warp_frame_strip(
        c1, c2, fl, t, black, white, mode=3, dim_y=h, dim_x=w, apron=apron, **kw)
    ry, ruv = ref(3)
    np.testing.assert_array_equal(np.asarray(gy), np.asarray(ry))
    np.testing.assert_array_equal(np.asarray(guv), np.asarray(ruv))

    # mode 4: pure structured grey flow
    gy, guv = warp_strip.grey_flow_frame(fl, dim_y=h, dim_x=w, **kw)
    ry, ruv = ref(4)
    np.testing.assert_array_equal(np.asarray(gy), np.asarray(ry))
    np.testing.assert_array_equal(np.asarray(guv), np.asarray(ruv))

    # mode 5: source | fast-mode-2 concat
    gy, guv = warp_viz.side_by_side_1(jnp.asarray(f1[0]), jnp.asarray(f1[1]),
                                      w2y, w2uv, dim_x=w)
    ry, ruv = ref(5)
    np.testing.assert_array_equal(np.asarray(gy), np.asarray(ry))
    np.testing.assert_array_equal(np.asarray(guv), np.asarray(ruv))

    # mode 6: structured Y + UV U-outputs over fast mode-2; V-only UV gather
    gy, guv = warp_viz.side_by_side_2(
        jnp.asarray(f1[0]), jnp.asarray(f1[1]), jnp.asarray(f2[1]),
        w2y, w2uv, fl, t, white, dim_y=h, dim_x=w, **kw)
    ry, ruv = ref(6)
    np.testing.assert_array_equal(np.asarray(gy), np.asarray(ry))
    np.testing.assert_array_equal(np.asarray(guv), np.asarray(ruv))

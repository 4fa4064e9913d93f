"""Round-5: band-kernel scheduling levers (group-loop unroll, force-fast) and
probe modes. Contract: group unrolling is pure loop scheduling — INTEGER paths
(modes 0/1, all table/merge work) are bit-identical at any factor; the mode-2
float blend carries the repo's 1-LSB blend tolerance class ONLY under
interpret-mode codegen-context FMA contraction (warp_band._merge_cells_kernel
docstring), so the strict tests here pin integer modes and
exactly-representable blend scalars."""

import numpy as np
import pytest

import jax.numpy as jnp

from hopperrender_tpu.ops import warp_band, warp_strip

from conftest import make_frame


def _build(rng, h, w, rs, is_hdr, apron, mag):
    y1, uv1 = make_frame(rng, h, w, is_hdr)
    y2, uv2 = make_frame(rng, h, w, is_hdr)
    flow = rng.integers(-mag, mag + 1, (2, h >> rs, w >> rs)).astype(np.int16)
    c1 = warp_strip.build_warp_context(jnp.asarray(y1), jnp.asarray(uv1),
                                       apron=apron, is_hdr=is_hdr)
    c2 = warp_strip.build_warp_context(jnp.asarray(y2), jnp.asarray(uv2),
                                       apron=apron, is_hdr=is_hdr)
    return c1, c2, jnp.asarray(flow)


KW = dict(res_scalar=2, is_hdr=False, dim_y=64, dim_x=128, apron=32,
          interpret=True)


@pytest.mark.parametrize("mode", [0, 1])
@pytest.mark.parametrize("unroll", [3])
def test_group_unroll_integer_modes_bit_exact(rng, mode, unroll):
    """Modes 0/1 (no float blend): strictly identical at any unroll factor,
    batched — unroll 3 exercises the loop epilogue (n_groups % 3 != 0)."""
    c1, c2, flow = _build(rng, 64, 128, 2, False, 32, 10)
    ts = jnp.asarray([0.25, 0.5, 0.75], jnp.float32)
    base = warp_band.warp_frame_band(
        c1, c2, flow, ts, jnp.float32(1.0), jnp.float32(254.0),
        mode=mode, **KW)
    un = warp_band.warp_frame_band(
        c1, c2, flow, ts, jnp.float32(1.0), jnp.float32(254.0),
        mode=mode, kernel_unroll=unroll, **KW)
    np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(un[0]))
    np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(un[1]))


def test_group_unroll_mode2_exact_blend_scalars(rng):
    """Mode 2 with t=0.5 (fs12 == fs21 == 0.5: products round exactly, so no
    contraction ambiguity exists): strictly identical at any factor."""
    c1, c2, flow = _build(rng, 64, 128, 2, False, 32, 10)
    ts = jnp.asarray([0.5, 0.5], jnp.float32)
    base = warp_band.warp_frame_band(
        c1, c2, flow, ts, jnp.float32(1.0), jnp.float32(255.0), mode=2, **KW)
    un = warp_band.warp_frame_band(
        c1, c2, flow, ts, jnp.float32(1.0), jnp.float32(255.0), mode=2,
        kernel_unroll=4, **KW)
    np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(un[0]))
    np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(un[1]))


def test_force_fast_matches_on_certifying_flow(rng):
    """Uniform flow certifies every subtile -> force_fast (cond skipped) is
    bit-identical to the cond kernel."""
    c1, c2, _ = _build(rng, 64, 128, 2, False, 32, 2)
    flow = jnp.full((2, 16, 32), 2, jnp.int16)
    a = warp_band.warp_frame_band(
        c1, c2, flow, jnp.float32(0.5), jnp.float32(0.0), jnp.float32(255.0),
        mode=2, **KW)
    f = warp_band.warp_frame_band(
        c1, c2, flow, jnp.float32(0.5), jnp.float32(0.0), jnp.float32(255.0),
        mode=2, force_fast=True, **KW)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(f[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(f[1]))


def test_debug_y_only_returns_zero_uv(rng):
    c1, c2, flow = _build(rng, 64, 128, 2, False, 32, 10)
    ts = jnp.asarray([0.25, 0.75], jnp.float32)
    full = warp_band.warp_frame_band(
        c1, c2, flow, ts, jnp.float32(1.0), jnp.float32(254.0), mode=2, **KW)
    y, uv = warp_band.warp_frame_band(
        c1, c2, flow, ts, jnp.float32(1.0), jnp.float32(254.0), mode=2,
        debug_y_only=True, **KW)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(full[0]))
    assert uv.shape == (2, 32, 128) and not np.asarray(uv).any()


def test_band_plan_chain_bounds_use_plan_scatter_signal():
    """(32,32) chains cost ~2x kernel time (round-5 chip decomposition), so
    the mid-range bound (4, 12] picks them ONLY when the settled tier plan
    shows real dispersion (any non-U step); an all-uniform plan (converged
    content, spread ~0) keeps (16,16) at any bound."""
    from hopperrender_tpu.engine.flow_engine import OpticalFlowEngine

    eng = OpticalFlowEngine(544, 960, is_hdr=False)
    key = eng._plan_key()
    # converged: all-uniform plan -> (16,16) even at a mid-range bound
    eng._plans[key] = ("U",) * 16
    assert eng._band_plan(8, eng._apron) == (16, 16)
    # converged + small bound: the 1.68 ms/output (8,8) chains
    assert eng._band_plan(4, eng._apron) == (8, 8)
    assert eng._band_plan(2, eng._apron) == (8, 8)
    # scattered: V steps present -> (32,32) in the certifiable mid-range
    eng._plans[key] = ("U",) * 12 + ("V0",) * 4
    assert eng._band_plan(8, eng._apron) == (32, 32)
    # scattered small-bound keeps the (16,16) default (spread unknown)
    assert eng._band_plan(2, eng._apron) == (16, 16)
    # out of the certifiable range either way
    assert eng._band_plan(13, eng._apron) == (16, 16)
    # no settled plan: conservative (32,32) mid-range / (16,16) small
    del eng._plans[key]
    assert eng._band_plan(8, eng._apron) == (32, 32)
    assert eng._band_plan(2, eng._apron) == (16, 16)


@pytest.mark.parametrize("is_hdr,rs,mag", [
    (False, 2, None), (True, 3, None),   # None = uniform flow (tier target)
    (False, 2, 10), (True, 3, 25),       # scattered (tier must not engage)
])
def test_uniform_tier_bit_exact(rng, is_hdr, rs, mag):
    """The uniform-subtile tier (fscal bit 30: 2-roll realign instead of
    select chains) is bit-exact vs both the strip oracle and the two-tier
    kernel, on the content it targets (uniform flow) and on content it must
    leave alone (scattered)."""
    h, w, apron = 64, 128, 32
    low_h, low_w = h >> rs, w >> rs
    y1, uv1 = make_frame(rng, h, w, is_hdr)
    y2, uv2 = make_frame(rng, h, w, is_hdr)
    if mag is None:
        flow = np.full((2, low_h, low_w), 3, np.int16)
    else:
        flow = rng.integers(-mag, mag + 1, (2, low_h, low_w)).astype(np.int16)
    c1 = warp_strip.build_warp_context(jnp.asarray(y1), jnp.asarray(uv1),
                                       apron=apron, is_hdr=is_hdr)
    c2 = warp_strip.build_warp_context(jnp.asarray(y2), jnp.asarray(uv2),
                                       apron=apron, is_hdr=is_hdr)
    flow = jnp.asarray(flow)
    black = 16.0 * (256 if is_hdr else 1)
    white = 235.0 * (256 if is_hdr else 1)
    ys, uvs = warp_strip.warp_frame_strip(
        c1, c2, flow, jnp.float32(0.375), jnp.float32(black),
        jnp.float32(white), res_scalar=rs, mode=2, is_hdr=is_hdr,
        dim_y=h, dim_x=w, apron=apron)
    kw = dict(res_scalar=rs, mode=2, is_hdr=is_hdr, dim_y=h, dim_x=w,
              apron=apron, interpret=True)
    for tier in (True, False):
        yb, uvb = warp_band.warp_frame_band(
            c1, c2, flow, jnp.float32(0.375), jnp.float32(black),
            jnp.float32(white), uniform_tier=tier, **kw)
        np.testing.assert_array_equal(np.asarray(yb), np.asarray(ys))
        np.testing.assert_array_equal(np.asarray(uvb), np.asarray(uvs))


def test_uniform_certificate_engagement(rng, monkeypatch):
    """Uniform flow certifies every subtile (bit 30); scattered flow none —
    the tier's routing signal, spied at the table build."""
    h, w, rs, apron = 64, 128, 2, 32
    low_h, low_w = h >> rs, w >> rs
    y1, uv1 = make_frame(rng, h, w, False)
    c1 = warp_strip.build_warp_context(jnp.asarray(y1), jnp.asarray(uv1),
                                       apron=apron, is_hdr=False)
    caps = []
    orig = warp_band._fast_tables

    def spy(*a, **k):
        fm, fsc = orig(*a, **k)
        caps.append(np.asarray(fsc))
        return fm, fsc

    monkeypatch.setattr(warp_band, "_fast_tables", spy)
    f = warp_band.warp_frame_band.__wrapped__   # unjitted: concrete spy values
    for flow_np, expect in ((np.full((2, low_h, low_w), 3, np.int16), 1.0),
                            (rng.integers(-10, 11, (2, low_h, low_w))
                             .astype(np.int16), 0.0)):
        caps.clear()
        y, _ = f(c1, c1, jnp.asarray(flow_np), jnp.float32(0.375),
                 jnp.float32(0.0), jnp.float32(255.0),
                 res_scalar=rs, mode=2, is_hdr=False, dim_y=h, dim_x=w,
                 apron=apron, interpret=True)
        np.asarray(y)
        a = np.concatenate([c.ravel() for c in caps])
        uni_rate = (((a >> 30) & 1) == 1).mean()
        assert uni_rate == expect, (uni_rate, expect)


@pytest.mark.parametrize("is_hdr,rs,mag", [
    (False, 2, 10), (True, 3, 25), (False, 2, None)])
def test_mode3_band_overlay_matches_strip(rng, is_hdr, rs, mag):
    """Mode 3 via the band kernel's raw blend + the HSV overlay op is
    bit-exact vs the strip mode-3 oracle (the 4K strip gathers cost 867
    ms/output on chip — round-5 viz bench; the overlay prices like mode 2)."""
    from hopperrender_tpu.ops import warp_viz

    h, w, apron = 64, 128, 32
    low_h, low_w = h >> rs, w >> rs
    y1, uv1 = make_frame(rng, h, w, is_hdr)
    y2, uv2 = make_frame(rng, h, w, is_hdr)
    if mag is None:
        flow = np.full((2, low_h, low_w), 3, np.int16)
    else:
        flow = rng.integers(-mag, mag + 1, (2, low_h, low_w)).astype(np.int16)
    c1 = warp_strip.build_warp_context(jnp.asarray(y1), jnp.asarray(uv1),
                                       apron=apron, is_hdr=is_hdr)
    c2 = warp_strip.build_warp_context(jnp.asarray(y2), jnp.asarray(uv2),
                                       apron=apron, is_hdr=is_hdr)
    flow = jnp.asarray(flow)
    black = 16.0 * (256 if is_hdr else 1)
    white = 235.0 * (256 if is_hdr else 1)
    ys, uvs = warp_strip.warp_frame_strip(
        c1, c2, flow, jnp.float32(0.375), jnp.float32(black),
        jnp.float32(white), res_scalar=rs, mode=3, is_hdr=is_hdr,
        dim_y=h, dim_x=w, apron=apron)
    ry, ruv = warp_band.warp_frame_band(
        c1, c2, flow, jnp.float32(0.375), jnp.float32(black),
        jnp.float32(white), res_scalar=rs, mode=2, is_hdr=is_hdr,
        dim_y=h, dim_x=w, apron=apron, interpret=True, raw_blend=True)
    yo, uvo = warp_viz.hsv_flow_overlay(
        ry, ruv, flow, jnp.float32(black), jnp.float32(white),
        res_scalar=rs, is_hdr=is_hdr, dim_y=h, dim_x=w)
    np.testing.assert_array_equal(np.asarray(yo), np.asarray(ys))
    np.testing.assert_array_equal(np.asarray(uvo), np.asarray(uvs))


@pytest.mark.exhaustive
def test_bucket5_batch_chunking_bit_exact(rng):
    """The bucket-5 t_batch cap (TPU worker-crash mitigation) splits the
    batch into <=2-output chunks — outputs identical to the unchunked op."""
    from hopperrender_tpu.engine.flow_engine import OpticalFlowEngine
    from hopperrender_tpu.vio import nv12

    h, w = 544, 960
    eng = OpticalFlowEngine(h, w, is_hdr=False)
    eng.search_radius = 5
    eng._refresh_geometry()
    eng.use_warp_band = warp_band.band_geometry_ok(
        res_scalar=eng.res_scalar, is_hdr=False, dim_y=h, dim_x=w,
        apron=eng._apron)
    assert eng.use_warp_band and eng._bucket == 5
    eng._band_interpret = True
    y1, uv1 = nv12.synthetic_frame(rng, h, w, motion_x=0)
    y2, uv2 = nv12.synthetic_frame(rng, h, w, motion_x=2)
    w0 = eng._build_wctx(jnp.asarray(y1), jnp.asarray(uv1))
    w1 = eng._build_wctx(jnp.asarray(y2), jnp.asarray(uv2))
    flow = jnp.asarray(
        rng.integers(-4, 5, (2, eng.low_h, eng.low_w)).astype(np.int16))
    ts = jnp.asarray([0.2, 0.4, 0.6, 0.8, 1.0], jnp.float32)
    yc, uvc = eng._run_warp_batch(w0, w1, flow, ts, 2, apron=eng._apron,
                                  flow_bound=4)
    cb = eng._band_plan(4, eng._apron)
    yo, uvo = warp_band.warp_frame_band(
        w0, w1, flow, ts, jnp.float32(0.0), jnp.float32(255.0),
        res_scalar=eng.res_scalar, mode=2, is_hdr=False, dim_y=h, dim_x=w,
        apron=eng._apron, apron_eff=eng.warp_apron_used, chain_bounds=cb,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(yc), np.asarray(yo))
    np.testing.assert_array_equal(np.asarray(uvc), np.asarray(uvo))


def test_batched_debug_prep_only_shapes(rng):
    """Batched prep-only accounting (tpu_warp_decomp): full vmapped table
    build + fold runs, kernel skipped, batched output contract kept."""
    c1, c2, flow = _build(rng, 64, 128, 2, False, 32, 10)
    ts = jnp.asarray([0.2, 0.5, 0.8], jnp.float32)
    y, uv = warp_band.warp_frame_band(
        c1, c2, flow, ts, jnp.float32(1.0), jnp.float32(254.0), mode=2,
        debug_prep_only=True, **KW)
    assert y.shape == (3, 64, 128)
    assert uv.shape == (3, 32, 128)

"""Round-4: per-pair BATCHED warp — one vmapped table build + one band-kernel
launch for ALL of a source interval's outputs (warp_band t_batch / engine
warp_frames_batch / server batched dispatch). Bit-exactness contract: the
batched path must be IDENTICAL to T per-output calls on every tier combination
(apron tiers, chain bounds, bit depths, modes). (ref behavior contract: the
per-output warp loop, HopperRender.cpp:1031-1043/1191-1197 — batching is a
host-side scheduling change only.)"""

import numpy as np
import pytest

import jax.numpy as jnp

from hopperrender_tpu import config as hcfg
from hopperrender_tpu.config import ActiveState, Settings
from hopperrender_tpu.engine import flow_engine
from hopperrender_tpu.ops import warp_band, warp_strip
from hopperrender_tpu.server.frame_server import FrameServer
from hopperrender_tpu.vio import nv12

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


def _assert_batch_matches_single(c1, c2, flow, ts, **kw):
    yb, uvb = warp_band.warp_frame_band(
        c1, c2, flow, jnp.asarray(ts, jnp.float32),
        jnp.float32(1.0), jnp.float32(254.0), interpret=True, **kw)
    assert yb.shape[0] == len(ts) and uvb.shape[0] == len(ts)
    for i, t in enumerate(ts):
        y1, uv1 = warp_band.warp_frame_band(
            c1, c2, flow, jnp.float32(t),
            jnp.float32(1.0), jnp.float32(254.0), interpret=True, **kw)
        np.testing.assert_array_equal(np.asarray(yb[i]), np.asarray(y1))
        np.testing.assert_array_equal(np.asarray(uvb[i]), np.asarray(uv1))


@pytest.mark.parametrize("is_hdr,rs,mode", [(False, 2, 2), (True, 3, 2)])
def test_batched_warp_matches_single(rng, is_hdr, rs, mode):
    h, w, apron = 64, 128, 32
    c1, c2, flow = _build(rng, h, w, rs, is_hdr, apron, 10)
    _assert_batch_matches_single(
        c1, c2, flow, [0.25, 0.5, 0.75],
        res_scalar=rs, mode=mode, is_hdr=is_hdr, dim_y=h, dim_x=w,
        apron=apron)


@pytest.mark.parametrize("is_hdr,rs,mode", [
    (False, 2, 0), (False, 2, 1), (True, 3, 0), (True, 3, 1),
    (False, 3, 2), (True, 2, 2),
])
def test_batched_warp_matches_single_wide(rng, is_hdr, rs, mode):
    h, w, apron = 64, 128, 32
    c1, c2, flow = _build(rng, h, w, rs, is_hdr, apron, 10)
    _assert_batch_matches_single(
        c1, c2, flow, [0.2, 0.4, 0.6, 0.8, 1.0],
        res_scalar=rs, mode=mode, is_hdr=is_hdr, dim_y=h, dim_x=w,
        apron=apron)


@pytest.mark.parametrize("apron_eff,cb", [
    (32, (16, 16)), (32, (32, 32)), (48, (32, 32))])
def test_batched_warp_apron_tier_and_chain_bounds(rng, apron_eff, cb):
    """Batched x the host-planned tiers: the t-fold must keep the static DMA
    origin shifts (apron_eff) and the (32,32) chain-bounds certificate
    bit-exact — these combinations are exactly what the served 24->120 path
    dispatches."""
    h, w, apron = 64, 128, 48
    c1, c2, flow = _build(rng, h, w, 2, False, apron, 12)
    _assert_batch_matches_single(
        c1, c2, flow, [0.25, 0.5, 0.75],
        res_scalar=2, mode=2, is_hdr=False, dim_y=h, dim_x=w,
        apron=apron, apron_eff=apron_eff, chain_bounds=cb)


def test_batched_warp_rs1_slot16(rng):
    """Batched x the rs=1 (480p-class) 16-bit slot packing."""
    h, w, apron = 64, 256, 32
    c1, c2, flow = _build(rng, h, w, 1, False, apron, 8)
    _assert_batch_matches_single(
        c1, c2, flow, [1.0 / 3.0, 2.0 / 3.0],
        res_scalar=1, mode=2, is_hdr=False, dim_y=h, dim_x=w, apron=apron)


def test_batched_warp_t1_vector(rng):
    """A length-1 ts VECTOR still returns a leading batch axis (the engine's
    fallback threshold never sends T=1 here, but the op contract holds)."""
    h, w, apron = 64, 128, 32
    c1, c2, flow = _build(rng, h, w, 2, False, apron, 10)
    kw = dict(res_scalar=2, mode=2, is_hdr=False, dim_y=h, dim_x=w,
              apron=apron)
    yb, uvb = warp_band.warp_frame_band(
        c1, c2, flow, jnp.asarray([0.5], jnp.float32),
        jnp.float32(1.0), jnp.float32(254.0), interpret=True, **kw)
    y1, uv1 = warp_band.warp_frame_band(
        c1, c2, flow, jnp.float32(0.5),
        jnp.float32(1.0), jnp.float32(254.0), interpret=True, **kw)
    assert yb.shape == (1,) + y1.shape and uvb.shape == (1,) + uv1.shape
    np.testing.assert_array_equal(np.asarray(yb[0]), np.asarray(y1))
    np.testing.assert_array_equal(np.asarray(uvb[0]), np.asarray(uv1))


def _streamed_engine(h, w, batch):
    """Stream 6 coherent frames; warp each pair's outputs either per-output
    or via warp_frames_batch. Returns the per-pair output arrays."""
    eng = flow_engine.OpticalFlowEngine(h, w, is_hdr=False, max_calc_res=16)
    eng.search_radius = hcfg.MAX_SEARCH_RADIUS
    eng._band_interpret = True
    outs = []
    for i in range(6):
        y, uv = nv12.synthetic_frame(np.random.default_rng(3), h, w,
                                     is_hdr=False, motion_x=i * 2,
                                     coherent=True)
        eng.update_frame(y, uv)
        eng.use_warp_band = True     # CPU test hook (interpret mode)
        if eng.frame_count < 3:
            continue
        eng.calculate_optical_flow()
        ts = [0.25, 0.5, 0.75]
        if batch:
            pairs = eng.warp_frames_batch(ts, 2)
        else:
            pairs = [eng.warp_frames(t, 2) for t in ts]
        outs.append([(np.asarray(y_), np.asarray(uv_)) for y_, uv_ in pairs])
    return eng, outs


def test_engine_warp_frames_batch_streamed():
    """Served-path equality: warp_frames_batch == T warp_frames calls on the
    real engine chain (apron tier + chain bounds from the streamed sig)."""
    eng_b, outs_b = _streamed_engine(64, 128, batch=True)
    eng_s, outs_s = _streamed_engine(64, 128, batch=False)
    assert outs_b and len(outs_b) == len(outs_s)
    # The batched path must have used the same host plan as the per-output one.
    assert eng_b.warp_apron_used == eng_s.warp_apron_used
    assert eng_b.warp_chain_bounds == eng_s.warp_chain_bounds
    for pair_b, pair_s in zip(outs_b, outs_s):
        for (by, buv), (sy, suv) in zip(pair_b, pair_s):
            np.testing.assert_array_equal(by, sy)
            np.testing.assert_array_equal(buv, suv)


def test_engine_batch_falls_back_without_band():
    """Engines not routing the band kernel (e.g. gather/strip-only paths)
    transparently run per-output warps."""
    eng = flow_engine.OpticalFlowEngine(64, 128, is_hdr=False, max_calc_res=16)
    eng.search_radius = hcfg.MAX_SEARCH_RADIUS
    rng = np.random.default_rng(5)
    for i in range(3):
        y, uv = nv12.synthetic_frame(rng, 64, 128, is_hdr=False, motion_x=i)
        eng.update_frame(y, uv)
    eng.calculate_optical_flow()
    assert not eng.use_warp_band       # CPU: strip twin
    pairs = eng.warp_frames_batch([0.25, 0.75], 2)
    singles = [eng.warp_frames(t, 2) for t in (0.25, 0.75)]
    for (by, buv), (sy, suv) in zip(pairs, singles):
        np.testing.assert_array_equal(np.asarray(by), np.asarray(sy))
        np.testing.assert_array_equal(np.asarray(buv), np.asarray(suv))


def test_engine_batch_rejects_overrange_scalar():
    eng = flow_engine.OpticalFlowEngine(64, 128, is_hdr=False, max_calc_res=16)
    with pytest.raises(ValueError):
        eng.warp_frames_batch([0.5, 1.5], 2)


def test_batched_warp_gate_env(monkeypatch):
    # Default ON since the round-5 chip gate passed; "0" opts out.
    monkeypatch.delenv("HRT_BATCHED_WARP", raising=False)
    assert flow_engine.batched_warp_enabled()
    monkeypatch.setenv("HRT_BATCHED_WARP", "0")
    assert not flow_engine.batched_warp_enabled()
    monkeypatch.setenv("HRT_BATCHED_WARP", "1")
    assert flow_engine.batched_warp_enabled()


def _run_server(batched, n=6, h=64, w=128):
    # auto_quality off: the scaler reacts to wall-clock warp times, which
    # differ between the batched/per-output runs — radius must stay pinned
    # for bit-equality across runs.
    srv = FrameServer(w, h, source_fps=24.0,
                      settings=Settings(target_fps=60.0,
                                        use_display_fps=False,
                                        auto_quality=False))
    rng = np.random.default_rng(9)
    frames = [nv12.synthetic_frame(rng, h, w, is_hdr=False, motion_x=i,
                                   coherent=True) for i in range(n)]
    all_out = []
    eng_hooked = False
    for y, uv in frames:
        all_out.append(srv.push_frame(y, uv))
        if not eng_hooked and srv.engine is not None:
            # Force the band route on CPU (interpret mode) for every later
            # push; re-force after each update via the instance hook below.
            eng = srv.engine
            eng._band_interpret = True
            orig = eng.update_frame

            def upd(y_, uv_, _orig=orig, _eng=eng):
                _orig(y_, uv_)
                _eng.use_warp_band = True

            eng.update_frame = upd
            eng_hooked = True
    srv._batched_warp = batched
    # Only the pushes after hooking matter for equality; push more frames.
    for i in range(n, n + 4):
        y, uv = nv12.synthetic_frame(rng, h, w, is_hdr=False, motion_x=i,
                                     coherent=True)
        all_out.append(srv.push_frame(y, uv))
    return all_out


def test_server_batched_warp_bit_exact():
    """FrameServer with the batched dispatch produces byte-identical outputs,
    timestamps, and flags vs the per-output loop."""
    outs_b = _run_server(batched=True)
    outs_s = _run_server(batched=False)
    assert len(outs_b) == len(outs_s)
    interp_seen = 0
    for frame_b, frame_s in zip(outs_b, outs_s):
        assert len(frame_b) == len(frame_s)
        for ob, os_ in zip(frame_b, frame_s):
            assert ob.start_time == os_.start_time
            assert ob.end_time == os_.end_time
            assert ob.blending_scalar == os_.blending_scalar
            assert ob.interpolated == os_.interpolated
            assert ob.scene_change == os_.scene_change
            interp_seen += ob.interpolated
            np.testing.assert_array_equal(ob.y, os_.y)
            np.testing.assert_array_equal(ob.uv, os_.uv)
    assert interp_seen >= 4   # the batched path actually engaged

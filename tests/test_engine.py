"""OpticalFlowEngine vs GoldenEngine: ring rotation, flow double-buffering, the
1-pair pipeline, and totalFrameDelta — end-to-end over a synthetic stream."""

import numpy as np
import pytest

from conftest import make_frame
from hopperrender_tpu.engine.flow_engine import CalcTimeWindow, OpticalFlowEngine
from hopperrender_tpu.ops.golden import GoldenEngine


def _stream(rng, n, h, w, is_hdr=False):
    frames = []
    base_y = rng.integers(0, 200, (h, w + n * 2)).astype(np.uint16 if is_hdr else np.uint8)
    base_uv = rng.integers(0, 200, (h // 2, w + n * 2)).astype(np.uint16 if is_hdr else np.uint8)
    for i in range(n):
        frames.append((base_y[:, i * 2:i * 2 + w].copy(), base_uv[:, i * 2:i * 2 + w].copy()))
    return frames


@pytest.mark.parametrize("is_hdr", [False, True])
def test_engine_matches_golden_stream(rng, is_hdr):
    h, w = 32, 48
    eng = OpticalFlowEngine(h, w, is_hdr=is_hdr, max_calc_res=16)
    gold = GoldenEngine(h, w, is_hdr=is_hdr, max_calc_res=16)
    assert eng.res_scalar == gold.res_scalar == 1
    assert (eng.low_h, eng.low_w) == (gold.low_h, gold.low_w)

    for i, (y, uv) in enumerate(_stream(rng, 5, h, w, is_hdr)):
        eng.update_frame(y, uv)
        gold.update_frame(y, uv)
        if eng.frame_count >= 3:
            eng.calculate_optical_flow()
            gold.calculate_optical_flow()
            assert eng.fetch_total_frame_delta() == gold.total_frame_delta
            # Warp uses the PREVIOUS pair's flow (1-pair pipeline).
            ey, euv = eng.warp_frames(0.5, 2)
            gy, guv = gold.warp_frames(0.5, 2)
            assert np.abs(np.asarray(ey).astype(np.int64) - gy.astype(np.int64)).max() <= 1
            assert np.abs(np.asarray(euv).astype(np.int64) - guv.astype(np.int64)).max() <= 1
        else:
            ey, euv = eng.copy_frame()
            gy, guv = gold.copy_frame()
            assert np.abs(np.asarray(ey).astype(np.int64) - gy.astype(np.int64)).max() <= 1
            assert np.abs(np.asarray(euv).astype(np.int64) - guv.astype(np.int64)).max() <= 1


def test_copy_frame_warmup_slots(rng):
    """copyFrame must display the latency-matched slot: frame 1 -> newest, frame 2 ->
    middle, frame >=3 -> oldest (ref: opticalFlowCalcSDR.cpp:173)."""
    h, w = 16, 16
    eng = OpticalFlowEngine(h, w, max_calc_res=8)
    frames = _stream(np.random.default_rng(1), 4, h, w)
    seen = []
    for y, uv in frames:
        eng.update_frame(y, uv)
        out_y, _ = eng.copy_frame()
        seen.append(np.asarray(out_y))
    def close(a, b):  # default levels still pass through float math: allow 1 LSB
        assert np.abs(a.astype(np.int64) - b.astype(np.int64)).max() <= 1

    close(seen[0], frames[0][0])  # frame 1: only one real frame -> slot 2 (itself)
    close(seen[1], frames[0][0])  # frame 2: slot 1 -> frame 0
    close(seen[2], frames[0][0])  # frame 3: slot 0 -> frame 0
    close(seen[3], frames[1][0])  # frame 4: slot 0 -> frame 1


def test_radius_change_no_retrace(rng):
    from hopperrender_tpu.ops import flow as flow_ops

    h, w = 16, 16
    eng = OpticalFlowEngine(h, w, max_calc_res=8)
    eng2 = OpticalFlowEngine(h, w, max_calc_res=8)  # same shape shares the trace
    for i, (y, uv) in enumerate(_stream(rng, 4, h, w)):
        eng.update_frame(y, uv)
        eng2.update_frame(y, uv)
        if eng.frame_count >= 3:
            eng.search_radius = 5 + i  # auto-scaler analogue
            eng.calculate_optical_flow()
            before = flow_ops.pyramid_flow._cache_size()
            eng2.calculate_optical_flow()
            assert flow_ops.pyramid_flow._cache_size() == before


def test_reset_stream_restarts_warmup(rng):
    h, w = 16, 16
    eng = OpticalFlowEngine(h, w, max_calc_res=8)
    for y, uv in _stream(rng, 3, h, w):
        eng.update_frame(y, uv)
    assert eng.frame_count == 3
    eng.reset_stream()
    assert eng.frame_count == 0


def test_calc_time_window():
    win = CalcTimeWindow(interval=3)
    for t in (0.1, 0.2, 0.3):
        win.record(t)
    assert win.peak == pytest.approx(0.3)
    win.record(0.05)  # crosses interval: avg over first 3, peak resets to current
    assert win.avg == pytest.approx(0.6 / 3)
    assert win.peak == pytest.approx(0.05)


def test_odd_dimensions_rejected():
    with pytest.raises(ValueError):
        OpticalFlowEngine(15, 16)


@pytest.mark.parametrize("mode", [3, 4, 5, 6])
def test_engine_viz_modes_route_fast_and_match_reference(rng, mode):
    """Engine routing for visualization modes 3-6 (round 4): modes 3/4 ride
    the strip/structured formulations, 5/6 compose from the fast mode-2 warp
    (ops/warp_viz.py) — outputs bit-exact vs the ops/warp.py reference
    formulation the engine previously used for these modes."""
    import jax.numpy as jnp
    from hopperrender_tpu.ops import warp as warp_ops

    h, w = 64, 128
    eng = OpticalFlowEngine(h, w, max_calc_res=16)
    assert eng.use_warp_strips
    frames = _stream(rng, 4, h, w)
    for y, uv in frames:
        eng.update_frame(y, uv)
        if eng.frame_count >= 3:
            eng.calculate_optical_flow()
    ey, euv = eng.warp_frames(0.5, mode)
    ry, ruv = warp_ops.warp_frame(
        eng._frames_y[0], eng._frames_uv[0], eng._frames_y[1],
        eng._frames_uv[1], eng._blurred[0], jnp.float32(0.5),
        jnp.float32(eng._levels()[0]), jnp.float32(eng._levels()[1]),
        res_scalar=eng.res_scalar, mode=mode, is_hdr=False)
    np.testing.assert_array_equal(np.asarray(ey), np.asarray(ry))
    np.testing.assert_array_equal(np.asarray(euv), np.asarray(ruv))

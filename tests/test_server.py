"""FrameServer end-to-end: cadence, warmup, scene gating, settings, side data,
resolution change, metrics."""

import numpy as np
import pytest

from hopperrender_tpu.config import ActiveState, FrameOutput, Settings
from hopperrender_tpu.server.frame_server import FrameServer
from hopperrender_tpu.vio import nv12


def make_server(**kw):
    settings = kw.pop("settings", Settings(target_fps=60.0, use_display_fps=False))
    return FrameServer(48, 32, source_fps=24.0, settings=settings, **kw)


def stream_frames(rng, n, h=32, w=48, is_hdr=False):
    return [nv12.synthetic_frame(rng, h, w, is_hdr=is_hdr, motion_x=i) for i in range(n)]


def test_warmup_then_interpolation(rng):
    srv = make_server()
    frames = stream_frames(rng, 6)
    all_out = []
    for y, uv in frames:
        all_out.append(srv.push_frame(y, uv))
    # First two source frames: passthrough only (frameCount < 3).
    assert all(not o.interpolated for o in all_out[0])
    assert all(not o.interpolated for o in all_out[1])
    # Warmed up: interpolated outputs appear, 2-3 outputs per source frame for 24->60.
    for outs in all_out[2:]:
        assert len(outs) in (2, 3)
        assert any(o.interpolated for o in outs)


def test_output_timestamps_monotonic_and_spaced(rng):
    srv = make_server()
    times = []
    for y, uv in stream_frames(rng, 8):
        for o in srv.push_frame(y, uv):
            times.append((o.start_time, o.end_time))
    target_ft = srv.cadence.target_frame_time
    for (s0, e0), (s1, e1) in zip(times, times[1:]):
        assert s1 == e0
        assert e1 - s1 == target_ft
    # Latency seed: first output at 2 source frames (ref: HopperRender.cpp:938-941).
    assert times[0][0] == 2 * srv.cadence.source_frame_time


def test_deactivated_passthrough(rng):
    srv = make_server(settings=Settings(activated=False, target_fps=60.0,
                                        use_display_fps=False))
    for y, uv in stream_frames(rng, 4):
        outs = srv.push_frame(y, uv)
        assert len(outs) == 1
        assert not outs[0].interpolated
        assert outs[0].end_time - outs[0].start_time == srv.cadence.playback_frame_time


def test_not_needed_when_source_fast(rng):
    srv = FrameServer(48, 32, source_fps=60.0,
                      settings=Settings(target_fps=60.0, use_display_fps=False))
    assert srv.cadence.state == ActiveState.NOT_NEEDED
    for y, uv in stream_frames(rng, 3):
        outs = srv.push_frame(y, uv)
        assert len(outs) == 1 and not outs[0].interpolated


def test_scene_change_forces_copy(rng):
    srv = make_server(settings=Settings(target_fps=60.0, use_display_fps=False,
                                        scene_change_threshold=1))
    frames = stream_frames(rng, 5)
    hard_cut = [(np.full_like(frames[0][0], 255), np.full_like(frames[0][1], 255)),
                (np.zeros_like(frames[0][0]), np.zeros_like(frames[0][1]))]
    seq = frames[:4] + hard_cut + frames[4:]
    saw_scene_copy = False
    for y, uv in seq:
        for o in srv.push_frame(y, uv):
            if o.scene_change:
                assert not o.interpolated
                saw_scene_copy = True
    assert saw_scene_copy


def test_side_data_passthrough_to_every_output(rng):
    srv = make_server()
    blob = {"hdr": b"\x01\x02", "dovi_rpu": b"\xff", "empty": b""}
    for y, uv in stream_frames(rng, 4):
        outs = srv.push_frame(y, uv, side_data=blob)
        for o in outs:
            assert o.side_data.get("hdr") == b"\x01\x02"
            assert o.side_data.get("dovi_rpu") == b"\xff"
            assert "empty" not in o.side_data  # zero-size blobs are not copied


def test_live_settings_update(rng):
    srv = make_server()
    for y, uv in stream_frames(rng, 3):
        srv.push_frame(y, uv)
    srv.update_settings(target_fps=120.0, delta_scalar=4, black_level=10)
    assert srv.engine.delta_scalar == 4
    assert srv.engine.black_level == 10.0
    assert srv.cadence.target_frame_time == int(1e7 / 120.0)
    m = srv.metrics()
    assert m.delta_scalar == 4
    # Deactivate live.
    srv.update_settings(activated=False)
    y, uv = nv12.synthetic_frame(rng, 32, 48)
    outs = srv.push_frame(y, uv)
    assert len(outs) == 1 and not outs[0].interpolated


def test_use_display_fps(rng):
    srv = FrameServer(48, 32, source_fps=24.0, display_fps=75.0,
                      settings=Settings(target_fps=60.0, use_display_fps=True))
    assert srv.cadence.target_frame_time == int(1e7 / 75.0)
    srv.set_display_fps(144.0)
    assert srv.cadence.target_frame_time == int(1e7 / 144.0)


def test_dynamic_resolution_change(rng):
    srv = make_server()
    for y, uv in stream_frames(rng, 4):
        srv.push_frame(y, uv)
    old_engine = srv.engine
    y, uv = nv12.synthetic_frame(rng, 64, 96)
    outs = srv.push_frame(y, uv)
    assert srv.engine is not old_engine
    assert (srv.height, srv.width) == (64, 96)
    # Engine restarts its warmup: passthrough until 3 frames at the new size.
    assert all(not o.interpolated for o in outs)
    assert outs[0].y.shape == (64, 96)


def test_new_segment_resets_warmup(rng):
    srv = make_server()
    for y, uv in stream_frames(rng, 4):
        srv.push_frame(y, uv)
    srv.new_segment(rate=1.0)
    y, uv = nv12.synthetic_frame(rng, 32, 48)
    outs = srv.push_frame(y, uv)
    assert all(not o.interpolated for o in outs)


def test_push_packed_roundtrip(rng):
    srv = make_server()
    y, uv = nv12.synthetic_frame(rng, 32, 48)
    buf = nv12.pack(y, uv, stride=64)  # strided input
    outs = srv.push_packed(bytes(buf.tobytes()), stride=64)
    assert outs[0].y.shape == (32, 48)
    packed = outs[0].packed(stride=50)
    assert packed.size == nv12.frame_size_samples(32, 50)


def test_metrics_fields(rng):
    srv = make_server()
    for y, uv in stream_frames(rng, 4):
        srv.push_frame(y, uv)
    m = srv.metrics()
    assert m.active_state == int(ActiveState.ACTIVE)
    assert m.source_fps == pytest.approx(24.0, abs=0.01)
    assert m.target_fps == pytest.approx(60.0, abs=0.01)
    assert (m.dim_x, m.dim_y) == (48, 32)
    assert m.low_dim_x > 0 and m.low_dim_y > 0
    assert m.search_radius >= 5
    assert m.ofc_calc_time > 0.0
    # All 23 GetCurrentSettings fields present (ref: iez.h:13-37), plus the
    # TPU-native extensions (band warp's host-planned tier; batched warp
    # dispatch state).
    import dataclasses as dc
    assert len(dc.fields(m)) == 25
    assert m.batched_warp in (False, True)
    assert m.warp_apron >= 0


def test_hdr_server(rng):
    srv = FrameServer(48, 32, source_fps=24.0, is_hdr=True,
                      settings=Settings(target_fps=60.0, use_display_fps=False))
    for y, uv in stream_frames(rng, 4, is_hdr=True):
        outs = srv.push_frame(y, uv)
        for o in outs:
            assert o.y.dtype == np.uint16


@pytest.mark.parametrize("mode", list(FrameOutput))
def test_all_output_modes(rng, mode):
    srv = make_server(settings=Settings(target_fps=60.0, use_display_fps=False,
                                        frame_output=int(mode)))
    for y, uv in stream_frames(rng, 4):
        outs = srv.push_frame(y, uv)
    assert any(o.interpolated for o in outs)


def test_display_poll_updates_target(rng, monkeypatch):
    """use_display_fps without an explicit rate polls the display every 5 s
    (ref: HopperRender.cpp:793-800)."""
    from hopperrender_tpu.server import display

    rates = iter([100.0, 120.0])
    srv = FrameServer(48, 32, source_fps=24.0,
                      settings=Settings(target_fps=60.0, use_display_fps=True))
    assert srv._display_poller is not None
    srv._display_poller._probe = lambda: next(rates, 120.0)
    y, uv = nv12.synthetic_frame(rng, 32, 48)
    srv.push_frame(y, uv)  # first poll -> 100 Hz
    assert srv.cadence.target_frame_time == int(1e7 / 100.0)
    srv.push_frame(y, uv)  # within 5 s window: no re-poll
    assert srv.cadence.target_frame_time == int(1e7 / 100.0)
    srv._display_poller._last_poll -= 6.0  # age the window
    srv.push_frame(y, uv)
    assert srv.cadence.target_frame_time == int(1e7 / 120.0)


def test_test_mode_settings(rng):
    """auto_quality=False pins the search radius (Test Mode parity); num_iterations
    pins the pyramid depth (NUM_ITERATIONS parity, ref: config.h:6,12)."""
    srv = make_server(settings=Settings(target_fps=60.0, use_display_fps=False,
                                        auto_quality=False, num_iterations=3))
    for y, uv in stream_frames(rng, 5):
        srv.push_frame(y, uv)
    assert srv.engine.search_radius == 5  # never auto-adjusted
    assert srv.engine.num_iterations == 3
    # Live re-enable.
    srv.update_settings(auto_quality=True)
    assert srv.scaler.enabled


def test_continuous_noise_does_not_trip_scene_gate(rng):
    """Continuous per-frame noise (the adversarial bench content) does NOT
    continuously trip the scene detector: detection is a SPIKE test against
    the rolling delta average (ref: HopperRender.cpp:1126-1176), and
    uncorrelated-noise deltas are uniformly high, so delta1 ~= 0. This pins
    the honest conclusion from VERDICT r3: adversarial noise streams ride the
    FULL interpolation path (scene gating does not rescue the budget there —
    the chain-bounds fast path and the TooSlow policy do)."""
    srv = make_server(settings=Settings(target_fps=60.0, use_display_fps=False))
    n_scene = n_interp = 0
    for i in range(14):
        y = rng.integers(0, 256, (32, 48), dtype=np.uint8)
        uv = rng.integers(0, 256, (16, 48), dtype=np.uint8)
        for o in srv.push_frame(y, uv):
            if i >= 4:  # past warmup + detector history fill
                n_scene += int(o.scene_change)
                n_interp += int(o.interpolated)
    assert n_scene == 0
    assert n_interp > 0

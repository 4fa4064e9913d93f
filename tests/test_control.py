"""Host control plane: cadence, state machine, scene detection, auto scaler."""

import math

import pytest

from hopperrender_tpu import config
from hopperrender_tpu.config import ActiveState
from hopperrender_tpu.server.control import (
    AutoQualityScaler,
    CadenceController,
    SceneChangeDetector,
    fps_to_frame_time,
)


def test_fps_to_frame_time():
    assert fps_to_frame_time(24.0) == 416666
    assert fps_to_frame_time(60.0) == 166666
    assert fps_to_frame_time(23.976) == int((1.0 / 23.976) * 1e7)


class TestStateMachine:
    def test_active_when_target_faster(self):
        c = CadenceController(24.0, 60.0)
        assert c.state == ActiveState.ACTIVE

    def test_not_needed_when_target_not_faster(self):
        c = CadenceController(60.0, 60.0)
        assert c.state == ActiveState.NOT_NEEDED
        c = CadenceController(120.0, 60.0)
        assert c.state == ActiveState.NOT_NEEDED

    def test_deactivated_stays_deactivated(self):
        c = CadenceController(24.0, 60.0, activated=False)
        assert c.state == ActiveState.DEACTIVATED
        c.update_interpolation_status()
        assert c.state == ActiveState.DEACTIVATED
        c.set_activated(True)
        assert c.state == ActiveState.ACTIVE

    def test_rate_change_flips_state(self):
        # 24 fps source sped up to 3x -> effective 72 fps > 60 target -> NotNeeded
        c = CadenceController(24.0, 60.0)
        c.new_segment(rate=3.0)
        assert c.state == ActiveState.NOT_NEEDED
        c.new_segment(rate=1.0)
        assert c.state == ActiveState.ACTIVE

    def test_fps_override(self):
        # Sample timing says 120 fps but container says 24 -> ratio 5 -> override.
        c = CadenceController(120.0, 60.0)
        assert c.state == ActiveState.NOT_NEEDED
        assert c.maybe_override_source_fps(24.0)
        assert c.state == ActiveState.ACTIVE
        assert c.source_frame_time == int(1e7 / 24.0)
        # Close fps: no override (ratio within [0.8, 1.2]).
        assert not c.maybe_override_source_fps(25.0)


class TestCadence:
    def test_24_to_60_pattern(self):
        """24->60: blending scalar cycles 0, .4, .8 | .2, .6 | ... giving 3,2,3,2
        outputs per source frame (ref: HopperRender.cpp:943-948,1191-1197)."""
        c = CadenceController(24.0, 60.0)
        counts = []
        for i in range(240):
            n = c.begin_source_frame(i * c.source_frame_time)
            counts.append(n)
            for _ in range(n):
                c.next_output_timing()
                c.advance_blending()
        # target/playback = 166666/416666 ~= 0.4; long-run average = 2.5 outputs per
        # source frame (the integer frame-time truncation perturbs single frames).
        assert sum(counts) / len(counts) == pytest.approx(2.5, abs=0.02)
        assert set(counts) <= {2, 3}
        assert 0.0 <= c.blending_scalar < 1.0

    def test_timestamps_seeded_with_pipeline_latency(self):
        c = CadenceController(24.0, 60.0, buffer_frames=2)
        c.begin_source_frame(1000)
        t = c.next_output_timing()
        assert t.start_time == 1000 + 2 * c.source_frame_time + 2 * c.target_frame_time
        assert t.end_time == t.start_time + c.target_frame_time

    def test_timestamps_monotonic_with_target_step(self):
        c = CadenceController(24.0, 60.0)
        c.begin_source_frame(0)
        prev = None
        for _ in range(10):
            t = c.next_output_timing()
            if prev is not None:
                assert t.start_time == prev.end_time
                assert t.end_time - t.start_time == c.target_frame_time
            prev = t

    def test_deactivated_single_passthrough_with_source_step(self):
        c = CadenceController(24.0, 60.0, activated=False)
        n = c.begin_source_frame(0)
        assert n == 1
        t = c.next_output_timing()
        assert t.end_time - t.start_time == c.playback_frame_time
        c.advance_blending()
        assert c.blending_scalar == 0.0  # blending only advances when Active

    def test_not_needed_single_output(self):
        c = CadenceController(60.0, 60.0)
        assert c.begin_source_frame(0) == 1


class TestSceneChangeDetector:
    SFT = fps_to_frame_time(24.0)

    def _fill(self, det, deltas, start_frame=3):
        for i, d in enumerate(deltas):
            det.add_frame_delta(start_frame + i, d, self.SFT)

    def test_no_detection_below_threshold(self):
        det = SceneChangeDetector()
        self._fill(det, [10, 11, 12, 10, 11])
        assert not det.evaluate(7, self.SFT, threshold=200)

    def test_detects_spike(self):
        """Warped pair delta spikes vs both the trailing average and the next pair."""
        det = SceneChangeDetector()
        self._fill(det, [10, 11, 12, 900, 12])  # current=900 (index -2), next=12
        assert det.evaluate(7, self.SFT, threshold=200)
        assert det.peak_delta1 >= 200

    def test_no_detection_when_next_also_high(self):
        """delta2 = current - next must also exceed the threshold: a sustained rise
        (e.g. fast motion) is not a cut."""
        det = SceneChangeDetector()
        self._fill(det, [10, 11, 12, 900, 890])
        assert not det.evaluate(7, self.SFT, threshold=200)

    def test_average_uses_up_to_10_entries_excluding_last_two(self):
        det = SceneChangeDetector()
        deltas = [100] * 12 + [500, 100]
        self._fill(det, deltas)
        # The 10-entry average STARTS at hist[size-2] (the current pair, ref:
        # HopperRender.cpp:1134-1135): avg = (500 + 9*100)/10 = 140;
        # delta1 = 500-140 = 360, delta2 = 500-100 = 400 -> min is 360.
        assert det.evaluate(3 + len(deltas) - 1, self.SFT, threshold=360)
        assert not det.evaluate(3 + len(deltas) - 1, self.SFT, threshold=361)

    def test_window_pruning_3s(self):
        det = SceneChangeDetector()
        frames_in_3s = int(3e7 / self.SFT)
        for i in range(frames_in_3s + 40):
            det.add_frame_delta(i, 100, self.SFT)
        assert det.frame_deltas[0].frame_number >= 40 - 1

    def test_clear_on_status_update(self):
        c = CadenceController(24.0, 60.0)
        c.scene.add_frame_delta(3, 100, self.SFT)
        c.update_interpolation_status()
        assert len(c.scene.frame_deltas) == 0


class TestAutoQualityScaler:
    FT24 = fps_to_frame_time(24.0)  # 416666 ticks = 41.67 ms

    def test_reduce_when_slow(self):
        s = AutoQualityScaler(enabled=True)
        s.add_warp_duration(0.010)
        # flow 0.025 + warp 0.010 = 35 ms; *1.4 = 49 ms > 41.67 ms -> reduce
        assert s.adjust(10, 0.025, self.FT24) == 9
        assert s.total_warp_duration == 0.0

    def test_raise_when_fast(self):
        s = AutoQualityScaler(enabled=True)
        s.add_warp_duration(0.002)
        # 0.005 + 0.002 = 7 ms; *1.6 < 41.67 -> raise
        assert s.adjust(10, 0.005, self.FT24) == 11

    def test_deadband_keeps_radius(self):
        s = AutoQualityScaler(enabled=True)
        # 30 ms: *1.4 = 42.0 > 41.67 -> reduce is triggered at exactly 30ms; use 29 ms:
        # *1.4 = 40.6 < 41.67 and *1.6 = 46.4 > 41.67 -> hold
        assert s.adjust(10, 0.029, self.FT24) == 10

    def test_clamped_to_bounds(self):
        s = AutoQualityScaler(enabled=True)
        assert s.adjust(config.MIN_SEARCH_RADIUS, 10.0, self.FT24) == config.MIN_SEARCH_RADIUS
        assert s.adjust(config.MAX_SEARCH_RADIUS, 0.0, self.FT24) == config.MAX_SEARCH_RADIUS

    def test_disabled(self):
        s = AutoQualityScaler(enabled=False)
        s.add_warp_duration(5.0)
        assert s.adjust(10, 5.0, self.FT24) == 10
        assert s.total_warp_duration == 0.0


class TestTooSlowPolicy:
    """Over-budget policy (config.py TOO_SLOW_*; ref: HopperRender.cpp:1438-1463,
    auto-disable commented at :1450-1452 — we implement it with hysteresis)."""

    FRAME_TIME = int(1e7 / 24)  # 24 fps source

    def _over_budget_time(self):
        # duration * UPPER_PERF_BUFFER > frame_time
        return (self.FRAME_TIME / 1e7) / config.UPPER_PERF_BUFFER * 1.05

    def test_trips_only_at_floor_after_n_frames(self):
        s = AutoQualityScaler(enabled=True)
        r = config.MIN_SEARCH_RADIUS + 2
        slow = self._over_budget_time()
        # First walks the radius down to the floor without tripping.
        for _ in range(2):
            r = s.adjust(r, slow, self.FRAME_TIME)
        assert r == config.MIN_SEARCH_RADIUS and not s.too_slow
        # Then needs TOO_SLOW_TRIP_FRAMES consecutive over-budget frames.
        for i in range(config.TOO_SLOW_TRIP_FRAMES - 1):
            r = s.adjust(r, slow, self.FRAME_TIME)
            assert not s.too_slow, f"tripped early at frame {i}"
        r = s.adjust(r, slow, self.FRAME_TIME)
        assert s.too_slow
        assert r == config.MIN_SEARCH_RADIUS

    def test_under_budget_resets_trip_counter(self):
        s = AutoQualityScaler(enabled=True)
        slow = self._over_budget_time()
        r = config.MIN_SEARCH_RADIUS
        for _ in range(config.TOO_SLOW_TRIP_FRAMES - 1):
            r = s.adjust(r, slow, self.FRAME_TIME)
        r = s.adjust(r, 1e-4, self.FRAME_TIME)  # one fast frame resets the run
        for _ in range(config.TOO_SLOW_TRIP_FRAMES - 1):
            r = s.adjust(config.MIN_SEARCH_RADIUS, slow, self.FRAME_TIME)
        assert not s.too_slow

    def test_recovers_after_hysteresis_window(self):
        s = AutoQualityScaler(enabled=True)
        s.too_slow = True
        s._warp_estimate = 0.0
        r = config.MIN_SEARCH_RADIUS
        for i in range(config.TOO_SLOW_RECOVER_FRAMES - 1):
            r = s.adjust(r, 1e-4, self.FRAME_TIME)
            assert s.too_slow, f"recovered early at frame {i}"
        r = s.adjust(r, 1e-4, self.FRAME_TIME)
        assert not s.too_slow

    def test_frozen_warp_estimate_blocks_recovery(self):
        # While TooSlow the warps are copies, so the budget test must use the
        # warp cost frozen at trip time — a slow flow alone shouldn't recover.
        s = AutoQualityScaler(enabled=True)
        s.too_slow = True
        s._warp_estimate = (self.FRAME_TIME / 1e7)  # warps alone blow the budget
        for _ in range(config.TOO_SLOW_RECOVER_FRAMES + 5):
            s.adjust(config.MIN_SEARCH_RADIUS, 1e-4, self.FRAME_TIME)
        assert s.too_slow


class TestTooSlowServer:
    """End-to-end: TooSlow -> passthrough at source cadence + state 3 in
    metrics, then recovery re-activates interpolation."""

    def test_server_passthrough_and_recovery(self, rng):
        import numpy as np
        from hopperrender_tpu.config import Settings
        from hopperrender_tpu.server.frame_server import FrameServer
        from hopperrender_tpu.vio import nv12

        srv = FrameServer(48, 32, source_fps=24.0,
                          settings=Settings(target_fps=60.0, use_display_fps=False))
        # Warm up: 4 source frames so the engine interpolates.
        for i in range(4):
            y, uv = nv12.synthetic_frame(rng, 32, 48, motion_x=i)
            outs = srv.push_frame(y, uv)
        assert any(o.interpolated for o in outs)

        # Force the tripped state (the trip path itself is unit-tested above).
        srv.scaler.too_slow = True
        srv.scaler._warp_estimate = 10.0  # keeps it tripped regardless of flow time
        y, uv = nv12.synthetic_frame(rng, 32, 48, motion_x=5)
        outs = srv.push_frame(y, uv)
        assert srv.cadence.state == ActiveState.TOO_SLOW
        assert srv.metrics().active_state == int(ActiveState.TOO_SLOW)
        assert len(outs) == 1  # passthrough: one copy per source frame
        assert not outs[0].interpolated
        # Source-cadence timestamps: the copy occupies a source-frame interval.
        assert (outs[0].end_time - outs[0].start_time
                == srv.cadence.playback_frame_time)

        # Recovery: tiny frames are far under budget once the estimate unfreezes.
        srv.scaler._warp_estimate = 0.0
        last = None
        for i in range(config.TOO_SLOW_RECOVER_FRAMES + 2):
            y, uv = nv12.synthetic_frame(rng, 32, 48, motion_x=6 + i)
            last = srv.push_frame(y, uv)
        assert srv.cadence.state == ActiveState.ACTIVE
        assert any(o.interpolated for o in last)

"""Round-2 control-plane fixes: live settings honesty, display poller lifecycle,
pipeline renegotiation on resolution change, HBM pre-check, scaler wiring."""

import numpy as np
import pytest

from hopperrender_tpu import config
from hopperrender_tpu.config import Settings
from hopperrender_tpu.engine import flow_engine
from hopperrender_tpu.server.frame_server import FrameServer
from hopperrender_tpu.server.pipeline import PipelinedServer
from hopperrender_tpu.vio import nv12


def make_server(h=32, w=48, **kw):
    settings = kw.pop("settings", Settings(target_fps=60.0, use_display_fps=False))
    return FrameServer(w, h, source_fps=24.0, settings=settings, **kw)


def feed_n(srv, rng, n, h=32, w=48):
    outs = []
    for i in range(n):
        y, uv = nv12.synthetic_frame(rng, h, w, motion_x=i)
        outs.extend(srv.push_frame(y, uv))
    return outs


# -- settings honesty ---------------------------------------------------------

def test_target_fps_zero_rejected():
    with pytest.raises(ValueError, match="target_fps"):
        Settings(target_fps=0.0).validate()
    srv = make_server()
    with pytest.raises(ValueError):
        srv.update_settings(target_fps=0)
    # The failed update must not leave partially-applied state behind.
    assert srv.settings.target_fps == 60.0


def test_num_iterations_applies_to_live_engine(rng):
    srv = make_server()
    feed_n(srv, rng, 2)
    assert srv.engine is not None
    srv.update_settings(num_iterations=3)
    assert srv.engine.num_iterations == 3


def test_max_calc_res_rebuilds_engine(rng):
    srv = make_server(h=256, w=256)
    for i in range(2):
        y, uv = nv12.synthetic_frame(rng, 256, 256, motion_x=i)
        srv.push_frame(y, uv)
    assert srv.engine.low_h == 256  # 256 <= 270: no downscale
    srv.update_settings(max_calc_res=128)
    assert srv.engine is None  # lazy rebuild pending
    y, uv = nv12.synthetic_frame(rng, 256, 256, motion_x=2)
    srv.push_frame(y, uv)
    assert srv.engine.low_h == 128


def test_use_display_fps_toggle_manages_poller():
    srv = make_server()
    assert srv._display_poller is None
    srv.update_settings(use_display_fps=True)
    assert srv._display_poller is not None
    srv.update_settings(use_display_fps=False)
    assert srv._display_poller is None


# -- auto-quality scaler sees real timings -------------------------------------

def test_scaler_descends_under_induced_load(rng):
    srv = make_server(settings=Settings(target_fps=60.0, use_display_fps=False,
                                        auto_quality=True))
    feed_n(srv, rng, 3)
    eng = srv.engine
    eng.search_radius = 12
    # Induce load: pretend the last flow calc took far longer than the frame time.
    eng.ofc_time.current = 10.0
    y, uv = nv12.synthetic_frame(rng, 32, 48, motion_x=9)
    srv.push_frame(y, uv)
    assert eng.search_radius == 11

    # And with fast timings the radius climbs back.
    eng.ofc_time.current = 0.0
    srv.scaler.total_warp_duration = 0.0
    srv.push_frame(y, uv)
    assert eng.search_radius == 12


# -- HBM pre-check --------------------------------------------------------------

def test_estimate_hbm_bytes_sane():
    small = flow_engine.estimate_hbm_bytes(480, 854, is_hdr=False)
    big = flow_engine.estimate_hbm_bytes(2160, 3840, is_hdr=True)
    assert small < big
    assert 50e6 < big < 4e9  # 4K HDR contexts are hundreds of MB, not TB


def test_check_device_memory_raises_on_small_device():
    class FakeDevice:
        def memory_stats(self):
            return {"bytes_limit": 64 * 1024 * 1024}

    with pytest.raises(RuntimeError, match="exceeds device memory"):
        flow_engine.check_device_memory(2160, 3840, is_hdr=True,
                                        max_calc_res=config.MAX_CALC_RES,
                                        device=FakeDevice())

    class BigDevice:
        def memory_stats(self):
            return {"bytes_limit": 16 * 1024 ** 3}

    # Plenty of memory (v5e-class 16 GB): 4K HDR must pass.
    flow_engine.check_device_memory(2160, 3840, is_hdr=True,
                                    max_calc_res=config.MAX_CALC_RES,
                                    device=BigDevice())


# -- pipeline renegotiation ------------------------------------------------------

def test_pipeline_mid_stream_resolution_grow(rng):
    srv = make_server(h=32, w=48)
    pipe = PipelinedServer(srv, input_slots=4, output_slots=8)
    for i in range(4):
        y, uv = nv12.synthetic_frame(rng, 32, 48, motion_x=i)
        pipe.feed(y, uv)
    # Mid-stream growth: both rings must renegotiate, not raise.
    for i in range(4):
        y, uv = nv12.synthetic_frame(rng, 64, 96, motion_x=i)
        pipe.feed(y, uv)
    pipe.close()
    outs = list(pipe.outputs(timeout=60))
    pipe.join()
    assert pipe.stats.renegotiations >= 1
    small = [o for o in outs if o.y.shape == (32, 48)]
    big = [o for o in outs if o.y.shape == (64, 96)]
    assert small and big
    assert len(outs) == pipe.stats.frames_out


def test_pipeline_worker_death_unblocks_producer(rng):
    srv = make_server(h=32, w=48)
    pipe = PipelinedServer(srv, input_slots=2, output_slots=4)

    def boom(*a, **k):
        raise RuntimeError("engine exploded")

    srv.push_frame = boom
    y, uv = nv12.synthetic_frame(rng, 32, 48)
    with pytest.raises(RuntimeError):
        # The worker dies on the first frame; subsequent feeds must not hang
        # forever on a full input ring.
        for i in range(8):
            pipe.feed(y, uv)
    with pytest.raises(RuntimeError, match="engine thread failed"):
        list(pipe.outputs(timeout=10))
    pipe.join()

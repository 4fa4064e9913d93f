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


# -- bucket-dependent aprons ------------------------------------------------

def test_apron_bucket_sizes():
    from hopperrender_tpu.ops import flow_strip
    a16 = flow_strip.apron_for(270, 480, 16)
    a8 = flow_strip.apron_for(270, 480, 8)
    a5 = flow_strip.apron_for(270, 480, 5)
    assert a16 == 576 and a8 == 144 and a5 == 48
    for a in (a16, a8, a5):
        assert a % 16 == 0


def test_apron_invariance_of_outputs(rng):
    """The apron is pure padding: pyramid flow and warp outputs must be
    identical across apron sizes (radius 5 fits both 48 and 576)."""
    import jax.numpy as jnp
    from hopperrender_tpu.ops import flow_strip, warp_strip

    h, w, rs = 64, 128, 2
    low_h, low_w = h >> rs, w >> rs
    f1 = nv12.synthetic_frame(rng, h, w, motion_x=0)
    f2 = nv12.synthetic_frame(rng, h, w, motion_x=3)
    radius = jnp.int32(5)
    outs = []
    for apron in (32, 144):
        ctx1 = flow_strip.build_frame_context(
            jnp.asarray(f1[0]), jnp.asarray(f1[1]), apron=apron, is_hdr=False,
            res_scalar=rs)
        _, blurred, raw = flow_strip.pyramid_flow_strip(
            ctx1, jnp.asarray(f2[0]), jnp.asarray(f2[1]), radius,
            jnp.int32(8), jnp.int32(6), low_h=low_h, low_w=low_w,
            res_scalar=rs, is_hdr=False, num_layers=5, apron=apron,
            dim_y=h, dim_x=w)
        c12 = warp_strip.build_warp_context(jnp.asarray(f1[0]), jnp.asarray(f1[1]),
                                            apron=apron, is_hdr=False)
        c21 = warp_strip.build_warp_context(jnp.asarray(f2[0]), jnp.asarray(f2[1]),
                                            apron=apron, is_hdr=False)
        oy, ouv = warp_strip.warp_frame_strip(
            c12, c21, blurred, jnp.float32(0.4), jnp.float32(0.0),
            jnp.float32(255.0), res_scalar=rs, mode=2, is_hdr=False,
            dim_y=h, dim_x=w, apron=apron)
        outs.append((np.asarray(blurred), int(raw), np.asarray(oy), np.asarray(ouv)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    assert outs[0][1] == outs[1][1]
    np.testing.assert_array_equal(outs[0][2], outs[1][2])
    np.testing.assert_array_equal(outs[0][3], outs[1][3])


@pytest.mark.parametrize("h,w,mcr,radii", [
    # Smoke: tiny strip-path geometry (max_calc_res=16 -> rs=2 at 64x128,
    # same transition mechanics); the production-size 576x192 sweep (~3 min
    # on CPU) runs in the exhaustive tier.
    (64, 128, 16, [16, 8, 5, 16]),
    pytest.param(576, 192, config.MAX_CALC_RES, [16, 16, 8, 5, 5, 16],
                 marks=pytest.mark.exhaustive),
])
def test_engine_apron_transitions_stay_exact(rng, h, w, mcr, radii):
    """Forcing the search radius across buckets mid-stream (engine rebuilds
    contexts at the new apron) must match an engine pinned at the max apron."""
    from hopperrender_tpu.engine.flow_engine import OpticalFlowEngine
    from hopperrender_tpu.ops import flow_strip

    frames = [nv12.synthetic_frame(rng, h, w, motion_x=i * 2)
              for i in range(len(radii))]

    def run(pin_max):
        eng = OpticalFlowEngine(h, w, max_calc_res=mcr)
        if pin_max:
            # Pin by monkeypatching the bucket to always report MAX.
            eng._radius_bucket = lambda: 16
        outs = []
        for (y, uv), r in zip(frames, radii):
            eng.search_radius = r
            eng.update_frame(y, uv)
            if eng.frame_count >= 3:
                eng.calculate_optical_flow()
                oy, ouv = eng.warp_frames(0.5, 2)
                outs.append((np.asarray(oy), np.asarray(ouv)))
        return outs

    a = run(False)
    b = run(True)
    for (ya, uva), (yb, uvb) in zip(a, b):
        np.testing.assert_array_equal(ya, yb)
        np.testing.assert_array_equal(uva, uvb)

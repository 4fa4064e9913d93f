"""Round-3 regression net: HBM-formula honesty and V-tier plumbing.

VERDICT r2 weak #6: estimate_hbm_bytes was an unvalidated hand formula that
would silently drift as context layouts evolve. It now derives the persistent
terms from jax.eval_shape over the real context builders; this test pins
formula == live-array ledger so any layout change that breaks the equality
fails loudly (ref: opticalFlowCalc.cpp:45-110 detectDevices).
"""

import jax
import numpy as np
import pytest

from hopperrender_tpu import config as hcfg
from hopperrender_tpu.engine import flow_engine
from hopperrender_tpu.vio import nv12


def _tree_bytes(tree) -> int:
    return sum(l.nbytes for l in jax.tree.leaves(tree) if hasattr(l, "nbytes"))


@pytest.mark.parametrize("h,w,is_hdr", [(1080, 1920, False), (480, 854, False)])
def test_hbm_persistent_terms_equal_live_ledger(h, w, is_hdr):
    eng = flow_engine.OpticalFlowEngine(h, w, is_hdr=is_hdr)
    # Contexts are built at the engine's current bucket; the pre-check formula
    # assumes the worst case, so stream at MAX radius to compare like for like.
    eng.search_radius = hcfg.MAX_SEARCH_RADIUS
    rng = np.random.default_rng(0)
    for i in range(3):
        y, uv = nv12.synthetic_frame(rng, h, w, is_hdr=is_hdr,
                                     motion_x=i * 2, coherent=True)
        eng.update_frame(y, uv)
    ledger = sum(
        _tree_bytes(getattr(eng, n))
        for n in ("_frames_y", "_frames_uv", "_ctxs", "_wctxs", "_blurred"))
    # warp_band_packed must mirror the engine's actual routing (CPU engines
    # don't run the band kernel, so they hold unpacked contexts).
    est = flow_engine.estimate_hbm_bytes(
        h, w, is_hdr=is_hdr, warp_band_packed=eng.use_warp_band)
    persistent = est - flow_engine._working_bytes(h, w, is_hdr=is_hdr)
    assert persistent == ledger
    # The transient working-set model must stay a positive, sane fraction.
    assert 0 < flow_engine._working_bytes(h, w, is_hdr=is_hdr) < est


def test_engine_warp_apron_tier_streamed(monkeypatch):
    """Served-path apron tier: on converged pan content the planned pyramid's
    sig carries the blurred flow's maxabs, and the next warp runs the band
    kernel at the smallest covering apron tier — bit-identical to the
    full-apron kernel (ref contract: warpFrameKernelSDR.h:116-184). Tier
    selection is opt-in since the round-4 chip A/B measured the full-apron
    layout FASTER (flow_engine._band_plan); this pins the opt-in path's
    planning + bit-exactness."""
    from hopperrender_tpu.ops import warp_band

    monkeypatch.setenv("HRT_APRON_TIERS", "1")

    h, w = 64, 128
    rng = np.random.default_rng(3)

    def stream(force_full):
        # max_calc_res=16 -> res_scalar 2 (strip/planned path + band-valid).
        eng = flow_engine.OpticalFlowEngine(h, w, is_hdr=False,
                                            max_calc_res=16)
        # Max radius -> bucket-16 apron (320 here): room for a tier drop.
        eng.search_radius = hcfg.MAX_SEARCH_RADIUS
        eng._band_interpret = True
        eng.warp_apron_used = -1     # poison: a real band warp must set it
        if force_full:
            eng._run_warp_orig = eng._run_warp
            eng._run_warp = lambda *a, **kw: eng._run_warp_orig(
                *a, **{**kw, "flow_bound": None})
        outs = []
        for i in range(5):
            y, uv = nv12.synthetic_frame(np.random.default_rng(3), h, w,
                                         is_hdr=False, motion_x=i * 2,
                                         coherent=True)
            eng.update_frame(y, uv)
            # CPU engines route strips; force the band path (interpret-mode
            # test hook) after every update — _refresh_geometry re-derives
            # the flag (platform check) whenever the apron changes.
            eng.use_warp_band = True
            if eng.frame_count < 3:
                continue
            eng.calculate_optical_flow()
            oy, ouv = eng.warp_frames(0.5, 2)
            outs.append((np.asarray(oy), np.asarray(ouv)))
        return eng, outs

    eng, outs = stream(force_full=False)
    full_eng, full_outs = stream(force_full=True)
    assert eng.tier_mode == "planned"
    # The sig-carried bound certified a real tier drop on this content.
    assert eng._flow_bounds[0] is not None
    assert eng.warp_apron_used < eng._apron
    assert eng.warp_apron_used == warp_band.pick_apron(
        eng._flow_bounds[0], eng._apron)
    assert full_eng.warp_apron_used == full_eng._apron
    for (ay, auv), (by, buv) in zip(outs, full_outs):
        np.testing.assert_array_equal(ay, by)
        np.testing.assert_array_equal(auv, buv)


def test_engine_chain_bounds_pick_rule():
    """The engine's host-side chain-bounds rule: (32,32) engages exactly when
    the certified bound implies residual spreads past (16,16)'s certificate
    (16 < 2b+8 <= 32), and the warp stays bit-identical to the strip twin
    under the widened bounds."""
    from hopperrender_tpu.ops import warp_strip

    h, w = 64, 128
    eng = flow_engine.OpticalFlowEngine(h, w, is_hdr=False, max_calc_res=16)
    eng.search_radius = hcfg.MAX_SEARCH_RADIUS
    eng._refresh_geometry()
    eng.use_warp_band = True
    eng._band_interpret = True
    rng = np.random.default_rng(11)
    y0, uv0 = nv12.synthetic_frame(rng, h, w, is_hdr=False)
    y1, uv1 = nv12.synthetic_frame(rng, h, w, is_hdr=False)
    import jax.numpy as jnp
    w0 = eng._build_wctx(jnp.asarray(y0), jnp.asarray(uv0))
    w1 = eng._build_wctx(jnp.asarray(y1), jnp.asarray(uv1))
    flow = jnp.asarray(
        rng.integers(-12, 13, (2, eng.low_h, eng.low_w)).astype(np.int16))

    for bound, want_cb in ((2, (16, 16)), (4, (16, 16)), (5, (32, 32)),
                           (12, (32, 32)), (13, (16, 16)), (None, (16, 16))):
        oy, ouv = eng._run_warp(w0, w1, None, None, flow, 0.96875, 2,
                                apron=eng._apron, flow_bound=bound)
        assert eng.warp_chain_bounds == want_cb, (bound, eng.warp_chain_bounds)
        if bound == 12:
            sy, suv = warp_strip.warp_frame_strip(
                w0, w1, flow, jnp.float32(0.96875), jnp.float32(0.0),
                jnp.float32(255.0), res_scalar=eng.res_scalar, mode=2,
                is_hdr=False, dim_y=h, dim_x=w, apron=eng._apron)
            np.testing.assert_array_equal(np.asarray(oy), np.asarray(sy))
            np.testing.assert_array_equal(np.asarray(ouv), np.asarray(suv))


def test_band_rs1_gate(monkeypatch):
    """rs=1 band routing is ON by default (chip-proven round 5) on BOTH
    derivation sites (init and the _refresh_geometry rebuild); HRT_BAND_RS1=0
    opts 480p back to the strip warp for A/Bs."""
    import types

    monkeypatch.delenv("HRT_BAND_RS1", raising=False)
    eng = flow_engine.OpticalFlowEngine(480, 854, is_hdr=False)
    assert eng.res_scalar == 1 and eng.use_strips
    # Pretend we are on a TPU so only the rs gate decides.
    eng._device = types.SimpleNamespace(platform="tpu")
    eng.search_radius = hcfg.MAX_SEARCH_RADIUS
    assert eng._refresh_geometry() in (True, False)
    assert eng.use_warp_band
    monkeypatch.setenv("HRT_BAND_RS1", "0")
    eng.search_radius = hcfg.MIN_SEARCH_RADIUS
    eng._flow_buckets = [5, 5]
    assert eng._refresh_geometry()          # bucket change forces re-derive
    assert not eng.use_warp_band


def test_engine_noise_content_tiers_compose_bit_exact():
    """The round-3 thesis end to end on ADVERSARIAL content: random frames
    (flow never converges) streamed through the planned engine — whatever
    plan/apron-tier/chain-bounds the host picks, outputs must equal the
    forced-full-apron default-bounds engine bit for bit. Composes V/G plans,
    the sig bound, pick_apron, and the chain-bounds rule on content none of
    the targeted tests chose."""
    h, w = 64, 128
    frames = []
    rng = np.random.default_rng(23)
    for i in range(6):
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        uv = rng.integers(0, 256, (h // 2, w), dtype=np.uint8)
        frames.append((y, uv))

    def stream(force_full):
        eng = flow_engine.OpticalFlowEngine(h, w, is_hdr=False,
                                            max_calc_res=16)
        eng.search_radius = hcfg.MAX_SEARCH_RADIUS
        eng._band_interpret = True
        if force_full:
            orig = eng._run_warp
            eng._run_warp = lambda *a, **kw: orig(
                *a, **{**kw, "flow_bound": None})
        outs = []
        for y, uv in frames:
            eng.update_frame(y, uv)
            eng.use_warp_band = True
            if eng.frame_count < 3:
                continue
            eng.calculate_optical_flow()
            for t in (0.25, 0.75):
                oy, ouv = eng.warp_frames(t, 2)
                outs.append((np.asarray(oy), np.asarray(ouv)))
        return eng, outs

    eng, outs = stream(False)
    _, full_outs = stream(True)
    assert eng._flow_bounds[0] is not None and eng._flow_bounds[0] > 0
    assert eng.warp_apron_used <= eng._apron
    for (ay, auv), (by, buv) in zip(outs, full_outs):
        np.testing.assert_array_equal(ay, by)
        np.testing.assert_array_equal(auv, buv)

"""Randomized cross-validation: the full engine (strip flow + strip warp + buckets)
against the GoldenEngine over random geometries, radii, bit depths, and content.

This is the belt-and-braces layer on top of the targeted bit-exactness tests: any
strip-path edge case (aprons, parity corrections, odd low dims, bucket spans,
warp-context boundary fixups) that slips through the unit tests must reproduce here.
"""

import numpy as np
import pytest

from hopperrender_tpu.engine.flow_engine import OpticalFlowEngine
from hopperrender_tpu.ops.golden import GoldenEngine

CASES = [
    # (h, w, max_calc_res, is_hdr, radius, mode, seed)
    (32, 64, 32, False, 5, 2, 1),     # rs=0 via floor? h=32 <= 32 -> rs=0 reference path
    (72, 96, 36, False, 9, 2, 2),     # rs=1, odd low dims (36x48)
    (64, 96, 32, True, 16, 2, 3),     # rs=1 HDR, radius 16
    (80, 144, 36, False, 7, 0, 4),    # rs=1, warp mode 0, bucket 8
    (96, 128, 32, True, 11, 1, 5),    # rs=1... h=96 -> 96>32 -> rs=2? low 24x32
    (100, 148, 32, False, 13, 2, 6),  # rs=2, non-multiple dims -> warp strip disabled
]


@pytest.mark.parametrize("h,w,mcr,is_hdr,radius,mode,seed", CASES)
def test_engine_fuzz_vs_golden(h, w, mcr, is_hdr, radius, mode, seed):
    rng = np.random.default_rng(seed)
    eng = OpticalFlowEngine(h, w, is_hdr=is_hdr, max_calc_res=mcr)
    gold = GoldenEngine(h, w, is_hdr=is_hdr, max_calc_res=mcr)
    eng.search_radius = radius
    gold.search_radius = radius
    assert (eng.res_scalar, eng.low_h, eng.low_w) == (
        gold.res_scalar, gold.low_h, gold.low_w)

    hi = 65536 if is_hdr else 256
    dtype = np.uint16 if is_hdr else np.uint8
    base_y = rng.integers(0, hi, (h, w + 16), dtype=dtype)
    base_uv = rng.integers(0, hi, (h // 2, w + 16), dtype=dtype)

    for i in range(5):
        sh = (i * 3) % 16
        y = base_y[:, sh:sh + w].copy()
        uv = base_uv[:, sh:sh + w].copy()
        eng.update_frame(y, uv)
        gold.update_frame(y, uv)
        if eng.frame_count >= 3:
            eng.calculate_optical_flow()
            gold.calculate_optical_flow()
            assert eng.fetch_total_frame_delta() == gold.total_frame_delta, \
                f"delta mismatch at frame {i}"
            np.testing.assert_array_equal(
                np.asarray(eng._blurred[1]), gold.blurred[1],
                err_msg=f"flow mismatch at frame {i}")
            t = [0.0, 0.25, 0.625, 1.0][i % 4]
            ey, euv = eng.warp_frames(t, mode)
            gy, guv = gold.warp_frames(t, mode)
            tol = 0 if mode in (0, 1) else 1
            assert np.abs(np.asarray(ey).astype(np.int64)
                          - gy.astype(np.int64)).max() <= tol, f"warp Y frame {i}"
            assert np.abs(np.asarray(euv).astype(np.int64)
                          - guv.astype(np.int64)).max() <= tol, f"warp UV frame {i}"


BAND_TIER_CASES = [
    # (h, w, rs, is_hdr, apron, apron_eff, bounds, max_mag, t, seed)
    (64, 128, 2, False, 64, 32, (16, 16), 31, 0.375, 10),
    (64, 128, 2, True, 96, 32, (32, 32), 12, 0.96875, 11),
    (64, 256, 3, False, 64, 32, (32, 32), 12, 0.7, 12),
    (64, 256, 3, True, 128, 64, (16, 16), 60, 0.25, 13),
    (128, 128, 2, False, 160, 32, (8, 8), 25, 0.5, 14),
    (64, 128, 3, True, 320, 256, (32, 32), 200, 1.0, 15),
]


@pytest.mark.parametrize("h,w,rs,is_hdr,apron,aw,bounds,mag,t,seed",
                         BAND_TIER_CASES)
def test_band_fuzz_apron_tier_chain_bounds(h, w, rs, is_hdr, apron, aw,
                                           bounds, mag, t, seed):
    """Fuzz the new static parameters jointly: every (apron_eff, chain_bounds)
    pair must stay bit-identical to the strip twin across geometries, parities
    (odd lane-shift residues), bit depths, and displacement magnitudes up to
    the tier bound."""
    import jax.numpy as jnp
    from hopperrender_tpu.ops import warp_band, warp_strip

    rng = np.random.default_rng(seed)
    low_h, low_w = h >> rs, w >> rs
    peak = 65536 if is_hdr else 256
    dt = np.uint16 if is_hdr else np.uint8
    y1 = rng.integers(0, peak, (h, w), dtype=dt)
    uv1 = rng.integers(0, peak, (h // 2, w), dtype=dt)
    y2 = rng.integers(0, peak, (h, w), dtype=dt)
    uv2 = rng.integers(0, peak, (h // 2, w), dtype=dt)
    assert mag <= aw, "fuzz case must respect the tier soundness contract"
    flow = jnp.asarray(rng.integers(-mag, mag + 1,
                                    (2, low_h, low_w)).astype(np.int16))
    c1 = warp_strip.build_warp_context(jnp.asarray(y1), jnp.asarray(uv1),
                                       apron=apron, is_hdr=is_hdr)
    c2 = warp_strip.build_warp_context(jnp.asarray(y2), jnp.asarray(uv2),
                                       apron=apron, is_hdr=is_hdr)
    kw = dict(res_scalar=rs, is_hdr=is_hdr, dim_y=h, dim_x=w, apron=apron)
    p1 = warp_band.pack_band_context(c1, **kw)
    p2 = warp_band.pack_band_context(c2, **kw)
    args = (flow, jnp.float32(t), jnp.float32(16.0 * (256 if is_hdr else 1)),
            jnp.float32(235.0 * (256 if is_hdr else 1)))
    for mode in (0, 2):
        want = warp_strip.warp_frame_strip(c1, c2, *args, mode=mode, **kw)
        got = warp_band.warp_frame_band(p1, p2, *args, mode=mode,
                                        interpret=True, apron_eff=aw,
                                        chain_bounds=bounds, **kw)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
    # Batched (T,) dimension composed with the same tier statics: the batch
    # containing t must reproduce the single-t outputs exactly.
    ts = jnp.asarray([t * 0.5, t], jnp.float32)
    by, buv = warp_band.warp_frame_band(p1, p2, flow, ts, args[2], args[3],
                                        mode=2, interpret=True, apron_eff=aw,
                                        chain_bounds=bounds, **kw)
    want = warp_band.warp_frame_band(p1, p2, *args, mode=2, interpret=True,
                                     apron_eff=aw, chain_bounds=bounds, **kw)
    np.testing.assert_array_equal(np.asarray(by[1]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(buv[1]), np.asarray(want[1]))

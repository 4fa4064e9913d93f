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

"""Checked-in golden fixtures for the five BASELINE configs: replay the pinned
input frames through the SERVED engine and require byte equality with the
pinned outputs (BASELINE.md "Configs to support"; generator:
scripts/make_golden_fixtures.py — outputs were cross-checked against the
golden oracle at generation time). Any kernel change that alters served
output bits fails here against an ARTIFACT, not a regenerated oracle."""

import glob
import os

import numpy as np
import pytest

from hopperrender_tpu.engine.flow_engine import OpticalFlowEngine

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
FIXTURES = sorted(glob.glob(os.path.join(FIXTURE_DIR, "golden_*.npz")))


def test_all_five_configs_have_fixtures():
    names = {os.path.basename(p) for p in FIXTURES}
    assert names == {f"golden_{n}.npz" for n in
                     ("480p-sdr", "1080p-sdr", "4k-sdr", "4k-hdr", "live")}


@pytest.mark.parametrize("path", FIXTURES,
                         ids=[os.path.basename(p) for p in FIXTURES])
def test_fixture_replay_bit_exact(path):
    z = np.load(path)
    meta = z["meta"]
    h, w, is_hdr, max_calc_res, num_iterations, black, white, n_modes = (
        int(v) for v in meta[:8])
    modes = [int(v) for v in meta[8:8 + n_modes]]
    in_y, in_uv = z["in_y"], z["in_uv"]
    eng = OpticalFlowEngine(h, w, is_hdr=bool(is_hdr),
                            max_calc_res=max_calc_res,
                            num_iterations=num_iterations,
                            black_level=float(black), white_level=float(white))
    outs_y, outs_uv, deltas = [], [], []
    for i in range(in_y.shape[0]):
        eng.update_frame(in_y[i], in_uv[i])
        if eng.frame_count < 3:
            y, uv = eng.copy_frame()
            outs_y.append(np.asarray(y))
            outs_uv.append(np.asarray(uv))
            continue
        eng.calculate_optical_flow()
        deltas.append(eng.fetch_total_frame_delta())
        for mode in modes:
            for t in (0.25, 0.75):
                y, uv = eng.warp_frames(t, mode)
                outs_y.append(np.asarray(y))
                outs_uv.append(np.asarray(uv))
    np.testing.assert_array_equal(np.stack(outs_y), z["out_y"])
    np.testing.assert_array_equal(np.stack(outs_uv), z["out_uv"])
    np.testing.assert_array_equal(np.asarray(deltas, np.int64), z["deltas"])

"""Generate the pinned golden fixture files for the five BASELINE configs
(BASELINE.md "Configs to support"): deterministic input frames + the engine's
streamed outputs, verified against the golden oracle at generation time, saved
as tests/fixtures/golden_<config>.npz. tests/test_golden_fixtures.py replays
the inputs through the SERVED path and asserts byte equality with the pinned
outputs — bit-exactness anchored to checked-in artifacts, not regenerated
oracles.

Geometry is scaled for CPU runtime (as in tests/test_baseline_configs.py);
kernel variants, control logic, and settings are exactly each config's.

Run on the CPU backend: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
    python scripts/make_golden_fixtures.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")

# (name, dict) — see tests/test_golden_fixtures.py for the replay semantics.
CONFIGS = [
    # 1. 480p SDR, fixed 3-level pyramid, blended output, 24->60 (reference
    #    formulation path: res_scalar 0).
    ("480p-sdr", dict(h=48, w=86, is_hdr=False, max_calc_res=270,
                      num_iterations=3, modes=(2,), target_fps=60.0)),
    # 2. 1080p SDR full pipeline: blended + HSV-flow outputs, flow blur.
    ("1080p-sdr", dict(h=54, w=96, is_hdr=False, max_calc_res=270,
                       num_iterations=0, modes=(2, 3), target_fps=60.0)),
    # 3. 4K SDR: reduced calc resolution (res_scalar >= 1 -> the production
    #    strip/planned path).
    ("4k-sdr", dict(h=64, w=112, is_hdr=False, max_calc_res=16,
                    num_iterations=0, modes=(2,), target_fps=60.0)),
    # 4. 4K HDR P010 24->120: HDR kernels + level correction.
    ("4k-hdr", dict(h=64, w=112, is_hdr=True, max_calc_res=16,
                    num_iterations=0, modes=(2,), target_fps=120.0,
                    black=16, white=235)),
    # 5. Live-stream: grey-flow visualization + scene threshold.
    ("live", dict(h=64, w=112, is_hdr=False, max_calc_res=16,
                  num_iterations=0, modes=(4,), target_fps=60.0,
                  scene_threshold=50000)),
]

N_FRAMES = 6


def stream_inputs(name: str, h: int, w: int, is_hdr: bool):
    """Deterministic panning input frames for one config."""
    from hopperrender_tpu.vio import nv12
    rng = np.random.default_rng(abs(hash(name)) % (2 ** 31))
    ys, uvs = [], []
    for i in range(N_FRAMES):
        y, uv = nv12.synthetic_frame(rng, h, w, is_hdr=is_hdr,
                                     motion_x=-10 + i * 4, coherent=True)
        ys.append(y)
        uvs.append(uv)
    return np.stack(ys), np.stack(uvs)


def run_engine(cfg: dict, in_y, in_uv):
    """Stream the pinned inputs through the engine exactly as the replay test
    does; returns the per-(frame, mode, t) outputs."""
    from hopperrender_tpu.engine.flow_engine import OpticalFlowEngine

    eng = OpticalFlowEngine(
        cfg["h"], cfg["w"], is_hdr=cfg["is_hdr"],
        max_calc_res=cfg["max_calc_res"], num_iterations=cfg["num_iterations"],
        black_level=float(cfg.get("black", 0)),
        white_level=float(cfg.get("white", 255)))
    outs_y, outs_uv, deltas = [], [], []
    blends = (0.25, 0.75)
    for i in range(in_y.shape[0]):
        eng.update_frame(in_y[i], in_uv[i])
        if eng.frame_count < 3:
            y, uv = eng.copy_frame()
            outs_y.append(np.asarray(y))
            outs_uv.append(np.asarray(uv))
            continue
        eng.calculate_optical_flow()
        deltas.append(eng.fetch_total_frame_delta())
        for mode in cfg["modes"]:
            for t in blends:
                y, uv = eng.warp_frames(t, mode)
                outs_y.append(np.asarray(y))
                outs_uv.append(np.asarray(uv))
    return np.stack(outs_y), np.stack(outs_uv), np.asarray(deltas, np.int64), eng


def verify_against_golden(cfg, in_y, in_uv, outs_y, outs_uv, deltas):
    """Generation-time cross-check: the same stream through the golden oracle
    engine; 0 LSB on integer paths, <= 1 LSB on float blend/levels paths."""
    from hopperrender_tpu.ops.golden import GoldenEngine

    gold = GoldenEngine(cfg["h"], cfg["w"], is_hdr=cfg["is_hdr"],
                        max_calc_res=cfg["max_calc_res"],
                        num_iterations=cfg["num_iterations"],
                        black_level=float(cfg.get("black", 0)),
                        white_level=float(cfg.get("white", 255)))
    k = 0
    worst = 0
    for i in range(in_y.shape[0]):
        gold.update_frame(in_y[i], in_uv[i])
        if gold.frame_count < 3:
            y, uv = gold.copy_frame()
            worst = max(worst,
                        np.abs(outs_y[k].astype(np.int64) - y.astype(np.int64)).max(),
                        np.abs(outs_uv[k].astype(np.int64) - uv.astype(np.int64)).max())
            k += 1
            continue
        gold.calculate_optical_flow()
        for mode in cfg["modes"]:
            for t in (0.25, 0.75):
                y, uv = gold.warp_frames(t, mode)
                worst = max(worst,
                            np.abs(outs_y[k].astype(np.int64) - y.astype(np.int64)).max(),
                            np.abs(outs_uv[k].astype(np.int64) - uv.astype(np.int64)).max())
                k += 1
    assert k == outs_y.shape[0]
    assert worst <= 1, f"engine deviates from golden by {worst} LSB"
    return worst


def main() -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for name, cfg in CONFIGS:
        in_y, in_uv = stream_inputs(name, cfg["h"], cfg["w"], cfg["is_hdr"])
        outs_y, outs_uv, deltas, eng = run_engine(cfg, in_y, in_uv)
        worst = verify_against_golden(cfg, in_y, in_uv, outs_y, outs_uv, deltas)
        path = os.path.join(FIXTURE_DIR, f"golden_{name}.npz")
        np.savez_compressed(
            path, in_y=in_y, in_uv=in_uv, out_y=outs_y, out_uv=outs_uv,
            deltas=deltas,
            meta=np.array([cfg["h"], cfg["w"], int(cfg["is_hdr"]),
                           cfg["max_calc_res"], cfg["num_iterations"],
                           int(cfg.get("black", 0)), int(cfg.get("white", 255)),
                           len(cfg["modes"])] + list(cfg["modes"]), np.int64))
        print(f"{name}: {outs_y.shape[0]} outputs, worst dev vs golden "
              f"{worst} LSB, strips={eng.use_strips} -> {path} "
              f"({os.path.getsize(path) // 1024} KiB)")
    print("done")


if __name__ == "__main__":
    sys.exit(main())

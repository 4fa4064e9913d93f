"""Headline benchmark: 4K HDR P010 24->60 fps interpolation on one TPU chip.

Measures steady-state per-source-frame device cost = one pyramidal optical-flow
calculation + 2.5 warps (60/24 outputs per source frame), matching the reference's
real-time constraint "flow time + warp time < 1/source fps" (BASELINE.md; ref:
README.md:81, HopperRender.cpp:1438-1463).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where vs_baseline is
the real-time budget ratio (1/24 s divided by the measured per-source-frame latency;
> 1 means faster than real time).

Flags:
  --config {4k-hdr,4k-sdr,1080p-sdr,480p-sdr}   (default 4k-hdr)
  --frames N        steady-state source frames to measure (default 24)
  --json-only       suppress the human-readable breakdown on stderr
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import numpy as np

CONFIGS = {
    "4k-hdr": dict(w=3840, h=2160, is_hdr=True, source_fps=24.0, target_fps=60.0),
    "4k-sdr": dict(w=3840, h=2160, is_hdr=False, source_fps=24.0, target_fps=60.0),
    "1080p-sdr": dict(w=1920, h=1080, is_hdr=False, source_fps=24.0, target_fps=60.0),
    "480p-sdr": dict(w=854, h=480, is_hdr=False, source_fps=24.0, target_fps=60.0),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="4k-hdr", choices=sorted(CONFIGS))
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()
    cfg = CONFIGS[args.config]

    import jax

    from hopperrender_tpu.engine.flow_engine import OpticalFlowEngine
    from hopperrender_tpu.vio import nv12

    w, h, is_hdr = cfg["w"], cfg["h"], cfg["is_hdr"]
    source_fps, target_fps = cfg["source_fps"], cfg["target_fps"]
    outputs_per_source = target_fps / source_fps

    eng = OpticalFlowEngine(h, w, is_hdr=is_hdr)
    rng = np.random.default_rng(0)
    frames = [nv12.synthetic_frame(rng, h, w, is_hdr=is_hdr, motion_x=i * 2) for i in range(4)]

    # Warmup: fill the ring, trigger all compilations (flow + warp + copy).
    for y, uv in frames[:3]:
        eng.update_frame(y, uv)
    eng.calculate_optical_flow()
    eng.warp_frames(0.5, 2)
    eng.copy_frame()

    flow_ms, warp_ms = [], []
    n_outputs = int(round(outputs_per_source * 2))  # measure 2 source frames' worth
    for i in range(args.frames):
        y, uv = frames[3 - (i % 2)]
        eng.update_frame(y, uv)
        t0 = time.perf_counter()
        eng.calculate_optical_flow()  # includes block_until_ready
        flow_ms.append((time.perf_counter() - t0) * 1e3)
        blend = 0.0
        t0 = time.perf_counter()
        for k in range(n_outputs):
            blend = (blend + 1.0 / outputs_per_source) % 1.0
            eng.warp_frames(blend, 2)
        warp_ms.append((time.perf_counter() - t0) * 1e3 / n_outputs)

    flow = statistics.median(flow_ms)
    warp = statistics.median(warp_ms)
    per_source_ms = flow + outputs_per_source * warp
    budget_ms = 1e3 / source_fps
    result = {
        "metric": f"{args.config}_flow_plus_warp_per_source_frame",
        "value": round(per_source_ms, 3),
        "unit": "ms",
        "vs_baseline": round(budget_ms / per_source_ms, 3),
    }
    if not args.json_only:
        print(
            f"[{args.config}] {w}x{h} {'HDR' if is_hdr else 'SDR'} "
            f"{source_fps:.0f}->{target_fps:.0f} fps on {jax.devices()[0]}\n"
            f"  flow calc:  {flow:8.3f} ms  (min {min(flow_ms):.3f}, max {max(flow_ms):.3f})\n"
            f"  warp:       {warp:8.3f} ms per output frame\n"
            f"  per source: {per_source_ms:8.3f} ms  (budget {budget_ms:.3f} ms, "
            f"{budget_ms / per_source_ms:.2f}x realtime)",
            file=sys.stderr,
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()

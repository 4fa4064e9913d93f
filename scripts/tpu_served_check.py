"""Served-path validation on the real chip: OpticalFlowEngine + auto quality
scaler + planned tier dispatch, streamed for a few hundred frames with
device-resident IO (frames sliced from an on-device canvas — nothing but
1-element probes crosses the tunnel per frame).

Records the scaler's radius trajectory (ref: HopperRender.cpp:1438-1463),
per-frame ofc/warp times, the tier-plan lifecycle (plans settled per bucket,
mispredict count), and the steady state. Tunnel honesty: the engine's forced
completion fetches cost one tunnel RTT each on axon (~30 ms, PERF.md) which
would drown the real device times; the script measures the RTT separately and
subtracts it from the recorded times before feeding the scaler — on a real
deployment host the fetch is microseconds and no correction applies.

Usage: PYTHONPATH=/root/repo python scripts/tpu_served_check.py [--config 4k-hdr]
       [--frames 240] [--content pan|noise]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONFIGS = {
    "4k-hdr": dict(w=3840, h=2160, is_hdr=True),
    "4k-sdr": dict(w=3840, h=2160, is_hdr=False),
    "1080p-sdr": dict(w=1920, h=1080, is_hdr=False),
    "480p-sdr": dict(w=854, h=480, is_hdr=False),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="4k-hdr", choices=sorted(CONFIGS))
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--content", default="pan", choices=("pan", "noise"))
    ap.add_argument("--source-fps", type=float, default=24.0)
    ap.add_argument("--target-fps", type=float, default=60.0)
    ap.add_argument("--batched-warp", action="store_true",
                    help="dispatch each interval's outputs via "
                         "warp_frames_batch (one launch; the dispatch RTT "
                         "amortizes over the batch)")
    args = ap.parse_args()
    cfg = CONFIGS[args.config]
    h, w, is_hdr = cfg["h"], cfg["w"], cfg["is_hdr"]

    import jax
    import jax.numpy as jnp

    from hopperrender_tpu.utils import compile_cache
    compile_cache.enable()
    from hopperrender_tpu.engine.flow_engine import OpticalFlowEngine
    from hopperrender_tpu.server.control import AutoQualityScaler, fps_to_frame_time
    from hopperrender_tpu.vio import nv12

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    # On-device canvas; each frame is a shifted window (true pan). For noise
    # content a second noise canvas is re-rolled into the mix per frame.
    span = 130
    base_y, base_uv = nv12.synthetic_frame(rng, h, w + span, is_hdr=is_hdr,
                                           motion_x=0, coherent=False)
    dev = jax.devices()[0]
    canvas_y = jax.device_put(jnp.asarray(base_y), dev)
    canvas_uv = jax.device_put(jnp.asarray(base_uv), dev)

    @jax.jit
    def slice_frame(x, salt):
        y = jax.lax.dynamic_slice(canvas_y, (0, x), (h, w))
        uv = jax.lax.dynamic_slice(canvas_uv, (0, x), (h // 2, w))
        if args.content == "noise":
            # Per-frame noise re-roll (~10% amplitude) on device.
            k = jax.random.PRNGKey(salt)
            amp = 6554 if is_hdr else 26
            ny = jax.random.randint(k, (h, w), 0, amp, jnp.int32)
            nuv = jax.random.randint(jax.random.fold_in(k, 1),
                                     (h // 2, w), 0, amp, jnp.int32)
            y = (y.astype(jnp.int32) + ny).clip(0, 65535 if is_hdr else 255
                                                ).astype(y.dtype)
            uv = (uv.astype(jnp.int32) + nuv).clip(0, 65535 if is_hdr else 255
                                                   ).astype(uv.dtype)
        return y, uv

    # Per-dispatch overhead estimate: a trivial jitted call + forced
    # 1-element fetch measures the tunnel's full fixed cost per engine call
    # (dispatch RTT + fetch RTT) — the engine's recorded times each wrap ONE
    # jitted computation + one fetch, so this is the per-call constant a
    # real deployment host (µs dispatch) would not pay. Subtracting it feeds
    # the scaler device-representative times; slope-method agreement is
    # cross-checked against bench.py in PERF.md.
    @jax.jit
    def _noop(x):
        return x + 1

    probe = jax.device_put(jnp.zeros((4,), jnp.int32), dev)
    int(_noop(probe)[0])
    ts = []
    for _ in range(12):
        t0 = time.perf_counter()
        int(_noop(probe)[0])
        ts.append(time.perf_counter() - t0)
    rtt = float(np.median(ts))
    print(f"per-dispatch overhead estimate: {rtt * 1e3:.1f} ms "
          f"(subtracted per engine call)", flush=True)

    eng = OpticalFlowEngine(h, w, is_hdr=is_hdr)
    assert not args.batched_warp or eng.use_warp_band, \
        "--batched-warp needs the band route (else the RTT model is wrong)"
    scaler = AutoQualityScaler(enabled=True)
    frame_time = fps_to_frame_time(args.source_fps)
    outputs_per_source = args.target_fps / args.source_fps

    radii, ofc_ms, warp_ms = [], [], []
    blend = 0.0
    t_start = time.perf_counter()
    for i in range(args.frames):
        x = (i * 2) % span
        y, uv = slice_frame(jnp.int32(x), jnp.int32(i))
        eng.update_frame(y, uv)
        if eng.frame_count < 3:
            continue
        eng.calculate_optical_flow()
        eng.ofc_time.current = max(0.0, eng.ofc_time.current - rtt)
        # Cadence: 60/24 -> alternating 2/3 outputs per source frame.
        blend += outputs_per_source
        n_out = int(blend)
        blend -= n_out
        if args.batched_warp and n_out > 1:
            # One dispatch for the interval: the per-call RTT constant
            # amortizes over the batch (warp_time records per-output shares).
            eng.warp_frames_batch(
                [(j + 0.5) / n_out for j in range(n_out)], 2)
            eng.warp_time.current = max(
                0.0, eng.warp_time.current - rtt / n_out)
            for _ in range(n_out):
                scaler.add_warp_duration(eng.warp_time.current)
        else:
            for j in range(max(1, n_out)):
                eng.warp_frames((j + 0.5) / max(1, n_out), 2)
                eng.warp_time.current = max(0.0, eng.warp_time.current - rtt)
                scaler.add_warp_duration(eng.warp_time.current)
        new_r = scaler.adjust(eng.search_radius, eng.ofc_time.current,
                              frame_time)
        radii.append(eng.search_radius)
        ofc_ms.append(eng.ofc_time.current * 1e3)
        warp_ms.append(eng.warp_time.current * 1e3)
        eng.search_radius = new_r
        if i < 12 or i % 20 == 0:
            print(f"frame {i:4d}: radius {radii[-1]:2d} "
                  f"flow {ofc_ms[-1]:7.2f} ms warp {warp_ms[-1]:7.2f} ms "
                  f"apron {eng.warp_apron_used:3d} "
                  f"mispredicts {eng.plan_mispredicts}", flush=True)

    wall = time.perf_counter() - t_start
    tail = slice(len(radii) // 2, None)
    print("\n=== served-path summary ===")
    print(f"config {args.config} content {args.content} frames {args.frames} "
          f"wall {wall:.1f}s")
    print(f"radius trajectory: start {radii[0]} -> steady "
          f"{int(np.median(radii[tail]))} (min {min(radii)}, max {max(radii)})")
    vals, counts = np.unique(radii, return_counts=True)
    print("radius histogram:", dict(zip(vals.tolist(), counts.tolist())))
    print(f"steady-state flow: {np.median(ofc_ms[tail]):.2f} ms; "
          f"warp/output: {np.median(warp_ms[tail]):.2f} ms; "
          f"per source frame ~ "
          f"{np.median(ofc_ms[tail]) + outputs_per_source * np.median(warp_ms[tail]):.2f} ms "
          f"(budget {1e3 / args.source_fps:.2f} ms)")
    print(f"plan mispredicts: {eng.plan_mispredicts} over "
          f"{len(radii)} interpolated frames; plans settled: ")
    for k, p in sorted(eng._plans.items()):
        print(f"  bucket {k}: {''.join(t if len(t) == 1 else t.lower() for t in p)}")
    sys.exit(0)


if __name__ == "__main__":
    main()

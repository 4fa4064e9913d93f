"""Headline benchmark: 4K HDR P010 24->60 fps interpolation on one TPU chip.

Measures steady-state per-source-frame device cost = one pyramidal optical-flow
calculation + (target/source) warps, matching the reference's real-time constraint
"flow time + warp time < 1/source fps" (BASELINE.md; ref: README.md:81).

Timing methodology (IMPORTANT): on the tunneled axon platform, block_until_ready()
returns at dispatch, not completion — execution is only forced by a device->host
transfer. Each op is therefore timed by the SLOPE method: k data-dependent copies are
chained inside ONE jitted program whose 4-byte result is fetched; cost = (t(k2) -
t(k1)) / (k2 - k1). This subtracts all tunnel/dispatch/transfer overheads and measures
pure device time.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where vs_baseline is
the real-time budget ratio (1/24 s divided by the measured per-source-frame latency;
> 1 means faster than real time).

Flags:
  --config {4k-hdr,4k-sdr,1080p-sdr,480p-sdr}   (default 4k-hdr)
  --radius R        search radius (default 16 = worst case; auto-scaler range 5-16)
  --streams B       lockstep multi-stream batch (default 1)
  --k1/--k2         chain lengths for the slope (default 1 and 4)
  --warp {auto,band,strip}  warp kernel (auto = engine routing: Pallas band on
                    TPU when the geometry qualifies, else XLA strips)
  --json-only       suppress the human-readable breakdown on stderr
"""

from __future__ import annotations

import argparse
import functools
import json
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
    ap.add_argument("--radius", type=int, default=16)
    ap.add_argument("--streams", type=int, default=1)
    ap.add_argument("--k1", type=int, default=1)
    ap.add_argument("--k2", type=int, default=3)
    ap.add_argument("--warp", default="auto", choices=("auto", "band", "strip"))
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()
    cfg = CONFIGS[args.config]

    import jax
    import jax.numpy as jnp

    from hopperrender_tpu import config as hcfg
    from hopperrender_tpu.ops import flow as flow_ops
    from hopperrender_tpu.ops import flow_strip
    from hopperrender_tpu.ops import warp as warp_ops
    from hopperrender_tpu.ops import warp_band
    from hopperrender_tpu.ops import warp_strip
    from hopperrender_tpu.vio import nv12

    w, h, is_hdr = cfg["w"], cfg["h"], cfg["is_hdr"]
    B = args.streams
    rs, low_h, low_w = hcfg.calc_flow_dims(h, w, hcfg.MAX_CALC_RES)
    outputs_per_source = cfg["target_fps"] / cfg["source_fps"]
    rng = np.random.default_rng(0)
    use_strips = rs >= 1
    # The engine sizes the apron to the radius bucket (flow_engine.update_frame).
    num_layers = next(b for b in (5, 8, 12, 16) if args.radius <= b)
    apron = flow_strip.apron_for(low_h, low_w, num_layers)

    def make_batch(shift):
        ys, uvs = [], []
        for b in range(B):
            y, uv = nv12.synthetic_frame(rng, h, w, is_hdr=is_hdr, motion_x=shift + b)
            ys.append(y)
            uvs.append(uv)
        return (jax.device_put(jnp.asarray(np.stack(ys))),
                jax.device_put(jnp.asarray(np.stack(uvs))))

    f1y, f1uv = make_batch(0)
    f2y, f2uv = make_batch(2)
    flow_prev = jnp.zeros((B, 2, low_h, low_w), jnp.int16)
    salt_dtype = jnp.uint16 if is_hdr else jnp.uint8
    white = 65280.0 if is_hdr else 255.0
    radius = jnp.int32(args.radius)

    # Two separately-jitted chains (fusing a whole source-frame unit into one
    # program can fault the TPU runtime; the engine also runs these as separate
    # dispatches): A = per-source overheads (context builds + pyramid),
    # B = one warp. per_source = A + outputs_per_source * B.
    def flow_unit(y1, uv1, y2, uv2):
        if use_strips:
            ctx = flow_strip.build_frame_context(y1, uv1, apron=apron, is_hdr=is_hdr,
                                                 res_scalar=rs if rs <= 4 else None,
                                                 low_dims=(low_h, low_w))
            _, blurred, raw = flow_strip.pyramid_flow_strip(
                ctx, y2, uv2, radius, jnp.int32(8), jnp.int32(6),
                low_h=low_h, low_w=low_w, res_scalar=rs, is_hdr=is_hdr,
                num_layers=num_layers, apron=apron, dim_y=h, dim_x=w)
            c12 = warp_strip.build_warp_context(y1, uv1, apron=apron, is_hdr=is_hdr)
            extra = c12["wpad_y"][0, 0].astype(jnp.uint32)
        else:
            _, blurred, raw = flow_ops.pyramid_flow(
                y1, uv1, y2, uv2, radius, jnp.int32(8), jnp.int32(6),
                low_h=low_h, low_w=low_w, res_scalar=rs, is_hdr=is_hdr,
                num_layers=num_layers)
            extra = jnp.uint32(0)
        return raw + blurred[0, 0, 0].astype(jnp.uint32) + extra

    band_ok = use_strips and warp_band.band_geometry_ok(
        res_scalar=rs, is_hdr=is_hdr, dim_y=h, dim_x=w, apron=apron)
    use_band = args.warp == "band" or (
        args.warp == "auto" and band_ok and jax.devices()[0].platform == "tpu")

    def warp_unit(i12, i21, fl_prev, t):
        if use_band:
            oy, ouv = warp_band.warp_frame_band(
                i12, i21, fl_prev, t, jnp.float32(0.0), jnp.float32(white),
                res_scalar=rs, mode=2, is_hdr=is_hdr, dim_y=h, dim_x=w, apron=apron)
        elif use_strips:
            oy, ouv = warp_strip.warp_frame_strip(
                i12, i21, fl_prev, t, jnp.float32(0.0), jnp.float32(white),
                res_scalar=rs, mode=2, is_hdr=is_hdr, dim_y=h, dim_x=w, apron=apron)
        else:
            oy, ouv = warp_ops.warp_frame(
                *i12, *i21, fl_prev, t, jnp.float32(0.0), jnp.float32(white),
                res_scalar=rs, mode=2, is_hdr=is_hdr)
        return jnp.sum(oy[0, :8].astype(jnp.uint32)) + jnp.sum(
            ouv[0, :8].astype(jnp.uint32))

    @functools.partial(jax.jit, static_argnames=("k",))
    def flow_chain(salt, *, k: int):
        acc = jnp.uint32(salt)
        for _ in range(k):
            y1 = f1y + (acc % 2).astype(salt_dtype)
            if B == 1:  # vmap changes gather lowering; match the engine's B=1 path
                r = flow_unit(y1[0], f1uv[0], f2y[0], f2uv[0])
            else:
                r = jnp.sum(jax.vmap(flow_unit)(y1, f1uv, f2y, f2uv))
            acc = jax.lax.optimization_barrier(acc + r)
        return acc

    @functools.partial(jax.jit, static_argnames=("k",))
    def warp_chain(salt, *, k: int):
        # Contexts are built IN-CHAIN (building once and passing device pytrees as
        # arguments measures pathologically on this platform); the slope therefore
        # includes one pair of warp-context builds per warp — a conservative
        # overcount (the engine builds them once per SOURCE frame).
        acc = jnp.uint32(salt)
        fl = flow_prev
        def one(y1, uv1, y2, uv2, f, t):
            if use_strips:
                c12 = warp_strip.build_warp_context(y1, uv1, apron=apron,
                                                    is_hdr=is_hdr)
                c21 = warp_strip.build_warp_context(y2, uv2, apron=apron,
                                                    is_hdr=is_hdr)
                return warp_unit(c12, c21, f, t)
            return warp_unit((y1, uv1), (y2, uv2), f, t)
        for i in range(k):
            fl = fl + (acc % 2).astype(jnp.int16)
            t = jnp.float32(0.1 + 0.3 * (i % 3))
            y1 = f1y + (acc % 2).astype(salt_dtype)
            if B == 1:
                r = one(y1[0], f1uv[0], f2y[0], f2uv[0], fl[0], t)
            else:
                r = jnp.sum(jax.vmap(lambda a, b, c, d, f: one(a, b, c, d, f, t))(
                    y1, f1uv, f2y, f2uv, fl))
            acc = jax.lax.optimization_barrier(acc + r)
        return acc

    def slope_ms(chain, k1, k2, reps=2):
        salt = 0
        for attempt in range(3):
            times = {}
            for k in (k1, k2):
                int(chain(salt, k=k))  # compile + warm
                salt += 1
                best = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    int(chain(salt, k=k))
                    salt += 1
                    best = min(best, time.perf_counter() - t0)
                times[k] = best
            ms = (times[k2] - times[k1]) / (k2 - k1) * 1e3
            if ms > 0:
                return ms
            print(f"slope attempt {attempt}: non-positive ({ms:.1f} ms), retrying "
                  f"(tunnel jitter / worker restart)", file=sys.stderr)
        # Fall back to a conservative upper bound: full k2 wall time per unit.
        return times[k2] / k2 * 1e3

    flow_ms = slope_ms(flow_chain, args.k1, args.k2)
    warp_ms = slope_ms(warp_chain, args.k1, args.k2)
    per_source_ms = (flow_ms + outputs_per_source * warp_ms) / B
    budget_ms = 1e3 / cfg["source_fps"]
    suffix = f"_x{B}streams" if B > 1 else ""
    result = {
        "metric": f"{args.config}{suffix}_flow_plus_warp_per_source_frame",
        "value": round(per_source_ms, 3),
        "unit": "ms",
        "vs_baseline": round(budget_ms / per_source_ms, 3),
    }
    if not args.json_only:
        print(
            f"[{args.config} x{B}] {w}x{h} {'HDR' if is_hdr else 'SDR'} radius "
            f"{args.radius} {'strip' if use_strips else 'reference'} path on "
            f"{jax.devices()[0]} (slope k={args.k1}->{args.k2})\n"
            f"  flow+ctx {flow_ms:.3f} ms; warp+wctx {warp_ms:.3f} ms\n"
            f"  per source frame (ctx builds + flow + {outputs_per_source:.1f} warps):"
            f" {per_source_ms:8.3f} ms/stream "
            f"(budget {budget_ms:.3f} ms, {budget_ms / per_source_ms:.2f}x realtime)",
            file=sys.stderr,
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()

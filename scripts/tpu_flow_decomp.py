"""Flow cost decomposition on chip (round 5).

The reproducible flow+ctx term is 9.5 ± 1.2 ms/source at 4K HDR (PERF.md
round-5 table) against ~1.6 ms of pure U-step compute (16 steps x 0.10 ms,
round-3 chip probes) — this probe splits the rest:

  ctx     build_frame_context alone (the per-source flow context: pads,
          phase decimations, low-res planes)
  flow    ctx + planned pyramid + blur + sig (bench.py's flow_unit — the
          served per-source dispatch)
  blur    blur_flow + the sig bound/probe math alone
  wctx    warp-context build+pack (bench.py's wctx_unit, for the same-run
          comparison)

pyramid-only ~= flow - ctx (the ctx build inside flow_unit is salted per
iteration exactly like the engine pays it per ingested frame).

Usage: python scripts/tpu_flow_decomp.py [--config 4k-hdr] [--radius 16]
Each measurement prints one JSON line immediately (crash-tolerant).
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from hopperrender_tpu.utils import compile_cache
compile_cache.enable()

from hopperrender_tpu.engine.flow_engine import OpticalFlowEngine
from hopperrender_tpu.ops import flow as flow_ops
from hopperrender_tpu.vio import nv12

CONFIGS = {
    "4k-hdr": dict(w=3840, h=2160, is_hdr=True),
    "4k-sdr": dict(w=3840, h=2160, is_hdr=False),
    "1080p-sdr": dict(w=1920, h=1080, is_hdr=False),
    "480p-sdr": dict(w=854, h=480, is_hdr=False),
}


def emit(name, ms, **extra):
    print(json.dumps(dict({"probe": name, "ms": round(ms, 3)}, **extra)),
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="4k-hdr", choices=sorted(CONFIGS))
    ap.add_argument("--radius", type=int, default=16)
    ap.add_argument("--k1", type=int, default=1)
    ap.add_argument("--k2", type=int, default=3)
    args = ap.parse_args()
    cfg = CONFIGS[args.config]
    h, w, is_hdr = cfg["h"], cfg["w"], cfg["is_hdr"]

    rng = np.random.default_rng(0)
    y1, uv1 = nv12.synthetic_frame(rng, h, w, is_hdr=is_hdr, motion_x=0,
                                   coherent=True)
    y2, uv2 = nv12.synthetic_frame(rng, h, w, is_hdr=is_hdr, motion_x=2,
                                   coherent=True)
    y1, uv1, y2, uv2 = map(lambda a: jax.device_put(jnp.asarray(a)),
                           (y1, uv1, y2, uv2))
    salt_dtype = jnp.uint16 if is_hdr else jnp.uint8

    engine = OpticalFlowEngine(h, w, is_hdr=is_hdr)
    engine.search_radius = args.radius
    engine._refresh_geometry()
    plan = engine.settle_plan(y1, uv1, y2, uv2)
    print(f"# {args.config} r{args.radius} plan "
          f"{''.join(t if len(t) == 1 else t.lower() for t in plan)} "
          f"on {jax.devices()[0]}", file=sys.stderr)
    flow_unit, warp_unit, wctx_unit, _ = engine.bench_units()

    def slope_ms(chain, k1=args.k1, k2=args.k2, reps=2):
        salt = 0
        times = {}
        for attempt in range(3):
            times = {}
            for k in (k1, k2):
                int(chain(salt, k=k))
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
            print(f"# slope non-positive ({ms:.2f}), retry {attempt}",
                  file=sys.stderr)
        return times[k2] / k2 * 1e3

    @functools.partial(jax.jit, static_argnames=("k",))
    def ctx_chain(salt, *, k):
        acc = jnp.uint32(salt)
        for _ in range(k):
            yy = y1 + (acc % 2).astype(salt_dtype)
            ctx = engine._build_ctx(yy, uv1)
            for leaf in jax.tree.leaves(ctx):
                acc = acc + jnp.sum(leaf.astype(jnp.uint32))
            acc = jax.lax.optimization_barrier(acc)
        return acc

    @functools.partial(jax.jit, static_argnames=("k",))
    def flow_chain(salt, *, k):
        acc = jnp.uint32(salt)
        for _ in range(k):
            yy = y1 + (acc % 2).astype(salt_dtype)
            acc = jax.lax.optimization_barrier(
                acc + flow_unit(yy, uv1, y2, uv2))
        return acc

    low_h, low_w = engine.low_h, engine.low_w
    flow0 = jnp.asarray(
        np.broadcast_to(np.array([2, 0], np.int16)[None, :, None, None],
                        (1, 2, low_h, low_w))[0].copy())

    @functools.partial(jax.jit, static_argnames=("k",))
    def blur_chain(salt, *, k):
        acc = jnp.uint32(salt)
        fl = flow0
        for _ in range(k):
            fl = fl + (acc % 2).astype(jnp.int16)
            blurred = flow_ops.blur_flow(fl)
            bound = jnp.max(jnp.abs(blurred.astype(jnp.int32)))
            acc = jax.lax.optimization_barrier(
                acc + bound.astype(jnp.uint32)
                + blurred[0, 0, 0].astype(jnp.uint32))
        return acc

    @functools.partial(jax.jit, static_argnames=("k",))
    def wctx_chain(salt, *, k):
        acc = jnp.uint32(salt)
        for _ in range(k):
            yy = y1 + (acc % 2).astype(salt_dtype)
            acc = jax.lax.optimization_barrier(acc + wctx_unit(yy, uv1))
        return acc

    # Pyramid-internal attribution: the planned pyramid with per-step pieces
    # stubbed (timing probes only — outputs/sig invalid; flow_strip
    # debug_skip docstring). pyramid-only ~= flow - ctx; counters cost ~=
    # flow - flow_no_counters; winners (argmin+adjust) ~= flow - flow_no_winners.
    from hopperrender_tpu.ops import flow_strip

    plan_t = engine._plans.get(engine._plan_key())
    scalars = (jnp.int32(args.radius), jnp.int32(engine.delta_scalar),
               jnp.int32(engine.neighbor_scalar))
    pkw = dict(low_h=low_h, low_w=low_w, res_scalar=engine.res_scalar,
               is_hdr=is_hdr, num_layers=engine._bucket, apron=engine._apron,
               dim_y=h, dim_x=w, num_iterations=engine.num_iterations)

    def pyr_chain(skip):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(salt, *, k):
            acc = jnp.uint32(salt)
            for _ in range(k):
                yy = y1 + (acc % 2).astype(salt_dtype)
                ctx = engine._build_ctx(yy, uv1)
                off, blurred, raw, sig = flow_strip.pyramid_flow_strip_planned(
                    ctx, y2, uv2, *scalars, plan=plan_t, debug_skip=skip,
                    **pkw)
                acc = jax.lax.optimization_barrier(
                    acc + raw + blurred[0, 0, 0].astype(jnp.uint32)
                    + jnp.sum(sig).astype(jnp.uint32))
            return acc
        return chain

    probes = [("ctx", ctx_chain), ("flow", flow_chain),
              ("blur", blur_chain), ("wctx", wctx_chain)]
    if plan_t is not None:
        probes += [("flow_no_counters", pyr_chain(("counters",))),
                   ("flow_no_winners", pyr_chain(("winners",))),
                   ("flow_sums_only", pyr_chain(("counters", "winners")))]
    for name, chain in probes:
        ms = slope_ms(chain)
        emit(name, ms)


if __name__ == "__main__":
    try:
        main()
    except BaseException as exc:  # noqa: BLE001 — keep completed lines useful
        print(json.dumps({"probe": "FAILED",
                          "error": f"{type(exc).__name__}: {exc}"[:300]}),
              flush=True)
        raise

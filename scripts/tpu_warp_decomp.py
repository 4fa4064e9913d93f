"""Warp cost decomposition + kernel-variant A/B on chip (round 5).

The driver-reproducible warp term is ~14.2 ms/output at 4K HDR and is
radius-independent, chain-bounds-independent, and ~linear in the batch size T
(PERF.md round-5 table) — the signatures of a per-group fixed cost inside the
band kernel, not DMA and not table size. This probe separates the terms the
slope method can isolate:

  prep1 / prepT   XLA table build only (debug_prep_only), scalar / batched T
  kern1 / kernT   kernel only: lev-salted chain over a FIXED flow — the table
                  subgraph is iteration-invariant so XLA CSE hoists it; only
                  the Pallas launches repeat
  full1 / fullT   tables + kernel (the bench accounting), salted flow

and A/Bs the kernel-only variants:

  unroll N        group-loop unroll (interleaves independent latency chains)
  force_fast      skip the per-group fast/slow lax.cond (prices the branch)
  chains (8,8)    shorter select chains (prices chain length honestly —
                  the round-3 A/B measured totals, masked by prep cost)

Usage: python scripts/tpu_warp_decomp.py [--config 4k-hdr] [--radius 16]
       [--t-batch 5] [--quick]
Each measurement prints one JSON line immediately (crash-tolerant: a mid-run
TPU fault keeps every completed number).

Also the bucket-5 fault repro: both round-5 queue crashes ("TPU worker
process crashed") happened in the radius-5 bucket's batched warp — run with
--radius 5 to reproduce/bisect.
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

from hopperrender_tpu import config as hcfg
from hopperrender_tpu.engine.flow_engine import OpticalFlowEngine
from hopperrender_tpu.ops import warp_band
from hopperrender_tpu.vio import nv12

CONFIGS = {
    "4k-hdr": dict(w=3840, h=2160, is_hdr=True),
    "4k-sdr": dict(w=3840, h=2160, is_hdr=False),
    "1080p-sdr": dict(w=1920, h=1080, is_hdr=False),
    "480p-sdr": dict(w=854, h=480, is_hdr=False),
    # CPU smoke (--interpret): forced rs=2/apron=32 like tests/test_warp_band
    # (the engine would derive rs=0, which the band kernel doesn't support).
    "micro": dict(w=128, h=64, is_hdr=False, force_rs=2, force_apron=32),
}


def emit(name, ms, **extra):
    print(json.dumps(dict({"probe": name, "ms": round(ms, 3)}, **extra)),
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="4k-hdr", choices=sorted(CONFIGS))
    ap.add_argument("--radius", type=int, default=16)
    ap.add_argument("--t-batch", type=int, default=5)
    ap.add_argument("--k1", type=int, default=1)
    ap.add_argument("--k2", type=int, default=3)
    ap.add_argument("--quick", action="store_true",
                    help="core decomposition only, skip the variant sweep")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke test (interpret-mode kernel; timings"
                         " meaningless)")
    ap.add_argument("--chains", type=int, default=0,
                    help="force chain bounds (N, N) instead of the served"
                         " plan's choice — the r5 crash bisection axis: all"
                         " crashing configs ran (32,32), the passing repro"
                         " ran (16,16)")
    ap.add_argument("--repro", action="store_true",
                    help="fault bisection: run single warps (no slope) in"
                         " order of increasing scope — scalar Y-only, scalar,"
                         " batched Y-only, batched — printing a line before"
                         " and after each, so a TPU worker crash pinpoints"
                         " the faulting configuration (round-5 r5 crashes)")
    args = ap.parse_args()
    cfg = CONFIGS[args.config]
    h, w, is_hdr = cfg["h"], cfg["w"], cfg["is_hdr"]
    T = args.t_batch

    rng = np.random.default_rng(0)
    y1, uv1 = nv12.synthetic_frame(rng, h, w, is_hdr=is_hdr, motion_x=0,
                                   coherent=True)
    y2, uv2 = nv12.synthetic_frame(rng, h, w, is_hdr=is_hdr, motion_x=2,
                                   coherent=True)
    y1, uv1, y2, uv2 = map(lambda a: jax.device_put(jnp.asarray(a)),
                           (y1, uv1, y2, uv2))

    if "force_rs" in cfg:    # micro smoke: bypass the engine's geometry
        from hopperrender_tpu.ops import warp_strip
        rs, apron = cfg["force_rs"], cfg["force_apron"]
        low_h, low_w = h >> rs, w >> rs
        cb_default = (16, 16)
        apron_eff = apron
        build = lambda yy, uu: warp_band.pack_band_context(
            warp_strip.build_warp_context(yy, uu, apron=apron, is_hdr=is_hdr),
            res_scalar=rs, is_hdr=is_hdr, dim_y=h, dim_x=w, apron=apron)
        w0, w1 = build(y1, uv1), build(y2, uv2)
    else:
        engine = OpticalFlowEngine(h, w, is_hdr=is_hdr)
        engine.search_radius = args.radius
        engine._refresh_geometry()
        assert engine.use_warp_band, "band kernel not routed for this config"
        apron = engine._apron
        rs = engine.res_scalar
        low_h, low_w = engine.low_h, engine.low_w
        # Served bound = the content's maxabs (pan flow (2,0)): picks the
        # (16,16) chains serving runs on this content (see bench.py).
        bound = 2
        cb_default = engine._band_plan(bound, apron)
        if args.chains:
            cb_default = (args.chains, args.chains)
        apron_eff = engine.warp_apron_used
        w0 = engine._build_wctx(y1, uv1)
        w1 = engine._build_wctx(y2, uv2)
    flow_np = np.broadcast_to(np.array([2, 0], np.int16)[None, :, None, None],
                              (1, 2, low_h, low_w))[0].copy()
    flow0 = jnp.asarray(flow_np)
    black = 16.0 * (256 if is_hdr else 1)
    white = 235.0 * (256 if is_hdr else 1)
    jax.block_until_ready(jax.tree.leaves(w1)[0])
    print(f"# {args.config} r{args.radius} apron {apron} apron_eff "
          f"{apron_eff} chains {cb_default} rs {rs} T {T} "
          f"on {jax.devices()[0]}", file=sys.stderr)

    wkw = dict(res_scalar=rs, is_hdr=is_hdr, dim_y=h, dim_x=w, apron=apron,
               apron_eff=apron_eff, mode=2, interpret=args.interpret)

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

    if args.repro:
        def once(name, ts_val, fl=None, **kw2):
            print(json.dumps({"repro": name, "state": "start"}), flush=True)
            y, uv = warp_band.warp_frame_band(
                w0, w1, flow0 if fl is None else fl, ts_val,
                jnp.float32(black), jnp.float32(white),
                chain_bounds=cb_default, **kw2, **wkw)
            v = int(jnp.sum(y[..., 0, :8].astype(jnp.uint32)))
            print(json.dumps({"repro": name, "state": "ok", "sum": v}),
                  flush=True)

        Tv = (jnp.arange(T, dtype=jnp.float32) + 0.5) / T
        once("scalar_y_only", jnp.float32(0.375), debug_y_only=True)
        once("scalar_uv_only", jnp.float32(0.375), debug_uv_only=True)
        once("scalar_full", jnp.float32(0.375))
        # Plane x batch-size sweep (queue-3 bisection: r5 T=2 all-passed,
        # T=3 Y-only passed, T=3 full CRASHED -> suspect = UV kernel, T>=3).
        for tb in (2, 3, 4, 5):
            tv = (jnp.arange(tb, dtype=jnp.float32) + 0.5) / tb
            once(f"batchT{tb}_y_only", tv, debug_y_only=True)
            once(f"batchT{tb}_uv_only", tv, debug_uv_only=True)
            once(f"batchT{tb}_full", tv)
        # The served shape: repeated dispatches of the same executable with
        # slightly varying flow (the streamed crash was on frame 3+, not the
        # first call).
        for i in range(8):
            once(f"batchT{T}_repeat{i}", Tv, fl=flow0 + np.int16(i % 3))

        # The bench's exact crash shape: k batched warps CHAINED inside one
        # jitted program (tables rebuilt per iteration from a drifting flow).
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(salt, *, k):
            acc = jnp.uint32(salt)
            fl = flow0
            for _ in range(k):
                fl = fl + (acc % 2).astype(jnp.int16)
                y, uv = warp_band.warp_frame_band(
                    w0, w1, fl, Tv, jnp.float32(black), jnp.float32(white),
                    chain_bounds=cb_default, **wkw)
                acc = jax.lax.optimization_barrier(
                    acc + jnp.sum(y[..., 0, :8].astype(jnp.uint32)))
            return acc

        for k in (1, 3):
            print(json.dumps({"repro": f"chain_k{k}", "state": "start"}),
                  flush=True)
            v = int(chain(7, k=k))
            print(json.dumps({"repro": f"chain_k{k}", "state": "ok",
                              "sum": v}), flush=True)
        print(json.dumps({"repro": "ALL_PASSED"}), flush=True)
        return

    def warp_call(fl, ts, blk, *, prep=False, unroll=1, ff=False, cb=None):
        y, uv = warp_band.warp_frame_band(
            w0, w1, fl, ts, jnp.float32(blk), jnp.float32(white),
            chain_bounds=cb or cb_default, debug_prep_only=prep,
            kernel_unroll=unroll, force_fast=ff, **wkw)
        return (jnp.sum(y[..., 0, :8].astype(jnp.uint32))
                + jnp.sum(uv[..., 0, :8].astype(jnp.uint32)))

    def make_ts(t_batch):
        if t_batch == 1:
            return jnp.float32(0.375)
        return (jnp.arange(t_batch, dtype=jnp.float32) + 0.5) / t_batch

    # --- salted-flow chains: tables rebuilt every iteration -----------------
    def flow_salted_chain(t_batch, *, prep=False, unroll=1, ff=False, cb=None):
        ts = make_ts(t_batch)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(salt, *, k):
            acc = jnp.uint32(salt)
            fl = flow0
            for _ in range(k):
                fl = fl + (acc % 2).astype(jnp.int16)
                r = warp_call(fl, ts, black, prep=prep, unroll=unroll,
                              ff=ff, cb=cb)
                acc = jax.lax.optimization_barrier(acc + r)
            return acc

        return chain

    # --- lev-salted chains: FIXED flow, tables CSE-hoisted -> kernel only ---
    def lev_salted_chain(t_batch, *, unroll=1, ff=False, cb=None):
        ts = make_ts(t_batch)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(salt, *, k):
            acc = jnp.uint32(salt)
            for _ in range(k):
                blk = black + (acc % 2).astype(jnp.float32)
                r = warp_call(flow0, ts, blk, unroll=unroll, ff=ff, cb=cb)
                acc = jax.lax.optimization_barrier(acc + r)
            return acc

        return chain

    # Core decomposition. Per-output normalization: /T for batched.
    core = [
        ("prep1", flow_salted_chain(1, prep=True), 1),
        ("full1", flow_salted_chain(1), 1),
        ("kern1", lev_salted_chain(1), 1),
        (f"prepT{T}", flow_salted_chain(T, prep=True), T),
        (f"fullT{T}", flow_salted_chain(T), T),
        (f"kernT{T}", lev_salted_chain(T), T),
    ]
    for name, chain, t_batch in core:
        ms = slope_ms(chain)
        emit(name, ms, per_output_ms=round(ms / t_batch, 3))

    if args.quick:
        return

    # Kernel-variant sweep (kernel-only accounting, batched T).
    for unroll in (2, 4, 8):
        ms = slope_ms(lev_salted_chain(T, unroll=unroll))
        emit(f"kernT{T}_unroll{unroll}", ms, per_output_ms=round(ms / T, 3))
    ms = slope_ms(lev_salted_chain(T, ff=True))
    emit(f"kernT{T}_forcefast", ms, per_output_ms=round(ms / T, 3))
    ms = slope_ms(lev_salted_chain(T, ff=True, unroll=4))
    emit(f"kernT{T}_ff_unroll4", ms, per_output_ms=round(ms / T, 3))
    ms = slope_ms(lev_salted_chain(T, cb=(8, 8)))
    emit(f"kernT{T}_chains8", ms, per_output_ms=round(ms / T, 3))
    ms = slope_ms(lev_salted_chain(T, cb=(32, 32)))
    emit(f"kernT{T}_chains32", ms, per_output_ms=round(ms / T, 3))
    # Full-path (tables + kernel) at the best-guess variant, for the bench
    # operating-point projection.
    ms = slope_ms(flow_salted_chain(T, unroll=4))
    emit(f"fullT{T}_unroll4", ms, per_output_ms=round(ms / T, 3))


if __name__ == "__main__":
    try:
        main()
    except BaseException as exc:  # noqa: BLE001 — keep completed lines useful
        print(json.dumps({"probe": "FAILED",
                          "error": f"{type(exc).__name__}: {exc}"[:300]}),
              flush=True)
        raise

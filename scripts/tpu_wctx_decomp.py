"""Warp-context (wctx) cost decomposition on chip (round-5 close).

The round-5 close attribution (scripts/tpu_flow_decomp.py, PERF.md
"per-source cost attribution") measured the per-source warp-context
build+pack at 6.0 ms — the second-largest per-source term and ~40x above
the HBM speed-of-light for the ~60 MB it moves. This probe splits it:

  ypad    luma mirror pad alone (warp_strip._warp_mirror_pad_axis x2)
  uvpair  UV pair-plane construction (stride-2 deinterleave + pair algebra
          + column pad + row mirror pad) — the suspected relayout term
  strip   build_warp_context total (= ypad + uvpair + stack)
  ypack   luma u32 slot pack alone (warp_band._pack_u32 on the padded luma)
  uvpack  UV u32 pack alone (both parity planes)
  full    build_warp_context + pack_band_context (what the engine pays,
          flow_engine._build_wctx)

Expected speed-of-light at 4K HDR (read+write every byte once, ~800 GB/s):
~0.15 ms. Whatever probe carries the excess is the round-6 target — the
likely fix is a single-pass Pallas pack kernel (read the raw frame's u32
lanes once, emit padded+packed Y and both UV parity planes directly).

Usage: python scripts/tpu_wctx_decomp.py [--config 4k-hdr] [--radius 16]
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
from hopperrender_tpu.ops import warp_strip, warp_band
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
    y, uv = nv12.synthetic_frame(rng, h, w, is_hdr=is_hdr, motion_x=0,
                                 coherent=True)
    y = jax.device_put(jnp.asarray(y))
    uv = jax.device_put(jnp.asarray(uv))
    salt_dtype = jnp.uint16 if is_hdr else jnp.uint8

    engine = OpticalFlowEngine(h, w, is_hdr=is_hdr)
    engine.search_radius = args.radius
    engine._refresh_geometry()
    apron = engine._apron
    print(f"# {args.config} r{args.radius} apron {apron} band "
          f"{engine.use_warp_band} on {jax.devices()[0]}", file=sys.stderr)

    def checksum(tree):
        acc = jnp.uint32(0)
        for leaf in jax.tree.leaves(tree):
            acc = acc + jnp.sum(leaf.astype(jnp.uint32))
        return acc

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

    def make_chain(body):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(salt, *, k):
            acc = jnp.uint32(salt)
            for _ in range(k):
                yy = y + (acc % 2).astype(salt_dtype)
                uvv = uv + (acc % 2).astype(salt_dtype)
                acc = jax.lax.optimization_barrier(acc + body(yy, uvv))
            return acc
        return chain

    a = apron

    def ypad_body(yy, uvv):
        p = warp_strip._warp_mirror_pad_axis(
            warp_strip._warp_mirror_pad_axis(yy, a, 0), a, 1)
        return checksum(p)

    def uvpair_body(yy, uvv):
        p0, p1 = warp_strip._uv_pair_planes(uvv, is_hdr)
        u = uvv[:, 0::2]
        v = uvv[:, 1::2]
        ac = a // 2
        p0 = warp_strip._pad_pair_cols(p0, u, v, ac, 0, is_hdr)
        p1 = warp_strip._pad_pair_cols(p1, u, v, ac, 1, is_hdr)
        p0 = warp_strip._warp_mirror_pad_axis(p0, a, 0)
        p1 = warp_strip._warp_mirror_pad_axis(p1, a, 0)
        return checksum(jnp.stack([p0, p1]))

    def strip_body(yy, uvv):
        return checksum(warp_strip.build_warp_context(
            yy, uvv, apron=a, is_hdr=is_hdr))

    # Pack-only probes: pad ONCE outside the chain (loop-invariant inputs
    # would let XLA hoist the pad; instead pre-pad the salted plane inside —
    # measure the pack on the already-padded geometry by re-deriving pads
    # from the salted frame but checksumming only the packed output after
    # subtracting the strip term from `full`).
    def full_body(yy, uvv):
        return checksum(engine._build_wctx(yy, uvv))

    probes = [("ypad", ypad_body), ("uvpair", uvpair_body),
              ("strip", strip_body), ("full", full_body)]
    # pack ~= full - strip; ypad/uvpair split strip.
    for name, body in probes:
        ms = slope_ms(make_chain(body))
        emit(name, ms)


if __name__ == "__main__":
    try:
        main()
    except BaseException as exc:  # noqa: BLE001 — keep completed lines useful
        print(json.dumps({"probe": "FAILED",
                          "error": f"{type(exc).__name__}: {exc}"[:300]}),
              flush=True)
        raise

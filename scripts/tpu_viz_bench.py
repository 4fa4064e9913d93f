"""Slope-timed visualization output modes on the real chip (VERDICT r4 #7).

Times the engine's OWN warp unit (bench_units) at 4K r16 for every output
mode the reference's warpFrameKernel supports (ref: warpFrameKernelSDR.h):
  2 = blended warp (the production baseline the viz modes are priced against)
  3 = HSV flow visualization (float hue math + half-blend on Y)
  4 = grey flow (pure structured math, no source samples)
  5 = side-by-side full res (source copy | mode-2 concat)
  6 = side-by-side 2x scaled with black border (structured Y over the mode-2
      output + V-only quarter-band gather UV — the round-5 rework)

Usage: python scripts/tpu_viz_bench.py [4k-hdr|4k-sdr] [radius]
Prints one line per mode: warp ms/output (slope method, k=1->3).
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from hopperrender_tpu.utils import compile_cache
compile_cache.enable()
from hopperrender_tpu import config as hcfg
from hopperrender_tpu.engine.flow_engine import OpticalFlowEngine
from hopperrender_tpu.vio import nv12

cfgname = sys.argv[1] if len(sys.argv) > 1 else "4k-hdr"
radius = int(sys.argv[2]) if len(sys.argv) > 2 else 16
W, H, is_hdr = (3840, 2160, cfgname == "4k-hdr")
rs, low_h, low_w = hcfg.calc_flow_dims(H, W, hcfg.MAX_CALC_RES)
rng = np.random.default_rng(0)
y1, uv1 = nv12.synthetic_frame(rng, H, W, is_hdr=is_hdr, motion_x=0)
y2, uv2 = nv12.synthetic_frame(rng, H, W, is_hdr=is_hdr, motion_x=2)
f1y, f1uv = jnp.asarray(y1), jnp.asarray(uv1)
f2y, f2uv = jnp.asarray(y2), jnp.asarray(uv2)
# Converged panning flow (the band/strip fast path — same as bench.py default).
flow_prev = jnp.asarray(np.broadcast_to(
    np.array([2, 0], np.int16)[:, None, None], (2, low_h, low_w)).copy())
salt_dtype = jnp.uint16 if is_hdr else jnp.uint8

engine = OpticalFlowEngine(H, W, is_hdr=is_hdr)
engine.search_radius = radius
engine.settle_plan(f1y, f1uv, f2y, f2uv)
engine._flow_bounds = [5, 5]
_, warp_unit, _, _ = engine.bench_units()
print(f"device: {jax.devices()[0]}; {cfgname} r{radius} "
      f"band={engine.use_warp_band}", flush=True)


def slope_ms(chain, k1=1, k2=3, reps=2):
    salt = 0
    for _ in range(3):
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
    return times[k2] / k2 * 1e3


for mode in (2, 3, 4, 5, 6):
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(salt, *, k: int, _mode=mode):
        acc = jnp.uint32(salt)
        fl = flow_prev
        for i in range(k):
            fl = fl + (acc % 2).astype(jnp.int16)
            t = jnp.float32(0.1 + 0.3 * (i % 3))
            r = warp_unit(f1y, f1uv, f2y, f2uv, fl, t, mode=_mode)
            acc = jax.lax.optimization_barrier(acc + r)
        return acc

    ms = slope_ms(chain)
    print(f"mode {mode}: {ms:7.2f} ms/output", flush=True)

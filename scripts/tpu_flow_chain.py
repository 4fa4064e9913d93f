"""Chained-pyramid crash bisection + slope timing on the real chip.

The bench chains k pyramids in one jit (slope method); a chained run at 4K HDR
crashed the TPU worker while single runs pass. This script reproduces with
explicit control of k and the uniform tier, and doubles as the flow slope
bench when it survives.

Usage: python scripts/tpu_flow_chain.py [4k-hdr] [radius] [k] [nouniform]
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
from hopperrender_tpu.ops import flow_strip
from hopperrender_tpu.vio import nv12

cfgname = sys.argv[1] if len(sys.argv) > 1 else "4k-hdr"
radius = int(sys.argv[2]) if len(sys.argv) > 2 else 16
kmax = int(sys.argv[3]) if len(sys.argv) > 3 else 3
uniform = "nouniform" not in sys.argv
W, H, is_hdr = (3840, 2160, True) if cfgname == "4k-hdr" else (1920, 1080, False)
rs, low_h, low_w = hcfg.calc_flow_dims(H, W, hcfg.MAX_CALC_RES)
bucket = next(b for b in (5, 8, 12, 16) if radius <= b)
apron = flow_strip.apron_for(low_h, low_w, bucket)
rng = np.random.default_rng(0)
y1, uv1 = nv12.synthetic_frame(rng, H, W, is_hdr=is_hdr, motion_x=0, coherent=True)
y2, uv2 = nv12.synthetic_frame(rng, H, W, is_hdr=is_hdr, motion_x=3, coherent=True)
f1y, f1uv = jnp.asarray(y1), jnp.asarray(uv1)
f2y, f2uv = jnp.asarray(y2), jnp.asarray(uv2)
salt_dtype = jnp.uint16 if is_hdr else jnp.uint8
print(f"device {jax.devices()[0]} r{radius} bucket {bucket} apron {apron} "
      f"uniform_tier={uniform}", flush=True)


@functools.partial(jax.jit, static_argnames=("k",))
def chain(salt, *, k: int):
    acc = jnp.uint32(salt)
    for _ in range(k):
        y1s = f1y + (acc % 2).astype(salt_dtype)
        ctx = flow_strip.build_frame_context(
            y1s, f1uv, apron=apron, is_hdr=is_hdr,
            res_scalar=rs if rs <= 4 else None, low_dims=(low_h, low_w))
        _, blurred, raw = flow_strip.pyramid_flow_strip(
            ctx, f2y, f2uv, jnp.int32(radius), jnp.int32(8), jnp.int32(6),
            low_h=low_h, low_w=low_w, res_scalar=rs, is_hdr=is_hdr,
            num_layers=bucket, apron=apron, dim_y=H, dim_x=W,
            uniform_tier=uniform)
        acc = jax.lax.optimization_barrier(
            acc + raw + blurred[0, 0, 0].astype(jnp.uint32))
    return acc


times = {}
salt = 0
for k in range(1, kmax + 1):
    t0 = time.perf_counter()
    v = int(chain(salt, k=k)); salt += 1
    print(f"k={k} compile+run {time.perf_counter()-t0:.1f}s ok (acc={v})",
          flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        int(chain(salt, k=k)); salt += 1
        best = min(best, time.perf_counter() - t0)
    times[k] = best
    print(f"k={k} best {best*1e3:.1f} ms", flush=True)
if kmax >= 3:
    print(f"slope flow+ctx: {(times[kmax]-times[1])/(kmax-1)*1e3:.2f} ms",
          flush=True)

"""Slope-time ONE pyramid step kernel on the chip: uniform / strip / patch /
tail-only variants, to locate where the per-step time lives.

Usage: python scripts/tpu_step_bench.py [variant] [window] [radius] [k2]
variants: uniform | strip | patch | tail
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

variant = sys.argv[1] if len(sys.argv) > 1 else "uniform"
window = int(sys.argv[2]) if len(sys.argv) > 2 else 2
radius = int(sys.argv[3]) if len(sys.argv) > 3 else 16
k2 = int(sys.argv[4]) if len(sys.argv) > 4 else 5
W, H, is_hdr = 3840, 2160, True
rs, low_h, low_w = hcfg.calc_flow_dims(H, W, hcfg.MAX_CALC_RES)
bucket = next(b for b in (5, 8, 12, 16) if radius <= b)
apron = flow_strip.apron_for(low_h, low_w, bucket)
rng = np.random.default_rng(0)
y1, uv1 = nv12.synthetic_frame(rng, H, W, is_hdr=True, motion_x=0, coherent=True)
y2, uv2 = nv12.synthetic_frame(rng, H, W, is_hdr=True, motion_x=3, coherent=True)
ctx = flow_strip.build_frame_context(
    jnp.asarray(y1), jnp.asarray(uv1), apron=apron, is_hdr=True,
    res_scalar=rs, low_dims=(low_h, low_w))
ctx = jax.tree.map(lambda a: a.block_until_ready(), ctx)
f2y, f2uv = jnp.asarray(y2), jnp.asarray(uv2)
kw = dict(window_size=window, res_scalar=rs, iteration=7, step=0, is_hdr=True,
          num_layers=bucket, apron=apron, dim_y=H, dim_x=W)
print(f"device {jax.devices()[0]} variant={variant} w={window} r{radius} "
      f"bucket {bucket} apron {apron}", flush=True)

kern = dict(uniform=flow_strip.delta_window_sums_uniform,
            strip=flow_strip.delta_window_sums_strip,
            patch=flow_strip.delta_window_sums_patch,
            mode=flow_strip.delta_window_sums_mode)


@functools.partial(jax.jit, static_argnames=("k",))
def chain(salt, *, k: int):
    acc = jnp.uint32(salt)
    off0 = np.full((2, low_h, low_w), 3, np.int16)
    if variant == "mode":
        # ~4% deviant windows (the converged-pan regime at fine steps).
        r2 = np.random.default_rng(7)
        n_wy, n_wx = -(-low_h // window), -(-low_w // window)
        m = r2.random((n_wy, n_wx)) < 0.04
        dev = np.repeat(np.repeat(m, window, 0), window, 1)[:low_h, :low_w]
        off0[0][dev] = -5
    if variant.startswith("values"):
        # Scattered offsets drawn from `cap` distinct values everywhere (the
        # non-converged fine-step regime the V tier targets). Variant name
        # selects the cap: values32 / values128.
        vcap = int(variant[len("values"):] or 32)
        r2 = np.random.default_rng(7)
        n_wy, n_wx = -(-low_h // window), -(-low_w // window)
        pool = np.stack([r2.integers(-6, 7, vcap), r2.integers(-6, 7, vcap)])
        pool[:, 0] = 3  # keep value 0 == the uniform fill
        pick = r2.integers(0, vcap, (n_wy, n_wx))
        grid = pool[:, pick].astype(np.int16)
        off0 = np.repeat(np.repeat(grid, window, 1), window, 2)[
            :, :low_h, :low_w].copy()
    off = jnp.asarray(off0)
    for i in range(k):
        off = off + (acc % 2).astype(jnp.int16)
        if variant == "ctx":
            # Per-frame flow-context build cost (mirror pads, transposes,
            # phase-decimated planes incl. low_dims padding).
            y1s = jnp.asarray(y1) + (acc % 2).astype(jnp.uint16)
            c = flow_strip.build_frame_context(
                y1s, jnp.asarray(uv1), apron=apron, is_hdr=True,
                res_scalar=rs, low_dims=(low_h, low_w))
            acc = acc + c["pad_y"][0, 0].astype(jnp.uint32) \
                + c["pad_y_t"][0, 0].astype(jnp.uint32) \
                + c["dec_y"][0, 0].astype(jnp.uint32) \
                + c["pad_uv"][0, 0].astype(jnp.uint32) \
                + c["pad_u_t"][0, 0].astype(jnp.uint32) \
                + c["dec_uv"][0, 0].astype(jnp.uint32)
            acc = jax.lax.optimization_barrier(acc)
            continue
        if variant == "cond2":
            # lax.cond overhead with the full ctx captured (measures TPU
            # conditional operand copies): same uniform kernel both branches.
            def br(o):
                return flow_strip.delta_window_sums_uniform(
                    ctx, f2y, f2uv, o, jnp.int32(radius), jnp.int32(8),
                    jnp.int32(6), **kw)

            def br2(o):
                return flow_strip.delta_window_sums_uniform(
                    ctx, f2y, f2uv, o, jnp.int32(radius), jnp.int32(8),
                    jnp.int32(7), **kw)

            sums = jax.lax.cond((acc % 2) == 0, br, br2, off)
            sums = jax.lax.optimization_barrier(sums)
            acc = jax.lax.optimization_barrier(acc + sums[0, 0, 0])
            continue
        if variant == "cond3":
            # lax.cond with a TINY capture (offsets only): isolates the cond
            # construct's fixed cost from operand-copy volume.
            def brs(o):
                return (o[0, 0, 0].astype(jnp.uint32)
                        + jnp.uint32(o.sum().astype(jnp.int32) & 0xFF))

            def brs2(o):
                return (o[1, 0, 0].astype(jnp.uint32)
                        + jnp.uint32(o.sum().astype(jnp.int32) & 0x7F))

            v = jax.lax.cond((acc % 2) == 0, brs, brs2, off)
            acc = jax.lax.optimization_barrier(acc + v)
            continue
        if variant == "cond4":
            # Heavy capture on the NON-executed branch only: distinguishes
            # executed-branch operand copies from all-branches copies.
            def cheap(o):
                return o[0, 0, 0].astype(jnp.uint32)

            def heavy(o):
                return flow_strip.delta_window_sums_uniform(
                    ctx, f2y, f2uv, o, jnp.int32(radius), jnp.int32(8),
                    jnp.int32(6), **kw)[0, 0, 0]

            # Runtime-true predicate (acc stays small) the compiler can't fold.
            v = jax.lax.cond((acc & jnp.uint32(1 << 31)) == 0, cheap, heavy,
                             off)
            acc = jax.lax.optimization_barrier(acc + v)
            continue
        if variant == "tail":
            # Tail cost alone: synthetic samples (no gathers), same cost math.
            samp = jnp.broadcast_to(
                f2y[:low_h, :low_w].astype(jnp.int32) >> 8,
                (bucket, low_h, low_w)) + off[0, 0, 0].astype(jnp.int32)
            u_s = samp
            v_s = samp
            ox, oy = flow_strip._window_offsets(off, jnp.int32(radius), bucket,
                                                window, 0)
            sums = flow_strip._cost_tail(
                samp, u_s, v_s, f2y, f2uv, off, ox, oy, jnp.int32(radius),
                jnp.int32(8), jnp.int32(6), window_size=window, res_scalar=rs,
                iteration=7, step=0, is_hdr=True, num_layers=bucket,
                dim_y=H, dim_x=W)
        elif variant.startswith("values"):
            # Full V-step cost: value index (sort/rank/searchsorted) + the
            # cap dense sample sets + merges, as pyramid_flow_strip_planned
            # pays it.
            vcap = int(variant[len("values"):] or 32)
            win_pk = ((off[0, ::window, ::window].astype(jnp.int32) << 16)
                      | (off[1, ::window, ::window].astype(jnp.int32)
                         & 0xFFFF))
            vals, val_idx, _ = flow_strip._window_value_index(win_pk, vcap)
            sums = flow_strip.delta_window_sums_values(
                ctx, f2y, f2uv, off, jnp.int32(radius), jnp.int32(8),
                jnp.int32(6), vals, val_idx, cap=vcap, **kw)
        else:
            sums = kern[variant](ctx, f2y, f2uv, off, jnp.int32(radius),
                                 jnp.int32(8), jnp.int32(6), **kw)
        acc = jax.lax.optimization_barrier(acc + sums[0, 0, 0])
    return acc


times = {}
salt = 0
for k in (1, k2):
    t0 = time.perf_counter()
    int(chain(salt, k=k)); salt += 1
    print(f"k={k} compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        int(chain(salt, k=k)); salt += 1
        best = min(best, time.perf_counter() - t0)
    times[k] = best
    print(f"k={k} best {best*1e3:.1f} ms", flush=True)
print(f"{variant} w={window} r{radius}: "
      f"{(times[k2]-times[1])/(k2-1)*1e3:.2f} ms/step", flush=True)

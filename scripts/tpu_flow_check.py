"""Real-TPU compile + run + bit-exactness check for the strip/patch/uniform
flow pyramid at production geometry.

Usage: python scripts/tpu_flow_check.py [4k-hdr|1080p-sdr] [radius] [uniform|mixed]
Runs pyramid_flow_strip on the chip, fetches the results, and compares
offsets/blurred/delta against the CPU run of the same function (same inputs) —
the CPU path is itself pinned to golden by the test suite.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

from hopperrender_tpu.utils import compile_cache
compile_cache.enable()
from hopperrender_tpu import config as hcfg
from hopperrender_tpu.ops import flow_strip
from hopperrender_tpu.vio import nv12


def run(device, ctx_args, pyr_args, kw):
    with jax.default_device(device):
        ctx = flow_strip.build_frame_context(*[jnp.asarray(a) for a in ctx_args],
                                             **kw["ctx"])
        off, blur, raw = flow_strip.pyramid_flow_strip(
            ctx, *[jnp.asarray(a) for a in pyr_args], **kw["pyr"])
        return np.asarray(off), np.asarray(blur), int(raw)


def main():
    cfgname = sys.argv[1] if len(sys.argv) > 1 else "4k-hdr"
    radius = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    content = sys.argv[3] if len(sys.argv) > 3 else "uniform"
    W, H, is_hdr = (3840, 2160, True) if cfgname == "4k-hdr" else (1920, 1080, False)
    rs, low_h, low_w = hcfg.calc_flow_dims(H, W, hcfg.MAX_CALC_RES)
    bucket = next(b for b in (5, 8, 12, 16) if radius <= b)
    apron = flow_strip.apron_for(low_h, low_w, bucket)
    rng = np.random.default_rng(0)
    if content == "uniform":
        y1, uv1 = nv12.synthetic_frame(rng, H, W, is_hdr=is_hdr, motion_x=0, coherent=True)
        y2, uv2 = nv12.synthetic_frame(rng, H, W, is_hdr=is_hdr, motion_x=3, coherent=True)
    else:  # mixed: random content defeats convergence -> gather branches
        hi = 65536 if is_hdr else 256
        dt = np.uint16 if is_hdr else np.uint8
        y1 = rng.integers(0, hi, (H, W), dtype=dt)
        uv1 = rng.integers(0, hi, (H // 2, W), dtype=dt)
        y2 = rng.integers(0, hi, (H, W), dtype=dt)
        uv2 = rng.integers(0, hi, (H // 2, W), dtype=dt)

    kw = dict(
        ctx=dict(apron=apron, is_hdr=is_hdr, res_scalar=rs if rs <= 4 else None,
                 low_dims=(low_h, low_w)),
        pyr=dict(low_h=low_h, low_w=low_w, res_scalar=rs, is_hdr=is_hdr,
                 num_layers=bucket, apron=apron, dim_y=H, dim_x=W),
    )
    ctx_args = (y1, uv1)
    pyr_args = (y2, uv2, jnp.int32(radius), jnp.int32(8), jnp.int32(6))

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    off_t, blur_t, raw_t = run(dev, ctx_args, pyr_args, kw)
    print("run 1 done; delta_raw =", raw_t, flush=True)
    off_t2, blur_t2, raw_t2 = run(dev, ctx_args, pyr_args, kw)
    print("run 2 done; deterministic =",
          np.array_equal(off_t, off_t2) and raw_t == raw_t2, flush=True)

    # Cross-platform comparison: the first invocation (any platform) saves,
    # the second (the other platform) compares — the CPU result is pinned to
    # golden by the test suite.
    ref = f"/tmp/flow_check_{cfgname}_{radius}_{content}.npz"
    import os
    if os.path.exists(ref) and "save" not in sys.argv:
        d = np.load(ref)
        ok = (np.array_equal(off_t, d["off"]) and np.array_equal(blur_t, d["blur"])
              and raw_t == int(d["raw"]))
        print(f"matches saved reference ({ref}): {ok}", flush=True)
        if not ok:
            print("first offset mismatches:",
                  np.argwhere(off_t != d["off"])[:5], flush=True)
            sys.exit(1)
    else:
        np.savez(ref, off=off_t, blur=blur_t, raw=raw_t)
        print("saved reference to", ref, flush=True)
    print("FLOW PYRAMID OK", flush=True)


if __name__ == "__main__":
    main()

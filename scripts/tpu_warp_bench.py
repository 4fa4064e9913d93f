"""Slope-timed 4K warp: band kernel vs strip twin on the real chip."""
import functools, sys, time
import numpy as np
import jax, jax.numpy as jnp
from hopperrender_tpu.utils import compile_cache
compile_cache.enable()
from hopperrender_tpu import config as hcfg
from hopperrender_tpu.ops import flow_strip, warp_band, warp_strip
from hopperrender_tpu.vio import nv12

cfgname = sys.argv[1] if len(sys.argv) > 1 else "4k-hdr"
which = sys.argv[2] if len(sys.argv) > 2 else "band"
radius = int(sys.argv[3]) if len(sys.argv) > 3 else 16
W, H, is_hdr = (3840, 2160, True) if cfgname == "4k-hdr" else \
               ((3840, 2160, False) if cfgname == "4k-sdr" else (1920, 1080, False))
rs, low_h, low_w = hcfg.calc_flow_dims(H, W, hcfg.MAX_CALC_RES)
bucket = next(b for b in (5, 8, 12, 16) if radius <= b)
apron = flow_strip.apron_for(low_h, low_w, bucket)
rng = np.random.default_rng(0)
y1, uv1 = nv12.synthetic_frame(rng, H, W, is_hdr=is_hdr, motion_x=0)
y2, uv2 = nv12.synthetic_frame(rng, H, W, is_hdr=is_hdr, motion_x=2)
f1y, f1uv = jnp.asarray(y1), jnp.asarray(uv1)
f2y, f2uv = jnp.asarray(y2), jnp.asarray(uv2)
if "smooth" in sys.argv:
    # Near-constant flow: routes the band kernel's tile-granular fast path
    # (representative of real blurred flow fields).
    flow0 = jnp.asarray(np.array([9, -13], np.int16)[:, None, None]
                        + rng.integers(-1, 2, (2, low_h, low_w)).astype(np.int16))
else:
    flow0 = jnp.asarray(rng.integers(-12, 13, (2, low_h, low_w)).astype(np.int16))
white = 65280.0 if is_hdr else 255.0
salt_dtype = jnp.uint16 if is_hdr else jnp.uint8
if which.startswith("band"):
    # "band" = default (16,16) chains; "band8" = (8,8) short chains;
    # "band32" = (32,32) wide chains (the adversarial-content tier);
    # "bandtier" = apron tier 32 (the converged-content DMA cut; sound here:
    # both flow flavors are bounded by 12+1+k <= 16 <= 32);
    # "bandprep" = XLA table/packing prep only (no Pallas call) for cost
    # attribution: kernel cost = band - bandprep.
    bounds = {"band8": (8, 8), "band32": (32, 32)}.get(which, (16, 16))
    fn = functools.partial(warp_band.warp_frame_band, chain_bounds=bounds,
                           debug_prep_only=which == "bandprep",
                           apron_eff=32 if which == "bandtier" else None)
else:
    fn = warp_strip.warp_frame_strip

@functools.partial(jax.jit, static_argnames=("k",))
def chain(salt, *, k: int):
    acc = jnp.uint32(salt)
    fl = flow0
    for i in range(k):
        fl = fl + (acc % 2).astype(jnp.int16)
        t = jnp.float32(0.1 + 0.3 * (i % 3))
        y1s = f1y + (acc % 2).astype(salt_dtype)
        c12 = warp_strip.build_warp_context(y1s, f1uv, apron=apron, is_hdr=is_hdr)
        c21 = warp_strip.build_warp_context(f2y, f2uv, apron=apron, is_hdr=is_hdr)
        if which == "wctx":
            # Context builds alone (mirror pads); the engine pays 2 of these
            # per SOURCE frame (amortized over 2.5 outputs).
            # FULL-plane checksums: partial slices would let XLA dead-code
            # the pad work this variant exists to measure.
            acc = jax.lax.optimization_barrier(
                acc + jnp.sum(c12["wpad_y"].astype(jnp.uint32))
                + jnp.sum(c12["wpad_uv"].astype(jnp.uint32))
                + jnp.sum(c21["wpad_y"].astype(jnp.uint32))
                + jnp.sum(c21["wpad_uv"].astype(jnp.uint32)))
            continue
        oy, ouv = fn(c12, c21, fl, t, jnp.float32(0.0), jnp.float32(white),
                     res_scalar=rs, mode=2, is_hdr=is_hdr, dim_y=H, dim_x=W, apron=apron)
        acc = jax.lax.optimization_barrier(
            acc + jnp.sum(oy[0, :8].astype(jnp.uint32)) + jnp.sum(ouv[0, :8].astype(jnp.uint32)))
    return acc

salt = 0
times = {}
for k in (1, 3):
    t0 = time.perf_counter(); int(chain(salt, k=k)); salt += 1
    print(f"k={k} compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); int(chain(salt, k=k)); salt += 1
        best = min(best, time.perf_counter() - t0)
    times[k] = best
    print(f"k={k} best {best*1e3:.1f} ms", flush=True)
ms = (times[3] - times[1]) / 2 * 1e3
print(f"{cfgname} {which} r{radius} (apron {apron}) warp+2ctx per output: {ms:.2f} ms", flush=True)

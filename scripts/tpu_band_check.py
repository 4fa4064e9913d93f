"""Real-TPU Mosaic compile + bit-exactness check for the warp band kernel."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from hopperrender_tpu.ops import warp_band, warp_strip

def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(1)
    h, w, apron, rs = 64, 128, 32, 2
    is_hdr = len(sys.argv) > 1 and sys.argv[1] == "hdr"
    if is_hdr:
        rs = 3
    if "4k" in sys.argv:   # full 4K geometry (the served headline config)
        h, w, rs, apron = 2160, 3840, 3, 48
    if "rs1" in sys.argv:  # 480p class: 2-px cells, slot16 Y layout (SDR).
        # Passing here on hardware is the gate for flipping
        # flow_engine._band_rs_enabled's rs=1 default (HRT_BAND_RS1).
        h, w, rs, apron = 480, 854, 1, 48
    dt = np.uint16 if is_hdr else np.uint8
    hi = 65536 if is_hdr else 256
    low_h, low_w = h >> rs, w >> rs
    y1 = rng.integers(0, hi, (h, w), dtype=dt); uv1 = rng.integers(0, hi, (h//2, w), dtype=dt)
    y2 = rng.integers(0, hi, (h, w), dtype=dt); uv2 = rng.integers(0, hi, (h//2, w), dtype=dt)
    flow = rng.integers(-25, 26, (2, low_h, low_w)).astype(np.int16)
    if "smooth" in sys.argv:   # fast-path coverage: near-constant flow
        flow = (np.array([9, -13], np.int16)[:, None, None]
                + rng.integers(-1, 2, (2, low_h, low_w)).astype(np.int16))
    if "uniform" in sys.argv:  # round-5 uniform-tier coverage: exactly
        # constant flow certifies EVERY subtile through the 2-roll path
        flow = np.broadcast_to(np.array([9, -13], np.int16)[:, None, None],
                               (2, low_h, low_w)).copy()
    c1 = warp_strip.build_warp_context(jnp.asarray(y1), jnp.asarray(uv1), apron=apron, is_hdr=is_hdr)
    c2 = warp_strip.build_warp_context(jnp.asarray(y2), jnp.asarray(uv2), apron=apron, is_hdr=is_hdr)
    scale = 256.0 if is_hdr else 1.0
    args = (c1, c2, jnp.asarray(flow), jnp.float32(0.375), jnp.float32(16.0*scale), jnp.float32(235.0*scale))
    for mode in (2, 0, 1):
        kw = dict(res_scalar=rs, mode=mode, is_hdr=is_hdr, dim_y=h, dim_x=w, apron=apron)
        ys, uvs = warp_strip.warp_frame_strip(*args, **kw)
        ys, uvs = np.asarray(ys), np.asarray(uvs)
        print(f"mode {mode}: strip done; compiling band...", flush=True)
        yb, uvb = warp_band.warp_frame_band(*args, **kw)
        yb, uvb = np.asarray(yb), np.asarray(uvb)
        ok_y = np.array_equal(ys, yb); ok_uv = np.array_equal(uvs, uvb)
        print(f"mode {mode}: y exact={ok_y} uv exact={ok_uv}", flush=True)
        if not (ok_y and ok_uv):
            print("y mismatches:", np.argwhere(ys != yb)[:5])
            print("uv mismatches:", np.argwhere(uvs != uvb)[:5])
            sys.exit(1)
    # Apron tier on hardware: shifted DMA origins must satisfy Mosaic's
    # alignment rules AND stay bit-exact (interpret-mode equality is proven
    # in tests/test_warp_band.py; this checks the real lowering).
    bound = int(np.abs(flow).max())
    aw = warp_band.pick_apron(bound, apron)
    if aw < apron:
        kw = dict(res_scalar=rs, mode=2, is_hdr=is_hdr, dim_y=h, dim_x=w,
                  apron=apron)
        want = [np.asarray(x) for x in warp_band.warp_frame_band(*args, **kw)]
        got = [np.asarray(x) for x in warp_band.warp_frame_band(
            *args, apron_eff=aw, **kw)]
        ok = all(np.array_equal(a, b) for a, b in zip(want, got))
        print(f"apron tier {aw} (full {apron}, bound {bound}): exact={ok}",
              flush=True)
        if not ok:
            sys.exit(1)
    if "batch" in sys.argv:
        # Per-pair batched warp on hardware: the t-folded grid (b % n_bands
        # source origins + dynamic SMEM fs index) is the one untested Mosaic
        # lowering. Passing here is the gate for flipping
        # flow_engine.batched_warp_enabled's default (HRT_BATCHED_WARP) and
        # for benching with --batched-warp.
        ts = jnp.asarray([0.2, 0.4, 0.6, 0.8, 1.0], jnp.float32)
        kw = dict(res_scalar=rs, mode=2, is_hdr=is_hdr, dim_y=h, dim_x=w,
                  apron=apron)
        aw = warp_band.pick_apron(int(np.abs(flow).max()), apron)
        print(f"batch: compiling T={ts.shape[0]} (apron_eff {aw})...",
              flush=True)
        yb, uvb = warp_band.warp_frame_band(
            c1, c2, jnp.asarray(flow), ts, args[4], args[5],
            apron_eff=aw, **kw)
        yb, uvb = np.asarray(yb), np.asarray(uvb)
        ok = True
        for i in range(ts.shape[0]):
            y1o, uv1o = warp_band.warp_frame_band(
                c1, c2, jnp.asarray(flow), ts[i], args[4], args[5],
                apron_eff=aw, **kw)
            ok &= np.array_equal(yb[i], np.asarray(y1o))
            ok &= np.array_equal(uvb[i], np.asarray(uv1o))
        print(f"batch T={ts.shape[0]}: exact={ok}", flush=True)
        if not ok:
            sys.exit(1)
    print("BAND KERNEL OK ON TPU", flush=True)

if __name__ == "__main__":
    main()

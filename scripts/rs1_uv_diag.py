"""rs=1 UV right-edge diagnostic (round-5 chip gate mismatch at cols 852/853).

Reproduces scripts/tpu_band_check.py's rs1 inputs (480x854 SDR, seed 1) and
compares strip vs band per mode. On CPU the band runs in interpret mode —
if the mismatch shows here it is a table/edge-pad logic bug (fixable without
a chip); if interpret is exact the divergence is in the Mosaic lowering.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from hopperrender_tpu.ops import warp_band, warp_strip


def main():
    print("devices:", jax.devices(), flush=True)
    interpret = jax.devices()[0].platform == "cpu"
    rng = np.random.default_rng(1)
    h, w, apron, rs = 480, 854, 48, 1
    dt = np.uint8
    low_h, low_w = h >> rs, w >> rs
    y1 = rng.integers(0, 256, (h, w), dtype=dt)
    uv1 = rng.integers(0, 256, (h // 2, w), dtype=dt)
    y2 = rng.integers(0, 256, (h, w), dtype=dt)
    uv2 = rng.integers(0, 256, (h // 2, w), dtype=dt)
    flow = rng.integers(-25, 26, (2, low_h, low_w)).astype(np.int16)
    c1 = warp_strip.build_warp_context(jnp.asarray(y1), jnp.asarray(uv1),
                                       apron=apron, is_hdr=False)
    c2 = warp_strip.build_warp_context(jnp.asarray(y2), jnp.asarray(uv2),
                                       apron=apron, is_hdr=False)
    args = (c1, c2, jnp.asarray(flow), jnp.float32(0.375),
            jnp.float32(16.0), jnp.float32(235.0))
    for mode in (2, 0, 1):
        kw = dict(res_scalar=rs, mode=mode, is_hdr=False, dim_y=h, dim_x=w,
                  apron=apron)
        ys, uvs = warp_strip.warp_frame_strip(*args, **kw)
        ys, uvs = np.asarray(ys), np.asarray(uvs)
        yb, uvb = warp_band.warp_frame_band(*args, interpret=interpret, **kw)
        yb, uvb = np.asarray(yb), np.asarray(uvb)
        ok_y = np.array_equal(ys, yb)
        ok_uv = np.array_equal(uvs, uvb)
        print(f"mode {mode}: y exact={ok_y} uv exact={ok_uv}", flush=True)
        if not ok_uv:
            bad = np.argwhere(uvs != uvb)
            cols = np.unique(bad[:, 1])
            print(f"  uv mismatch count={len(bad)} cols={cols[:10]}"
                  f" rows[:5]={np.unique(bad[:, 0])[:5]}")
            r0, c0 = bad[0]
            print(f"  first: ({r0},{c0}) strip={uvs[r0, c0]} band={uvb[r0, c0]}")
        if not ok_y:
            bad = np.argwhere(ys != yb)
            print(f"  y mismatch count={len(bad)} cols="
                  f"{np.unique(bad[:, 1])[:10]}")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

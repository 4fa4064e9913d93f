"""Real-TPU tolerance check for warp mode 3 (HSV flow visualization).

Mode 3 is the only float-heavy path (atan2/mod hue math, ref:
warpFrameKernelSDR.h:23-113); the integer modes are covered bit-exactly by the
digest suite. This script runs the XLA formulation on the real chip against
the golden NumPy model and asserts every sample is within 1 LSB — closing the
round-1 gap "mode-3 float semantics on real TPU unverified" (VERDICT.md).
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

from hopperrender_tpu.ops import golden, warp as warp_ops


def main():
    print("device:", jax.devices()[0], flush=True)
    worst = 0
    for is_hdr in (False, True):
        rng = np.random.default_rng(3)
        h, w, rs = 64, 128, 2
        low_h, low_w = h >> rs, w >> rs
        dt = np.uint16 if is_hdr else np.uint8
        hi = 65536 if is_hdr else 256
        y1 = rng.integers(0, hi, (h, w), dtype=dt)
        uv1 = rng.integers(0, hi, (h // 2, w), dtype=dt)
        y2 = rng.integers(0, hi, (h, w), dtype=dt)
        uv2 = rng.integers(0, hi, (h // 2, w), dtype=dt)
        # Flows spanning all hue quadrants incl. zero (the atan2 edge).
        flow = rng.integers(-30, 31, (2, low_h, low_w)).astype(np.int16)
        flow[:, :2, :2] = 0
        scale = 256.0 if is_hdr else 1.0
        for t in (0.25, 0.875):
            gy, guv = golden.warp_frame(
                y1, uv1, y2, uv2, flow.astype(np.int16), t, rs, 3,
                16.0 * scale, 235.0 * scale, is_hdr)
            ty, tuv = warp_ops.warp_frame(
                jnp.asarray(y1), jnp.asarray(uv1), jnp.asarray(y2),
                jnp.asarray(uv2), jnp.asarray(flow), jnp.float32(t),
                jnp.float32(16.0 * scale), jnp.float32(235.0 * scale),
                res_scalar=rs, mode=3, is_hdr=is_hdr)
            dy = np.abs(np.asarray(ty).astype(np.int64) - gy.astype(np.int64))
            duv = np.abs(np.asarray(tuv).astype(np.int64)
                         - guv.astype(np.int64))
            lsb = 256 if is_hdr else 1  # HDR hue math shifts <<8 (1 SDR LSB)
            m = max(dy.max(), duv.max())
            worst = max(worst, m // lsb if lsb > 1 else m)
            print(f"hdr={is_hdr} t={t}: max |diff| y={dy.max()} uv={duv.max()}"
                  f" (allowed {lsb})", flush=True)
            if dy.max() > lsb or duv.max() > lsb:
                print("MODE-3 TOLERANCE EXCEEDED", flush=True)
                sys.exit(1)
    print(f"MODE-3 OK ON TPU (worst {worst} LSB)", flush=True)


if __name__ == "__main__":
    main()

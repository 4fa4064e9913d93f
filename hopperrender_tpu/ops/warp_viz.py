"""Side-by-side visualization modes 5/6 composed from the FAST mode-2 warp.

The reference renders every output mode inside the one warp kernel
(ref: warpFrameKernelSDR.h:116-184). The TPU-fast decomposition observes that
the side-by-side modes are spatial COMPOSITIONS of things the fast paths
already produce:

  * Mode 5 (SideBySide1, ref: warpFrameKernelSDR.h:128-133): left half is the
    raw source-1 passthrough, right half is the full-resolution mode-2 blend
    at the SAME coordinates — a concat of the source plane and the band/strip
    mode-2 output. Costs one fast mode-2 warp + a copy: real-time wherever
    mode 2 is.

  * Mode 6 (SideBySide2, ref: warpFrameKernelSDR.h:135-151): a centered
    vertical band shows the 2x-downsampled source (left) and the
    2x-downsampled mode-2 blend (right). For the Y plane both halves are
    strided slices (the reference's adjusted coordinates are exactly
    even-row/even-col subsampling), so Y needs NO gathers beyond the fast
    mode-2 warp it reuses. The UV plane's right half samples with the OUTPUT
    pixel's parity at adjusted coordinates — not derivable from the full-res
    mode-2 UV plane — so UV keeps the reference formulation restricted to the
    band rows (a 2x cut of its gathers). Mode 6 is therefore ~3-4x cheaper
    than the full gather formulation but remains a debug-grade path.

Both compositions are bit-exact twins of ops/warp.py modes 5/6 (tested in
tests/test_warp_strip.py)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hopperrender_tpu.ops import warp as warp_ops


@functools.partial(jax.jit, static_argnames=("dim_x",))
def side_by_side_1(src12_y, src12_uv, warp2_y, warp2_uv, *, dim_x: int):
    """Mode 5: left half source-1 passthrough, right half the mode-2 blend
    (ref: warpFrameKernelSDR.h:128-133). warp2_* is the full-frame mode-2
    output from any of the bit-exact fast paths (band/strip)."""
    half = dim_x >> 1
    y = jnp.concatenate([src12_y[:, :half], warp2_y[:, half:]], axis=1)
    uv = jnp.concatenate([src12_uv[:, :half], warp2_uv[:, half:]], axis=1)
    return y, uv


@functools.partial(
    jax.jit, static_argnames=("res_scalar", "is_hdr", "dim_y", "dim_x"),
)
def side_by_side_2(src12_y, src12_uv, src21_y, src21_uv, warp2_y, flow,
                   blending_scalar, black_level, white_level,
                   *, res_scalar: int, is_hdr: bool, dim_y: int, dim_x: int):
    """Mode 6: centered band of 2x-downsampled source (left) and blend
    (right), black/neutral elsewhere (ref: warpFrameKernelSDR.h:135-151).

    Y plane: fully structured — the reference's adjusted coordinates
    ((cy - vo) << 1, (cx [- W/2]) << 1) are even-stride subsampling of the
    source plane and of the full-resolution mode-2 output (warp2_y), so both
    halves are strided slices.

    UV plane: the right half applies the OUTPUT pixel's parity at adjusted
    coordinates, which the full-res mode-2 UV cannot provide; it reuses the
    reference formulation restricted to the band rows via row sharding
    (warp_ops.warp_frame_plane row_offset/out_rows)."""
    dtype = jnp.uint16 if is_hdr else jnp.uint8
    half = dim_x >> 1

    # ---- Y: structured composition ----------------------------------------
    vo = dim_y >> 2
    band_h = dim_y >> 1
    left = src12_y[0:dim_y:2, 0:dim_x:2]          # (H/2, W/2)
    right = warp2_y[0:dim_y:2, 0:dim_x:2]
    band = jnp.concatenate([left, right], axis=1).astype(dtype)
    y = jnp.zeros((dim_y, dim_x), dtype)
    y = jax.lax.dynamic_update_slice(y, band[:band_h], (vo, 0))

    # ---- UV: reference formulation on the band rows only ------------------
    vo_c = vo >> 1
    band_c = dim_y >> 2
    uv_band = warp_ops.warp_frame_plane(
        src12_y, src12_uv, src21_y, src21_uv, flow,
        jnp.asarray(blending_scalar, jnp.float32),
        jnp.asarray(black_level, jnp.float32),
        jnp.asarray(white_level, jnp.float32),
        vo_c,
        res_scalar=res_scalar, mode=6, cz=1, is_hdr=is_hdr, out_rows=band_c,
    )
    mid = 32768 if is_hdr else 128
    uv = jnp.full((dim_y >> 1, dim_x), mid, dtype)
    uv = jax.lax.dynamic_update_slice(uv, uv_band, (vo_c, 0))
    return y, uv

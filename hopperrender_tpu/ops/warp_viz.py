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
    2x-downsampled mode-2 blend (right).

    Y plane: both halves are strided slices (the reference's adjusted
    coordinates are exactly even-row/even-col subsampling of the source and
    of the full-res mode-2 output) — NO gathers beyond the fast mode-2 warp.

    UV plane, left half: the reference reads source column
    (cx << 1) + (cx & 1) at even rows — U from every even source pair, V from
    every odd source pair: two strided slices, interleaved. Structured.

    UV plane, right half: the reference samples with the OUTPUT pixel's
    parity at adjusted (doubled) coordinates. The U outputs (cx even) apply
    parity 0 at an even adjusted column — IDENTICAL, formula for formula
    (same scaled/flow/mirror/levels math), to the full-res mode-2 UV output
    at (adjCy, adjCx), so they are a strided subsample of warp2_uv. Only the
    V outputs (parity 1 at an even adjusted column, which no mode-2 pixel
    computes) need a gather — one pixel per output V, dim_y/4 x dim_x/4
    elements: 4x fewer than gathering the whole band, 8x fewer than a
    full-frame UV warp. Mode 6 therefore costs the fast mode-2 warp it
    reuses plus a quarter-band UV gather.

Both compositions are bit-exact twins of ops/warp.py modes 5/6 (tested in
tests/test_warp_strip.py)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hopperrender_tpu.ops.warp import (
    F32, _apply_levels_uv, _apply_levels_y, _mirror_warp, _round_c,
    _visualize_flow)


@functools.partial(
    jax.jit, static_argnames=("res_scalar", "is_hdr", "dim_y", "dim_x"))
def hsv_flow_overlay(raw2_y, raw2_uv, flow, black, white, *,
                     res_scalar: int, is_hdr: bool, dim_y: int, dim_x: int):
    """Mode 3 (HSV flow visualization, ref: warpFrameKernelSDR.h:23-113 +
    the mode-3 branch at :172-183) composed from the FAST mode-2 warp:
    raw2_y / raw2_uv are the PRE-levels blended planes (the band kernel's
    raw_blend=True mode-2 output — the blend values the reference's kernel
    colorizes), the flow coloring is per-cell constant (structured repeats
    of the low-res flow, no gathers), and levels apply last, exactly like
    the strip twin's mode-3 combine (warp_strip.warp_frame_strip:283-311).
    Bit-exact vs the strip mode 3 (tests/test_round5.py); costs the fast
    mode-2 warp + elementwise VPU work instead of the 4K strip gathers
    (chip-measured 867 ms/output at 4K HDR r16 — round-5 viz bench)."""
    rs = res_scalar
    cell = 1 << rs
    low_h, low_w = flow.shape[1:]
    h2 = dim_y // 2
    dtype = jnp.uint16 if is_hdr else jnp.uint8
    black = jnp.asarray(black, F32)
    white = jnp.asarray(white, F32)
    res_impact = 4 if rs <= 2 else 1
    neg16 = lambda v: (-v.astype(jnp.int32)).astype(jnp.int16)  # noqa: E731

    cy = jnp.arange(dim_y, dtype=jnp.int32)
    cix = jnp.arange(dim_x // cell, dtype=jnp.int32)
    cell_row = jnp.clip(cy >> rs, 0, low_h - 1)
    cell_col = jnp.clip(cix, 0, low_w - 1)
    fx_y = jnp.repeat(flow[0][cell_row][:, cell_col], cell, axis=1)
    fy_y = jnp.repeat(flow[1][cell_row][:, cell_col], cell, axis=1)
    y = _visualize_flow(
        neg16(fx_y), neg16(fy_y), raw2_y.astype(jnp.int32),
        jnp.zeros((dim_y, dim_x), jnp.int32), res_impact, is_hdr)

    cy2 = jnp.arange(h2, dtype=jnp.int32)
    uv_cell_row = jnp.clip((cy2 >> rs) << 1, 0, low_h - 1)
    uv_cell_col = jnp.clip(cix & ~1, 0, low_w - 1)
    fx_c = jnp.repeat(flow[0][uv_cell_row][:, uv_cell_col], cell, axis=1)
    fy_c = jnp.repeat(flow[1][uv_cell_row][:, uv_cell_col], cell, axis=1)
    chan = 1 + (jnp.arange(dim_x, dtype=jnp.int32) & 1)[None, :]
    uv = _visualize_flow(
        neg16(fx_c), neg16(fy_c), raw2_uv.astype(jnp.int32),
        jnp.broadcast_to(chan, (h2, dim_x)), res_impact, is_hdr)
    return (_apply_levels_y(y, black, white, is_hdr).astype(dtype),
            _apply_levels_uv(uv, white, is_hdr).astype(dtype))


@functools.partial(jax.jit, static_argnames=("dim_x",))
def side_by_side_1(src12_y, src12_uv, warp2_y, warp2_uv, *, dim_x: int):
    """Mode 5: left half source-1 passthrough, right half the mode-2 blend
    (ref: warpFrameKernelSDR.h:128-133). warp2_* is the full-frame mode-2
    output from any of the bit-exact fast paths (band/strip)."""
    half = dim_x >> 1
    y = jnp.concatenate([src12_y[:, :half], warp2_y[:, half:]], axis=1)
    uv = jnp.concatenate([src12_uv[:, :half], warp2_uv[:, half:]], axis=1)
    return y, uv


def _sbs2_uv_v_half(src12_uv, src21_uv, flow, fs12, white,
                    *, res_scalar: int, is_hdr: bool, dim_y: int, dim_x: int,
                    m_off: int):
    """Mode-6 right-half V outputs only: the blend with PARITY 1 at the even
    adjusted column 2m for m = m_off, m_off+2, ... (the columns whose output
    pixel cx = dim_x/2 + m is odd). One gathered pixel per output V — the
    only part of mode 6 the structured compositions cannot provide
    (ref: warpFrameKernelSDR.h:143-145 adjusted coords, :178-183 sampling
    with `(newCx & ~1) + (cx & 1)` where cx is the OUTPUT column)."""
    half = dim_x >> 1
    band_c = dim_y >> 2
    plane_h = dim_y >> 1
    low_h, low_w = flow.shape[1:]
    n_v = (half - m_off + 1) // 2
    fs21 = (F32(1.0) - fs12).astype(F32)

    mm = m_off + 2 * jnp.arange(n_v, dtype=jnp.int32)
    adj_cx = jnp.broadcast_to((mm << 1)[None, :], (band_c, n_v))
    adj_cy = jnp.broadcast_to(
        (jnp.arange(band_c, dtype=jnp.int32) << 1)[:, None], (band_c, n_v))

    # Flow lookup + warped positions: verbatim twins of
    # warp.warp_frame_plane's cz=1 path (ref: warpFrameKernelSDR.h:153-170).
    scaled_cx = jnp.clip((adj_cx >> res_scalar) & ~1, 0, low_w - 1)
    scaled_cy = jnp.clip((adj_cy >> res_scalar) << 1, 0, low_h - 1)
    off_x12 = flow[0][scaled_cy, scaled_cx].astype(jnp.int32)
    off_y12 = flow[1][scaled_cy, scaled_cx].astype(jnp.int32)
    back_cy = jnp.clip(scaled_cy - (off_y12 >> res_scalar), 0, low_h - 1)
    back_cx = jnp.clip(scaled_cx - (off_x12 >> res_scalar), 0, low_w - 1)
    off_x21 = flow[0][back_cy, back_cx].astype(jnp.int32)
    off_y21 = flow[1][back_cy, back_cx].astype(jnp.int32)

    new_cx12 = _mirror_warp(adj_cx + _round_c(off_x12.astype(F32) * fs12),
                            dim_x)
    new_cy12 = _mirror_warp(
        adj_cy + _round_c(off_y12.astype(F32) * fs12 * F32(0.5)), plane_h)
    new_cx21 = _mirror_warp(adj_cx - _round_c(off_x21.astype(F32) * fs21),
                            dim_x)
    new_cy21 = _mirror_warp(
        adj_cy - _round_c(off_y21.astype(F32) * fs21 * F32(0.5)), plane_h)

    v12 = src12_uv[new_cy12, (new_cx12 & ~1) + 1].astype(F32)
    v21 = src21_uv[new_cy21, (new_cx21 & ~1) + 1].astype(F32)
    blended = jnp.trunc(v12 * fs21 + v21 * fs12).astype(jnp.int32)
    return _apply_levels_uv(blended, white.astype(F32), is_hdr)


@functools.partial(
    jax.jit, static_argnames=("res_scalar", "is_hdr", "dim_y", "dim_x"),
)
def side_by_side_2(src12_y, src12_uv, src21_uv, warp2_y, warp2_uv, flow,
                   blending_scalar, white_level,
                   *, res_scalar: int, is_hdr: bool, dim_y: int, dim_x: int):
    """Mode 6: centered band of 2x-downsampled source (left) and blend
    (right), black/neutral elsewhere (ref: warpFrameKernelSDR.h:135-151).

    Y: strided slices of the source and of warp2_y (the fast mode-2 output).
    UV: left half and the right half's U outputs are strided slices (of the
    source and of warp2_uv); only the right half's V outputs gather
    (_sbs2_uv_v_half) — see the module docstring for the derivation."""
    dtype = jnp.uint16 if is_hdr else jnp.uint8
    half = dim_x >> 1

    # ---- Y: structured composition ----------------------------------------
    vo = dim_y >> 2
    band_h = dim_y >> 1
    left_y = src12_y[0:dim_y:2, 0:dim_x:2]            # (H/2, W/2)
    right_y = warp2_y[0:dim_y:2, 0:dim_x:2]
    band = jnp.concatenate([left_y, right_y], axis=1).astype(dtype)
    y = jnp.zeros((dim_y, dim_x), dtype)
    y = jax.lax.dynamic_update_slice(y, band[:band_h], (vo, 0))

    # ---- UV ----------------------------------------------------------------
    vo_c = vo >> 1
    band_c = dim_y >> 2

    # Left half: U from every even source pair, V from every odd source pair
    # (source column (cx << 1) + (cx & 1) at even rows) — two strided slices.
    rows2 = src12_uv[0:2 * band_c:2]                   # (band_c, dim_x)
    n_u = (half + 1) // 2                              # even cx count
    n_vl = half // 2                                   # odd cx count
    left_uv = jnp.zeros((band_c, half), dtype)
    left_uv = left_uv.at[:, 0::2].set(rows2[:, 0::4][:, :n_u])
    left_uv = left_uv.at[:, 1::2].set(rows2[:, 3::4][:, :n_vl])

    # Right half: start from the U candidates (strided warp2_uv subsample),
    # then overwrite the V output columns with the parity-1 gather.
    right_uv = warp2_uv[0:2 * band_c:2, 0:dim_x:2]     # (band_c, half)
    m_off = 1 - (half & 1)       # (half + m) odd <=> m = m_off (mod 2)
    vv = _sbs2_uv_v_half(
        src12_uv, src21_uv, flow, jnp.asarray(blending_scalar, F32),
        jnp.asarray(white_level, F32), res_scalar=res_scalar, is_hdr=is_hdr,
        dim_y=dim_y, dim_x=dim_x, m_off=m_off)
    right_uv = right_uv.at[:, m_off::2].set(vv.astype(dtype))

    mid = 32768 if is_hdr else 128
    uv = jnp.full((dim_y >> 1, dim_x), mid, dtype)
    uv = jax.lax.dynamic_update_slice(
        uv, jnp.concatenate([left_uv, right_uv], axis=1), (vo_c, 0))
    return y, uv

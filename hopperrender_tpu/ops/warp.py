"""JAX warp / copy ops: bidirectional warp + blend with all 7 output modes, levels,
HSV/grey flow visualization, and the passthrough copy.

Bit-exact re-expression of the reference kernels:
  * warp_frame_plane  (ref: warpFrameKernelSDR.h:116-184 / HDR.h)
  * visualize_flow    (ref: warpFrameKernelSDR.h:23-113)
  * copy_frame        (ref: copyFrameKernelSDR.h:12-25 / HDR.h)

C float semantics replicated: float32 arithmetic, `(int)round()` = half away from
zero, float->unsigned conversions truncate toward zero. Mode 3 (HSV flow) uses
atan2/fmod whose last-ulp behavior may differ between XLA and a GPU OpenCL driver;
every other mode is exact integer/simple-float math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

F32 = jnp.float32


def _mirror_warp(pos: jnp.ndarray, dim: int) -> jnp.ndarray:
    """(ref: warpFrameKernelSDR.h:12-20)."""
    p = pos.astype(jnp.int32)
    res = jnp.where(p >= dim - 1, p - (p - (dim - 2)) * 2, jnp.where(p < 1, -p + 1, p))
    return jnp.clip(res, 1, dim - 2)


def _round_c(x: jnp.ndarray) -> jnp.ndarray:
    """C round(): half away from zero in float32 (ref: warpFrameKernelSDR.h:167)."""
    x = x.astype(F32)
    return jnp.where(x >= 0, jnp.floor(x + F32(0.5)), jnp.ceil(x - F32(0.5))).astype(jnp.int32)


def _apply_levels_y(value, black, white, is_hdr: bool):
    peak = F32(65535.0) if is_hdr else F32(255.0)
    v = (value.astype(F32) - black) / (white - black) * peak
    return jnp.trunc(jnp.clip(v, F32(0.0), peak)).astype(jnp.int32)


def _apply_levels_uv(value, white, is_hdr: bool):
    peak = F32(65535.0) if is_hdr else F32(255.0)
    mid = F32(32768.0) if is_hdr else F32(128.0)
    v = (value.astype(F32) - mid) / white * peak + mid
    return jnp.trunc(jnp.clip(v, F32(0.0), peak)).astype(jnp.int32)


def _visualize_flow(offset_x, offset_y, curr_pixel, channel, res_impact: int, is_hdr: bool):
    """HSV flow visualization (ref: warpFrameKernelSDR.h:23-113)."""
    ox = offset_x.astype(jnp.int32)
    oy = offset_y.astype(jnp.int32)
    no_flow = (jnp.abs(ox) < 1) & (jnp.abs(oy) < 1)

    angle_rad = jnp.arctan2(oy.astype(F32), ox.astype(F32)).astype(F32)
    m_pi_f = F32(3.14159274101257324)  # M_PI_F
    angle_deg = (angle_rad * (F32(180.0) / m_pi_f)).astype(F32)
    angle_deg = jnp.where(angle_deg < 0, angle_deg + F32(360.0), angle_deg)
    angle_deg = jnp.mod(angle_deg, F32(360.0)).astype(F32)
    angle_deg = jnp.where(angle_deg < 0, angle_deg + F32(360.0), angle_deg)
    hue = (angle_deg / F32(360.0)).astype(F32)

    h_i = (hue * F32(6.0)).astype(jnp.int32)
    f = (hue * F32(6.0) - h_i.astype(F32)).astype(F32)
    q = (F32(1.0) - f).astype(F32)
    f255 = jnp.trunc(f * F32(255.0)).astype(jnp.int32)
    q255 = jnp.trunc(q * F32(255.0)).astype(jnp.int32)
    h_mod = h_i % 6

    def pick(v0, v1, v2, v3, v4, v5):
        vals = jnp.stack([jnp.broadcast_to(jnp.asarray(v, jnp.int32), h_mod.shape)
                          for v in (v0, v1, v2, v3, v4, v5)])
        return jnp.take_along_axis(vals, h_mod[None], axis=0)[0]

    r = pick(255, q255, 0, 0, f255, 255)
    g = pick(f255, 255, 255, q255, 0, 0)
    b = pick(0, 0, f255, 255, 255, q255)

    mag = (jnp.abs(ox) + jnp.abs(oy)).astype(F32)
    imp = F32(res_impact)
    r = jnp.trunc(jnp.clip(r.astype(F32) / F32(255.0) * mag * imp, F32(0.0), F32(255.0))).astype(jnp.int32)
    g = jnp.trunc(jnp.clip(g.astype(F32) / F32(255.0) * jnp.abs(oy).astype(F32) * F32(2.0) * imp,
                           F32(0.0), F32(255.0))).astype(jnp.int32)
    b = jnp.trunc(jnp.clip(b.astype(F32) / F32(255.0) * mag * imp, F32(0.0), F32(255.0))).astype(jnp.int32)

    r = jnp.where(no_flow, 0, r)
    g = jnp.where(no_flow, 0, g)
    b = jnp.where(no_flow, 0, b)

    rf, gf, bf = r.astype(F32), g.astype(F32), b.astype(F32)
    y_val = jnp.trunc(jnp.clip(rf * F32(0.299) + gf * F32(0.587) + bf * F32(0.114),
                               F32(0.0), F32(255.0))).astype(jnp.int32)
    u_val = jnp.trunc(jnp.clip(rf * F32(-0.168736) + gf * F32(-0.331264) + bf * F32(0.5) + F32(128.0),
                               F32(0.0), F32(255.0))).astype(jnp.int32)
    v_val = jnp.trunc(jnp.clip(rf * F32(0.5) + gf * F32(-0.418688) + bf * F32(-0.081312) + F32(128.0),
                               F32(0.0), F32(255.0))).astype(jnp.int32)

    curr = curr_pixel.astype(jnp.int32)
    if is_hdr:  # (ref: warpFrameKernelHDR.h:107-111)
        y_out = (y_val << 7) + (curr >> 1)
        u_out = u_val << 8
        v_out = v_val << 8
    else:
        y_out = (y_val >> 1) + (curr >> 1)
        u_out = u_val
        v_out = v_val
    return jnp.where(channel == 0, y_out, jnp.where(channel == 1, u_out, v_out))


@functools.partial(
    jax.jit, static_argnames=("res_scalar", "mode", "cz", "is_hdr", "out_rows")
)
def warp_frame_plane(
    src12_y: jnp.ndarray,
    src12_uv: jnp.ndarray,
    src21_y: jnp.ndarray,
    src21_uv: jnp.ndarray,
    flow: jnp.ndarray,            # (2, low_h, low_w) int16 blurred offsets
    frame_scalar12: jnp.ndarray,  # traced f32 = blending scalar t
    black_level: jnp.ndarray,     # traced f32 (HDR caller pre-scales x256)
    white_level: jnp.ndarray,     # traced f32
    row_offset: jnp.ndarray | int = 0,  # traced: absolute row of this shard's first row
    *,
    res_scalar: int,
    mode: int,
    cz: int,
    is_hdr: bool,
    out_rows: int | None = None,  # rows this shard produces (None = full plane)
) -> jnp.ndarray:
    """One plane (cz=0: Y (H,W); cz=1: interleaved UV (H/2,W)) of the warp kernel
    (ref: warpFrameKernelSDR.h:116-184).

    out_rows/row_offset shard the OUTPUT rows across devices (spatial parallelism):
    sources stay whole (replicated); each shard computes rows
    [row_offset, row_offset + out_rows) in absolute plane coordinates."""
    dim_y, dim_x = src12_y.shape
    low_h, low_w = flow.shape[1:]
    out_h = out_rows if out_rows is not None else (dim_y >> cz)
    dtype = jnp.uint16 if is_hdr else jnp.uint8
    src12 = src12_y if cz == 0 else src12_uv
    src21 = src21_y if cz == 0 else src21_uv
    plane_h = src12.shape[0]

    fs12 = frame_scalar12.astype(F32)
    fs21 = (F32(1.0) - fs12).astype(F32)

    cx = jax.lax.broadcasted_iota(jnp.int32, (out_h, dim_x), 1)
    cy = jax.lax.broadcasted_iota(jnp.int32, (out_h, dim_x), 0) + jnp.asarray(
        row_offset, jnp.int32
    )
    adj_cx, adj_cy = cx, cy

    done = jnp.zeros((out_h, dim_x), dtype=bool)
    early = jnp.zeros((out_h, dim_x), dtype=jnp.int32)

    if mode == 5:  # SideBySide1: left half = source12 passthrough
        left = cx < (dim_x >> 1)
        early = jnp.where(left, src12[cy, cx].astype(jnp.int32), early)
        done = done | left
    elif mode == 6:  # SideBySide2
        vo = (dim_y >> 2) >> cz
        band = (cy >= vo) & (cy < vo + (dim_y >> (1 + cz)))
        in_left = band & (cx < (dim_x >> 1))
        in_right = band & (cx >= (dim_x >> 1)) & (cx < dim_x)
        src_rows = jnp.clip((cy - vo) << 1, 0, plane_h - 1)
        src_cols = jnp.clip((cx << 1) + ((cx & 1) if cz else 0), 0, dim_x - 1)
        early = jnp.where(in_left, src12[src_rows, src_cols].astype(jnp.int32), early)
        black_fill = (32768 if is_hdr else 128) if cz else 0
        outside = ~in_left & ~in_right
        early = jnp.where(outside, black_fill, early)
        done = done | in_left | outside
        adj_cx = jnp.where(in_right, (cx - (dim_x >> 1)) << 1, cx)
        adj_cy = jnp.where(in_right, (cy - vo) << 1, cy)

    # Flow lookup (ref: warpFrameKernelSDR.h:153-158).
    if cz:
        scaled_cx = (adj_cx >> res_scalar) & ~1
        scaled_cy = (adj_cy >> res_scalar) << 1
    else:
        scaled_cx = adj_cx >> res_scalar
        scaled_cy = adj_cy >> res_scalar
    scaled_cx = jnp.clip(scaled_cx, 0, low_w - 1)
    scaled_cy = jnp.clip(scaled_cy, 0, low_h - 1)

    flow_x = flow[0]
    flow_y = flow[1]
    off_x12 = flow_x[scaled_cy, scaled_cx].astype(jnp.int32)
    off_y12 = flow_y[scaled_cy, scaled_cx].astype(jnp.int32)
    back_cy = jnp.clip(scaled_cy - (off_y12 >> res_scalar), 0, low_h - 1)
    back_cx = jnp.clip(scaled_cx - (off_x12 >> res_scalar), 0, low_w - 1)
    off_x21 = flow_x[back_cy, back_cx].astype(jnp.int32)
    off_y21 = flow_y[back_cy, back_cx].astype(jnp.int32)

    if mode == 4:  # GreyFlow (ref: warpFrameKernelSDR.h:161-164)
        if cz:
            grey = jnp.full((out_h, dim_x), 32768 if is_hdr else 128, jnp.int32)
        else:
            shift_g = 10 if is_hdr else 2
            peak = 65535 if is_hdr else 255
            grey = jnp.minimum((jnp.abs(off_x12) + jnp.abs(off_y12)) << shift_g, peak)
        return jnp.where(done, early, grey).astype(dtype)

    # Warped positions (ref: warpFrameKernelSDR.h:166-170).
    y_scale = F32(0.5) if cz else F32(1.0)
    plane_dim_y = (dim_y >> 1) if cz else dim_y
    new_cx12 = _mirror_warp(adj_cx + _round_c(off_x12.astype(F32) * fs12), dim_x)
    new_cy12 = _mirror_warp(adj_cy + _round_c(off_y12.astype(F32) * fs12 * y_scale), plane_dim_y)
    new_cx21 = _mirror_warp(adj_cx - _round_c(off_x21.astype(F32) * fs21), dim_x)
    new_cy21 = _mirror_warp(adj_cy - _round_c(off_y21.astype(F32) * fs21 * y_scale), plane_dim_y)

    if cz:
        col12 = (new_cx12 & ~1) + (cx & 1)
        col21 = (new_cx21 & ~1) + (cx & 1)
    else:
        col12, col21 = new_cx12, new_cx21

    if mode == 0:
        res = src12[new_cy12, col12].astype(jnp.int32)
    elif mode == 1:
        res = src21[new_cy21, col21].astype(jnp.int32)
    else:
        v12 = src12[new_cy12, col12].astype(F32)
        v21 = src21[new_cy21, col21].astype(F32)
        blended = jnp.trunc(v12 * fs21 + v21 * fs12).astype(jnp.int32)
        if mode == 3:
            channel = cz + (cx & 1) if cz else jnp.zeros_like(cx)
            res_impact = 4 if res_scalar <= 2 else 1
            neg_x = (-flow_x[scaled_cy, scaled_cx].astype(jnp.int32)).astype(jnp.int16)
            neg_y = (-flow_y[scaled_cy, scaled_cx].astype(jnp.int32)).astype(jnp.int16)
            blended = _visualize_flow(neg_x, neg_y, blended, channel, res_impact, is_hdr)
        if cz:
            res = _apply_levels_uv(blended, white_level.astype(F32), is_hdr)
        else:
            res = _apply_levels_y(blended, black_level.astype(F32), white_level.astype(F32), is_hdr)

    return jnp.where(done, early, res).astype(dtype)


@functools.partial(jax.jit, static_argnames=("res_scalar", "mode", "is_hdr"))
def warp_frame(
    src12_y, src12_uv, src21_y, src21_uv, flow, blending_scalar,
    black_level, white_level, *, res_scalar: int, mode: int, is_hdr: bool,
):
    """Both planes (Y launch + UV launch, ref: opticalFlowCalcSDR.cpp:152-167)."""
    t = jnp.asarray(blending_scalar, F32)
    black = jnp.asarray(black_level, F32)
    white = jnp.asarray(white_level, F32)
    y = warp_frame_plane(src12_y, src12_uv, src21_y, src21_uv, flow, t, black, white,
                         res_scalar=res_scalar, mode=mode, cz=0, is_hdr=is_hdr)
    uv = warp_frame_plane(src12_y, src12_uv, src21_y, src21_uv, flow, t, black, white,
                          res_scalar=res_scalar, mode=mode, cz=1, is_hdr=is_hdr)
    return y, uv


@functools.partial(jax.jit, static_argnames=("is_hdr",))
def copy_frame(src_y, src_uv, black_level, white_level, *, is_hdr: bool):
    """Passthrough with levels (ref: copyFrameKernelSDR.h:12-25)."""
    dtype = jnp.uint16 if is_hdr else jnp.uint8
    black = jnp.asarray(black_level, F32)
    white = jnp.asarray(white_level, F32)
    y = _apply_levels_y(src_y, black, white, is_hdr).astype(dtype)
    uv = _apply_levels_uv(src_uv, white, is_hdr).astype(dtype)
    return y, uv

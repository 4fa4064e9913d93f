"""Golden (NumPy) model of the six interpolation kernels.

This is the bit-exactness oracle for the TPU kernels. Every function re-states, in
vectorized NumPy with explicit C integer/float semantics, the behavior of one OpenCL
kernel from the reference:

  * calc_delta_sums          (ref: calcDeltaSumsKernelSDR.h / ...HDR.h)
  * determine_lowest_layer   (ref: determineLowestLayerKernelSDR.h)
  * adjust_offset_array      (ref: adjustOffsetArrayKernelSDR.h)
  * blur_flow                (ref: blurFlowKernelSDR.h)
  * warp_frame               (ref: warpFrameKernelSDR.h / ...HDR.h)
  * copy_frame               (ref: copyFrameKernelSDR.h / ...HDR.h)

plus the pyramid driver loop `calculate_optical_flow`
(ref: opticalFlowCalcSDR.cpp:44-139) and a full GoldenEngine with the reference's
3-frame ring buffer and 1-pair flow/warp pipeline (ref: opticalFlowCalcSDR.cpp:19-29,
opticalFlowCalc.h:73-78).

Layout notes (differences from the reference that are pure representation):
  * Frames are planar pairs (y: (H, W), uv: (H//2, W) interleaved U/V) instead of one
    flat NV12/P010 byte buffer; strides are handled at ingest, not here.
  * The windowed delta sums are stored compactly as (layers, n_win_y, n_win_x) instead
    of sparsely at window-origin cells of a (layers, low_h, low_w) array. Only the
    window-origin cells are ever consumed (ref: determineLowestLayerKernelSDR.h:16,
    adjustOffsetArrayKernelSDR.h:13-15), so this is bijective.

C semantics replicated exactly:
  * int16 ("short") wraparound in the offset arrays and uint32 wraparound in the
    window sums.
  * Truncating integer division (blur: `(short)(sum / 64)` truncates toward zero,
    ref: blurFlowKernelSDR.h:90; totalFrameDelta normalization,
    ref: opticalFlowCalcSDR.cpp:93).
  * `(int)round(...)` = round-half-away-from-zero in float32 (warp displacement,
    ref: warpFrameKernelSDR.h:167-170).
  * float -> unsigned integer conversions truncate toward zero.

Out-of-range behavior: where the reference would read out of bounds (undefined
behavior, e.g. mirrored coordinates still out of range for |offset| > dim), this model
clamps indices after mirroring. Divergence is only possible where the reference is UB.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from hopperrender_tpu import config

FIRST_NEIGHBOR_ITERATION = config.FIRST_NEIGHBOR_ITERATION

F32 = np.float32


def _signed_square_i16(rel: np.ndarray) -> np.ndarray:
    """rel * |rel| with the reference's `short` result type
    (ref: calcDeltaSumsKernelSDR.h:71,74; adjustOffsetArrayKernelSDR.h:19)."""
    r = rel.astype(np.int32)
    return (r * r * np.where(r > 0, 1, -1)).astype(np.int16)


def _mirror_in_frame(pos: np.ndarray, dim: int) -> np.ndarray:
    """Single mirror at frame borders used by the delta kernel
    (ref: calcDeltaSumsKernelSDR.h:86-95). Clamped afterwards for memory safety
    (reference is UB beyond one mirror)."""
    p = pos.astype(np.int64)
    # if/else-if in C: only ONE branch applies, based on the original value.
    m = np.where(p >= dim, dim - (p - dim + 1), np.where(p < 0, -p - 1, p))
    return np.clip(m, 0, dim - 1)


def _mirror_warp(pos: np.ndarray, dim: int) -> np.ndarray:
    """Warp-kernel mirror; clamps the result to [1, dim-2]
    (ref: warpFrameKernelSDR.h:12-20)."""
    p = pos.astype(np.int64)
    res = np.where(p >= dim - 1, p - (p - (dim - 2)) * 2, p)
    res = np.where(p < 1, -p + 1, res)
    return np.clip(res, 1, dim - 2)


def _round_c(x: np.ndarray) -> np.ndarray:
    """C round(): half away from zero, computed in float32 (ref: warpFrameKernelSDR.h:167)."""
    x = x.astype(F32)
    return np.where(x >= 0, np.floor(x + F32(0.5)), np.ceil(x - F32(0.5))).astype(np.int32)


def _abs_diff(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """OpenCL abs_diff: exact |a-b| without wrap (computed in int64 -> int32)."""
    return np.abs(a.astype(np.int64) - b.astype(np.int64)).astype(np.int32)


# ---------------------------------------------------------------------------
# calcDeltaSumsKernel
# ---------------------------------------------------------------------------

def calc_delta_sums(
    frame1_y: np.ndarray,
    frame1_uv: np.ndarray,
    frame2_y: np.ndarray,
    frame2_uv: np.ndarray,
    offsets: np.ndarray,  # (2, low_h, low_w) int16; [0]=X plane, [1]=Y plane
    window_size: int,
    search_radius: int,
    res_scalar: int,
    iteration: int,
    step: int,
    delta_scalar: int,
    neighbor_bias_scalar: int,
    is_hdr: bool,
) -> np.ndarray:
    """Cost volume + windowed reduction (ref: calcDeltaSumsKernelSDR.h:36-191).

    Returns compact window sums, shape (search_radius, n_win_y, n_win_x) uint32,
    where n_win = ceil(low_dim / window_size). Each cell is the uint32-wrapping sum of
    per-pixel (delta + offset bias + neighbor bias) over the window's in-bounds pixels
    (the reference accumulates the same per-8x8-workgroup partial sums via atomic_add,
    ref: calcDeltaSumsKernelSDR.h:156-190; integer addition is order-independent).
    """
    dim_y, dim_x = frame1_y.shape
    low_h, low_w = offsets.shape[1:]
    L = search_radius

    cx = np.arange(low_w, dtype=np.int32)[None, None, :]
    cy = np.arange(low_h, dtype=np.int32)[None, :, None]
    cz = np.arange(L, dtype=np.int32)[:, None, None]
    scaled_cx = cx << res_scalar
    scaled_cy = cy << res_scalar

    ideal_x = offsets[0].astype(np.int16)[None]
    ideal_y = offsets[1].astype(np.int16)[None]

    # Candidate adjustment: signed square of (cz % r) - r/2 on the active axis
    # (ref: calcDeltaSumsKernelSDR.h:67-77).
    rel = ((cz % L) - L // 2).astype(np.int16)
    rel_sq = _signed_square_i16(rel)
    if step % 2 == 0:
        rel_x, rel_y = rel_sq, np.zeros_like(rel_sq)
    else:
        rel_x, rel_y = np.zeros_like(rel_sq), rel_sq

    # `short offsetX = idealOffsetX + relOffsetAdjustmentX` — int16 wraparound.
    with np.errstate(over="ignore"):
        offset_x = (ideal_x + rel_x).astype(np.int16)
        offset_y = (ideal_y + rel_y).astype(np.int16)

    new_cx = scaled_cx + offset_x.astype(np.int32)
    new_cy = scaled_cy + offset_y.astype(np.int32)

    in_frame = (scaled_cx < dim_x) & (scaled_cy < dim_y)  # scaled coords are >= 0

    m_cx = _mirror_in_frame(np.broadcast_to(new_cx, (L, low_h, low_w)), dim_x)
    m_cy = _mirror_in_frame(np.broadcast_to(new_cy, (L, low_h, low_w)), dim_y)

    s_cx = np.clip(np.broadcast_to(scaled_cx, (1, low_h, low_w)), 0, dim_x - 1)
    s_cy = np.clip(np.broadcast_to(scaled_cy, (1, low_h, low_w)), 0, dim_y - 1)

    shift = 8 if is_hdr else 0  # HDR compares the top 8 bits (ref: calcDeltaSumsKernelHDR.h:98-100)

    f1_y = frame1_y.astype(np.int32) >> shift
    f2_y = frame2_y.astype(np.int32) >> shift
    f1_uv = frame1_uv.astype(np.int32) >> shift
    f2_uv = frame2_uv.astype(np.int32) >> shift

    uv_h, uv_w = frame1_uv.shape

    def uv_idx(yy, xx):
        u_y = np.clip(yy >> 1, 0, uv_h - 1)
        u_x = np.clip(xx & ~1, 0, uv_w - 1)
        v_x = np.clip((xx & ~1) + 1, 0, uv_w - 1)
        return u_y, u_x, v_x

    m_uy, m_ux, m_vx = uv_idx(m_cy, m_cx)
    s_uy, s_ux, s_vx = uv_idx(s_cy, s_cx)

    delta = (
        _abs_diff(f1_y[m_cy, m_cx], f2_y[s_cy, s_cx])
        + _abs_diff(f1_uv[m_uy, m_ux], f2_uv[s_uy, s_ux])
        + _abs_diff(f1_uv[m_uy, m_vx], f2_uv[s_uy, s_vx])
    ).astype(np.uint32)
    delta = delta << np.uint32(delta_scalar)
    delta = np.where(in_frame, delta, np.uint32(0))

    # Offset bias: |offset| on the active axis (ref: calcDeltaSumsKernelSDR.h:104-109).
    if step == 0:
        offset_bias = np.abs(offset_x.astype(np.int32)).astype(np.uint32)
    else:
        offset_bias = np.abs(offset_y.astype(np.int32)).astype(np.uint32)
    offset_bias = np.broadcast_to(offset_bias, (L, low_h, low_w))

    # Neighbor bias from iteration >= 4 (ref: calcDeltaSumsKernelSDR.h:112-144).
    neighbor_bias = np.zeros((L, low_h, low_w), dtype=np.uint32)
    if iteration >= FIRST_NEIGHBOR_ITERATION:
        plane = offsets[0 if step == 0 else 1].astype(np.int16)
        active = offset_x if step == 0 else offset_y
        nb = np.zeros((L, low_h, low_w), dtype=np.uint32)
        # Relative neighbor positions: down, right, left, up at +-2*windowSize.
        for dx, dy in ((0, 2 * window_size), (2 * window_size, 0),
                       (-2 * window_size, 0), (0, -2 * window_size)):
            ny = np.clip(np.arange(low_h, dtype=np.int64) + dy, 0, low_h - 1)
            nx = np.clip(np.arange(low_w, dtype=np.int64) + dx, 0, low_w - 1)
            n_off = plane[ny[:, None], nx[None, :]][None]  # (1, low_h, low_w) int16
            nb += _abs_diff(n_off, active).astype(np.uint32)
        neighbor_bias = nb << np.uint32(neighbor_bias_scalar)

    with np.errstate(over="ignore"):
        total = delta + offset_bias + neighbor_bias  # uint32, wrapping

    # Windowed sum over in-bounds pixels (compact layout).
    n_win_y = -(-low_h // window_size)
    n_win_x = -(-low_w // window_size)
    pad_h = n_win_y * window_size - low_h
    pad_w = n_win_x * window_size - low_w
    padded = np.pad(total, ((0, 0), (0, pad_h), (0, pad_w)))
    with np.errstate(over="ignore"):
        sums = padded.reshape(L, n_win_y, window_size, n_win_x, window_size).sum(
            axis=(2, 4), dtype=np.uint32
        )
    return sums


# ---------------------------------------------------------------------------
# determineLowestLayerKernel
# ---------------------------------------------------------------------------

def determine_lowest_layer(sums: np.ndarray, search_radius: int) -> np.ndarray:
    """Per-window argmin over layers, first minimum wins
    (ref: determineLowestLayerKernelSDR.h:16-27). sums: (L, n_win_y, n_win_x)."""
    return np.argmin(sums[:search_radius], axis=0).astype(np.uint8)


# ---------------------------------------------------------------------------
# adjustOffsetArrayKernel
# ---------------------------------------------------------------------------

def adjust_offset_array(
    offsets: np.ndarray,      # (2, low_h, low_w) int16, modified copy returned
    lowest_layer: np.ndarray,  # (n_win_y, n_win_x) uint8
    window_size: int,
    search_radius: int,
    step: int,
) -> np.ndarray:
    """Commit each window's winning candidate to all its pixels
    (ref: adjustOffsetArrayKernelSDR.h:11-20)."""
    low_h, low_w = offsets.shape[1:]
    ideal_rel = ((lowest_layer.astype(np.int32) % search_radius) - search_radius // 2)
    adj = _signed_square_i16(ideal_rel.astype(np.int16))
    adj_full = np.repeat(np.repeat(adj, window_size, axis=0), window_size, axis=1)
    adj_full = adj_full[:low_h, :low_w]
    out = offsets.copy()
    with np.errstate(over="ignore"):
        out[step & 1] = (out[step & 1] + adj_full).astype(np.int16)
    return out


# ---------------------------------------------------------------------------
# blurFlowKernel
# ---------------------------------------------------------------------------

def blur_flow(offsets: np.ndarray) -> np.ndarray:
    """8x8 box blur (window [-4, 4) in both axes), mirrored borders, truncating
    division by 64 (ref: blurFlowKernelSDR.h:3-4,79-91). offsets: (2, low_h, low_w)."""
    radius = 4
    _, low_h, low_w = offsets.shape
    # blur mirror: pos<0 -> -pos-1, pos>=dim -> dim-(pos-dim+1) == numpy 'symmetric'.
    padded = np.pad(
        offsets.astype(np.int64), ((0, 0), (radius, radius - 1), (radius, radius - 1)),
        mode="symmetric",
    )
    # Integral-image box sum over the 8x8 window.
    c = padded.cumsum(axis=1).cumsum(axis=2)
    c = np.pad(c, ((0, 0), (1, 0), (1, 0)))
    k = 2 * radius
    s = (
        c[:, k:, k:]
        - c[:, :-k, k:]
        - c[:, k:, :-k]
        + c[:, :-k, :-k]
    )
    s = s[:, :low_h, :low_w]
    div = 64
    out = np.sign(s) * (np.abs(s) // div)  # C integer division truncates toward zero
    return out.astype(np.int16)


# ---------------------------------------------------------------------------
# Flow pyramid driver (ref: opticalFlowCalcSDR.cpp:44-139)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class FlowParams:
    search_radius: int = config.MIN_SEARCH_RADIUS
    res_scalar: int = 0
    delta_scalar: int = config.DEFAULT_DELTA_SCALAR
    neighbor_bias_scalar: int = config.DEFAULT_NEIGHBOR_SCALAR
    num_iterations: int = config.NUM_ITERATIONS  # 0 = auto
    is_hdr: bool = False


def calculate_optical_flow(
    frame1_y, frame1_uv, frame2_y, frame2_uv, low_h: int, low_w: int, params: FlowParams
) -> tuple[np.ndarray, np.ndarray, int]:
    """Full pyramid loop. Returns (offsets, blurred_offsets, total_frame_delta).

    total_frame_delta is the window-(0,0) sum of layer (radius/2 - 1) at iteration 0
    step 0, divided (truncating) by low_h*low_w*10 (SDR) or *6 (HDR)
    (ref: opticalFlowCalcSDR.cpp:91-94, opticalFlowCalcHDR.cpp:93)."""
    window = config.initial_window_size(low_h, low_w)
    iters = config.num_pyramid_iterations(window, params.num_iterations)
    offsets = np.zeros((2, low_h, low_w), dtype=np.int16)
    total_frame_delta = 0

    for iteration in range(iters):
        for step in (0, 1):
            sums = calc_delta_sums(
                frame1_y, frame1_uv, frame2_y, frame2_uv, offsets,
                window, params.search_radius, params.res_scalar, iteration, step,
                params.delta_scalar, params.neighbor_bias_scalar, params.is_hdr,
            )
            if iteration == 0 and step == 0:
                norm = low_h * low_w * (6 if params.is_hdr else 10)
                total_frame_delta = int(sums[params.search_radius // 2 - 1, 0, 0]) // norm
            lowest = determine_lowest_layer(sums, params.search_radius)
            offsets = adjust_offset_array(offsets, lowest, window, params.search_radius, step)
        window = max(window >> 1, 1)

    blurred = blur_flow(offsets)
    return offsets, blurred, total_frame_delta


# ---------------------------------------------------------------------------
# warpFrameKernel (ref: warpFrameKernelSDR.h / HDR.h)
# ---------------------------------------------------------------------------

def _visualize_flow(
    offset_x: np.ndarray, offset_y: np.ndarray, curr_pixel: np.ndarray,
    channel: np.ndarray, res_impact: int, is_hdr: bool,
) -> np.ndarray:
    """HSV flow visualization (ref: warpFrameKernelSDR.h:23-113)."""
    ox = offset_x.astype(np.int32)
    oy = offset_y.astype(np.int32)
    no_flow = (np.abs(ox) < 1) & (np.abs(oy) < 1)

    angle_rad = np.arctan2(oy.astype(F32), ox.astype(F32)).astype(F32)
    m_pi_f = F32(np.float32(np.pi))
    angle_deg = (angle_rad * (F32(180.0) / m_pi_f)).astype(F32)
    angle_deg = np.where(angle_deg < 0, angle_deg + F32(360.0), angle_deg)
    angle_deg = np.mod(angle_deg, F32(360.0)).astype(F32)
    angle_deg = np.where(angle_deg < 0, angle_deg + F32(360.0), angle_deg)
    hue = (angle_deg / F32(360.0)).astype(F32)

    h_i = (hue * F32(6.0)).astype(np.int32)  # C truncation
    f = (hue * F32(6.0) - h_i.astype(F32)).astype(F32)
    q = (F32(1.0) - f).astype(F32)

    f255 = np.trunc(f * F32(255.0)).astype(np.int32)  # (unsigned char)(f * 255.0f)
    q255 = np.trunc(q * F32(255.0)).astype(np.int32)
    h_mod = h_i % 6

    r = np.select(
        [h_mod == 0, h_mod == 1, h_mod == 2, h_mod == 3, h_mod == 4, h_mod == 5],
        [255, q255, 0, 0, f255, 255], default=0,
    )
    g = np.select(
        [h_mod == 0, h_mod == 1, h_mod == 2, h_mod == 3, h_mod == 4, h_mod == 5],
        [f255, 255, 255, q255, 0, 0], default=0,
    )
    b = np.select(
        [h_mod == 0, h_mod == 1, h_mod == 2, h_mod == 3, h_mod == 4, h_mod == 5],
        [0, 0, f255, 255, 255, q255], default=0,
    )

    mag = (np.abs(ox) + np.abs(oy)).astype(F32)
    imp = F32(res_impact)
    # rgb.x = (uchar)clamp(rgb.x/255 * scale, 0, 255)  — float math, truncated store.
    r = np.trunc(np.clip(r.astype(F32) / F32(255.0) * mag * imp, F32(0.0), F32(255.0))).astype(np.int32)
    g = np.trunc(np.clip(g.astype(F32) / F32(255.0) * np.abs(oy).astype(F32) * F32(2.0) * imp,
                         F32(0.0), F32(255.0))).astype(np.int32)
    b = np.trunc(np.clip(b.astype(F32) / F32(255.0) * mag * imp, F32(0.0), F32(255.0))).astype(np.int32)

    r = np.where(no_flow, 0, r)
    g = np.where(no_flow, 0, g)
    b = np.where(no_flow, 0, b)

    rf, gf, bf = r.astype(F32), g.astype(F32), b.astype(F32)
    y_val = np.trunc(np.clip(rf * F32(0.299) + gf * F32(0.587) + bf * F32(0.114),
                             F32(0.0), F32(255.0))).astype(np.int32)
    u_val = np.trunc(np.clip(rf * F32(-0.168736) + gf * F32(-0.331264) + bf * F32(0.5) + F32(128.0),
                             F32(0.0), F32(255.0))).astype(np.int32)
    v_val = np.trunc(np.clip(rf * F32(0.5) + gf * F32(-0.418688) + bf * F32(-0.081312) + F32(128.0),
                             F32(0.0), F32(255.0))).astype(np.int32)

    curr = curr_pixel.astype(np.int32)
    if is_hdr:
        y_out = (y_val << 7) + (curr >> 1)
        u_out = u_val << 8
        v_out = v_val << 8
    else:
        y_out = (y_val >> 1) + (curr >> 1)
        u_out = u_val
        v_out = v_val
    return np.where(channel == 0, y_out, np.where(channel == 1, u_out, v_out))


def _apply_levels_y(value: np.ndarray, black: float, white: float, is_hdr: bool) -> np.ndarray:
    """(ref: warpFrameKernelSDR.h:3-5 / HDR.h:3-5). Returns truncated integer."""
    peak = F32(65535.0) if is_hdr else F32(255.0)
    v = (value.astype(F32) - F32(black)) / (F32(white) - F32(black)) * peak
    return np.trunc(np.clip(v, F32(0.0), peak)).astype(np.int64)


def _apply_levels_uv(value: np.ndarray, white: float, is_hdr: bool) -> np.ndarray:
    """(ref: warpFrameKernelSDR.h:7-9 / HDR.h:7-9)."""
    peak = F32(65535.0) if is_hdr else F32(255.0)
    mid = F32(32768.0) if is_hdr else F32(128.0)
    v = (value.astype(F32) - mid) / F32(white) * peak + mid
    return np.trunc(np.clip(v, F32(0.0), peak)).astype(np.int64)


def warp_frame_plane(
    src12_y, src12_uv, src21_y, src21_uv,
    flow: np.ndarray,          # (2, low_h, low_w) int16 blurred offsets
    frame_scalar12: float,     # = blending scalar t
    frame_scalar21: float,     # = 1 - t
    res_scalar: int,
    frame_output_mode: int,
    black_level: float,
    white_level: float,
    cz: int,
    is_hdr: bool,
) -> np.ndarray:
    """One plane (cz=0: Y, cz=1: interleaved UV) of the warp kernel
    (ref: warpFrameKernelSDR.h:116-184)."""
    dim_y, dim_x = src12_y.shape
    low_h, low_w = flow.shape[1:]
    out_h = dim_y >> cz
    dtype = np.uint16 if is_hdr else np.uint8
    src12 = src12_y if cz == 0 else src12_uv
    src21 = src21_y if cz == 0 else src21_uv
    plane_h = src12.shape[0]

    cx = np.broadcast_to(np.arange(dim_x, dtype=np.int32)[None, :], (out_h, dim_x))
    cy = np.broadcast_to(np.arange(out_h, dtype=np.int32)[:, None], (out_h, dim_x))
    adj_cx, adj_cy = cx, cy

    vertical_offset = dim_y >> 2
    mode = frame_output_mode
    out = np.zeros((out_h, dim_x), dtype=np.int64)
    # Masks for early-return regions.
    done = np.zeros((out_h, dim_x), dtype=bool)

    if mode == 5:
        left = cx < (dim_x >> 1)
        out = np.where(left, src12[cy, cx].astype(np.int64), out)
        done |= left
    elif mode == 6:
        vo = vertical_offset >> cz
        band = (cy >= vo) & (cy < vo + (dim_y >> (1 + cz)))
        in_left = band & (cx < (dim_x >> 1))
        in_right = band & (cx >= (dim_x >> 1)) & (cx < dim_x)
        src_rows = np.clip((cy - vo) << 1, 0, plane_h - 1)
        src_cols = np.clip((cx << 1) + ((cx & 1) if cz else 0), 0, dim_x - 1)
        out = np.where(in_left, src12[src_rows, src_cols].astype(np.int64), out)
        black_fill = 32768 if is_hdr else 128
        outside = ~in_left & ~in_right
        out = np.where(outside, (black_fill if cz else 0), out)
        done |= in_left | outside
        adj_cx = np.where(in_right, (cx - (dim_x >> 1)) << 1, cx)
        adj_cy = np.where(in_right, (cy - vo) << 1, cy)

    # Flow lookup (ref: warpFrameKernelSDR.h:153-158).
    if cz:
        scaled_cx = (adj_cx >> res_scalar) & ~1
        scaled_cy = (adj_cy >> res_scalar) << 1
    else:
        scaled_cx = adj_cx >> res_scalar
        scaled_cy = adj_cy >> res_scalar
    scaled_cx = np.clip(scaled_cx, 0, low_w - 1)
    scaled_cy = np.clip(scaled_cy, 0, low_h - 1)

    off_x12 = flow[0, scaled_cy, scaled_cx].astype(np.int32)
    off_y12 = flow[1, scaled_cy, scaled_cx].astype(np.int32)
    back_cy = np.clip(scaled_cy - (off_y12 >> res_scalar), 0, low_h - 1)
    back_cx = np.clip(scaled_cx - (off_x12 >> res_scalar), 0, low_w - 1)
    off_x21 = flow[0, back_cy, back_cx].astype(np.int32)
    off_y21 = flow[1, back_cy, back_cx].astype(np.int32)

    if mode == 4:  # GreyFlow (ref: warpFrameKernelSDR.h:161-164)
        if cz:
            grey = np.full_like(out, 32768 if is_hdr else 128)
        else:
            shift_g = 10 if is_hdr else 2
            peak = 65535 if is_hdr else 255
            grey = np.minimum((np.abs(off_x12) + np.abs(off_y12)) << shift_g, peak).astype(np.int64)
        res = np.where(done, out, grey)
        return res.astype(dtype)

    # Warped positions (ref: warpFrameKernelSDR.h:166-170).
    y_scale = F32(0.5) if cz else F32(1.0)
    plane_dim_y = (dim_y >> 1) if cz else dim_y
    new_cx12 = _mirror_warp(adj_cx + _round_c(off_x12.astype(F32) * F32(frame_scalar12)), dim_x)
    new_cy12 = _mirror_warp(
        adj_cy + _round_c(off_y12.astype(F32) * F32(frame_scalar12) * y_scale), plane_dim_y)
    new_cx21 = _mirror_warp(adj_cx - _round_c(off_x21.astype(F32) * F32(frame_scalar21)), dim_x)
    new_cy21 = _mirror_warp(
        adj_cy - _round_c(off_y21.astype(F32) * F32(frame_scalar21) * y_scale), plane_dim_y)

    if cz:
        col12 = (new_cx12 & ~1) + (cx & 1)
        col21 = (new_cx21 & ~1) + (cx & 1)
    else:
        col12, col21 = new_cx12, new_cx21

    v12 = src12[new_cy12, col12].astype(np.int64)
    v21 = src21[new_cy21, col21].astype(np.int64)

    if mode == 0:
        res = v12
    elif mode == 1:
        res = v21
    else:
        blended = np.trunc(
            v12.astype(F32) * F32(frame_scalar21) + v21.astype(F32) * F32(frame_scalar12)
        ).astype(np.int64)  # (unsigned short) conversion truncates
        if mode == 3:
            channel = cz + (cx & 1) if cz else np.zeros_like(cx)
            res_impact = 4 if res_scalar <= 2 else 1
            with np.errstate(over="ignore"):
                neg_x = (-flow[0, scaled_cy, scaled_cx].astype(np.int16)).astype(np.int16)
                neg_y = (-flow[1, scaled_cy, scaled_cx].astype(np.int16)).astype(np.int16)
            blended = _visualize_flow(neg_x, neg_y, blended, channel, res_impact, is_hdr)
        if cz:
            res = _apply_levels_uv(blended, white_level, is_hdr)
        else:
            res = _apply_levels_y(blended, black_level, white_level, is_hdr)

    res = np.where(done, out, res)
    return res.astype(dtype)


def warp_frame(
    src12_y, src12_uv, src21_y, src21_uv, flow, blending_scalar: float,
    res_scalar: int, frame_output_mode: int, black_level: float, white_level: float,
    is_hdr: bool,
) -> tuple[np.ndarray, np.ndarray]:
    """Both planes; black/white pre-scaled x256 for HDR by the caller's engine
    (ref: opticalFlowCalcHDR.cpp:151-152)."""
    t = float(blending_scalar)
    args = (src12_y, src12_uv, src21_y, src21_uv, flow, t, 1.0 - t, res_scalar,
            frame_output_mode, black_level, white_level)
    y = warp_frame_plane(*args, 0, is_hdr)
    uv = warp_frame_plane(*args, 1, is_hdr)
    return y, uv


# ---------------------------------------------------------------------------
# copyFrameKernel (ref: copyFrameKernelSDR.h / HDR.h)
# ---------------------------------------------------------------------------

def copy_frame(
    src_y, src_uv, black_level: float, white_level: float, is_hdr: bool
) -> tuple[np.ndarray, np.ndarray]:
    dtype = np.uint16 if is_hdr else np.uint8
    y = _apply_levels_y(src_y, black_level, white_level, is_hdr).astype(dtype)
    uv = _apply_levels_uv(src_uv, white_level, is_hdr).astype(dtype)
    return y, uv


# ---------------------------------------------------------------------------
# GoldenEngine — reference control flow (ring buffer + 1-pair pipeline)
# ---------------------------------------------------------------------------

class GoldenEngine:
    """Mirror of OpticalFlowCalcSDR/HDR host orchestration:
    3-deep frame ring (slot 2 = newest), flow computed between slots 1 and 2,
    warping reads slots 0 and 1 with the previous pair's blurred flow
    (ref: opticalFlowCalcSDR.cpp:19-29,113-123,141-183)."""

    def __init__(self, frame_height: int, frame_width: int, *, is_hdr: bool = False,
                 delta_scalar: int = config.DEFAULT_DELTA_SCALAR,
                 neighbor_scalar: int = config.DEFAULT_NEIGHBOR_SCALAR,
                 black_level: float = 0.0, white_level: float = 255.0,
                 max_calc_res: int = config.MAX_CALC_RES,
                 num_iterations: int = config.NUM_ITERATIONS):
        self.h, self.w = frame_height, frame_width
        self.is_hdr = is_hdr
        self.num_iterations = num_iterations  # 0 = auto (ref: config.h:6)
        self.res_scalar, self.low_h, self.low_w = config.calc_flow_dims(
            frame_height, frame_width, max_calc_res)
        self.search_radius = config.MIN_SEARCH_RADIUS
        self.delta_scalar = delta_scalar
        self.neighbor_scalar = neighbor_scalar
        self.black_level = black_level
        self.white_level = white_level
        dtype = np.uint16 if is_hdr else np.uint8
        self.frames_y = [np.zeros((self.h, self.w), dtype) for _ in range(3)]
        self.frames_uv = [np.zeros((self.h // 2, self.w), dtype) for _ in range(3)]
        self.blurred = [np.zeros((2, self.low_h, self.low_w), np.int16) for _ in range(2)]
        self.total_frame_delta = 0
        self.frame_count = 0

    def update_frame(self, y: np.ndarray, uv: np.ndarray) -> None:
        self.frames_y = [self.frames_y[1], self.frames_y[2], y.copy()]
        self.frames_uv = [self.frames_uv[1], self.frames_uv[2], uv.copy()]
        self.frame_count += 1

    def calculate_optical_flow(self) -> None:
        params = FlowParams(
            search_radius=self.search_radius, res_scalar=self.res_scalar,
            delta_scalar=self.delta_scalar, neighbor_bias_scalar=self.neighbor_scalar,
            is_hdr=self.is_hdr, num_iterations=self.num_iterations)
        _, blurred, delta = calculate_optical_flow(
            self.frames_y[1], self.frames_uv[1], self.frames_y[2], self.frames_uv[2],
            self.low_h, self.low_w, params)
        # blur writes blurred[0], then the double buffer swaps so blurred[0] holds the
        # PREVIOUS pair's flow for warping (ref: opticalFlowCalcSDR.cpp:115-123).
        self.blurred = [self.blurred[1], blurred]
        self.total_frame_delta = delta

    def _levels(self) -> tuple[float, float]:
        if self.is_hdr:  # (ref: opticalFlowCalcHDR.cpp:151-152)
            return self.black_level * 256.0, self.white_level * 256.0
        return self.black_level, self.white_level

    def warp_frames(self, blending_scalar: float, frame_output_mode: int):
        if blending_scalar > 1.0:
            raise ValueError("Blending scalar is greater than 1.0")
        black, white = self._levels()
        return warp_frame(
            self.frames_y[0], self.frames_uv[0], self.frames_y[1], self.frames_uv[1],
            self.blurred[0], blending_scalar, self.res_scalar, frame_output_mode,
            black, white, self.is_hdr)

    def copy_frame(self):
        idx = 0 if self.frame_count >= 3 else (1 if self.frame_count >= 2 else 2)
        black, white = self._levels()
        return copy_frame(self.frames_y[idx], self.frames_uv[idx], black, white, self.is_hdr)

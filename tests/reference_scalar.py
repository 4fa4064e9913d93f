"""Literal per-pixel Python translation of the reference OpenCL kernels.

Deliberately slow and scalar: each function follows the OpenCL C source text
line-by-line (cited per function) so it can serve as an unambiguous ground truth for
the vectorized golden model in hopperrender_tpu/ops/golden.py. Only suitable for tiny
frames inside tests.
"""

from __future__ import annotations

import math

import numpy as np

FIRST_NEIGHBOR_ITERATION = 4


def _i16(x: int) -> int:
    """Wrap to C `short`."""
    x &= 0xFFFF
    return x - 0x10000 if x >= 0x8000 else x


def _u32(x: int) -> int:
    return x & 0xFFFFFFFF


def _f32(x) -> np.float32:
    return np.float32(x)


def mirror_in_frame(pos: int, dim: int) -> int:
    # ref: calcDeltaSumsKernelSDR.h:86-95, clamped afterwards (UB guard, same as golden)
    if pos >= dim:
        pos = dim - (pos - dim + 1)
    elif pos < 0:
        pos = -pos - 1
    return min(max(pos, 0), dim - 1)


def calc_delta_sums_scalar(f1y, f1uv, f2y, f2uv, offsets, window_size, search_radius,
                           res_scalar, iteration, step, delta_scalar, neighbor_scalar,
                           is_hdr):
    """ref: calcDeltaSumsKernelSDR.h:36-191 (HDR: compare >>8)."""
    dim_y, dim_x = f1y.shape
    low_h, low_w = offsets.shape[1:]
    n_wy = -(-low_h // window_size)
    n_wx = -(-low_w // window_size)
    sums = np.zeros((search_radius, n_wy, n_wx), dtype=np.uint64)
    shift = 8 if is_hdr else 0
    uv_h, uv_w = f1uv.shape

    def sample_y(fr, y, x):
        return int(fr[min(max(y, 0), dim_y - 1), min(max(x, 0), dim_x - 1)]) >> shift

    def sample_uv(fr, y, x):
        return int(fr[min(max(y, 0), uv_h - 1), min(max(x, 0), uv_w - 1)]) >> shift

    for cz in range(search_radius):
        rel = (cz % search_radius) - search_radius // 2
        rel = _i16(rel * rel * (1 if rel > 0 else -1))
        for cy in range(low_h):
            for cx in range(low_w):
                ideal_x = int(offsets[0, cy, cx])
                ideal_y = int(offsets[1, cy, cx])
                rel_x = rel if (step & 1) == 0 else 0
                rel_y = rel if (step & 1) == 1 else 0
                offset_x = _i16(ideal_x + rel_x)
                offset_y = _i16(ideal_y + rel_y)
                scaled_cx = cx << res_scalar
                scaled_cy = cy << res_scalar
                new_cx = scaled_cx + offset_x
                new_cy = scaled_cy + offset_y

                if scaled_cx < 0 or scaled_cx >= dim_x or scaled_cy < 0 or scaled_cy >= dim_y:
                    delta = 0
                else:
                    mx = mirror_in_frame(new_cx, dim_x)
                    my = mirror_in_frame(new_cy, dim_y)
                    delta = (
                        abs(sample_y(f1y, my, mx) - sample_y(f2y, scaled_cy, scaled_cx))
                        + abs(sample_uv(f1uv, my >> 1, mx & ~1)
                              - sample_uv(f2uv, scaled_cy >> 1, scaled_cx & ~1))
                        + abs(sample_uv(f1uv, my >> 1, (mx & ~1) + 1)
                              - sample_uv(f2uv, scaled_cy >> 1, (scaled_cx & ~1) + 1))
                    )
                    delta = _u32(delta << delta_scalar)

                offset_bias = abs(offset_x) if step == 0 else abs(offset_y)

                neighbor_bias = 0
                if iteration >= FIRST_NEIGHBOR_ITERATION:
                    for dx, dy in ((0, 2 * window_size), (2 * window_size, 0),
                                   (-2 * window_size, 0), (0, -2 * window_size)):
                        ny = min(max(cy + dy, 0), low_h - 1)
                        nx = min(max(cx + dx, 0), low_w - 1)
                        if step == 0:
                            n_off = int(offsets[0, ny, nx])
                            neighbor_bias += abs(n_off - offset_x)
                        else:
                            n_off = int(offsets[1, ny, nx])
                            neighbor_bias += abs(n_off - offset_y)
                    neighbor_bias = _u32(neighbor_bias << neighbor_scalar)

                total = _u32(delta + offset_bias + neighbor_bias)
                wy, wx = cy // window_size, cx // window_size
                sums[cz, wy, wx] = _u32(int(sums[cz, wy, wx]) + total)
    return sums.astype(np.uint32)


def determine_lowest_layer_scalar(sums, search_radius):
    """ref: determineLowestLayerKernelSDR.h:16-27 (strict <, first min wins)."""
    _, n_wy, n_wx = sums.shape
    out = np.zeros((n_wy, n_wx), dtype=np.uint8)
    for wy in range(n_wy):
        for wx in range(n_wx):
            lowest = 0
            for z in range(1, search_radius):
                if sums[z, wy, wx] < sums[lowest, wy, wx]:
                    lowest = z
            out[wy, wx] = lowest
    return out


def adjust_offset_array_scalar(offsets, lowest_layer, window_size, search_radius, step):
    """ref: adjustOffsetArrayKernelSDR.h:11-20."""
    out = offsets.copy()
    low_h, low_w = offsets.shape[1:]
    for cy in range(low_h):
        for cx in range(low_w):
            ll = int(lowest_layer[cy // window_size, cx // window_size])
            rel = (ll % search_radius) - search_radius // 2
            adj = _i16(rel * rel * (1 if rel > 0 else -1))
            out[step & 1, cy, cx] = _i16(int(out[step & 1, cy, cx]) + adj)
    return out


def blur_flow_scalar(offsets):
    """ref: blurFlowKernelSDR.h:7-14 (mirror), 79-91 (sum [-4,4), truncating /64)."""
    radius = 4
    _, low_h, low_w = offsets.shape
    out = np.zeros_like(offsets)

    def mirror(pos, dim):
        if pos >= dim:
            return dim - (pos - dim + 1)
        if pos < 0:
            return -pos - 1
        return pos

    for gz in range(2):
        for gy in range(low_h):
            for gx in range(low_w):
                s = 0
                for ky in range(-radius, radius):
                    for kx in range(-radius, radius):
                        s += int(offsets[gz, mirror(gy + ky, low_h), mirror(gx + kx, low_w)])
                q = abs(s) // 64 * (1 if s >= 0 else -1)  # C trunc toward zero
                out[gz, gy, gx] = _i16(q)
    return out


def mirror_warp(pos: int, dim: int) -> int:
    """ref: warpFrameKernelSDR.h:12-20."""
    res = pos
    if pos >= dim - 1:
        res = pos - ((pos - (dim - 2)) * 2)
    elif pos < 1:
        res = -pos + 1
    return min(max(res, 1), dim - 2)


def _round_c(x: np.float32) -> int:
    x = float(np.float32(x))
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def visualize_flow_scalar(offset_x, offset_y, curr_pixel, channel, res_impact, is_hdr):
    """ref: warpFrameKernelSDR.h:23-113 / HDR.h:23-113."""
    if abs(offset_x) < 1.0 and abs(offset_y) < 1.0:
        r = g = b = 0
    else:
        angle_rad = _f32(math.atan2(float(offset_y), float(offset_x)))
        m_pi_f = np.float32(np.pi)
        angle_deg = _f32(angle_rad * _f32(_f32(180.0) / m_pi_f))
        if angle_deg < 0:
            angle_deg = _f32(angle_deg + _f32(360.0))
        angle_deg = _f32(np.fmod(angle_deg, _f32(360.0)))
        if angle_deg < 0:
            angle_deg = _f32(angle_deg + _f32(360.0))
        hue = _f32(angle_deg / _f32(360.0))
        h_i = int(hue * _f32(6.0))
        f = _f32(hue * _f32(6.0) - _f32(h_i))
        q = _f32(_f32(1.0) - f)
        table = {
            0: (255, int(f * _f32(255.0)), 0),
            1: (int(q * _f32(255.0)), 255, 0),
            2: (0, 255, int(f * _f32(255.0))),
            3: (0, int(q * _f32(255.0)), 255),
            4: (int(f * _f32(255.0)), 0, 255),
            5: (255, 0, int(q * _f32(255.0))),
        }
        r, g, b = table[h_i % 6]
        mag = _f32(abs(offset_x) + abs(offset_y))
        imp = _f32(res_impact)
        r = int(max(min(_f32(_f32(r) / _f32(255.0)) * mag * imp, _f32(255.0)), _f32(0.0)))
        g = int(max(min(_f32(_f32(g) / _f32(255.0)) * _f32(abs(offset_y)) * _f32(2.0) * imp,
                        _f32(255.0)), _f32(0.0)))
        b = int(max(min(_f32(_f32(b) / _f32(255.0)) * mag * imp, _f32(255.0)), _f32(0.0)))

    rf, gf, bf = _f32(r), _f32(g), _f32(b)
    if channel == 0:
        y = int(max(min(rf * _f32(0.299) + gf * _f32(0.587) + bf * _f32(0.114),
                        _f32(255.0)), _f32(0.0)))
        if is_hdr:
            return (y << 7) + (int(curr_pixel) >> 1)
        return (y >> 1) + (int(curr_pixel) >> 1)
    if channel == 1:
        u = int(max(min(rf * _f32(-0.168736) + gf * _f32(-0.331264) + bf * _f32(0.5)
                        + _f32(128.0), _f32(255.0)), _f32(0.0)))
        return (u << 8) if is_hdr else u
    v = int(max(min(rf * _f32(0.5) + gf * _f32(-0.418688) + bf * _f32(-0.081312)
                    + _f32(128.0), _f32(255.0)), _f32(0.0)))
    return (v << 8) if is_hdr else v


def apply_levels_y_scalar(value, black, white, is_hdr):
    peak = _f32(65535.0) if is_hdr else _f32(255.0)
    v = _f32(_f32(_f32(value) - _f32(black)) / _f32(_f32(white) - _f32(black)) * peak)
    return int(max(min(v, peak), _f32(0.0)))


def apply_levels_uv_scalar(value, white, is_hdr):
    peak = _f32(65535.0) if is_hdr else _f32(255.0)
    mid = _f32(32768.0) if is_hdr else _f32(128.0)
    v = _f32(_f32(_f32(value) - mid) / _f32(white) * peak + mid)
    return int(max(min(v, peak), _f32(0.0)))


def warp_frame_plane_scalar(src12_y, src12_uv, src21_y, src21_uv, flow,
                            frame_scalar12, frame_scalar21, res_scalar,
                            frame_output_mode, black_level, white_level, cz, is_hdr):
    """ref: warpFrameKernelSDR.h:116-184, one plane."""
    dim_y, dim_x = src12_y.shape
    low_h, low_w = flow.shape[1:]
    out_h = dim_y >> cz
    dtype = np.uint16 if is_hdr else np.uint8
    src12 = src12_y if cz == 0 else src12_uv
    src21 = src21_y if cz == 0 else src21_uv
    out = np.zeros((out_h, dim_x), dtype=dtype)
    vertical_offset = dim_y >> 2
    fs12 = _f32(frame_scalar12)
    fs21 = _f32(frame_scalar21)
    mode = frame_output_mode

    for cy in range(out_h):
        for cx in range(dim_x):
            adj_cx, adj_cy = cx, cy
            if mode == 5 and cx < (dim_x >> 1):
                out[cy, cx] = src12[cy, cx]
                continue
            if mode == 6:
                vo = vertical_offset >> cz
                in_band = vo <= cy < vo + (dim_y >> (1 + cz))
                in_left = in_band and cx < (dim_x >> 1)
                in_right = in_band and (dim_x >> 1) <= cx < dim_x
                if in_left:
                    out[cy, cx] = src12[(cy - vo) << 1, (cx << 1) + ((cx & 1) if cz else 0)]
                    continue
                elif in_right:
                    adj_cx = (cx - (dim_x >> 1)) << 1
                    adj_cy = (cy - vo) << 1
                else:
                    out[cy, cx] = (32768 if is_hdr else 128) if cz else 0
                    continue

            if cz:
                scaled_cx = (adj_cx >> res_scalar) & ~1
                scaled_cy = (adj_cy >> res_scalar) << 1
            else:
                scaled_cx = adj_cx >> res_scalar
                scaled_cy = adj_cy >> res_scalar
            scaled_cx = min(max(scaled_cx, 0), low_w - 1)
            scaled_cy = min(max(scaled_cy, 0), low_h - 1)

            off_x12 = int(flow[0, scaled_cy, scaled_cx])
            off_y12 = int(flow[1, scaled_cy, scaled_cx])
            by = min(max(scaled_cy - (off_y12 >> res_scalar), 0), low_h - 1)
            bx = min(max(scaled_cx - (off_x12 >> res_scalar), 0), low_w - 1)
            off_x21 = int(flow[0, by, bx])
            off_y21 = int(flow[1, by, bx])

            if mode == 4:
                if cz:
                    out[cy, cx] = 32768 if is_hdr else 128
                else:
                    shift_g = 10 if is_hdr else 2
                    peak = 65535 if is_hdr else 255
                    out[cy, cx] = min((abs(off_x12) + abs(off_y12)) << shift_g, peak)
                continue

            y_scale = _f32(0.5) if cz else _f32(1.0)
            plane_dim_y = (dim_y >> 1) if cz else dim_y
            new_cx12 = mirror_warp(adj_cx + _round_c(_f32(off_x12) * fs12), dim_x)
            new_cy12 = mirror_warp(adj_cy + _round_c(_f32(_f32(off_y12) * fs12 * y_scale)),
                                   plane_dim_y)
            new_cx21 = mirror_warp(adj_cx - _round_c(_f32(off_x21) * fs21), dim_x)
            new_cy21 = mirror_warp(adj_cy - _round_c(_f32(_f32(off_y21) * fs21 * y_scale)),
                                   plane_dim_y)

            if cz:
                col12 = (new_cx12 & ~1) + (cx & 1)
                col21 = (new_cx21 & ~1) + (cx & 1)
            else:
                col12, col21 = new_cx12, new_cx21

            if mode == 0:
                out[cy, cx] = src12[new_cy12, col12]
            elif mode == 1:
                out[cy, cx] = src21[new_cy21, col21]
            else:
                blended = int(_f32(_f32(int(src12[new_cy12, col12])) * fs21
                                   + _f32(int(src21[new_cy21, col21])) * fs12))
                if mode == 3:
                    channel = cz + (cx & 1) if cz else 0
                    res_impact = 4 if res_scalar <= 2 else 1
                    blended = visualize_flow_scalar(
                        _i16(-off_x12), _i16(-off_y12), blended, channel, res_impact, is_hdr)
                if cz:
                    out[cy, cx] = apply_levels_uv_scalar(blended, white_level, is_hdr)
                else:
                    out[cy, cx] = apply_levels_y_scalar(blended, black_level, white_level, is_hdr)
    return out


def copy_frame_scalar(src_y, src_uv, black_level, white_level, is_hdr):
    """ref: copyFrameKernelSDR.h:12-25."""
    dtype = np.uint16 if is_hdr else np.uint8
    y = np.zeros_like(src_y, dtype=dtype)
    uv = np.zeros_like(src_uv, dtype=dtype)
    for cy in range(src_y.shape[0]):
        for cx in range(src_y.shape[1]):
            y[cy, cx] = apply_levels_y_scalar(int(src_y[cy, cx]), black_level, white_level, is_hdr)
    for cy in range(src_uv.shape[0]):
        for cx in range(src_uv.shape[1]):
            uv[cy, cx] = apply_levels_uv_scalar(int(src_uv[cy, cx]), white_level, is_hdr)
    return y, uv

"""Strip-mined warp: the TPU-fast formulation of warpFrameKernel modes 0/1/2.

Same principle as ops/flow_strip.py: the blurred flow is constant per low-res cell
(ref: warpFrameKernelSDR.h:153-158), so each output row of a cell reads a RUN of
2^rs consecutive source samples at a cell-constant displacement. One int32-block
gather per (output row, cell) replaces 2^rs point gathers.

Mirroring (ref: warpFrameKernelSDR.h:12-20 — reflect about 1 and dim-2, then clamp
to [1, dim-2]; note rows 0 and dim-1 are remapped even in range) is baked into
warp-apron-padded planes built once per frame.

UV handling: output column cx reads byte (mirror(cx+dx) & ~1) + (cx & 1) — the pair
index is mirror(cx+dx) >> 1 and the byte is the OUTPUT parity. Two precomputed pair
interleavings (P0 = (u[s], v[s]) for even dx; P1 = (u[s], v[s+1]) for odd dx, with
exact mirrored pads and boundary fixups) make every run contiguous; the dx parity
selects the plane via the row index of a stacked array (no extra gathers).

Visualization modes: 3 (HSV flow) rides this formulation too — the blended
pre-levels samples are already here and the flow color is per-cell constant, so
the HSV math runs on structured (repeat) flow upsamples, no extra gathers.
Mode 4 (grey flow) needs NO source samples at all: grey_flow_frame below is
pure structured math. Modes 5/6 compose in ops/warp_viz.py. res_scalar==0 /
non-multiple dims keep ops/warp.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hopperrender_tpu.ops import flow_strip
from hopperrender_tpu.ops.warp import (F32, _round_c, _apply_levels_y,
                                       _apply_levels_uv, _visualize_flow)

_strip_gather = flow_strip._strip_gather


def _warp_mirror_pad_axis(x: jnp.ndarray, a: int, axis: int) -> jnp.ndarray:
    """Pad + REMAP an axis with the warp mirror rule: value at padded position
    a + t equals x[clamp(mirror_warp(t))] for t in [-a, dim+a). Note positions 0 and
    dim-1 map to 1 and dim-3 (ref: warpFrameKernelSDR.h:12-20)."""
    dim = x.shape[axis]

    def sl(lo, hi):
        return jax.lax.slice_in_dim(x, lo, hi, axis=axis)

    def flip(y):
        return jnp.flip(y, axis=axis)

    sym = min(a, dim - 4) if dim > 4 else 0
    parts = []
    if sym > 0:
        parts.append(flip(sl(2, 2 + sym)))           # t in [-sym, 0): x[1 - t]
    parts.extend([sl(1, 2), sl(1, dim - 1), sl(dim - 3, dim - 2)])  # t in [0, dim)
    if sym > 0:
        parts.append(flip(sl(dim - 3 - sym, dim - 3)))  # t in [dim, dim+sym): x[2(dim-2)-t]
    out = jnp.concatenate(parts, axis=axis)
    extra = a - sym
    if extra > 0:
        far_lo = sl(dim - 2, dim - 1)  # over-reflection clamps to dim-2
        far_hi = sl(1, 2)              # ... and to 1 on the other side
        out = jnp.concatenate(
            [jnp.concatenate([far_lo] * extra, axis=axis), out,
             jnp.concatenate([far_hi] * extra, axis=axis)], axis=axis)
    return out


def _uv_pair_planes(uv: jnp.ndarray, is_hdr: bool):
    """P0[s] = (u[s], v[s]); P1[s] = (u[s], v[s+1]) with the exact column-mirror
    boundary values (derivation in module docstring). Returns (P0, P1) as packed
    pair elements (u16 SDR / u32 HDR), un-padded columns handled by caller pads."""
    hc, w = uv.shape
    wc = w // 2
    u = uv[:, 0::2]
    v = uv[:, 1::2]
    pair_dtype = jnp.uint32 if is_hdr else jnp.uint16

    def pack(a, b):
        return jax.lax.bitcast_convert_type(jnp.stack([a, b], axis=-1), pair_dtype)

    p0 = pack(u, v)
    # P0 boundary: s = wc-1 has 2s+1 = w-1 -> mirror -> v[wc-2].
    p0 = p0.at[:, wc - 1].set(pack(u[:, wc - 1:wc], v[:, wc - 2:wc - 1])[:, 0])
    v_next = jnp.concatenate([v[:, 1:], v[:, wc - 2:wc - 1]], axis=1)
    p1 = pack(u, v_next)
    # P1 boundary s = wc-1: u at m(2s+1 = W-1) = W-3 -> pair wc-2; v at m(2s+2 = W)
    # = W-4 -> pair wc-2.
    p1 = p1.at[:, wc - 1].set(pack(u[:, wc - 2:wc - 1], v[:, wc - 2:wc - 1])[:, 0])
    return p0, p1


def _pad_pair_cols(p: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, ac: int, q: int,
                   is_hdr: bool) -> jnp.ndarray:
    """Column pads for pair plane P_q: low side s in [-ac, 0): q=0 -> (u[1-s], v[-s]);
    q=1 -> (u[-s], v[-s]). High side s in [wc, wc+ac): q=0 -> (u[2wc-2-s], v[2wc-3-s]...
    computed from the mirror algebra); clamp far fills beyond one reflection."""
    hc, wc = u.shape
    pair_dtype = jnp.uint32 if is_hdr else jnp.uint16

    def pack(a, b):
        return jax.lax.bitcast_convert_type(jnp.stack([a, b], axis=-1), pair_dtype)

    def idx_cols(plane, idx):
        idx = jnp.clip(jnp.asarray(idx, jnp.int32), 0, wc - 1)
        return plane[:, idx]

    s_lo = jnp.arange(-ac, 0)
    s_hi = jnp.arange(wc, wc + ac)
    if q == 0:
        # lo: u index m(2s)>>1 = (1-2s)>>1 = -s ; v index m(2s+1)>>1 = -s
        lo = pack(idx_cols(u, -s_lo), idx_cols(v, -s_lo))
        # high: u index m(2s)>>1 = (2W-4-2s)>>1 = 2wc-2-s ; v: m(2s+1)>>1 = 2wc-3-s
        hi = pack(idx_cols(u, 2 * wc - 2 - s_hi), idx_cols(v, 2 * wc - 3 - s_hi))
    else:
        # lo: u index m(2s+1)>>1 = -s ; v index m(2s+2)>>1 = (-2s-2)>>1... = -s-1
        lo = pack(idx_cols(u, -s_lo), idx_cols(v, -s_lo - 1))
        # hi: u: m(2s+1)>>1 = 2wc-3-s ; v: m(2s+2)>>1 = 2wc-3-s
        hi = pack(idx_cols(u, 2 * wc - 3 - s_hi), idx_cols(v, 2 * wc - 3 - s_hi))
    return jnp.concatenate([lo, p, hi], axis=1)


@functools.partial(jax.jit, static_argnames=("apron", "is_hdr"))
def build_warp_context(y: jnp.ndarray, uv: jnp.ndarray, *, apron: int, is_hdr: bool):
    """Warp-padded planes per frame: luma (both axes), UV pair planes stacked by dx
    parity (rows warp-padded in chroma space; columns per the pair-mirror algebra)."""
    a = apron
    pad_y = _warp_mirror_pad_axis(_warp_mirror_pad_axis(y, a, 0), a, 1)
    p0, p1 = _uv_pair_planes(uv, is_hdr)
    u = uv[:, 0::2]
    v = uv[:, 1::2]
    ac = a // 2
    p0 = _pad_pair_cols(p0, u, v, ac, 0, is_hdr)
    p1 = _pad_pair_cols(p1, u, v, ac, 1, is_hdr)
    p0 = _warp_mirror_pad_axis(p0, a, 0)  # chroma rows mirror in UV-row space
    p1 = _warp_mirror_pad_axis(p1, a, 0)
    pad_uv = jnp.stack([p0, p1])          # (2, Hc + 2a, Wc + 2ac)
    return dict(wpad_y=pad_y, wpad_uv=pad_uv)


def _pair_offsets(flow: jnp.ndarray, res_scalar: int, low_h: int, low_w: int):
    """The t-INDEPENDENT half of the per-cell displacement math: flow12 at the
    cell and flow21 sampled at (cell - flow12 >> rs) clamped (the back-flow
    gather, ref: warpFrameKernelSDR.h:153-158). Hoist this out of any per-t
    vmap — the back gather is the table build's one real gather (~low_h*low_w
    indices) and it is identical for every output of a pair."""
    off_x12 = flow[0].astype(jnp.int32)
    off_y12 = flow[1].astype(jnp.int32)
    back_y = jnp.clip(
        jax.lax.broadcasted_iota(jnp.int32, (low_h, low_w), 0)
        - (off_y12 >> res_scalar), 0, low_h - 1)
    back_x = jnp.clip(
        jax.lax.broadcasted_iota(jnp.int32, (low_h, low_w), 1)
        - (off_x12 >> res_scalar), 0, low_w - 1)
    off_x21 = flow[0][back_y, back_x].astype(jnp.int32)
    off_y21 = flow[1][back_y, back_x].astype(jnp.int32)
    return off_x12, off_y12, off_x21, off_y21


def _displacements_from_offsets(offs, t):
    """The t-DEPENDENT half: C-rounded scaled offsets (elementwise only;
    ref: warpFrameKernelSDR.h:166-170)."""
    off_x12, off_y12, off_x21, off_y21 = offs
    fs12 = jnp.asarray(t, F32)
    fs21 = (F32(1.0) - fs12).astype(F32)
    dx12 = _round_c(off_x12.astype(F32) * fs12)
    dy12 = _round_c(off_y12.astype(F32) * fs12)
    dx21 = -_round_c(off_x21.astype(F32) * fs21)
    dy21 = -_round_c(off_y21.astype(F32) * fs21)
    # UV plane: halved Y displacement (ref: warpFrameKernelSDR.h:168,170)
    dy12_uv = _round_c(off_y12.astype(F32) * fs12 * F32(0.5))
    dy21_uv = -_round_c(off_y21.astype(F32) * fs21 * F32(0.5))
    return (dx12, dy12, dx21, dy21, dy12_uv, dy21_uv)


def _cell_displacements(flow: jnp.ndarray, t, res_scalar: int, low_h: int, low_w: int):
    """Per-cell integer displacements for both directions, exactly as the reference
    computes them per pixel (ref: warpFrameKernelSDR.h:153-170): flow12 at the cell,
    flow21 sampled at (cell - flow12 >> rs) clamped, C-rounded scaled offsets."""
    return _displacements_from_offsets(
        _pair_offsets(flow, res_scalar, low_h, low_w), t)


def _gather_runs(plane, row_idx, base, run: int, group: int):
    """Per segment: `run` consecutive elements starting at base (strip gather with
    nb covering run + alignment)."""
    nb = (run + group - 1) // group + 1
    strips = _strip_gather(plane, row_idx.reshape(-1), base.reshape(-1), nb, group)
    return strips[:, :run]


@functools.partial(
    jax.jit, static_argnames=("res_scalar", "mode", "is_hdr", "dim_y", "dim_x",
                              "apron", "out_rows_y", "out_rows_uv"),
)
def warp_frame_strip(
    wctx12: dict, wctx21: dict,
    flow: jnp.ndarray,
    blending_scalar, black_level, white_level,
    row0_y=0, row0_uv=0,
    *,
    res_scalar: int, mode: int, is_hdr: bool, dim_y: int, dim_x: int, apron: int,
    out_rows_y: int | None = None, out_rows_uv: int | None = None,
):
    """Strip-mined twin of ops.warp.warp_frame for modes 0/1/2 — identical outputs.
    Requires res_scalar >= 1 and dims divisible by 2^res_scalar.

    row0_y / out_rows_y (and the UV pair) compute only a SLAB of output rows
    starting at the traced row0 — the multi-chip row-sharding axis
    (SURVEY.md §2.6, parallel/mesh.py): each device gathers only its band's
    runs. Defaults cover the whole frame.

    Mode 3 (HSV flow visualization, ref: warpFrameKernelSDR.h:23-113 +
    the mode-3 branch at :172-183): the blended samples come from the same
    strip gathers as mode 2; the flow coloring is per-cell constant, so its
    per-pixel inputs are structured repeats of the low-res flow — the mode
    costs mode 2 plus elementwise VPU work, making it real-time capable
    instead of riding the XLA gather formulation."""
    assert mode in (0, 1, 2, 3)
    rs = res_scalar
    cell = 1 << rs
    assert dim_y % cell == 0 and dim_x % cell == 0
    low_h, low_w = flow.shape[1:]
    a = apron
    ac = a // 2
    n_cx = dim_x // cell
    dtype = jnp.uint16 if is_hdr else jnp.uint8
    group_y = 4 if is_hdr else 8
    group_c = 2 if is_hdr else 4
    out_rows_y = dim_y if out_rows_y is None else out_rows_y
    out_rows_uv = dim_y // 2 if out_rows_uv is None else out_rows_uv

    t = jnp.asarray(blending_scalar, F32)
    fs12 = t
    fs21 = (F32(1.0) - fs12).astype(F32)
    dx12, dy12, dx21, dy21, dy12_uv, dy21_uv = _cell_displacements(
        flow, t, rs, low_h, low_w)

    # ---- Y plane ------------------------------------------------------------
    # Segment = (output row, cell column). Cell row index = cy >> rs.
    cy = jnp.arange(out_rows_y, dtype=jnp.int32) + jnp.asarray(row0_y, jnp.int32)
    cix = jnp.arange(n_cx, dtype=jnp.int32)
    cell_row = jnp.clip(cy >> rs, 0, low_h - 1)
    cell_col = jnp.clip(cix, 0, low_w - 1)

    def y_samples(ctx, dx, dy):
        rows = cy[:, None] + dy[cell_row][:, cell_col] + a       # (rows_y, n_cx)
        base = (cix[None, :] << rs) + dx[cell_row][:, cell_col] + a
        runs = _gather_runs(ctx["wpad_y"], rows, base, cell, group_y)
        return runs.reshape(out_rows_y, n_cx * cell).astype(jnp.int32)

    v12_y = y_samples(wctx12, dx12, dy12) if mode != 1 else None
    v21_y = y_samples(wctx21, dx21, dy21) if mode != 0 else None

    # ---- UV plane -----------------------------------------------------------
    # Output (H/2, W); flow lookup at ((cy2 >> rs) << 1, (cx >> rs) & ~1)
    # (ref: warpFrameKernelSDR.h:153-154).
    h2 = out_rows_uv
    cy2 = jnp.arange(h2, dtype=jnp.int32) + jnp.asarray(row0_uv, jnp.int32)
    uv_cell_row = jnp.clip((cy2 >> rs) << 1, 0, low_h - 1)
    uv_cell_col = jnp.clip(cix & ~1, 0, low_w - 1)
    pairs_per_cell = cell // 2
    hc_p = wctx12["wpad_uv"].shape[1]

    def uv_samples(ctx, dx_arr, dy_uv_arr):
        dxc = dx_arr[uv_cell_row][:, uv_cell_col]               # (h2, n_cx)
        dyc = dy_uv_arr[uv_cell_row][:, uv_cell_col]
        q = (dxc & 1).astype(jnp.int32)
        stacked = ctx["wpad_uv"].reshape(2 * hc_p, -1)
        rows = q * hc_p + (cy2[:, None] + dyc + a)
        base = ((cix[None, :] << rs) >> 1) + ((dxc - q) >> 1) + ac
        runs = _gather_runs(stacked, rows, base, pairs_per_cell, group_c)
        pairs = runs.reshape(h2, n_cx * pairs_per_cell)
        u_b, v_b = flow_strip._unpack_pairs(pairs, is_hdr)
        out = jnp.stack([u_b, v_b], axis=-1).reshape(h2, dim_x)
        return out.astype(jnp.int32)

    v12_uv = uv_samples(wctx12, dx12, dy12_uv) if mode != 1 else None
    v21_uv = uv_samples(wctx21, dx21, dy21_uv) if mode != 0 else None

    # ---- combine (ref: warpFrameKernelSDR.h:172-183) ------------------------
    if mode == 0:
        return v12_y.astype(dtype), v12_uv.astype(dtype)
    if mode == 1:
        return v21_y.astype(dtype), v21_uv.astype(dtype)
    black = jnp.asarray(black_level, F32)
    white = jnp.asarray(white_level, F32)
    blended_y = jnp.trunc(v12_y.astype(F32) * fs21 + v21_y.astype(F32) * fs12
                          ).astype(jnp.int32)
    blended_uv = jnp.trunc(v12_uv.astype(F32) * fs21 + v21_uv.astype(F32) * fs12
                           ).astype(jnp.int32)
    if mode == 3:
        # Structured per-pixel flow upsample (the same cell lookup as the
        # reference's scaled_cx/scaled_cy, ref: warpFrameKernelSDR.h:153-158,
        # realized as repeats instead of per-pixel gathers).
        res_impact = 4 if rs <= 2 else 1
        fx_y = jnp.repeat(flow[0][cell_row][:, cell_col], cell, axis=1)
        fy_y = jnp.repeat(flow[1][cell_row][:, cell_col], cell, axis=1)
        neg16 = lambda v: (-v.astype(jnp.int32)).astype(jnp.int16)
        blended_y = _visualize_flow(
            neg16(fx_y), neg16(fy_y), blended_y,
            jnp.zeros((out_rows_y, dim_x), jnp.int32), res_impact, is_hdr)
        fx_c = jnp.repeat(flow[0][uv_cell_row][:, uv_cell_col], cell, axis=1)
        fy_c = jnp.repeat(flow[1][uv_cell_row][:, uv_cell_col], cell, axis=1)
        chan = 1 + (jnp.arange(dim_x, dtype=jnp.int32) & 1)[None, :]
        blended_uv = _visualize_flow(
            neg16(fx_c), neg16(fy_c), blended_uv,
            jnp.broadcast_to(chan, (h2, dim_x)), res_impact, is_hdr)
    out_y = _apply_levels_y(blended_y, black, white, is_hdr).astype(dtype)
    out_uv = _apply_levels_uv(blended_uv, white, is_hdr).astype(dtype)
    return out_y, out_uv


@functools.partial(
    jax.jit, static_argnames=("res_scalar", "is_hdr", "dim_y", "dim_x"),
)
def grey_flow_frame(flow: jnp.ndarray, *, res_scalar: int, is_hdr: bool,
                    dim_y: int, dim_x: int):
    """Mode 4 (grey flow, ref: warpFrameKernelSDR.h:161-164) as pure
    structured math — NO source samples exist in this mode, so it needs no
    warp contexts and no gathers at all: a nearest upsample of the low-res
    flow (repeats) plus elementwise |ox|+|oy| shifts. Bit-exact twin of
    ops/warp.py mode 4. Real-time at any geometry (sub-ms at 4K)."""
    rs = res_scalar
    cell = 1 << rs
    low_h, low_w = flow.shape[1:]
    dtype = jnp.uint16 if is_hdr else jnp.uint8
    shift_g = 10 if is_hdr else 2
    peak = 65535 if is_hdr else 255

    cy = jnp.arange(dim_y, dtype=jnp.int32)
    cix = jnp.arange(dim_x // cell, dtype=jnp.int32)
    cell_row = jnp.clip(cy >> rs, 0, low_h - 1)
    cell_col = jnp.clip(cix, 0, low_w - 1)
    ox = jnp.repeat(flow[0][cell_row][:, cell_col].astype(jnp.int32),
                    cell, axis=1)
    oy = jnp.repeat(flow[1][cell_row][:, cell_col].astype(jnp.int32),
                    cell, axis=1)
    y = jnp.minimum((jnp.abs(ox) + jnp.abs(oy)) << shift_g, peak).astype(dtype)
    uv = jnp.full((dim_y // 2, dim_x), 32768 if is_hdr else 128, dtype)
    return y, uv

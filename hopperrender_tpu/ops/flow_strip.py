"""Strip-mined cost volume: the TPU-fast formulation of calcDeltaSums.

Why: XLA TPU point-gathers run at ~96M indices/s regardless of locality (PERF.md),
and the naive cost volume needs 16 layers x low_h x low_w x 3 samples ~ 6M indices
per pyramid step. But gathers with a small contiguous trailing block (8-16 B) run at
the SAME index rate — 8-16x the bytes per index.

Key structural fact (SURVEY.md §2.3): within a search window both offset planes are
window-constant at every pyramid step, so for one window-row all candidate samples of
all layers lie in ONE contiguous byte strip of the (apron-padded) source frame:

    pos(l, cx) = (cx << rs) + ideal + rel_l  ==  strip_base + static(cx) + dyn(l)

The kernel therefore:
  1. pads each source frame once with an exact mirror apron (the reference's
     mirror-once-then-clamp rule, ref: calcDeltaSumsKernelSDR.h:86-95, becomes plain
     in-bounds reads),
  2. gathers per window-row segment a strip of NB G-byte blocks (one fast gather),
  3. normalizes the per-row base%G remainder with a G-way dense select,
  4. extracts each layer's samples with a dynamic slice + static stride (16 tiny
     descriptors instead of millions),
  5. feeds the reconstructed per-pixel samples into the same bias/window-sum logic
     as the reference formulation (ops/flow.py) — bit-exact by construction.

Step 0 (X-axis candidates) reads row strips; step 1 (Y-axis candidates) reads column
strips from TRANSPOSED planes built once per frame. Chroma uses interleaved (u,v)
pairs per element for row strips and split transposed U/V planes for column strips.

The strip span is static per radius bucket (<=8: 26 px, <=16: 114 px — the span of
the signed-square candidate offsets, ref: calcDeltaSumsKernelSDR.h:69-77), while the
radius itself stays a traced scalar inside the bucket.

Requires res_scalar >= 1 (chroma pair indexing); res_scalar == 0 inputs (<= 270p)
keep the reference formulation in ops/flow.py, which is fast enough at that size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hopperrender_tpu import config
from hopperrender_tpu.ops import flow as flow_ops

MAX_R = config.MAX_SEARCH_RADIUS
UINT32_MAX = np.uint32(0xFFFFFFFF)


def rel_span(num_layers: int) -> tuple[int, int]:
    """(min_rel, span) of the signed-square candidate offsets for a radius bucket:
    rel(l) = signed_square((l % r) - r//2); worst case r = num_layers."""
    r = num_layers
    lo = -((r // 2) ** 2)
    hi = (r - 1 - r // 2) ** 2 if r >= 2 else 0  # max (l%r)-r//2 is r-1-r//2
    return lo, hi - lo + 1


def max_rel(num_layers: int) -> int:
    """Largest |signed-square candidate step| for a radius bucket."""
    lo, span = rel_span(num_layers)
    return max(-lo, span + lo - 1)


def apron_for(low_h: int, low_w: int, num_layers: int = MAX_R) -> int:
    """Static bound on |offset| for a radius BUCKET: each iteration's adjust adds
    at most max_rel per axis step, plus one more for the candidate being
    evaluated; round up to a multiple of 16. Offsets reset to zero per frame
    pair, so the bound holds per pair at that pair's bucket — smaller buckets
    get much smaller contexts/bands (64 vs 576 at the radius-5 floor)."""
    iters = config.num_pyramid_iterations(config.initial_window_size(low_h, low_w))
    a = max_rel(num_layers) * (iters + 1)
    return max(32, -(-a // 16) * 16)


def _mirror_pad_1d_axis(x: jnp.ndarray, a: int, axis: int) -> jnp.ndarray:
    """Pad axis by `a` on both sides with the reference's mirror-once-then-clamp rule
    (ref: calcDeltaSumsKernelSDR.h:86-95): symmetric reflection for the first `dim`
    padded elements, then the FAR edge value (the clamp catches the over-reflection).
    """
    dim = x.shape[axis]
    sym = min(a, dim)
    x2 = jnp.concatenate(
        [jnp.flip(jax.lax.slice_in_dim(x, 0, sym, axis=axis), axis=axis), x,
         jnp.flip(jax.lax.slice_in_dim(x, dim - sym, dim, axis=axis), axis=axis)],
        axis=axis,
    )
    extra = a - sym
    if extra > 0:
        # Over-reflected positions clamp to the OPPOSITE edge (mirror maps them
        # across the frame; clip then lands on that far edge).
        far_lo = jax.lax.slice_in_dim(x, dim - 1, dim, axis=axis)
        far_hi = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
        reps_lo = jnp.concatenate([far_lo] * extra, axis=axis)
        reps_hi = jnp.concatenate([far_hi] * extra, axis=axis)
        x2 = jnp.concatenate([reps_lo, x2, reps_hi], axis=axis)
    return x2


def _pad_to_multiple(x: jnp.ndarray, axis: int, m: int) -> jnp.ndarray:
    dim = x.shape[axis]
    pad = (-dim) % m
    if pad == 0:
        return x
    cfg = [(0, 0, 0)] * x.ndim
    cfg[axis] = (0, pad, 0)
    return jax.lax.pad(x, jnp.zeros((), x.dtype), cfg)


def patch_extents(low_h: int, low_w: int, window: int, res_scalar: int,
                  apron: int) -> tuple[int, int, int, int]:
    """Static decimated-plane extents (hd, wd, hcd, wcd) REQUIRED for clip-free
    (w, w) patch gathers at this window size, with offsets bounded by the apron.
    lax.gather in CLIP mode clips the patch START when start > dim - w, which
    SHIFTS the whole patch and corrupts real pixels of overhanging windows —
    the planes must be large enough that no legal start clips."""
    a, ac, rs = apron, apron // 2, res_scalar
    lh = -(-low_h // window) * window
    lw = -(-low_w // window) * window
    rc = rs - 1
    hd = ((((lh - window) << rs) + 2 * a) >> rs) + window
    wd = ((((lw - window) << rs) + 2 * a) >> rs) + window
    hcd = (((((lh - window) << rs) >> 1) + 2 * ac) >> rc) + window
    wcd = (((((lw - window) << rs) >> 1) + 2 * ac) >> rc) + window
    return hd, wd, hcd, wcd


def patch_fits(ctx: dict, *, low_h: int, low_w: int, window: int,
               res_scalar: int, apron: int) -> bool:
    """Can the coarse-window patch gather run clip-free on this context?"""
    if "dec_y" not in ctx:
        return False
    hd = ctx["dec_y"].shape[0] // (1 << (2 * res_scalar))
    hcd = ctx["dec_uv"].shape[0] // (1 << (2 * (res_scalar - 1)))
    need = patch_extents(low_h, low_w, window, res_scalar, apron)
    return (need[0] <= hd and need[1] <= ctx["dec_y"].shape[1]
            and need[2] <= hcd and need[3] <= ctx["dec_uv"].shape[1])


def uniform_fits(ctx: dict, *, low_h: int, low_w: int, res_scalar: int,
                 apron: int) -> bool:
    """Can the uniform/mode tier's (low_h, low_w) dynamic slices run clip-free
    on this context's decimated planes? dynamic_slice CLAMPS out-of-range
    starts, which silently SHIFTS the sampled plane — contexts built without
    low_dims padding can be up to one decimated row/col short near the apron
    bound (same hazard class as patch_fits)."""
    if "dec_y" not in ctx:
        return False
    rs = res_scalar
    P, Pc = 1 << rs, 1 << (rs - 1)
    a = apron
    hd = ctx["dec_y"].shape[0] // (P * P)
    wd = ctx["dec_y"].shape[1]
    hcd = ctx["dec_uv"].shape[0] // (Pc * Pc)
    wcd = ctx["dec_uv"].shape[1]
    # Slice starts reach (2a) >> rs in luma space and (2*(a//2)) >> (rs-1) in
    # chroma space at the apron-bound offsets.
    return (hd >= ((2 * a) >> rs) + low_h and wd >= ((2 * a) >> rs) + low_w
            and hcd >= ((2 * (a // 2)) >> (rs - 1)) + low_h
            and wcd >= ((2 * (a // 2)) >> (rs - 1)) + low_w)


def _phase_decimate(plane: jnp.ndarray, p: int) -> jnp.ndarray:
    """Fold 2^rs-phase decimation into rows: out[(py*p + px)*Hd + i, j] ==
    plane[i*p + py, j*p + px]. Used by the coarse-window patch gather."""
    if p == 1:
        return plane
    hp = _pad_to_multiple(_pad_to_multiple(plane, 0, p), 1, p)
    hd, wd = hp.shape[0] // p, hp.shape[1] // p
    return (hp.reshape(hd, p, wd, p)
            .transpose(1, 3, 0, 2)
            .reshape(p * p * hd, wd))


@functools.partial(jax.jit, static_argnames=("apron", "is_hdr", "res_scalar",
                                              "low_dims"))
def build_frame_context(y: jnp.ndarray, uv: jnp.ndarray, *, apron: int, is_hdr: bool,
                        res_scalar: int | None = None,
                        low_dims: tuple[int, int] | None = None):
    """Derived planes for strip gathering, built once per source frame:
      pad_y    (Hp, Wp)      mirror-apron luma
      pad_y_t  (Wp, Hp)      transposed (for Y-axis candidate steps)
      pad_uv   (Hc_p, Wc_p)  chroma (u,v) PAIRS: one element = one u,v pair
      pad_u_t / pad_v_t      transposed split chroma planes
      dec_y / dec_uv         phase-decimated planes for coarse-window patch
                             gathers (only when res_scalar is given and <= 4)
    When low_dims=(low_h, low_w) is given, the decimated planes are zero-padded
    so every window in the pyramid schedule can patch-gather clip-free (see
    patch_extents); without it, patch_fits() gates windows to what fits.
    All returned in their natural dtype; block views are bitcast at gather time."""
    a = apron
    ac = a // 2
    # The HDR cost volume compares only the TOP 8 bits (>>8, ref:
    # calcDeltaSumsKernelHDR.h:98-100), so the flow context stores pre-shifted
    # uint8 planes for both bit depths — halving the HDR gather block count.
    if is_hdr:
        y = (y >> 8).astype(jnp.uint8)
        uv = (uv >> 8).astype(jnp.uint8)
    pad_y = _mirror_pad_1d_axis(_mirror_pad_1d_axis(y, a, 0), a, 1)
    pad_y_t = pad_y.T
    # Chroma pairs: mirror-in-full-res then >>1 equals the same mirror rule in
    # chroma index space (proof: SURVEY.md §7 mirror notes; arithmetic shift floors).
    uv_pairs = jax.lax.bitcast_convert_type(
        uv.reshape(uv.shape[0], uv.shape[1] // 2, 2), jnp.uint16)
    pad_uv = _mirror_pad_1d_axis(_mirror_pad_1d_axis(uv_pairs, ac, 0), ac, 1)
    u_plane = uv[:, 0::2]
    v_plane = uv[:, 1::2]
    pad_u_t = _mirror_pad_1d_axis(_mirror_pad_1d_axis(u_plane, ac, 0), ac, 1).T
    pad_v_t = _mirror_pad_1d_axis(_mirror_pad_1d_axis(v_plane, ac, 0), ac, 1).T
    ctx = dict(pad_y=pad_y, pad_y_t=pad_y_t, pad_uv=pad_uv,
               pad_u_t=pad_u_t, pad_v_t=pad_v_t)
    if res_scalar is not None and 1 <= res_scalar <= 4:
        assert a % (1 << res_scalar) == 0 and ac % (1 << (res_scalar - 1)) == 0
        dec_src_y, dec_src_uv = pad_y, pad_uv
        if low_dims is not None:
            # Grow the decimation inputs so every scheduled window's patch
            # starts stay clip-free (values past the mirror apron are only ever
            # read for masked positions — zeros are fine).
            rs = res_scalar
            need = [1, 1, 1, 1]
            for _, w in flow_ops.window_schedule(*low_dims):
                e = patch_extents(low_dims[0], low_dims[1], w, rs, a)
                need = [max(n, v) for n, v in zip(need, e)]
            ry = max(0, (need[0] << rs) - pad_y.shape[0])
            cy = max(0, (need[1] << rs) - pad_y.shape[1])
            if ry or cy:
                dec_src_y = jnp.pad(pad_y, ((0, ry), (0, cy)))
            rc = max(0, (need[2] << (rs - 1)) - pad_uv.shape[0])
            cc = max(0, (need[3] << (rs - 1)) - pad_uv.shape[1])
            if rc or cc:
                dec_src_uv = jnp.pad(pad_uv, ((0, rc), (0, cc)))
        ctx["dec_y"] = _phase_decimate(dec_src_y, 1 << res_scalar)
        ctx["dec_uv"] = _phase_decimate(dec_src_uv, 1 << (res_scalar - 1))
    return ctx


def _strip_gather(plane: jnp.ndarray, row_idx: jnp.ndarray, base: jnp.ndarray,
                  nb: int, group: int):
    """Gather per segment `nb` consecutive `group`-element blocks starting at the
    block containing `base`; returns (strips, rem) where strips is
    (n_seg, nb*group) elements (base-aligned: strips[s, k] == plane[row_idx[s],
    base[s] + k]) and the per-row base%group remainder has been normalized away with
    a group-way dense select."""
    n_rows, n_cols = plane.shape
    blocks = _pad_to_multiple(plane, 1, group)
    nb_cols = blocks.shape[1] // group
    blocks = blocks.reshape(n_rows, nb_cols, group)

    # Gather int32 cells: XLA's TPU gather handles 4-byte trailing blocks at full
    # index rate, while u8/u16 trailing blocks fault the backend at scale.
    elem = plane.dtype.itemsize
    per32 = 4 // elem
    if per32 > 1:
        blocks32 = jax.lax.bitcast_convert_type(
            blocks.reshape(n_rows, nb_cols, group // per32, per32), jnp.int32)
    else:
        blocks32 = blocks

    block0 = base // group
    rem = (base - block0 * group).astype(jnp.int32)
    b = jnp.arange(nb, dtype=jnp.int32)[None, :]
    bi = jnp.clip(block0[:, None] + b, 0, nb_cols - 1)
    ri = jnp.clip(row_idx, 0, n_rows - 1)[:, None]
    g32 = blocks32[ri, bi]                   # (n_seg, nb, group/per32) int32
    if per32 > 1:
        g = jax.lax.bitcast_convert_type(g32, plane.dtype)  # (..., per32)
    else:
        g = g32.astype(plane.dtype)
    flat = g.reshape(g32.shape[0], nb * group)

    # Normalize the remainder: strips[s, k] = flat[s, k + rem[s]], as a dense
    # select over shifted copies. For groups > 8 the select is TWO-LEVEL
    # (rem = 8q + r): 8 + group/8 copies instead of `group` — big blocks
    # gather ~2.4x faster per index (chip-probed: 32 B = 3.8 ns/idx vs 8 B =
    # 9.3) without a select blow-up.
    def shift_select(arr, amounts, sel):
        out = jnp.zeros_like(arr)
        for m in amounts:
            shifted = jnp.concatenate(
                [arr[:, m:], jnp.zeros((arr.shape[0], m), arr.dtype)], axis=1)
            out = jnp.where(sel[:, None] == m, shifted, out)
        return out

    if group <= 8:
        return shift_select(flat, range(group), rem)
    fine = shift_select(flat, range(8), rem & 7)
    return shift_select(fine, range(0, group, 8), rem & ~7)


def _extract_layers(strips: jnp.ndarray, layer_starts: jnp.ndarray, n_pix: int,
                    stride: int, num_layers: int):
    """samples[l, s, i] = strips[s, layer_starts[l] + i*stride] via per-layer dynamic
    slice + static stride (num_layers tiny descriptors)."""
    usable = (n_pix - 1) * stride + 1

    def one(start):
        sl = jax.lax.dynamic_slice(
            strips, (0, start), (strips.shape[0], usable))
        return sl[:, ::stride]

    return jax.vmap(one)(layer_starts.astype(jnp.int32))  # (L, n_seg, n_pix)


def _unpack_pairs(pairs: jnp.ndarray, is_hdr: bool):
    """(u, v) from packed little-endian pairs."""
    if is_hdr:
        u = (pairs & jnp.uint32(0xFFFF)).astype(jnp.int32)
        v = (pairs >> jnp.uint32(16)).astype(jnp.int32)
    else:
        u = (pairs & jnp.uint16(0xFF)).astype(jnp.int32)
        v = (pairs >> jnp.uint16(8)).astype(jnp.int32)
    return u, v


@functools.partial(
    jax.jit,
    static_argnames=("window_size", "res_scalar", "iteration", "step", "is_hdr",
                     "num_layers", "apron", "dim_y", "dim_x", "n_seg_local"),
)
def delta_window_sums_strip(
    ctx: dict,                    # build_frame_context of frame1
    f2y: jnp.ndarray,
    f2uv: jnp.ndarray,
    offsets: jnp.ndarray,         # (2, low_h, low_w) int16
    radius: jnp.ndarray,
    delta_scalar: jnp.ndarray,
    neighbor_scalar: jnp.ndarray,
    seg_start=0,                  # traced: first window ROW (step even) / COL (odd)
    *,
    window_size: int,
    res_scalar: int,
    iteration: int,
    step: int,
    is_hdr: bool,
    num_layers: int,
    apron: int,
    dim_y: int,
    dim_x: int,
    n_seg_local: int | None = None,  # windows along the segment axis (None = all)
) -> jnp.ndarray:
    """Strip-mined twin of flow.delta_window_sums — identical outputs.

    seg_start / n_seg_local compute only a slab of windows along the step's
    pixel-segment axis (rows for step even, columns for step odd) — the
    multi-chip sharding axis (SURVEY.md §2.6): each device gathers only its
    slab's strips, then the compact sums are all-gathered. Slab windows past
    the frame edge produce zero-delta sums (callers slice them off)."""
    assert res_scalar >= 1, "strip kernel requires res_scalar >= 1"
    low_h, low_w = offsets.shape[1:]
    L = num_layers
    w = window_size
    rs = res_scalar
    a = apron
    ac = a // 2
    min_rel, span = rel_span(L)
    # Context planes are uint8 / uint16-pairs for BOTH bit depths (HDR pre-shifted
    # >>8 at context build): 8-byte blocks throughout.
    # 32-byte gather blocks: the TPU block-gather rate IMPROVES with block
    # size up to 32 B (3.8 vs 9.3 ns/idx, scripts/gather_probe.py) AND fewer
    # blocks cover each strip; the remainder select is two-level (8 + G/8).
    group_y = 32          # u8 elements
    group_c = 16          # u16 pair elements = 32 B

    n_wy = -(-low_h // w)
    n_wx = -(-low_w // w)
    lw_pad = n_wx * w
    lh_pad = n_wy * w
    seg0 = jnp.asarray(seg_start, jnp.int32)
    if n_seg_local is None:
        n_seg_local_ = n_wy if step % 2 == 0 else n_wx
    else:
        n_seg_local_ = n_seg_local

    # Candidate offsets per layer (traced radius within the static bucket).
    lz = jnp.arange(L, dtype=jnp.int32)
    rel = flow_ops._signed_square_i16(((lz % radius) - radius // 2).astype(jnp.int16))
    rel32 = rel.astype(jnp.int32)

    ideal_x = offsets[0]
    ideal_y = offsets[1]
    # Window-constant representatives (origin pixel of each window), restricted
    # to the slab along the step's segment axis (clip keeps padded slab windows
    # safe; their sums are sliced off by the caller).
    win_x = ideal_x[::w, ::w].astype(jnp.int32)  # (n_wy, n_wx)
    win_y = ideal_y[::w, ::w].astype(jnp.int32)
    widx = seg0 + jnp.arange(n_seg_local_, dtype=jnp.int32)
    if step % 2 == 0:
        widx = jnp.clip(widx, 0, n_wy - 1)
        win_x_s = win_x[widx]        # (n_loc, n_wx)
        win_y_s = win_y[widx]
    else:
        widx = jnp.clip(widx, 0, n_wx - 1)
        win_x_s = win_x[:, widx]     # (n_wy, n_loc)
        win_y_s = win_y[:, widx]

    # int16 wraparound of ideal + rel, evaluated once per (layer, window).
    if step % 2 == 0:
        off_x_lw = (win_x_s[None].astype(jnp.int16)
                    + rel[:, None, None]).astype(jnp.int16)
        off_y_lw = jnp.broadcast_to(win_y_s.astype(jnp.int16),
                                    (L, n_seg_local_, n_wx))
    else:
        off_x_lw = jnp.broadcast_to(win_x_s.astype(jnp.int16),
                                    (L, n_wy, n_seg_local_))
        off_y_lw = (win_y_s[None].astype(jnp.int16)
                    + rel[:, None, None]).astype(jnp.int16)

    # Default (whole-frame) path keeps the original segment count — exactly the
    # frame's rows/cols; a slab always covers its full windows (masked later).
    if n_seg_local is None:
        slab_px = low_h if step % 2 == 0 else low_w
    else:
        slab_px = n_seg_local_ * w
    if step % 2 == 0:
        # ---- X-axis candidates: row strips -------------------------------------
        # Segment = (output row cy, window column wx). Luma strip along columns.
        cy = jnp.arange(slab_px, dtype=jnp.int32) + seg0 * w
        wr = jnp.arange(slab_px, dtype=jnp.int32) // w   # slab-local window row
        seg_row = ((cy[:, None] << rs) + win_y_s[wr[:, None],
                                                 jnp.arange(n_wx)[None, :]] + a)
        seg_ix = win_x_s[wr[:, None], jnp.arange(n_wx)[None, :]]
        base = (jnp.arange(n_wx, dtype=jnp.int32)[None, :] * (w << rs)
                + seg_ix + min_rel + a)
        nb_y = (span + ((w - 1) << rs) + group_y - 1) // group_y + 1
        strips = _strip_gather(ctx["pad_y"], seg_row.reshape(-1), base.reshape(-1),
                               nb_y, group_y)
        # samples[l, seg, i] for i = pixel within window: in-strip position
        # (i << rs) + (rel_l - min_rel).
        layer_starts = rel32 - min_rel
        samp = _extract_layers(strips.astype(jnp.int32), layer_starts, w, 1 << rs, L)
        samp = samp.reshape(L, slab_px, n_wx, w).reshape(
            L, slab_px, lw_pad)[:, :, :low_w]

        # Chroma: pair strips. pos_pair(l, i) = (i << (rs-1)) + ((ix + rel_l) >> 1)
        # with the >>1 parity handled by two extractions + per-segment select.
        c_row = ((cy[:, None] << rs) + win_y_s[wr[:, None],
                                               jnp.arange(n_wx)[None, :]]) >> 1
        c_row = c_row + ac
        c_base = ((jnp.arange(n_wx, dtype=jnp.int32)[None, :] * (w << rs)) >> 1) \
            + ((seg_ix + min_rel) >> 1) + ac
        nb_c = ((span >> 1) + 2 + ((w - 1) << (rs - 1)) + group_c - 1) // group_c + 1
        c_strips = _strip_gather(ctx["pad_uv"], c_row.reshape(-1),
                                 c_base.reshape(-1), nb_c, group_c)
        # delta from strip base: ((ix + rel) >> 1) - ((ix + min_rel) >> 1)
        # = f(parity of (ix + min_rel)) — two variants selected per segment.
        even_starts = (rel32 - min_rel) >> 1              # base even
        odd_starts = (rel32 - min_rel + 1) >> 1           # base odd
        cs = c_strips
        samp_even = _extract_layers(cs, even_starts, w, 1 << (rs - 1), L)
        samp_odd = _extract_layers(cs, odd_starts, w, 1 << (rs - 1), L)
        base_parity = ((seg_ix + min_rel) & 1).reshape(-1)[None, :, None]
        pair = jnp.where(base_parity == 0, samp_even, samp_odd)
        u_s, v_s = _unpack_pairs(pair.astype(jnp.uint16), False)
        u_s = u_s.reshape(L, slab_px, n_wx, w).reshape(
            L, slab_px, lw_pad)[:, :, :low_w]
        v_s = v_s.reshape(L, slab_px, n_wx, w).reshape(
            L, slab_px, lw_pad)[:, :, :low_w]
    else:
        # ---- Y-axis candidates: column strips from transposed planes -----------
        cx = jnp.arange(slab_px, dtype=jnp.int32) + seg0 * w
        wc = jnp.arange(slab_px, dtype=jnp.int32) // w   # slab-local window col
        seg_col = ((cx[:, None] << rs) + win_x_s[jnp.arange(n_wy)[None, :],
                                                 wc[:, None]] + a)
        seg_iy = win_y_s[jnp.arange(n_wy)[None, :], wc[:, None]]
        base = (jnp.arange(n_wy, dtype=jnp.int32)[None, :] * (w << rs)
                + seg_iy + min_rel + a)
        nb_y = (span + ((w - 1) << rs) + group_y - 1) // group_y + 1
        strips = _strip_gather(ctx["pad_y_t"], seg_col.reshape(-1),
                               base.reshape(-1), nb_y, group_y)
        layer_starts = rel32 - min_rel
        samp = _extract_layers(strips.astype(jnp.int32), layer_starts, w, 1 << rs, L)
        # (L, slab cols, n_wy, w) -> rows restored, slab cols kept
        samp = samp.reshape(L, slab_px, n_wy, w).reshape(
            L, slab_px, lh_pad)[:, :, :low_h]
        samp = samp.transpose(0, 2, 1)

        # Chroma via split transposed planes: u col = ((cxf + ix) >> 1) fixed per
        # segment; strip runs along chroma rows ((cyf + iy + rel) >> 1).
        cxf = cx[:, None] << rs
        ixw = win_x_s[jnp.arange(n_wy)[None, :], wc[:, None]]
        c_col = ((cxf + ixw) >> 1) + ac
        c_base = (((jnp.arange(n_wy, dtype=jnp.int32)[None, :] * (w << rs)) >> 1)
                  + ((seg_iy + min_rel) >> 1) + ac)
        nb_c = ((span >> 1) + 2 + ((w - 1) << (rs - 1)) + group_c_t(is_hdr) - 1) \
            // group_c_t(is_hdr) + 1
        even_starts = (rel32 - min_rel) >> 1
        odd_starts = (rel32 - min_rel + 1) >> 1
        base_parity = ((seg_iy + min_rel) & 1).reshape(-1)[None, :, None]

        def chroma_from(plane):
            st = _strip_gather(plane, c_col.reshape(-1), c_base.reshape(-1),
                               nb_c, group_c_t(is_hdr))
            se = _extract_layers(st.astype(jnp.int32), even_starts, w,
                                 1 << (rs - 1), L)
            so = _extract_layers(st.astype(jnp.int32), odd_starts, w,
                                 1 << (rs - 1), L)
            s = jnp.where(base_parity == 0, se, so)
            s = s.reshape(L, slab_px, n_wy, w).reshape(
                L, slab_px, lh_pad)[:, :, :low_h]
            return s.transpose(0, 2, 1)

        u_s = chroma_from(ctx["pad_u_t"])
        v_s = chroma_from(ctx["pad_v_t"])

    return _cost_tail(samp, u_s, v_s, f2y, f2uv, offsets, off_x_lw, off_y_lw,
                      radius, delta_scalar, neighbor_scalar,
                      window_size=w, res_scalar=rs, iteration=iteration, step=step,
                      is_hdr=is_hdr, num_layers=L, dim_y=dim_y, dim_x=dim_x,
                      seg0=seg0)


def _window_offsets(offsets, radius, num_layers, window_size, step,
                    layer_offset=0):
    """Per-(layer, window) candidate offsets with int16 wraparound (window-constant
    invariant; representatives at window origins). layer_offset maps the local
    layer range to global candidate layers (multi-chip layer sharding)."""
    L = num_layers
    w = window_size
    lz = jnp.arange(L, dtype=jnp.int32) + jnp.asarray(layer_offset, jnp.int32)
    rel = flow_ops._signed_square_i16(((lz % radius) - radius // 2).astype(jnp.int16))
    win_x = offsets[0][::w, ::w]
    win_y = offsets[1][::w, ::w]
    n_wy, n_wx = win_x.shape
    if step % 2 == 0:
        off_x = (win_x[None] + rel[:, None, None]).astype(jnp.int16)
        off_y = jnp.broadcast_to(win_y, (L, n_wy, n_wx))
    else:
        off_x = jnp.broadcast_to(win_x, (L, n_wy, n_wx))
        off_y = (win_y[None] + rel[:, None, None]).astype(jnp.int16)
    return off_x, off_y


def _patch_gather(plane, row0, col0, w: int):
    """Gather (w, w) patches at per-descriptor starts: out (N, w, w)."""
    starts = jnp.stack([row0.reshape(-1), col0.reshape(-1)], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1))
    return jax.lax.gather(plane, starts, dn, slice_sizes=(w, w),
                          mode=jax.lax.GatherScatterMode.CLIP)


@functools.partial(
    jax.jit,
    static_argnames=("window_size", "res_scalar", "iteration", "step", "is_hdr",
                     "num_layers", "apron", "dim_y", "dim_x"),
)
def delta_window_sums_patch(
    ctx: dict,
    f2y: jnp.ndarray,
    f2uv: jnp.ndarray,
    offsets: jnp.ndarray,
    radius: jnp.ndarray,
    delta_scalar: jnp.ndarray,
    neighbor_scalar: jnp.ndarray,
    layer_offset=0,               # traced: first global layer of this shard
    *,
    window_size: int,
    res_scalar: int,
    iteration: int,
    step: int,
    is_hdr: bool,
    num_layers: int,
    apron: int,
    dim_y: int,
    dim_x: int,
) -> jnp.ndarray:
    """Coarse-window twin of delta_window_sums_strip: ONE (w, w) patch gather per
    (layer, window) from phase-decimated planes (a window's samples form a stride-
    2^rs grid = a contiguous patch in one phase plane). Cheaper than strips when the
    descriptor count L x n_windows is small (w >= ~32); identical outputs."""
    assert res_scalar >= 1
    w = window_size
    rs = res_scalar
    L = num_layers
    a = apron
    ac = a // 2
    low_h, low_w = offsets.shape[1:]
    n_wy = -(-low_h // w)
    n_wx = -(-low_w // w)
    lh_pad, lw_pad = n_wy * w, n_wx * w
    P = 1 << rs
    Pc = 1 << (rs - 1)

    off_x_lw, off_y_lw = _window_offsets(offsets, radius, L, w, step,
                                         layer_offset=layer_offset)
    ox = off_x_lw.astype(jnp.int32)
    oy = off_y_lw.astype(jnp.int32)
    wy_base = (jnp.arange(n_wy, dtype=jnp.int32)[None, :, None] * (w << rs))
    wx_base = (jnp.arange(n_wx, dtype=jnp.int32)[None, None, :] * (w << rs))

    # Luma: pos = window_origin<<rs + off + apron; phase/quotient split.
    pos_y = wy_base + oy + a
    pos_x = wx_base + ox + a
    hd = ctx["dec_y"].shape[0] // (P * P)
    row = ((pos_y & (P - 1)) * P + (pos_x & (P - 1))) * hd + (pos_y >> rs)
    col = pos_x >> rs
    patches = _patch_gather(ctx["dec_y"], row, col, w)
    samp = (patches.reshape(L, n_wy, n_wx, w, w)
            .transpose(0, 1, 3, 2, 4)
            .reshape(L, lh_pad, lw_pad)[:, :low_h, :low_w].astype(jnp.int32))

    # Chroma pairs: pos_c = (window_origin<<(rs-1)) + (off >> 1) + chroma apron.
    pos_cy = (wy_base >> 1) + (oy >> 1) + ac
    pos_cx = (wx_base >> 1) + (ox >> 1) + ac
    hcd = ctx["dec_uv"].shape[0] // (Pc * Pc)
    if Pc == 1:
        c_row, c_col = pos_cy, pos_cx
    else:
        c_row = ((pos_cy & (Pc - 1)) * Pc + (pos_cx & (Pc - 1))) * hcd \
            + (pos_cy >> (rs - 1))
        c_col = pos_cx >> (rs - 1)
    c_patches = _patch_gather(ctx["dec_uv"], c_row, c_col, w)
    pair = (c_patches.reshape(L, n_wy, n_wx, w, w)
            .transpose(0, 1, 3, 2, 4)
            .reshape(L, lh_pad, lw_pad)[:, :low_h, :low_w])
    u_s, v_s = _unpack_pairs(pair, False)

    return _cost_tail(samp, u_s, v_s, f2y, f2uv, offsets, off_x_lw, off_y_lw,
                      radius, delta_scalar, neighbor_scalar,
                      window_size=w, res_scalar=rs, iteration=iteration, step=step,
                      is_hdr=is_hdr, num_layers=L, dim_y=dim_y, dim_x=dim_x,
                      layer_offset=layer_offset)


def _dense_value_samples(ctx: dict, ix, iy, rel, *, res_scalar: int,
                         apron: int, low_h: int, low_w: int, step: int,
                         num_layers: int):
    """Per-layer dense frame-1 samples at ONE window-constant offset (ix, iy):
    each layer's samples are one (low_h, low_w) dynamic slice of the
    phase-decimated planes — zero gathers. Returns (samp (L,lh,lw) i32,
    pairs (L,lh,lw) packed u16). Shared by the uniform, mode, and
    value-bucket tiers."""
    rs = res_scalar
    L = num_layers
    a, ac = apron, apron // 2
    P = 1 << rs
    Pc = 1 << (rs - 1)
    hd = ctx["dec_y"].shape[0] // (P * P)
    hcd = ctx["dec_uv"].shape[0] // (Pc * Pc)

    def y_slice(pos_y, pos_x):
        row = ((pos_y & (P - 1)) * P + (pos_x & (P - 1))) * hd + (pos_y >> rs)
        return jax.lax.dynamic_slice(
            ctx["dec_y"], (row, pos_x >> rs), (low_h, low_w)).astype(jnp.int32)

    def uv_slice(pos_cy, pos_cx):
        if Pc == 1:
            row, col = pos_cy, pos_cx
        else:
            row = ((pos_cy & (Pc - 1)) * Pc + (pos_cx & (Pc - 1))) * hcd \
                + (pos_cy >> (rs - 1))
            col = pos_cx >> (rs - 1)
        return jax.lax.dynamic_slice(ctx["dec_uv"], (row, col), (low_h, low_w))

    samp, pairs = [], []
    for l_i in range(L):
        rel_l = rel[l_i]
        off_x = ix + (rel_l if step % 2 == 0 else 0)
        off_y = iy + (rel_l if step % 2 == 1 else 0)
        # int16 wraparound parity with the gather kernels' candidate math.
        off_x = off_x.astype(jnp.int16).astype(jnp.int32)
        off_y = off_y.astype(jnp.int16).astype(jnp.int32)
        samp.append(y_slice(off_y + a, off_x + a))
        # Chroma pairs: (even + q) >> 1 == even/2 + (q >> 1) exactly, so the
        # uniform slice start is (off >> 1) + chroma apron (see strip twin).
        pairs.append(uv_slice((off_y >> 1) + ac, (off_x >> 1) + ac))
    return jnp.stack(samp), jnp.stack(pairs)


def delta_window_sums_uniform(
    ctx: dict,
    f2y: jnp.ndarray,
    f2uv: jnp.ndarray,
    offsets: jnp.ndarray,
    radius: jnp.ndarray,
    delta_scalar: jnp.ndarray,
    neighbor_scalar: jnp.ndarray,
    *,
    window_size: int,
    res_scalar: int,
    iteration: int,
    step: int,
    is_hdr: bool,
    num_layers: int,
    apron: int,
    dim_y: int,
    dim_x: int,
    bias_offsets: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Zero-gather twin of delta_window_sums_strip for UNIFORM offset planes
    (every window holds the same offset — true at iteration 0, where offsets
    start zeroed, and at every later step once the pyramid has converged on
    global motion, e.g. panning content). Each layer's frame-1 samples are
    then ONE (low_h, low_w) dynamic slice of a phase-decimated plane. Callers
    must guard with the uniformity predicate (pyramid_flow_strip wraps this
    and the gather kernels in lax.cond).

    bias_offsets: plane used for the bias/neighbor terms and the window
    representatives in the tail (defaults to `offsets`); the mode tier samples
    at the dominant offset but keeps the REAL plane's biases."""
    assert res_scalar >= 1 and uniform_fits(
        ctx, low_h=offsets.shape[1], low_w=offsets.shape[2],
        res_scalar=res_scalar, apron=apron)
    if bias_offsets is None:
        bias_offsets = offsets
    rs = res_scalar
    L = num_layers
    low_h, low_w = offsets.shape[1:]
    w = window_size

    ix = offsets[0, 0, 0].astype(jnp.int32)
    iy = offsets[1, 0, 0].astype(jnp.int32)
    lz = jnp.arange(L, dtype=jnp.int32)
    rel = flow_ops._signed_square_i16(
        ((lz % radius) - radius // 2).astype(jnp.int16)).astype(jnp.int32)

    samp, pairs = _dense_value_samples(
        ctx, ix, iy, rel, res_scalar=rs, apron=apron, low_h=low_h,
        low_w=low_w, step=step, num_layers=L)
    u_s, v_s = _unpack_pairs(pairs, False)

    off_x_lw, off_y_lw = _window_offsets(bias_offsets, radius, L, w, step)
    return _cost_tail(samp, u_s, v_s, f2y, f2uv, bias_offsets, off_x_lw,
                      off_y_lw, radius, delta_scalar, neighbor_scalar,
                      window_size=w, res_scalar=rs, iteration=iteration,
                      step=step, is_hdr=is_hdr, num_layers=L, dim_y=dim_y,
                      dim_x=dim_x)


def _flatten_ctx(ctx: dict):
    """Pack the context planes into ONE u32 buffer for lax.cond boundaries.

    TPU conditionals copy their captured operands per invocation, and copies
    of 8/16-bit planes run far below HBM speed (chip-probed: a cond capturing
    the ~80 MB context dict costs ~4.4 ms vs 0.74 ms with a tiny capture).
    One u32-typed operand copies at native layout speed; branches unpack
    views lazily (materialized only when that branch actually runs)."""
    metas = []
    parts = []
    off = 0
    for k in sorted(ctx):
        a = ctx[k]
        eb = a.dtype.itemsize
        per32 = 4 // eb
        w32 = -(-a.shape[-1] // per32)
        pad = w32 * per32 - a.shape[-1]
        ap = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)]) if pad else a
        if per32 == 1:
            flat = jax.lax.bitcast_convert_type(ap, jnp.uint32).reshape(-1)
        else:
            flat = jax.lax.bitcast_convert_type(
                ap.reshape(ap.shape[:-1] + (w32, per32)),
                jnp.uint32).reshape(-1)
        metas.append((k, a.dtype, a.shape, w32, off, flat.shape[0]))
        parts.append(flat)
        off += flat.shape[0]
    return jnp.concatenate(parts), tuple(metas)


def _unflatten_ctx(flat: jnp.ndarray, metas) -> dict:
    """Rebuild the context dict (views into the flat buffer) inside a branch."""
    ctx = {}
    for k, dtype, shape, w32, off, n in metas:
        per32 = 4 // jnp.dtype(dtype).itemsize
        sl = jax.lax.dynamic_slice(flat, (off,), (n,))
        if per32 == 1:
            a = jax.lax.bitcast_convert_type(
                sl.reshape(shape[:-1] + (w32,)), dtype)
        else:
            # u32 -> N narrow elements: the bitcast appends the per32 dim.
            a = jax.lax.bitcast_convert_type(
                sl.reshape(shape[:-1] + (w32,)), dtype)
            a = a.reshape(shape[:-1] + (w32 * per32,))
        if w32 * per32 != shape[-1]:
            a = jax.lax.slice_in_dim(a, 0, shape[-1], axis=a.ndim - 1)
        ctx[k] = a
    return ctx


def mode_tier_cap(window_size: int, low_h: int, low_w: int) -> int:
    """Static deviant-window budget for delta_window_sums_mode. The mode
    kernel's cost is proportional to the CAP (static shapes), not the actual
    deviant count, so the cap trades coverage against the per-step floor:
    ~4k strip segments keeps a corrected step ~3 ms vs 15+ ms full strips."""
    n_win = -(-low_h // window_size) * -(-low_w // window_size)
    return min(2048, max(1, 4096 // window_size), n_win)


# Graduated mode-tier caps for the PLANNED pyramid: the correction batch costs
# its static cap, so steps with only a handful of deviant windows (border
# effects on otherwise-converged content) should pay a small cap, not the full
# one. "M" = the full mode_tier_cap (the cond path's single tier).
MODE_TIER_CAPS = {"M0": 32, "M1": 256, "M": None}

# Value-bucket tier caps (delta_window_sums_values): cost is linear in the
# STATIC cap on distinct window-offset values (cap x num_layers dense
# slices), independent of how many windows deviate — the lever for
# non-converged fine steps where the mode tier's deviant budget blows but
# the VALUE diversity stays small (the neighbor bias clusters offsets).
VALUE_TIER_CAPS = {"V0": 32, "V1": 128}


def tier_cap(tier: str, window_size: int, low_h: int, low_w: int) -> int:
    """Static budget of a tier: deviant windows for 'M*', distinct offset
    values for 'V*'."""
    if tier in VALUE_TIER_CAPS:
        return VALUE_TIER_CAPS[tier]
    full = mode_tier_cap(window_size, low_h, low_w)
    cap = MODE_TIER_CAPS[tier]
    return full if cap is None else min(cap, full)


def tier_valid(tier: str, n_dev: int, n_dist: int, window_size: int,
               low_h: int, low_w: int) -> bool:
    """Was `tier` a correct choice for a step whose pre-step deviant count
    was n_dev and distinct-value count n_dist? 'G' is unconditionally
    exact."""
    if tier == "G":
        return True
    if tier == "U":
        return n_dev == 0
    if tier in VALUE_TIER_CAPS:
        return n_dist <= tier_cap(tier, window_size, low_h, low_w)
    return n_dev <= tier_cap(tier, window_size, low_h, low_w)


def delta_window_sums_mode(
    ctx: dict,
    f2y: jnp.ndarray,
    f2uv: jnp.ndarray,
    offsets: jnp.ndarray,
    radius: jnp.ndarray,
    delta_scalar: jnp.ndarray,
    neighbor_scalar: jnp.ndarray,
    *,
    window_size: int,
    res_scalar: int,
    iteration: int,
    step: int,
    is_hdr: bool,
    num_layers: int,
    apron: int,
    dim_y: int,
    dim_x: int,
    cap: int | None = None,
) -> jnp.ndarray:
    """MODE-DOMINANT tier: dense zero-gather sums at the dominant offset
    (delta_window_sums_uniform — exact for every window holding the dominant
    value) plus EXACT per-window corrections for the <= K deviant windows,
    gathered as one small strip batch and scattered over the dense sums.

    On converged content (panning video) the finest pyramid steps hold >95%
    of windows at one offset; this turns their 15+ ms full strip gathers into
    ~0.3 ms. Callers guard with n_deviant <= mode_tier_cap (pyramid wraps in
    lax.cond); the deviant list itself is static-shaped (jnp.nonzero size=K).
    Bit-exact: non-deviant windows get the dense sums (their offsets equal
    the dominant), deviant windows are recomputed with the strip kernel's
    exact arithmetic (biases included) and overwritten."""
    assert res_scalar >= 1 and uniform_fits(
        ctx, low_h=offsets.shape[1], low_w=offsets.shape[2],
        res_scalar=res_scalar, apron=apron)
    rs = res_scalar
    L = num_layers
    w = window_size
    a, ac = apron, apron // 2
    low_h, low_w = offsets.shape[1:]
    n_wy = -(-low_h // w)
    n_wx = -(-low_w // w)
    K = mode_tier_cap(w, low_h, low_w) if cap is None \
        else min(cap, n_wy * n_wx)

    win_x = offsets[0, ::w, ::w].astype(jnp.int32)
    win_y = offsets[1, ::w, ::w].astype(jnp.int32)
    packed = (win_x << 16) | (win_y & 0xFFFF)
    dom = _dominant_offset(packed)
    dom_x = dom >> 16
    dom_y = (dom << 16) >> 16           # sign-extend low half

    # Dense base at the dominant offset (samples only; biases use the REAL
    # per-window offsets inside the tail — see delta_window_sums_uniform).
    dom_plane = jnp.broadcast_to(
        jnp.stack([dom_x, dom_y]).astype(jnp.int16)[:, None, None],
        offsets.shape)
    base_sums = delta_window_sums_uniform(
        ctx, f2y, f2uv, dom_plane, radius, delta_scalar, neighbor_scalar,
        window_size=w, res_scalar=rs, iteration=iteration, step=step,
        is_hdr=is_hdr, num_layers=L, apron=apron, dim_y=dim_y, dim_x=dim_x,
        bias_offsets=offsets)

    # Deviant list and merge, SCATTER-FREE (TPU scatters cost ~100+ ns per
    # element — a .at[].set merge of (L, K) values measured ~10 ms/step):
    #   rank r(i) = cumsum(deviant)[i]; the k-th deviant's flat index is the
    #   first i with r(i) == k+1 (searchsorted on the monotone cumsum), and
    #   the dense merge gathers each window's correction row by its rank.
    dev = (packed != dom).reshape(-1)
    cs = jnp.cumsum(dev.astype(jnp.int32))
    flat_idx = jnp.clip(
        jnp.searchsorted(cs, jnp.arange(1, K + 1, dtype=jnp.int32),
                         method="sort"),
        0, n_wy * n_wx - 1)
    kwy = (flat_idx // n_wx).astype(jnp.int32)
    kwx = (flat_idx - (flat_idx // n_wx) * n_wx).astype(jnp.int32)
    kix = win_x[kwy, kwx]
    kiy = win_y[kwy, kwx]

    corr = _window_list_sums(
        ctx, f2y, f2uv, offsets, kwy, kwx, kix, kiy, radius, delta_scalar,
        neighbor_scalar, window_size=w, res_scalar=rs, iteration=iteration,
        step=step, is_hdr=is_hdr, num_layers=L, apron=apron,
        dim_y=dim_y, dim_x=dim_x)

    slot_map = jnp.clip(cs - 1, 0, K - 1)            # window -> its rank
    g = corr.T[slot_map]                             # (n_win, L) block gather
    g = g.T.reshape(L, n_wy, n_wx)
    dev_win = dev.reshape(1, n_wy, n_wx)
    return jnp.where(dev_win, g, base_sums)


def _dominant_offset(packed: jnp.ndarray) -> jnp.ndarray:
    """Approximate modal packed offset: the probe value (from 5 fixed grid
    positions) matching the most windows. When the field is converged the
    true mode sits at one of the probes; when it does not, the deviant count
    against the chosen value simply exceeds the cap and the caller falls back
    to the gather kernels — correctness never depends on this choice."""
    h, w = packed.shape
    probes = jnp.stack([
        packed[0, 0], packed[h // 2, w // 2], packed[h // 4, w // 4],
        packed[(3 * h) // 4, (3 * w) // 4], packed[h // 2, w // 4],
    ])
    counts = jnp.sum(packed.reshape(1, -1) == probes[:, None], axis=1)
    return probes[jnp.argmax(counts)]


def _window_value_index(packed: jnp.ndarray, cap: int):
    """Distinct packed window-offset values, scatter-free:
      vals    (cap,) the first `cap` distinct values ascending (tail repeats
              the max when fewer exist),
      val_idx (n_wy, n_wx) each window's index into vals (exact whenever
              n_distinct <= cap),
      n_distinct scalar.
    Rank trick as the mode tier's deviant list: sort, boundary flags,
    cumsum ranks, searchsorted (no scatters — PERF.md scatter cost)."""
    flat = packed.reshape(-1)
    srt = jnp.sort(flat)
    is_new = jnp.concatenate([jnp.ones((1,), jnp.int32),
                              (srt[1:] != srt[:-1]).astype(jnp.int32)])
    ranks = jnp.cumsum(is_new) - 1                       # nondecreasing
    n_distinct = ranks[-1] + 1
    firsts = jnp.searchsorted(ranks, jnp.arange(cap, dtype=jnp.int32),
                              side="left")
    vals = srt[jnp.clip(firsts, 0, flat.shape[0] - 1)]   # (cap,) ascending
    val_idx = jnp.clip(jnp.searchsorted(vals, flat, side="left"),
                       0, cap - 1).reshape(packed.shape)
    return vals, val_idx, n_distinct


def delta_window_sums_values(
    ctx: dict,
    f2y: jnp.ndarray,
    f2uv: jnp.ndarray,
    offsets: jnp.ndarray,
    radius: jnp.ndarray,
    delta_scalar: jnp.ndarray,
    neighbor_scalar: jnp.ndarray,
    vals: jnp.ndarray,       # (cap,) from _window_value_index
    val_idx: jnp.ndarray,    # (n_wy, n_wx)
    *,
    window_size: int,
    res_scalar: int,
    iteration: int,
    step: int,
    is_hdr: bool,
    num_layers: int,
    apron: int,
    dim_y: int,
    dim_x: int,
    cap: int,
) -> jnp.ndarray:
    """VALUE-BUCKET tier: one dense zero-gather sample set per DISTINCT
    window-offset value (<= cap of them), merged per pixel by each window's
    value index — the generalization of the uniform (1 value) and mode
    (1 value + corrections) tiers to arbitrarily scattered but value-sparse
    offset fields (fine pyramid steps on non-converged content). Exact for
    every window whenever n_distinct <= cap (callers validate via the sig);
    biases/window sums ride the shared _cost_tail on the REAL offsets."""
    assert res_scalar >= 1 and uniform_fits(
        ctx, low_h=offsets.shape[1], low_w=offsets.shape[2],
        res_scalar=res_scalar, apron=apron)
    rs = res_scalar
    L = num_layers
    low_h, low_w = offsets.shape[1:]
    w = window_size

    lz = jnp.arange(L, dtype=jnp.int32)
    rel = flow_ops._signed_square_i16(
        ((lz % radius) - radius // 2).astype(jnp.int16)).astype(jnp.int32)

    # Per-pixel value index (window-constant; repeat to the pixel grid).
    idx_pix = jnp.repeat(jnp.repeat(val_idx, w, axis=0), w, axis=1)[
        :low_h, :low_w][None]                             # (1, lh, lw)

    # fori_loop, NOT a cap-unrolled python loop: unrolling cap x L dynamic
    # slices + select chains compiles pathologically (~135 s extra for ONE
    # V0 step on the CPU backend; worse at V1/remote-compile scale) and is
    # the known TPU over-fusion crash shape. The while-loop carry updates in
    # place (XLA aliases loop carries — none of lax.cond's operand-copy tax,
    # PERF.md round 2), so runtime stays ~cap x the uniform-step cost.
    def merge_value(k, carry):
        samp, pairs = carry
        vx = vals[k] >> 16
        vy = (vals[k] << 16) >> 16                        # sign-extend low
        s_k, p_k = _dense_value_samples(
            ctx, vx, vy, rel, res_scalar=rs, apron=apron, low_h=low_h,
            low_w=low_w, step=step, num_layers=L)
        m = idx_pix == k
        return jnp.where(m, s_k, samp), jnp.where(m, p_k, pairs)

    samp, pairs = jax.lax.fori_loop(
        0, cap, merge_value, (jnp.zeros((L, low_h, low_w), jnp.int32),
                              jnp.zeros((L, low_h, low_w), jnp.uint16)))
    u_s, v_s = _unpack_pairs(pairs, False)

    off_x_lw, off_y_lw = _window_offsets(offsets, radius, L, w, step)
    return _cost_tail(samp, u_s, v_s, f2y, f2uv, offsets, off_x_lw, off_y_lw,
                      radius, delta_scalar, neighbor_scalar,
                      window_size=w, res_scalar=rs, iteration=iteration,
                      step=step, is_hdr=is_hdr, num_layers=L, dim_y=dim_y,
                      dim_x=dim_x)


def _window_list_sums(ctx, f2y, f2uv, offsets, kwy, kwx, kix, kiy, radius,
                      delta_scalar, neighbor_scalar, *, window_size,
                      res_scalar, iteration, step, is_hdr, num_layers, apron,
                      dim_y, dim_x):
    """Exact (L, K) window sums for an explicit window list — the strip
    kernel's arithmetic restricted to K windows (strip gather per listed
    window row/column, layer extraction, delta + biases, window sum)."""
    rs = res_scalar
    L = num_layers
    w = window_size
    a, ac = apron, apron // 2
    low_h, low_w = offsets.shape[1:]
    K = kwy.shape[0]
    min_rel, span = rel_span(L)
    group_y = 32
    group_c = 16
    shift = 8 if is_hdr else 0

    lz = jnp.arange(L, dtype=jnp.int32)
    rel = flow_ops._signed_square_i16(
        ((lz % radius) - radius // 2).astype(jnp.int16))
    rel32 = rel.astype(jnp.int32)
    j = jnp.arange(w, dtype=jnp.int32)

    # int16-wrap candidate offsets per (L, K) — the active axis gets rel.
    if step % 2 == 0:
        off_x_lk = (kix[None, :].astype(jnp.int16)
                    + rel[:, None]).astype(jnp.int16)
        off_y_lk = jnp.broadcast_to(kiy.astype(jnp.int16), (L, K))
    else:
        off_x_lk = jnp.broadcast_to(kix.astype(jnp.int16), (L, K))
        off_y_lk = (kiy[None, :].astype(jnp.int16)
                    + rel[:, None]).astype(jnp.int16)

    if step % 2 == 0:
        # Row strips: segment = (window, in-window row j).
        cy = kwy[:, None] * w + j[None, :]               # (K, w)
        seg_row = (cy << rs) + kiy[:, None] + a
        base = (kwx[:, None] * (w << rs)) + kix[:, None] + min_rel + a
        base = jnp.broadcast_to(base, (K, w))
        nb_y = (span + ((w - 1) << rs) + group_y - 1) // group_y + 1
        strips = _strip_gather(ctx["pad_y"], seg_row.reshape(-1),
                               base.reshape(-1), nb_y, group_y)
        layer_starts = rel32 - min_rel
        samp = _extract_layers(strips.astype(jnp.int32), layer_starts, w,
                               1 << rs, L)               # (L, K*w, w)
        samp = samp.reshape(L, K, w, w)                  # (L, K, row, col)

        c_row = (((cy << rs) + kiy[:, None]) >> 1) + ac
        c_base = (((kwx[:, None] * (w << rs)) >> 1)
                  + ((kix[:, None] + min_rel) >> 1) + ac)
        c_base = jnp.broadcast_to(c_base, (K, w))
        nb_c = ((span >> 1) + 2 + ((w - 1) << (rs - 1)) + group_c - 1) \
            // group_c + 1
        c_strips = _strip_gather(ctx["pad_uv"], c_row.reshape(-1),
                                 c_base.reshape(-1), nb_c, group_c)
        even_starts = (rel32 - min_rel) >> 1
        odd_starts = (rel32 - min_rel + 1) >> 1
        se = _extract_layers(c_strips, even_starts, w, 1 << (rs - 1), L)
        so = _extract_layers(c_strips, odd_starts, w, 1 << (rs - 1), L)
        parity = ((kix + min_rel) & 1)[None, :, None, None]
        pair = jnp.where(
            jnp.broadcast_to(parity, (L, K, w, w)) == 0,
            se.reshape(L, K, w, w), so.reshape(L, K, w, w))
        u_s, v_s = _unpack_pairs(pair.astype(jnp.uint16), False)
        cx = kwx[:, None] * w + j[None, :]
        pix_cy = cy[:, :, None]                          # (K, w, 1) rows
        pix_cx = cx[:, None, :]                          # (K, 1, w) cols
    else:
        # Column strips from transposed planes: segment = (window, col j).
        cx = kwx[:, None] * w + j[None, :]               # (K, w)
        seg_col = (cx << rs) + kix[:, None] + a
        base = (kwy[:, None] * (w << rs)) + kiy[:, None] + min_rel + a
        base = jnp.broadcast_to(base, (K, w))
        nb_y = (span + ((w - 1) << rs) + group_y - 1) // group_y + 1
        strips = _strip_gather(ctx["pad_y_t"], seg_col.reshape(-1),
                               base.reshape(-1), nb_y, group_y)
        layer_starts = rel32 - min_rel
        samp = _extract_layers(strips.astype(jnp.int32), layer_starts, w,
                               1 << rs, L)               # (L, K*w cols, w rows)
        samp = samp.reshape(L, K, w, w).transpose(0, 1, 3, 2)  # (L,K,row,col)

        c_col = (((cx << rs) + kix[:, None]) >> 1) + ac
        c_base = (((kwy[:, None] * (w << rs)) >> 1)
                  + ((kiy[:, None] + min_rel) >> 1) + ac)
        c_base = jnp.broadcast_to(c_base, (K, w))
        nb_c = ((span >> 1) + 2 + ((w - 1) << (rs - 1)) + group_c_t(is_hdr)
                - 1) // group_c_t(is_hdr) + 1
        even_starts = (rel32 - min_rel) >> 1
        odd_starts = (rel32 - min_rel + 1) >> 1
        parity = ((kiy + min_rel) & 1)[None, :, None, None]

        def chroma_from(plane):
            st = _strip_gather(plane, c_col.reshape(-1), c_base.reshape(-1),
                               nb_c, group_c_t(is_hdr))
            se = _extract_layers(st.astype(jnp.int32), even_starts, w,
                                 1 << (rs - 1), L)
            so = _extract_layers(st.astype(jnp.int32), odd_starts, w,
                                 1 << (rs - 1), L)
            s = jnp.where(jnp.broadcast_to(parity, (L, K, w, w)) == 0,
                          se.reshape(L, K, w, w), so.reshape(L, K, w, w))
            return s.transpose(0, 1, 3, 2)               # (L, K, row, col)

        u_s = chroma_from(ctx["pad_u_t"])
        v_s = chroma_from(ctx["pad_v_t"])
        cy = kwy[:, None] * w + j[None, :]
        pix_cy = cy[:, :, None]
        pix_cx = cx[:, None, :]

    # Frame-2 samples at the window pixels: build the decimated planes DENSELY
    # once (strided views, the dense tail's formulas), group into windows, and
    # block-gather one (w*w)-element record per listed window — point gathers
    # per pixel would cost ~10x (TPU gathers are per-descriptor).
    scaled_cy = jnp.broadcast_to(pix_cy << rs, (K, w, w))
    scaled_cx = jnp.broadcast_to(pix_cx << rs, (K, w, w))
    in_frame = (scaled_cx < dim_x) & (scaled_cy < dim_y)
    in_grid = (jnp.broadcast_to(pix_cx, (K, w, w)) < low_w) & (
        jnp.broadcast_to(pix_cy, (K, w, w)) < low_h)
    uv_h = dim_y // 2
    f2y_i = f2y.astype(jnp.int32) >> shift
    f2uv_i = f2uv.astype(jnp.int32) >> shift
    lh_pad, lw_pad = -(-low_h // w) * w, -(-low_w // w) * w
    flat_idx = kwy * (lw_pad // w) + kwx
    cyd = jnp.clip(jnp.arange(lh_pad) << rs, 0, dim_y - 1)
    cxd = jnp.clip(jnp.arange(lw_pad) << rs, 0, dim_x - 1)
    f2d_y = f2y_i[cyd][:, cxd]
    f2d_u = f2uv_i[jnp.clip(cyd >> 1, 0, uv_h - 1)][:,
                                                    jnp.clip(cxd & ~1, 0,
                                                             f2uv.shape[1] - 1)]
    f2d_v = f2uv_i[jnp.clip(cyd >> 1, 0, uv_h - 1)][
        :, jnp.clip((cxd & ~1) + 1, 0, f2uv.shape[1] - 1)]

    def win_gather(plane_d):
        blocks = (plane_d.reshape(lh_pad // w, w, lw_pad // w, w)
                  .transpose(0, 2, 1, 3).reshape(-1, w * w))
        return blocks[flat_idx].reshape(K, w, w)

    f2_y = win_gather(f2d_y)[None]
    f2_u = win_gather(f2d_u)[None]
    f2_v = win_gather(f2d_v)[None]

    delta = (jnp.abs(samp - f2_y) + jnp.abs(u_s - f2_u)
             + jnp.abs(v_s - f2_v)).astype(jnp.uint32)
    delta = delta << delta_scalar.astype(jnp.uint32)
    delta = jnp.where(in_frame[None], delta, jnp.uint32(0))

    active = off_x_lk if step % 2 == 0 else off_y_lk      # (L, K)
    offset_bias = jnp.abs(active.astype(jnp.int32)).astype(jnp.uint32)
    total = delta + offset_bias[:, :, None, None]

    if iteration >= config.FIRST_NEIGHBOR_ITERATION:
        plane = offsets[0 if step % 2 == 0 else 1]
        nb = jnp.zeros((L, K, w, w), jnp.uint32)
        act32 = active.astype(jnp.int32)
        rr = jnp.arange(lh_pad, dtype=jnp.int32)
        cc = jnp.arange(lw_pad, dtype=jnp.int32)
        for dx, dy in ((0, 2 * w), (2 * w, 0), (-2 * w, 0), (0, -2 * w)):
            # Dense shifted/clipped neighbor plane, then one block per window.
            nof_d = plane[jnp.clip(rr + dy, 0, low_h - 1)][
                :, jnp.clip(cc + dx, 0, low_w - 1)]
            n_off = win_gather(nof_d.astype(jnp.int32))[None]
            nb = nb + jnp.abs(n_off - act32[:, :, None, None]).astype(
                jnp.uint32)
        total = total + (nb << neighbor_scalar.astype(jnp.uint32))

    total = jnp.where(in_grid[None], total, jnp.uint32(0))
    sums = total.sum(axis=(2, 3), dtype=jnp.uint32)       # (L, K)
    return jnp.where(lz[:, None] < radius, sums, UINT32_MAX)


def _cost_tail(samp, u_s, v_s, f2y, f2uv, offsets, off_x_lw, off_y_lw,
               radius, delta_scalar, neighbor_scalar, *, window_size, res_scalar,
               iteration, step, is_hdr, num_layers, dim_y, dim_x, seg0=0,
               layer_offset=0):
    """Shared cost assembly (mirrors flow.delta_window_sums): delta + biases +
    window sums from reconstructed per-pixel frame-1 samples.

    Slab mode (seg0 != 0 or sample arrays narrower than the frame): the arrays
    cover global rows [seg0*w, ...) for step even / columns for step odd; pixels
    past the frame edge contribute zero (the original formulation's zero pad).
    layer_offset maps local layers to global candidate layers (layer sharding)."""
    w = window_size
    rs = res_scalar
    L = num_layers
    low_h, low_w = offsets.shape[1:]
    seg0 = jnp.asarray(seg0, jnp.int32)

    shift = 8 if is_hdr else 0
    slab_h, slab_w = samp.shape[1:]
    row0 = seg0 * w if step % 2 == 0 else 0
    col0 = seg0 * w if step % 2 == 1 else 0
    cxg = (jnp.arange(slab_w, dtype=jnp.int32) + col0)[None, None, :]
    cyg = (jnp.arange(slab_h, dtype=jnp.int32) + row0)[None, :, None]
    scaled_cx = cxg << rs
    scaled_cy = cyg << rs
    in_frame = (scaled_cx < dim_x) & (scaled_cy < dim_y)
    in_grid = (cxg < low_w) & (cyg < low_h)

    uv_h = dim_y // 2
    f2y_i = f2y.astype(jnp.int32) >> shift
    f2uv_i = f2uv.astype(jnp.int32) >> shift
    s_cy = jnp.clip(scaled_cy, 0, dim_y - 1)
    s_cx = jnp.clip(scaled_cx, 0, dim_x - 1)
    s_uy = jnp.clip(s_cy >> 1, 0, uv_h - 1)
    s_ux = jnp.clip(s_cx & ~1, 0, f2uv.shape[1] - 1)
    s_vx = jnp.clip((s_cx & ~1) + 1, 0, f2uv.shape[1] - 1)
    f2_y = f2y_i[s_cy[0], s_cx[0]][None]
    f2_u = f2uv_i[s_uy[0], s_ux[0]][None]
    f2_v = f2uv_i[s_uy[0], s_vx[0]][None]

    # Context samples are already top-8-bit for HDR (pre-shifted at context build);
    # only the frame2 side shifts here.
    delta = (
        jnp.abs(samp - f2_y)
        + jnp.abs(u_s - f2_u)
        + jnp.abs(v_s - f2_v)
    ).astype(jnp.uint32)
    delta = delta << delta_scalar.astype(jnp.uint32)
    delta = jnp.where(in_frame, delta, jnp.uint32(0))

    # Per-pixel offsets for biases (window-broadcast over the slab).
    off_x_full = jnp.repeat(jnp.repeat(off_x_lw, w, axis=1), w, axis=2)[
        :, :slab_h, :slab_w]
    off_y_full = jnp.repeat(jnp.repeat(off_y_lw, w, axis=1), w, axis=2)[
        :, :slab_h, :slab_w]
    active = off_x_full if step % 2 == 0 else off_y_full
    offset_bias = jnp.abs(active.astype(jnp.int32)).astype(jnp.uint32)

    if iteration >= config.FIRST_NEIGHBOR_ITERATION:
        plane = offsets[0 if step % 2 == 0 else 1]
        nb = jnp.zeros((L, slab_h, slab_w), dtype=jnp.uint32)
        for dx, dy in ((0, 2 * w), (2 * w, 0), (-2 * w, 0), (0, -2 * w)):
            r = jnp.clip(cyg[0, :, 0] + dy, 0, low_h - 1)
            c = jnp.clip(cxg[0, 0, :] + dx, 0, low_w - 1)
            n_off = plane[r][:, c][None]
            nb = nb + jnp.abs(n_off.astype(jnp.int32)
                              - active.astype(jnp.int32)).astype(jnp.uint32)
        neighbor_bias = nb << neighbor_scalar.astype(jnp.uint32)
    else:
        neighbor_bias = jnp.uint32(0)

    total = delta + offset_bias + neighbor_bias
    total = jnp.where(in_grid, total, jnp.uint32(0))
    pad_h = (-slab_h) % w
    pad_w = (-slab_w) % w
    padded = jnp.pad(total, ((0, 0), (0, pad_h), (0, pad_w)))
    sums = padded.reshape(L, (slab_h + pad_h) // w, w,
                          (slab_w + pad_w) // w, w).sum(axis=(2, 4),
                                                        dtype=jnp.uint32)
    lz3 = (jnp.arange(L, dtype=jnp.int32)
           + jnp.asarray(layer_offset, jnp.int32))[:, None, None]
    return jnp.where(lz3 < radius, sums, UINT32_MAX)


def group_c_t(is_hdr: bool) -> int:
    """Blocks for transposed split chroma planes (uint8 for both bit depths
    since the HDR context pre-shifts >>8): 32 B per index (see group_y)."""
    return 32


@functools.partial(
    jax.jit,
    static_argnames=("low_h", "low_w", "res_scalar", "is_hdr", "num_iterations",
                     "num_layers", "apron", "dim_y", "dim_x", "uniform_tier"),
)
def pyramid_flow_strip(
    ctx1: dict,
    f2y: jnp.ndarray,
    f2uv: jnp.ndarray,
    radius: jnp.ndarray,
    delta_scalar: jnp.ndarray,
    neighbor_scalar: jnp.ndarray,
    *,
    low_h: int,
    low_w: int,
    res_scalar: int,
    is_hdr: bool,
    num_iterations: int = 0,
    num_layers: int = MAX_R,
    apron: int,
    dim_y: int,
    dim_x: int,
    uniform_tier: bool = True,
):
    """Strip-mined twin of flow.pyramid_flow (identical outputs). frame1 arrives as
    its prebuilt context (built once per source frame by the engine)."""
    offsets = jnp.zeros((2, low_h, low_w), dtype=jnp.int16)
    total_delta_raw = jnp.uint32(0)
    use_tiers = uniform_tier and uniform_fits(
        ctx1, low_h=low_h, low_w=low_w, res_scalar=res_scalar, apron=apron)
    if use_tiers:
        # One u32 operand through every per-step cond (see _flatten_ctx);
        # the frame-2 planes ride along (they would be copied per cond too).
        ctx_flat, ctx_meta = _flatten_ctx(
            {**ctx1, "__f2y": f2y, "__f2uv": f2uv})
    else:
        ctx_flat = ctx_meta = None

    for iteration, window in flow_ops.window_schedule(low_h, low_w, num_iterations):
        for step in (0, 1):
            # Coarse windows: patch gathers (one descriptor per layer x window);
            # fine windows: strips (descriptor count would explode otherwise).
            # patch_fits guards against CLIPPED patch starts (which shift the
            # patch content): windows whose worst-case start overruns the
            # decimated planes fall back to strips.
            n_desc = num_layers * -(-low_h // window) * -(-low_w // window)
            use_patch = n_desc <= 4096 and patch_fits(
                ctx1, low_h=low_h, low_w=low_w, window=window,
                res_scalar=res_scalar, apron=apron)
            kernel = delta_window_sums_patch if use_patch else delta_window_sums_strip
            kw = dict(window_size=window, res_scalar=res_scalar,
                      iteration=iteration, step=step, is_hdr=is_hdr,
                      num_layers=num_layers, apron=apron,
                      dim_y=dim_y, dim_x=dim_x)
            if use_tiers:
                # MODE-DOMINANT TIER: when all but <= K windows hold one
                # offset (iteration 0 by construction; converged motion on
                # real content afterwards), sample densely at the dominant
                # offset (zero gathers) and correct the deviant windows with
                # one small strip batch. Decided on device per step
                # (lax.cond); both branches are bit-exact.
                win_pk = ((offsets[0, ::window, ::window].astype(jnp.int32)
                           << 16)
                          | (offsets[1, ::window, ::window].astype(jnp.int32)
                             & 0xFFFF))
                n_dev = jnp.sum((win_pk != _dominant_offset(win_pk))
                                .astype(jnp.int32))
                # Three-way: fully uniform (0 deviants, ~0.1 ms) / dominant
                # with few deviants (mode kernel, cost ~ the static cap) /
                # full gather. The mode kernel's correction machinery costs
                # its cap even at n_dev == 1, so uniform steps must not pay it.
                meta = ctx_meta

                def unpack(cf):
                    d = _unflatten_ctx(cf, meta)
                    return d, d.pop("__f2y"), d.pop("__f2uv")

                def t_uniform(cf, o):
                    d, fy, fuv = unpack(cf)
                    return delta_window_sums_uniform(
                        d, fy, fuv, o, radius,
                        delta_scalar, neighbor_scalar, **kw)

                def t_mode(cf, o):
                    d, fy, fuv = unpack(cf)
                    return delta_window_sums_mode(
                        d, fy, fuv, o, radius,
                        delta_scalar, neighbor_scalar, **kw)

                def t_gather(cf, o):
                    d, fy, fuv = unpack(cf)
                    return kernel(
                        d, fy, fuv, o, radius,
                        delta_scalar, neighbor_scalar, **kw)

                sums = jax.lax.cond(
                    n_dev == 0, t_uniform,
                    lambda cf, o: jax.lax.cond(
                        n_dev <= mode_tier_cap(window, low_h, low_w),
                        t_mode, t_gather, cf, o),
                    ctx_flat, offsets,
                )
                # The barrier bounds fusion scope across the cond boundary —
                # unbounded fusion around the branch bodies faults the TPU
                # runtime (same class as the per-step barrier below).
                sums = jax.lax.optimization_barrier(sums)
            else:
                sums = kernel(
                    ctx1, f2y, f2uv, offsets, radius, delta_scalar,
                    neighbor_scalar, **kw,
                )
            if iteration == 0 and step == 0:
                total_delta_raw = jax.lax.dynamic_index_in_dim(
                    sums[:, 0, 0], radius // 2 - 1, keepdims=False
                )
            winners = flow_ops.lowest_layer(sums)
            offsets = flow_ops.adjust_offsets(
                offsets, winners, radius, window_size=window, step=step
            )
            # Fusing all 16 strip steps into one compute region faults the TPU
            # runtime (worker crash); a barrier per step keeps one executable while
            # bounding fusion scope. No measurable cost (the steps are serial anyway).
            offsets = jax.lax.optimization_barrier(offsets)

    blurred = flow_ops.blur_flow(offsets)
    return offsets, blurred, total_delta_raw


# --------------------------------------------------------------------------
# PLANNED pyramid: host-side tier selection (no per-step lax.cond)
#
# The cond-dispatched tiers above are bit-exact but pay a per-step device tax:
# ~0.74 ms fixed cond overhead plus a copy of the flattened context operand
# (~4.4 ms at 4K HDR) on EVERY pyramid step — ~5 ms x 14-16 steps of pure
# dispatch that swamps the 0.10 ms uniform-step compute (chip probes, PERF.md
# round 2). The reference's own adaptivity is host-driven per frame
# (ref: HopperRender.cpp:1438-1463 autoAdjustSettings); the planned pyramid
# applies the same move to tier selection:
#
#   * the per-step tier choice is a STATIC `plan` baked into the executable —
#     each step calls its kernel directly, no cond, no operand copies;
#   * every step also computes its pre-step deviant-window count n_dev (a few
#     vector ops on the tiny window grid) and returns the vector: the host
#     VALIDATES the plan it ran (tier_valid) and PREDICTS the next frame's
#     plan (predict_plan) from counts fetched with the same device->host
#     sync the engine already performs for honest timing;
#   * on a misprediction the host re-runs the pair with repair_plan (the
#     still-valid prefix + exact gather steps) before the flow is consumed —
#     the flow isn't needed until the NEXT frame's warp (1-pair pipeline),
#     and stable content mispredicts rarely.
#
# Each distinct plan is one compiled executable (cached per plan tuple); on
# stable content the plan converges after 1-2 frames.
# --------------------------------------------------------------------------


def plan_steps(low_h: int, low_w: int,
               num_iterations: int = 0) -> list[tuple[int, int, int]]:
    """Per-step (iteration, window, step) list in execution order."""
    return [(it, w, s)
            for it, w in flow_ops.window_schedule(low_h, low_w, num_iterations)
            for s in (0, 1)]


def default_plan(low_h: int, low_w: int, num_iterations: int = 0) -> tuple:
    """First-pair plan: iteration-0 step-0 is provably uniform (offsets start
    zeroed); everything else exact gathers until counts teach us better."""
    n = len(plan_steps(low_h, low_w, num_iterations))
    return ("U",) + ("G",) * (n - 1)


def sig_flow_bound(sig) -> int:
    """maxabs of the blurred flow, from a fetched validity sig (the warp
    apron tier's certificate; layout: [ndev*n, ndist*n, bound, probe])."""
    return int(sig[-2])


def split_sig(sig, low_h: int, low_w: int, num_iterations: int = 0):
    """(ndev, ndist) per-step arrays from a fetched validity sig
    (layout: [ndev x n_steps, ndist x n_steps, completion probe])."""
    n = len(plan_steps(low_h, low_w, num_iterations))
    return sig[:n], sig[n:2 * n]


def predict_plan(sig, low_h: int, low_w: int,
                 num_iterations: int = 0) -> tuple:
    """Next-frame plan from this frame's validity sig. Chooses the cheapest
    tier with headroom over the observed counts (so small frame-to-frame
    fluctuations don't mispredict); U only at exactly zero deviants. Tier
    cost order (chip-probed): U < M0 < M1 < V0 < M < V1 < G. ndist is only
    measured on steps that ran V/G-strip (others report the window count =
    "unknown"), so V is only ever entered from steps where it was actually
    counted."""
    steps = plan_steps(low_h, low_w, num_iterations)
    ndev, ndist = split_sig(sig, low_h, low_w, num_iterations)
    plan = []
    for n, d, (_, w, _) in zip(ndev, ndist, steps):
        n, d = int(n), int(d)
        if n == 0:
            plan.append("U")
        elif 2 * n <= tier_cap("M0", w, low_h, low_w):
            plan.append("M0")
        elif 2 * n <= tier_cap("M1", w, low_h, low_w):
            plan.append("M1")
        elif 4 * d <= 3 * tier_cap("V0", w, low_h, low_w):
            plan.append("V0")
        elif 2 * n <= tier_cap("M", w, low_h, low_w):
            plan.append("M")
        elif 4 * d <= 3 * tier_cap("V1", w, low_h, low_w):
            plan.append("V1")
        else:
            plan.append("G")
    return tuple(plan)


def first_invalid_step(plan, sig, low_h: int, low_w: int,
                       num_iterations: int = 0) -> int | None:
    """Index of the first step whose planned tier was wrong for the measured
    pre-step counts, or None when the whole run was valid. Counts AFTER the
    first invalid step are untrustworthy (the offsets diverged)."""
    steps = plan_steps(low_h, low_w, num_iterations)
    ndev, ndist = split_sig(sig, low_h, low_w, num_iterations)
    for i, (tier, n, d, (_, w, _)) in enumerate(zip(plan, ndev, ndist, steps)):
        if not tier_valid(tier, int(n), int(d), w, low_h, low_w):
            return i
    return None


def repair_plan(plan, invalid_step: int) -> tuple:
    """Redo plan after a misprediction: keep the proven-valid prefix, exact
    gathers from the first invalid step on."""
    return tuple(plan[:invalid_step]) + ("G",) * (len(plan) - invalid_step)


@functools.partial(
    jax.jit,
    static_argnames=("low_h", "low_w", "res_scalar", "is_hdr", "num_iterations",
                     "num_layers", "apron", "dim_y", "dim_x", "plan",
                     "debug_skip"),
)
def pyramid_flow_strip_planned(
    ctx1: dict,
    f2y: jnp.ndarray,
    f2uv: jnp.ndarray,
    radius: jnp.ndarray,
    delta_scalar: jnp.ndarray,
    neighbor_scalar: jnp.ndarray,
    *,
    low_h: int,
    low_w: int,
    res_scalar: int,
    is_hdr: bool,
    num_iterations: int = 0,
    num_layers: int = MAX_R,
    apron: int,
    dim_y: int,
    dim_x: int,
    plan: tuple,
    debug_skip: tuple = (),
):
    """Statically tier-planned twin of pyramid_flow_strip (see block comment
    above). Returns (offsets, blurred, total_delta_raw, sig) with the
    validity sig laid out [ndev x n_steps, ndist x n_steps, flow-bound,
    probe]:
    ndev[i] = pre-step deviant-window count vs the probe-dominant offset,
    ndist[i] = distinct-value count (measured only on steps that ran a V
    tier or a strip-routed G step — others report the window count =
    "unknown"), and the final element is a 1-element completion probe
    (blurred[0,0,0]) so ONE host fetch of `sig` both validates the plan and
    forces completion for honest timing (PERF.md dispatch semantics).

    Outputs are bit-exact vs pyramid_flow (the gather formulation) whenever
    the plan is VALID for the content (tier_valid per step); an invalid plan
    is detectable from sig and must be repaired+rerun by the caller."""
    steps = plan_steps(low_h, low_w, num_iterations)
    assert len(plan) == len(steps), (plan, steps)
    tiers_ok = uniform_fits(ctx1, low_h=low_h, low_w=low_w,
                            res_scalar=res_scalar, apron=apron)
    assert tiers_ok or all(t == "G" for t in plan), \
        "U/M/V tiers need a low_dims-padded context (uniform_fits)"

    offsets = jnp.zeros((2, low_h, low_w), dtype=jnp.int16)
    total_delta_raw = jnp.uint32(0)
    ndevs, ndists = [], []
    for tier, (iteration, window, step) in zip(plan, steps):
        kw = dict(window_size=window, res_scalar=res_scalar,
                  iteration=iteration, step=step, is_hdr=is_hdr,
                  num_layers=num_layers, apron=apron,
                  dim_y=dim_y, dim_x=dim_x)
        n_wy = -(-low_h // window)
        n_wx = -(-low_w // window)
        n_desc = num_layers * n_wy * n_wx
        strip_routed = not (n_desc <= 4096 and patch_fits(
            ctx1, low_h=low_h, low_w=low_w, window=window,
            res_scalar=res_scalar, apron=apron))
        # Pre-step deviant count vs the probe-dominant offset — always
        # computed (a few vector ops on the window grid): it validates THIS
        # step's tier and predicts the next frame's. debug_skip is a TIMING
        # ATTRIBUTION probe only (scripts/tpu_flow_decomp.py): "counters"
        # fakes the validity counts (sig invalid!), "winners" skips the
        # argmin/adjust chain (offsets stay zero) — never served.
        win_pk = ((offsets[0, ::window, ::window].astype(jnp.int32) << 16)
                  | (offsets[1, ::window, ::window].astype(jnp.int32)
                     & 0xFFFF))
        if "counters" in debug_skip:
            n_dev = win_pk[0, 0]
        else:
            n_dev = jnp.sum((win_pk != _dominant_offset(win_pk))
                            .astype(jnp.int32))
        ndevs.append(n_dev)
        # Distinct-value count: a sort of the window grid — only worth paying
        # where a V tier could matter (it runs V, or the step is an expensive
        # strip-routed gather the predictor might demote to V).
        count_dist = tier in VALUE_TIER_CAPS or (tier == "G" and strip_routed
                                                 and tiers_ok)
        if count_dist:
            vcap = tier_cap(tier, window, low_h, low_w) \
                if tier in VALUE_TIER_CAPS else max(VALUE_TIER_CAPS.values())
            vals, val_idx, n_distinct = _window_value_index(win_pk, vcap)
            ndists.append(n_distinct)
        else:
            vals = val_idx = None
            ndists.append(jnp.int32(n_wy * n_wx))

        if tier == "U":
            sums = delta_window_sums_uniform(
                ctx1, f2y, f2uv, offsets, radius, delta_scalar,
                neighbor_scalar, **kw)
        elif tier in MODE_TIER_CAPS:
            sums = delta_window_sums_mode(
                ctx1, f2y, f2uv, offsets, radius, delta_scalar,
                neighbor_scalar, cap=tier_cap(tier, window, low_h, low_w),
                **kw)
        elif tier in VALUE_TIER_CAPS:
            sums = delta_window_sums_values(
                ctx1, f2y, f2uv, offsets, radius, delta_scalar,
                neighbor_scalar, vals, val_idx,
                cap=tier_cap(tier, window, low_h, low_w), **kw)
        else:
            assert tier == "G", tier
            kernel = (delta_window_sums_strip if strip_routed
                      else delta_window_sums_patch)
            sums = kernel(ctx1, f2y, f2uv, offsets, radius, delta_scalar,
                          neighbor_scalar, **kw)

        if iteration == 0 and step == 0:
            total_delta_raw = jax.lax.dynamic_index_in_dim(
                sums[:, 0, 0], radius // 2 - 1, keepdims=False)
        if "winners" in debug_skip:
            offsets = offsets + sums[0, :1, :1].astype(jnp.int16)[None]
        else:
            winners = flow_ops.lowest_layer(sums)
            offsets = flow_ops.adjust_offsets(
                offsets, winners, radius, window_size=window, step=step)
        # Per-step fence: unbounded fusion across pyramid steps faults the
        # TPU runtime (PERF.md fusion hazard) — same fence as the cond path.
        offsets = jax.lax.optimization_barrier(offsets)

    blurred = flow_ops.blur_flow(offsets)
    # maxabs of the BLURRED flow: the warp apron tier's certificate. The warp
    # that consumes this flow runs NEXT frame (flow double buffer), by which
    # time this sig has been fetched — so the host picks the smallest band
    # apron covering the true displacement bound with no speculation
    # (warp_band.pick_apron / flow_engine._flow_bounds).
    bound = jnp.max(jnp.abs(blurred.astype(jnp.int32))).astype(jnp.int32)
    sig = jnp.concatenate([
        jnp.stack(ndevs),
        jnp.stack(ndists),
        bound[None],
        blurred[0, 0, 0].astype(jnp.int32)[None],
    ])
    return offsets, blurred, total_delta_raw, sig

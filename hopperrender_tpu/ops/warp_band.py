"""Pallas row-band warp kernel: the TPU-native formulation of warpFrameKernel
modes 0/1/2 (ref: warpFrameKernelSDR.h:116-184 / HDR.h).

Why: the strip-mined warp (ops/warp_strip.py) is bound by XLA's per-index gather
cost (~6.2M block indices per 4K output ~= 92 ms). This kernel has NO gathers:

  * grid over (row band, width tile); one DMA per source pulls the
    displacement-bounded band (rows +- apron) of the warp-padded plane into VMEM
    as packed uint32 lanes;
  * per cell (the 2^rs x 2^rs block sharing one displacement,
    ref: warpFrameKernelSDR.h:153-158), ONE tile-aligned (8, 256)-lane vector
    load at a dynamic row offset, a dynamic lane roll (pltpu.roll) to the cell's
    output position, a sub-lane byte realign (shift/or), and a masked merge into
    an (8, 128) accumulator — whole-register VPU ops only, no sub-tile slices
    (the Mosaic rejection found in round 1);
  * blend + levels run dense on the accumulated tile as bit-exact twins of
    ops/warp.py (_apply_levels_y/_apply_levels_uv reused verbatim).

Outputs are identical to warp_strip.warp_frame_strip (tested exhaustively in
interpret mode and on hardware via the engine digests). Requires res_scalar in
{2, 3} and band-compatible dims (band_geometry_ok); other configs keep strips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hopperrender_tpu.ops.warp import F32, _apply_levels_y, _apply_levels_uv
from hopperrender_tpu.ops.warp_strip import _cell_displacements

U32 = jnp.uint32


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _choose_geometry(dim_rows: int, out_w32: int, a_rows: int, a_lanes: int,
                     cb: int, vmem_budget: int, n_bufs: int):
    """(band_rows, n_tiles, c32, c32_alloc) minimizing band DMA bytes under the
    VMEM budget. out_w32: packed uint32 output width (a multiple of 128);
    a_rows/a_lanes: one-sided displacement apron in rows / uint32 lanes."""
    tile_opts = [t for t in range(1, out_w32 // 128 + 1)
                 if out_w32 % t == 0 and (out_w32 // t) % 128 == 0]
    best = None
    for band in range(8, _round_up(dim_rows, 8) + 1, 8):
        n_bands = -(-dim_rows // band)  # last band clamps its DMA window
        rows = band + 2 * a_rows
        for nt in tile_opts:
            c32 = out_w32 // nt + 2 * a_lanes
            c32_alloc = max(256, _round_up(c32 + cb + 1, 128))
            if n_bufs * (rows + 8) * c32_alloc * 4 > vmem_budget:
                continue
            dma = n_bands * nt * rows * c32 * 4 * n_bufs
            if best is None or dma < best[0]:
                best = (dma, band, nt, c32, c32_alloc)
    return None if best is None else best[1:]


def _pack_u32(plane: jnp.ndarray, per32: int, min_w32: int,
              min_rows: int = 0) -> jnp.ndarray:
    """(H, W) elements -> (>=min_rows, >=min_w32) uint32 lanes (little-endian).
    Row padding keeps the last band's DMA window in bounds at its aligned
    static-stride offset (padded rows only feed sliced-off padded outputs)."""
    h, w = plane.shape
    rpad = max(0, min_rows - h)
    if plane.dtype == U32:
        assert per32 == 1
        if w < min_w32 or rpad:
            plane = jnp.pad(plane, ((0, rpad), (0, max(0, min_w32 - w))))
        return plane
    w32 = max(-(-w // per32), min_w32)
    pad = w32 * per32 - w
    if pad or rpad:
        plane = jnp.pad(plane, ((0, rpad), (0, pad)))
    return jax.lax.bitcast_convert_type(
        plane.reshape(h + rpad, w32, per32), U32)


def _merge_cells_kernel(
    *, cell: int, per32: int, cb: int, band_rows: int, a_rows: int,
    c32: int, c32_alloc: int, tile_w32: int, mode: int, is_hdr: bool,
    is_uv: bool, n_par: int, cpt: int, nk: int, xdiv8: int,
):
    """Kernel factory. Refs:
      disp_ref  SMEM (1, 8, cpb*cpt*nk/8) int32, flattened per-cell records of
                (row_off12, col12, row_off21, col21[, q12, q21]) — row_off
                includes the apron, col is the tile-local packed element column
                including the apron, q selects the UV parity plane. (Flat-ish
                layout: SMEM pads the minormost dim to 128 and requires the
                second-to-last block dim to be a multiple of 8.)
      fs_ref    SMEM (1, 1) f32 blending scalar
      lev_ref   SMEM (1, 2) f32 black/white levels
      src12/21  ANY  (n_par, src_rows, src_w32) packed u32 source planes
      out_ref   VMEM (band_rows, tile_w32) u32
      band12/21 VMEM (n_par, band_rows + 2*a_rows, c32_alloc) u32 scratch
      sem       DMA  (2, n_par)
    """
    rows = band_rows + 2 * a_rows
    c32_dma = _round_up(c32, 128)     # lane-dim DMA slices must be 128-aligned
    sub_per = 8 // cell               # cell-rows per 8-row accumulator group
    cps = (128 * per32) // cell       # cells per 128-lane output subtile
    n_sub = tile_w32 // 128
    fbits = 32 // per32               # packed sub-unit width for the realign
    ebits = 16 if is_hdr else 8       # element width (Y sample / UV byte)

    def kernel(disp_ref, fs_ref, lev_ref, src12_ref, src21_ref, out_ref,
               band12, band21, sem):
        emask = U32(0xFFFF if is_hdr else 0xFF)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        b = pl.program_id(0)
        t = pl.program_id(1)
        copies = []
        for si, (src, band) in enumerate(((src12_ref, band12),
                                          (src21_ref, band21))):
            if (mode == 0 and si == 1) or (mode == 1 and si == 0):
                continue
            for q in range(n_par):
                # Source planes are row-padded so every band window is in
                # bounds at this aligned static-stride offset (no last-band
                # shift — Mosaic requires provably 8-aligned row offsets).
                c = pltpu.make_async_copy(
                    src.at[q, pl.ds(b * band_rows, rows),
                           pl.ds(t * tile_w32, c32_dma)],
                    band.at[q, pl.ds(0, rows), pl.ds(0, c32_dma)],
                    sem.at[si, q],
                )
                c.start()
                copies.append(c)
        for c in copies:
            c.wait()

        fs12 = fs_ref[0, 0]
        fs21 = (F32(1.0) - fs12).astype(F32)

        def fetch_cell(band, r0, p, q_par, target_lane):
            """One cell's run as an (8, 128) u32 vector, placed at lanes
            [target_lane, target_lane + cb). Defensive clamps keep every access
            in bounds even for padded cells (their outputs are sliced off).
            Mosaic accepts only 8-aligned dynamic sublane and 128-aligned
            dynamic lane offsets (probed): load aligned, realign with rolls."""
            r0 = jnp.clip(r0, 0, rows - 8)
            c32i = jnp.clip(p // per32, 0, c32 - 1)
            sub = p - (p // per32) * per32
            la = pl.multiple_of(jnp.minimum(c32i & ~127, c32_alloc - 256), 128)
            ra = pl.multiple_of((r0 >> 3) << 3, 8)
            if n_par > 1:
                w = band[q_par, pl.ds(ra, 16), pl.ds(la, 256)]
            else:
                w = band[0, pl.ds(ra, 16), pl.ds(la, 256)]
            w = pltpu.roll(w, (16 - (r0 - ra)) & 15, axis=0)[:8]
            s = jnp.remainder(target_lane - (c32i - la), 256)
            w = pltpu.roll(w, s, axis=1)
            if per32 > 1:
                wm1 = pltpu.roll(w, 255, axis=1)  # wm1[i] = w[i+1]
                sh = (U32(fbits) * sub.astype(U32))
                sh2 = (U32(32) - sh) & U32(31)
                w = jnp.where(sub == 0, w, (w >> sh) | (wm1 << sh2))
            return w[:, :128]

        unroll = next((u for u in (8, 4, 2, 1) if cps % u == 0), 1)

        def group_body(gi, _):
            """One (8-row group, 128-lane subtile) output tile."""
            cr8 = gi // n_sub
            g = gi - cr8 * n_sub

            def one_cell(j, acc12, acc21):
                sub_cr = j // cps
                jj = j - sub_cr * cps
                cr_l = cr8 * sub_per + sub_cr
                cx_l = g * cps + jj
                rec = (cr_l * cpt + cx_l) * nk

                def d(j_):
                    r = rec + j_
                    return disp_ref[0, r // xdiv8, r % xdiv8]

                target = jj * cb
                mask = (lane >= target) & (lane < target + cb)
                if sub_per > 1:
                    mask = mask & (row_i >= sub_cr * cell) & (
                        row_i < sub_cr * cell + cell)
                if mode != 1:
                    v = fetch_cell(band12, cr8 * 8 + d(0), d(1),
                                   d(4) if is_uv else 0, target)
                    acc12 = jnp.where(mask, v, acc12)
                if mode != 0:
                    v = fetch_cell(band21, cr8 * 8 + d(2), d(3),
                                   d(5) if is_uv else 0, target)
                    acc21 = jnp.where(mask, v, acc21)
                return acc12, acc21

            def body(ju, accs):
                # Unrolled: independent per-cell chains overlap in the VPU
                # pipeline (load -> roll -> realign -> merge is serial per cell).
                acc12, acc21 = accs
                for u in range(unroll):
                    acc12, acc21 = one_cell(ju * unroll + u, acc12, acc21)
                return acc12, acc21

            zero = jnp.zeros((8, 128), U32)
            acc12, acc21 = jax.lax.fori_loop(
                0, (sub_per * cps) // unroll, body, (zero, zero))

            if mode == 0:
                packed = acc12
            elif mode == 1:
                packed = acc21
            else:
                packed = jnp.zeros((8, 128), U32)
                black = lev_ref[0, 0]
                white = lev_ref[0, 1]
                for k in range(32 // ebits):
                    v12 = ((acc12 >> U32(ebits * k)) & emask).astype(
                        jnp.int32).astype(F32)
                    v21 = ((acc21 >> U32(ebits * k)) & emask).astype(
                        jnp.int32).astype(F32)
                    blended = jnp.trunc(v12 * fs21 + v21 * fs12).astype(
                        jnp.int32)
                    if is_uv:
                        res = _apply_levels_uv(blended, white, is_hdr)
                    else:
                        res = _apply_levels_y(blended, black, white, is_hdr)
                    packed = packed | (res.astype(U32) << U32(ebits * k))
            ro = pl.multiple_of(cr8 * 8, 8)
            co = pl.multiple_of(g * 128, 128)
            out_ref[pl.ds(ro, 8), pl.ds(co, 128)] = packed
            return 0

        jax.lax.fori_loop(0, (band_rows // 8) * n_sub, group_body, 0)

    return kernel


def _band_call(disp, fs, lev, src12, src21, *, cell, per32, cb, band_rows,
               a_rows, c32, c32_alloc, tile_w32, n_tiles, out_rows, mode,
               is_hdr, is_uv, n_par, interpret):
    n_bands = -(-out_rows // band_rows)
    cpb, cpt, k = disp.shape[2:]
    xdiv8 = cpb * cpt * k // 8
    kern = _merge_cells_kernel(
        cell=cell, per32=per32, cb=cb, band_rows=band_rows, a_rows=a_rows,
        c32=c32, c32_alloc=c32_alloc, tile_w32=tile_w32, mode=mode,
        is_hdr=is_hdr, is_uv=is_uv, n_par=n_par, cpt=cpt, nk=k, xdiv8=xdiv8)
    disp = disp.reshape(disp.shape[0], disp.shape[1] * 8, xdiv8)
    return pl.pallas_call(
        kern,
        grid=(n_bands, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 8, xdiv8), lambda b, t: (b, t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((band_rows, tile_w32), lambda b, t: (b, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_bands * band_rows,
                                        n_tiles * tile_w32), U32),
        scratch_shapes=[
            # +8 rows: cell fetches load 16 sublanes from an 8-aligned start,
            # which can overrun the filled band by up to 8 (garbage rows are
            # rolled/masked away, but must not fault).
            pltpu.VMEM((n_par, band_rows + 2 * a_rows + 8, c32_alloc), U32),
            pltpu.VMEM((n_par, band_rows + 2 * a_rows + 8, c32_alloc), U32),
            pltpu.SemaphoreType.DMA((2, n_par)),
        ],
        interpret=interpret,
    )(disp, fs, lev, src12, src21)


def _geometries(*, res_scalar: int, is_hdr: bool, dim_y: int, dim_x: int,
                apron: int, vmem_budget: int):
    """Static Y/UV band geometries, or None when unsupported."""
    rs = res_scalar
    if rs < 2 or rs > 3:
        return None
    cell = 1 << rs
    a = apron
    if dim_y % cell or dim_x % cell or a % 16:
        return None
    per32 = 2 if is_hdr else 4
    w32 = _round_up(dim_x, per32 * 128) // per32
    gy = _choose_geometry(dim_y, w32, a, a // per32, cell // per32,
                          vmem_budget, 2)
    per32c = 1 if is_hdr else 2
    ac = a // 2
    w32c = _round_up(dim_x // 2, per32c * 128) // per32c
    gc = _choose_geometry(dim_y // 2, w32c, ac, ac // per32c,
                          cell // per32c, vmem_budget, 4)
    if gy is None or gc is None:
        return None
    return (cell, per32, w32, gy), (per32c, w32c, gc)


def band_geometry_ok(*, res_scalar: int, is_hdr: bool, dim_y: int, dim_x: int,
                     apron: int, vmem_budget: int = 10 << 20) -> bool:
    """Static predicate: can the band kernel handle this configuration?"""
    return _geometries(res_scalar=res_scalar, is_hdr=is_hdr, dim_y=dim_y,
                       dim_x=dim_x, apron=apron, vmem_budget=vmem_budget) \
        is not None


@functools.partial(
    jax.jit, static_argnames=("res_scalar", "mode", "is_hdr", "dim_y", "dim_x",
                              "apron", "interpret", "vmem_budget"),
)
def warp_frame_band(
    wctx12: dict, wctx21: dict,
    flow: jnp.ndarray,
    blending_scalar, black_level, white_level,
    *,
    res_scalar: int, mode: int, is_hdr: bool, dim_y: int, dim_x: int,
    apron: int, interpret: bool = False, vmem_budget: int = 10 << 20,
):
    """Pallas twin of warp_strip.warp_frame_strip (identical outputs) for modes
    0/1/2. Consumes the same per-frame warp contexts."""
    assert mode in (0, 1, 2)
    rs = res_scalar
    a = apron
    low_h, low_w = flow.shape[1:]
    geoms = _geometries(res_scalar=rs, is_hdr=is_hdr, dim_y=dim_y, dim_x=dim_x,
                        apron=a, vmem_budget=vmem_budget)
    assert geoms is not None, "unsupported band geometry (use warp_strip)"
    (cell, per32, w32, gy), (per32c, w32c, gc) = geoms
    dtype = jnp.uint16 if is_hdr else jnp.uint8

    t = jnp.asarray(blending_scalar, F32)
    dx12, dy12, dx21, dy21, dy12_uv, dy21_uv = _cell_displacements(
        flow, t, rs, low_h, low_w)
    fs = jnp.full((1, 1), t, F32)
    lev = jnp.stack([jnp.asarray(black_level, F32),
                     jnp.asarray(white_level, F32)]).reshape(1, 2)

    # ---- Y plane -------------------------------------------------------------
    band_rows, n_tiles, c32, c32_alloc = gy
    tile_w32 = w32 // n_tiles
    cb = cell // per32
    n_cy = dim_y // cell
    n_cx = dim_x // cell
    cpt = (tile_w32 * per32) // cell
    pad_cx = n_tiles * cpt - n_cx
    row_idx = jnp.clip(jnp.arange(n_cy, dtype=jnp.int32), 0, low_h - 1)
    col_idx = jnp.clip(jnp.arange(n_cx, dtype=jnp.int32), 0, low_w - 1)

    def y_table(dy, dx):
        dyc = dy[row_idx][:, col_idx]
        dxc = dx[row_idx][:, col_idx]
        if pad_cx:
            dyc = jnp.pad(dyc, ((0, 0), (0, pad_cx)))
            dxc = jnp.pad(dxc, ((0, 0), (0, pad_cx)))
        cx_in_tile = jnp.arange(dxc.shape[1], dtype=jnp.int32) % cpt
        return dyc + a, cx_in_tile[None, :] * cell + dxc + a

    r12, p12 = y_table(dy12, dx12)
    r21, p21 = y_table(dy21, dx21)
    dispY = jnp.stack([r12, p12, r21, p21], axis=-1)
    cpb = band_rows // cell
    nb_y = -(-dim_y // band_rows)
    if nb_y * cpb > n_cy:
        dispY = jnp.pad(dispY, ((0, nb_y * cpb - n_cy), (0, 0), (0, 0)))
    dispY = (dispY.reshape(nb_y, cpb, n_tiles, cpt, 4)
             .transpose(0, 2, 1, 3, 4))

    min_w32 = (n_tiles - 1) * tile_w32 + _round_up(c32, 128)
    min_rows_y = nb_y * band_rows + 2 * a
    src12y = _pack_u32(wctx12["wpad_y"], per32, min_w32, min_rows_y)[None]
    src21y = _pack_u32(wctx21["wpad_y"], per32, min_w32, min_rows_y)[None]
    outy = _band_call(
        dispY, fs, lev, src12y, src21y, cell=cell, per32=per32, cb=cb,
        band_rows=band_rows, a_rows=a, c32=c32, c32_alloc=c32_alloc,
        tile_w32=tile_w32, n_tiles=n_tiles, out_rows=dim_y, mode=mode,
        is_hdr=is_hdr, is_uv=False, n_par=1, interpret=interpret)
    y = jax.lax.bitcast_convert_type(outy, dtype).reshape(
        outy.shape[0], -1)[:dim_y, :dim_x]

    # ---- UV plane (pair elements; parity-stacked planes) ----------------------
    band_c, n_tiles_c, c32c, c32c_alloc = gc
    tile_w32c = w32c // n_tiles_c
    sc_pairs = cell                    # supercell = 2 x-cells sharing flow
    cbc = sc_pairs // per32c
    h2 = dim_y // 2
    ac = a // 2
    n_scx = dim_x // (2 * cell)
    cptc = (tile_w32c * per32c) // sc_pairs
    pad_scx = n_tiles_c * cptc - n_scx

    sc_row = jnp.clip(jnp.arange(h2 // cell, dtype=jnp.int32) << 1, 0,
                      low_h - 1)
    sc_col = jnp.clip(jnp.arange(n_scx, dtype=jnp.int32) * 2, 0, low_w - 1)

    def uv_table(dx, dyuv):
        dxc = dx[sc_row][:, sc_col]
        dyc = dyuv[sc_row][:, sc_col]
        if pad_scx:
            dxc = jnp.pad(dxc, ((0, 0), (0, pad_scx)))
            dyc = jnp.pad(dyc, ((0, 0), (0, pad_scx)))
        q = (dxc & 1).astype(jnp.int32)
        sc_in_tile = jnp.arange(dxc.shape[1], dtype=jnp.int32) % cptc
        p = sc_in_tile[None, :] * sc_pairs + ((dxc - q) >> 1) + ac
        return dyc + ac, p, q

    rc12, pc12, q12 = uv_table(dx12, dy12_uv)
    rc21, pc21, q21 = uv_table(dx21, dy21_uv)
    dispC = jnp.stack([rc12, pc12, rc21, pc21, q12, q21], axis=-1)
    cpbc = band_c // cell
    nb_c = -(-h2 // band_c)
    n_scy = h2 // cell
    if nb_c * cpbc > n_scy:
        dispC = jnp.pad(dispC, ((0, nb_c * cpbc - n_scy), (0, 0), (0, 0)))
    dispC = (dispC.reshape(nb_c, cpbc, n_tiles_c, cptc, 6)
             .transpose(0, 2, 1, 3, 4))

    min_w32c = (n_tiles_c - 1) * tile_w32c + _round_up(c32c, 128)
    min_rows_c = nb_c * band_c + 2 * ac

    def pack_uv(ctx):
        puv = ctx["wpad_uv"]          # (2, Hc+2a, Wc+2ac) pair elements
        # The UV band only spans +-a/2 rows (|round(off*fs*0.5)| <= apron/2):
        # trim the +-a row padding so the in-kernel row origin is apron/2.
        puv = puv[:, a - ac:puv.shape[1] - (a - ac)]
        return jnp.stack([_pack_u32(puv[0], per32c, min_w32c, min_rows_c),
                          _pack_u32(puv[1], per32c, min_w32c, min_rows_c)])

    src12c = pack_uv(wctx12)
    src21c = pack_uv(wctx21)
    outc = _band_call(
        dispC, fs, lev, src12c, src21c, cell=cell, per32=per32c, cb=cbc,
        band_rows=band_c, a_rows=ac, c32=c32c, c32_alloc=c32c_alloc,
        tile_w32=tile_w32c, n_tiles=n_tiles_c, out_rows=h2, mode=mode,
        is_hdr=is_hdr, is_uv=True, n_par=2, interpret=interpret)
    pair_dtype = jnp.uint32 if is_hdr else jnp.uint16
    pairs = jax.lax.bitcast_convert_type(outc, pair_dtype)
    pairs = pairs.reshape(outc.shape[0], -1)[:h2, :dim_x // 2]
    uv = jax.lax.bitcast_convert_type(pairs, dtype).reshape(h2, dim_x)
    return y, uv

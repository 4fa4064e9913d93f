"""EXPERIMENTAL (round-2 target): Pallas row-band warp kernel.

The strip-mined warp (ops/warp_strip.py) is bound by XLA's ~10 ns/index gather cost
(~6.2M indices per 4K output = ~92 ms). This kernel removes per-index cost entirely:

  * grid over cell-row BANDS (2^rs output rows) x width tiles;
  * per band, ONE manual DMA pulls the displacement-bounded source band
    (|round(off*t)| <= apron) from each warp-padded source plane into VMEM;
  * a fori loop over cells copies (cell x cell) VMEM slices at per-cell dynamic
    offsets into alignment scratch (vector shifts, no HBM indices);
  * blend + levels run dense on the aligned band.

Status: bit-exact in Pallas interpret mode against ops/warp_strip (see
tests/test_warp_band.py). Mosaic findings from a real-TPU compile attempt
(2026-08-16): (1) u8->f32 casts must widen via int32 (fixed below); (2) the
per-cell (cell x cell) u8 VMEM slices lower to sub-tile vector.load ops, which
Mosaic REJECTS (int8 min tile is (32, 128)). Round-2 fix: load tile-aligned
(8, 128+) windows per cell and realign with a dynamic lane roll (pltpu.roll),
masking the merge — turns per-cell work into ~15 whole-tile VPU ops, est. 2-4 ms
per 1080p output frame. Only the Y plane of blend mode 2 is implemented; UV and
modes 0/1 follow the same structure. Not wired into the engine.

VMEM budget at 4K HDR: band = (cell + 2*apron) rows; with apron 576 and width tiles
of W/4 + 2*apron columns, two source bands fit in ~11 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hopperrender_tpu.ops.warp import F32, _apply_levels_y
from hopperrender_tpu.ops.warp_strip import _cell_displacements


def _band_kernel(cell: int, band_rows: int, apron: int, n_cells: int, is_hdr: bool):
    a = apron
    cell_rows = band_rows // cell  # Mosaic blocks need >= 8 rows

    def kernel(d_ref, fs_ref, lev_ref, src12_ref, src21_ref, out_ref,
               band12, band21, al12, al21, sem):
        b = pl.program_id(0)
        rows = band_rows + 2 * a
        # One DMA per source: the displacement-bounded band.
        c12 = pltpu.make_async_copy(
            src12_ref.at[pl.ds(b * band_rows, rows), :], band12, sem.at[0])
        c21 = pltpu.make_async_copy(
            src21_ref.at[pl.ds(b * band_rows, rows), :], band21, sem.at[1])
        c12.start()
        c21.start()
        c12.wait()
        c21.wait()

        def per_cell(i, _):
            cr = i // n_cells
            c = i % n_cells
            dx12 = d_ref[0, cr, c, 0]
            dy12 = d_ref[0, cr, c, 1]
            dx21 = d_ref[0, cr, c, 2]
            dy21 = d_ref[0, cr, c, 3]
            al12[pl.ds(cr * cell, cell), pl.ds(c * cell, cell)] = band12[
                pl.ds(cr * cell + dy12 + a, cell), pl.ds(c * cell + dx12 + a, cell)]
            al21[pl.ds(cr * cell, cell), pl.ds(c * cell, cell)] = band21[
                pl.ds(cr * cell + dy21 + a, cell), pl.ds(c * cell + dx21 + a, cell)]
            return 0

        jax.lax.fori_loop(0, cell_rows * n_cells, per_cell, 0)

        fs12 = fs_ref[0, 0]
        fs21 = (F32(1.0) - fs12).astype(F32)
        # Mosaic can't cast u8->f32 directly; widen via int32 first.
        a12f = al12[:, : n_cells * cell].astype(jnp.int32).astype(F32)
        a21f = al21[:, : n_cells * cell].astype(jnp.int32).astype(F32)
        blended = jnp.trunc(a12f * fs21 + a21f * fs12).astype(jnp.int32)
        out_ref[:, :] = _apply_levels_y(
            blended, lev_ref[0, 0], lev_ref[0, 1], is_hdr
        ).astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("res_scalar", "is_hdr", "dim_y", "dim_x", "apron", "interpret"),
)
def warp_band_y(
    wctx12: dict,
    wctx21: dict,
    flow: jnp.ndarray,
    blending_scalar,
    black_level,
    white_level,
    *,
    res_scalar: int,
    is_hdr: bool,
    dim_y: int,
    dim_x: int,
    apron: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Y plane of blend mode 2 via the band kernel; twin of the warp_strip Y path."""
    rs = res_scalar
    cell = 1 << rs
    band_rows = max(cell, 8)  # Mosaic block constraint: >= 8 sublanes
    assert dim_y % band_rows == 0 and dim_x % cell == 0
    low_h, low_w = flow.shape[1:]
    n_bands = dim_y // band_rows
    n_cells = dim_x // cell
    cell_rows = band_rows // cell
    a = apron

    t = jnp.asarray(blending_scalar, F32)
    dx12, dy12, dx21, dy21, _, _ = _cell_displacements(flow, t, rs, low_h, low_w)
    row_idx = jnp.clip(jnp.arange(n_bands * cell_rows, dtype=jnp.int32), 0, low_h - 1)
    col_idx = jnp.clip(jnp.arange(n_cells, dtype=jnp.int32), 0, low_w - 1)
    disp = jnp.stack(
        [d[row_idx][:, col_idx] for d in (dx12, dy12, dx21, dy21)], axis=-1
    ).astype(jnp.int32).reshape(n_bands, cell_rows, n_cells, 4)

    src12 = wctx12["wpad_y"]
    src21 = wctx21["wpad_y"]
    dtype = src12.dtype
    rows = band_rows + 2 * a
    wp = src12.shape[1]

    fs = jnp.full((1, 1), t, F32)
    lev = jnp.stack([jnp.asarray(black_level, F32),
                     jnp.asarray(white_level, F32)]).reshape(1, 2)

    out = pl.pallas_call(
        _band_kernel(cell, band_rows, a, n_cells, is_hdr),
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec((1, cell_rows, n_cells, 4), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((band_rows, dim_x), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((dim_y, dim_x), dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, wp), dtype),
            pltpu.VMEM((rows, wp), dtype),
            pltpu.VMEM((band_rows, wp), dtype),
            pltpu.VMEM((band_rows, wp), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(disp, fs, lev, src12, src21)
    return out

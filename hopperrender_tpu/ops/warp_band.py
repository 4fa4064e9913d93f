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
tests/test_warp_band.py); NOT yet validated under Mosaic on real TPU (this
environment's remote compiler needs a dedicated session — ROADMAP.md round 2).
Only the Y plane of blend mode 2 is implemented; UV and modes 0/1 follow the same
structure. Not wired into the engine.

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


def _band_kernel(cell: int, apron: int, n_cells: int, is_hdr: bool):
    a = apron

    def kernel(d_ref, fs_ref, lev_ref, src12_ref, src21_ref, out_ref,
               band12, band21, al12, al21, sem):
        b = pl.program_id(0)
        rows = cell + 2 * a
        # One DMA per source: the displacement-bounded band.
        c12 = pltpu.make_async_copy(
            src12_ref.at[pl.ds(b * cell, rows), :], band12, sem.at[0])
        c21 = pltpu.make_async_copy(
            src21_ref.at[pl.ds(b * cell, rows), :], band21, sem.at[1])
        c12.start()
        c21.start()
        c12.wait()
        c21.wait()

        def per_cell(c, _):
            dx12 = d_ref[0, c, 0]
            dy12 = d_ref[0, c, 1]
            dx21 = d_ref[0, c, 2]
            dy21 = d_ref[0, c, 3]
            al12[:, pl.ds(c * cell, cell)] = band12[
                pl.ds(dy12 + a, cell), pl.ds(c * cell + dx12 + a, cell)]
            al21[:, pl.ds(c * cell, cell)] = band21[
                pl.ds(dy21 + a, cell), pl.ds(c * cell + dx21 + a, cell)]
            return 0

        jax.lax.fori_loop(0, n_cells, per_cell, 0)

        fs12 = fs_ref[0, 0]
        fs21 = (F32(1.0) - fs12).astype(F32)
        blended = jnp.trunc(
            al12[:, : n_cells * cell].astype(F32) * fs21
            + al21[:, : n_cells * cell].astype(F32) * fs12
        ).astype(jnp.int32)
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
    assert dim_y % cell == 0 and dim_x % cell == 0
    low_h, low_w = flow.shape[1:]
    n_bands = dim_y // cell
    n_cells = dim_x // cell
    a = apron

    t = jnp.asarray(blending_scalar, F32)
    dx12, dy12, dx21, dy21, _, _ = _cell_displacements(flow, t, rs, low_h, low_w)
    cell_rows = jnp.clip(jnp.arange(n_bands, dtype=jnp.int32), 0, low_h - 1)
    cell_cols = jnp.clip(jnp.arange(n_cells, dtype=jnp.int32), 0, low_w - 1)
    disp = jnp.stack(
        [d[cell_rows][:, cell_cols] for d in (dx12, dy12, dx21, dy21)], axis=-1
    ).astype(jnp.int32)  # (n_bands, n_cells, 4)

    src12 = wctx12["wpad_y"]
    src21 = wctx21["wpad_y"]
    dtype = src12.dtype
    rows = cell + 2 * a
    wp = src12.shape[1]

    fs = jnp.full((1, 1), t, F32)
    lev = jnp.stack([jnp.asarray(black_level, F32),
                     jnp.asarray(white_level, F32)]).reshape(1, 2)

    out = pl.pallas_call(
        _band_kernel(cell, a, n_cells, is_hdr),
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec((1, n_cells, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((cell, dim_x), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((dim_y, dim_x), dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, wp), dtype),
            pltpu.VMEM((rows, wp), dtype),
            pltpu.VMEM((cell, wp), dtype),
            pltpu.VMEM((cell, wp), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(disp, fs, lev, src12, src21)
    return out

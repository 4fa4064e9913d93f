"""Pallas TPU kernels for the non-gather hot ops.

Kernel strategy (measured on a real v5e chip, see PERF.md):

  * The cost-volume and warp kernels are GATHER-shaped (per-pixel data-dependent
    indices, ref: calcDeltaSumsKernelSDR.h:98-100, warpFrameKernelSDR.h:167-178).
    XLA's native TPU gather lowering runs them within ~2.5-4x of the HBM
    speed-of-light bound, and Mosaic's dynamic-gather support cannot express the
    2-D per-element pattern; those ops stay in XLA (ops/flow.py, ops/warp.py), which
    is the idiomatic TPU formulation.
  * Ops with static access patterns are fused here as single-pass VMEM kernels:
      - blur_flow_pallas: the 8x8 box blur of both flow planes
        (ref: blurFlowKernelSDR.h). One HBM read + one write; the shifted-adds run
        entirely in VMEM, replacing the XLA cumsum formulation that materializes
        two prefix-sum intermediates.

Every Pallas kernel is bit-exact against the golden model and interchangeable with
its XLA twin via ops.flow.blur_flow(..., backend=...).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLUR_RADIUS = 4  # KERNEL_RADIUS (ref: blurFlowKernelSDR.h:4)


def _make_blur_kernel(low_h: int, low_w: int):
    def kernel(pad_ref, out_ref):
        """One flow plane: box-sum over the [-4, 4) x [-4, 4) window, truncating /64.
        Input is the mirror-padded plane; the 64 shifted adds stay in VMEM."""
        r = BLUR_RADIUS
        # Separable box filter: 8 column-shifted adds, then 8 row-shifted adds
        # (16 VMEM temps instead of 64 — Mosaic stack-allocates every unrolled temp).
        row = jnp.zeros((low_h + 2 * r - 1, low_w), jnp.int32)
        for kx in range(2 * r):
            row = row + pad_ref[0, :, kx:kx + low_w].astype(jnp.int32)
        acc = jnp.zeros((low_h, low_w), jnp.int32)
        for ky in range(2 * r):
            acc = acc + row[ky:ky + low_h, :]
        out_ref[0] = (jnp.sign(acc) * (jnp.abs(acc) // 64)).astype(jnp.int16)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def blur_flow_pallas(offsets: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """Pallas twin of ops.flow.blur_flow: (2, low_h, low_w) int16 -> int16.

    The mirror pad (blur mirror rule: pos<0 -> -pos-1, pos>=dim -> dim-(pos-dim+1),
    ref: blurFlowKernelSDR.h:7-14 == numpy 'symmetric') runs in XLA (Mosaic has no
    `rev`); the 64 shifted adds + truncating divide fuse into one VMEM pass per
    plane (<= 270x480 x 4B = 520 KB, fits whole), with no prefix-sum intermediates.
    """
    _, low_h, low_w = offsets.shape
    r = BLUR_RADIUS
    padded = jnp.pad(offsets, ((0, 0), (r, r - 1), (r, r - 1)), mode="symmetric")
    return pl.pallas_call(
        _make_blur_kernel(low_h, low_w),
        grid=(2,),
        in_specs=[pl.BlockSpec((1, low_h + 2 * r - 1, low_w + 2 * r - 1),
                               lambda z: (z, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, low_h, low_w), lambda z: (z, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(offsets.shape, jnp.int16),
        interpret=interpret,
    )(padded)

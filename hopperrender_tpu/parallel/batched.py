"""Single-chip multi-stream batching.

A production frame server interpolates many streams per chip. Lockstep batching vmaps
the full per-stream step (pyramid flow on the newest pair + warp of the previous pair)
over a leading stream axis, amortizing dispatch overhead and filling the VPU — the
single-chip counterpart of the "dp" mesh axis in parallel/mesh.py.

Per-stream blending scalars differ (streams sit at different cadence phases), so the
blend factor is a (B,) array; the search radius and tunables are shared (one settings
profile per batch), matching how a fleet pins one config per model/job.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hopperrender_tpu.ops import flow as flow_ops
from hopperrender_tpu.ops import warp as warp_ops


@functools.partial(
    jax.jit,
    static_argnames=("low_h", "low_w", "res_scalar", "mode", "is_hdr"),
)
def batched_step(
    f0y, f0uv, f1y, f1uv, f2y, f2uv,   # (B, H, W) / (B, H/2, W) stream ring slots
    flow_prev,                          # (B, 2, low_h, low_w) previous pair's flow
    radius, delta_scalar, neighbor_scalar,  # shared scalars
    blend,                              # (B,) per-stream blending scalar
    black, white,                       # shared levels
    *,
    low_h: int,
    low_w: int,
    res_scalar: int,
    mode: int,
    is_hdr: bool,
):
    """One lockstep step for B streams.

    Returns (out_y, out_uv, new_flow, delta_raw) with leading stream axis. Same
    1-pair pipeline as the scalar engine: flow on (f1, f2), warp of (f0, f1) with
    flow_prev (SURVEY.md §2.2)."""

    def per_stream(a0y, a0uv, a1y, a1uv, a2y, a2uv, fl_prev, t):
        _, blurred, delta_raw = flow_ops.pyramid_flow(
            a1y, a1uv, a2y, a2uv, radius, delta_scalar, neighbor_scalar,
            low_h=low_h, low_w=low_w, res_scalar=res_scalar, is_hdr=is_hdr)
        oy, ouv = warp_ops.warp_frame(
            a0y, a0uv, a1y, a1uv, fl_prev, t, black, white,
            res_scalar=res_scalar, mode=mode, is_hdr=is_hdr)
        return oy, ouv, blurred, delta_raw

    return jax.vmap(per_stream)(f0y, f0uv, f1y, f1uv, f2y, f2uv, flow_prev, blend)

"""JAX flow-calculation ops: cost volume, layer argmin, offset adjust, flow blur.

Bit-exact re-expression of the reference OpenCL kernels for XLA/TPU:

  * delta_window_sums       (ref: calcDeltaSumsKernelSDR.h:36-191 / HDR.h)
  * lowest_layer + adjust   (ref: determineLowestLayerKernelSDR.h, adjustOffsetArrayKernelSDR.h)
  * blur_flow               (ref: blurFlowKernelSDR.h:17-92)
  * pyramid_flow            (ref: opticalFlowCalcSDR.cpp:44-123 driver loop)

TPU-first design decisions (vs. the reference's GPU formulation):
  * The reference's workgroup tree-reduction + atomic_add windowed sum becomes a
    zero-padded reshape-reduce producing COMPACT per-window sums
    (layers, n_win_y, n_win_x) — deterministic, fusable, no atomics. Only window-origin
    cells are ever consumed by the reference, so this is bijective.
  * The search radius is dynamic (auto quality scaler changes it per frame,
    ref: HopperRender.cpp:1438-1463). To avoid re-jitting, the layer dimension is
    statically padded to MAX_SEARCH_RADIUS=16 and layers >= radius are masked to
    uint32 max so the argmin never selects them (real layers occupy indices
    0..radius-1; ties resolve to the first = real index, matching the reference's
    strict `<` scan).
  * The pyramid loop is unrolled at trace time: the window-size schedule depends only
    on the (static) flow-grid resolution (ref: opticalFlowCalcSDR.cpp:48-65).
  * Integer semantics preserved exactly: int16 offset wraparound, uint32 window-sum
    wraparound, OpenCL abs_diff, single-branch border mirroring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hopperrender_tpu import config

MAX_R = config.MAX_SEARCH_RADIUS
UINT32_MAX = np.uint32(0xFFFFFFFF)  # numpy, not jnp: module-level device constants
                                    # break tracing on remote/tunneled backends


def _signed_square_i16(rel: jnp.ndarray) -> jnp.ndarray:
    r = rel.astype(jnp.int32)
    return (r * r * jnp.where(r > 0, 1, -1)).astype(jnp.int16)


def _mirror_in_frame(pos: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Single-branch mirror + clamp (ref: calcDeltaSumsKernelSDR.h:86-95)."""
    p = pos.astype(jnp.int32)
    m = jnp.where(p >= dim, dim - (p - dim + 1), jnp.where(p < 0, -p - 1, p))
    return jnp.clip(m, 0, dim - 1)


def _abs_diff_i32(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32))


@functools.partial(
    jax.jit,
    static_argnames=("window_size", "res_scalar", "iteration", "step", "is_hdr",
                     "num_layers"),
)
def delta_window_sums(
    f1y: jnp.ndarray,
    f1uv: jnp.ndarray,
    f2y: jnp.ndarray,
    f2uv: jnp.ndarray,
    offsets: jnp.ndarray,        # (2, low_h, low_w) int16
    radius: jnp.ndarray,         # traced int32 scalar in [MIN_SEARCH_RADIUS, 16]
    delta_scalar: jnp.ndarray,   # traced int32 scalar
    neighbor_scalar: jnp.ndarray,  # traced int32 scalar
    layer_offset: jnp.ndarray | int = 0,  # traced: first global layer of this shard
    *,
    window_size: int,
    res_scalar: int,
    iteration: int,
    step: int,
    is_hdr: bool,
    num_layers: int = MAX_R,
) -> jnp.ndarray:
    """Compact cost-volume window sums, shape (num_layers, n_win_y, n_win_x) uint32.
    Global layers >= radius are UINT32_MAX.

    num_layers/layer_offset shard the candidate (search-layer) dimension across
    devices: shard d computes global layers [offset, offset + num_layers)."""
    dim_y, dim_x = f1y.shape
    uv_h, uv_w = f1uv.shape
    low_h, low_w = offsets.shape[1:]
    L = num_layers

    cx = jnp.arange(low_w, dtype=jnp.int32)[None, None, :]
    cy = jnp.arange(low_h, dtype=jnp.int32)[None, :, None]
    lz = jnp.arange(L, dtype=jnp.int32)[:, None, None] + jnp.asarray(layer_offset, jnp.int32)
    scaled_cx = cx << res_scalar
    scaled_cy = cy << res_scalar

    rel = ((lz % radius) - radius // 2).astype(jnp.int16)
    rel_sq = _signed_square_i16(rel)
    zero = jnp.zeros_like(rel_sq)
    rel_x, rel_y = (rel_sq, zero) if step % 2 == 0 else (zero, rel_sq)

    ideal_x = offsets[0][None]
    ideal_y = offsets[1][None]
    offset_x = ideal_x + rel_x  # int16, wraps
    offset_y = ideal_y + rel_y

    new_cx = scaled_cx + offset_x.astype(jnp.int32)
    new_cy = scaled_cy + offset_y.astype(jnp.int32)
    in_frame = (scaled_cx < dim_x) & (scaled_cy < dim_y)

    m_cx = _mirror_in_frame(new_cx, dim_x)
    m_cy = _mirror_in_frame(new_cy, dim_y)
    s_cx = jnp.clip(scaled_cx, 0, dim_x - 1)
    s_cy = jnp.clip(scaled_cy, 0, dim_y - 1)

    shift = 8 if is_hdr else 0
    f1y_i = f1y.astype(jnp.int32) >> shift
    f2y_i = f2y.astype(jnp.int32) >> shift
    f1uv_i = f1uv.astype(jnp.int32) >> shift
    f2uv_i = f2uv.astype(jnp.int32) >> shift

    def uv_idx(yy, xx):
        return (
            jnp.clip(yy >> 1, 0, uv_h - 1),
            jnp.clip(xx & ~1, 0, uv_w - 1),
            jnp.clip((xx & ~1) + 1, 0, uv_w - 1),
        )

    m_uy, m_ux, m_vx = uv_idx(m_cy, m_cx)
    s_uy, s_ux, s_vx = uv_idx(s_cy, s_cx)

    # frame2 samples are layer-independent (the source pixel grid).
    f2_samp = (f2y_i[s_cy[0], s_cx[0]], f2uv_i[s_uy[0], s_ux[0]], f2uv_i[s_uy[0], s_vx[0]])

    delta = (
        _abs_diff_i32(f1y_i[m_cy, m_cx], f2_samp[0][None])
        + _abs_diff_i32(f1uv_i[m_uy, m_ux], f2_samp[1][None])
        + _abs_diff_i32(f1uv_i[m_uy, m_vx], f2_samp[2][None])
    ).astype(jnp.uint32)
    delta = delta << delta_scalar.astype(jnp.uint32)
    delta = jnp.where(in_frame, delta, jnp.uint32(0))

    active = offset_x if step == 0 else offset_y
    offset_bias = jnp.abs(active.astype(jnp.int32)).astype(jnp.uint32)

    if iteration >= config.FIRST_NEIGHBOR_ITERATION:
        plane = offsets[0 if step == 0 else 1]
        nb = jnp.zeros((L, low_h, low_w), dtype=jnp.uint32)
        # down, right, left, up at +-2*windowSize, edge-clamped
        # (ref: calcDeltaSumsKernelSDR.h:112-131).
        for dx, dy in ((0, 2 * window_size), (2 * window_size, 0),
                       (-2 * window_size, 0), (0, -2 * window_size)):
            if dy:
                idx = jnp.clip(jnp.arange(low_h, dtype=jnp.int32) + dy, 0, low_h - 1)
                n_off = plane[idx, :][None]
            else:
                idx = jnp.clip(jnp.arange(low_w, dtype=jnp.int32) + dx, 0, low_w - 1)
                n_off = plane[:, idx][None]
            nb = nb + _abs_diff_i32(n_off, active).astype(jnp.uint32)
        neighbor_bias = nb << neighbor_scalar.astype(jnp.uint32)
    else:
        neighbor_bias = jnp.uint32(0)

    total = delta + offset_bias + neighbor_bias  # uint32, wraps

    n_win_y = -(-low_h // window_size)
    n_win_x = -(-low_w // window_size)
    pad_h = n_win_y * window_size - low_h
    pad_w = n_win_x * window_size - low_w
    padded = jnp.pad(total, ((0, 0), (0, pad_h), (0, pad_w)))
    sums = padded.reshape(L, n_win_y, window_size, n_win_x, window_size).sum(
        axis=(2, 4), dtype=jnp.uint32
    )
    # Mask padded layers (global index >= radius) so argmin never selects them.
    return jnp.where(lz < radius, sums, UINT32_MAX)


def lowest_layer(sums: jnp.ndarray) -> jnp.ndarray:
    """Per-window argmin over layers, first minimum wins
    (ref: determineLowestLayerKernelSDR.h:16-27). Padded layers are UINT32_MAX and at
    indices >= radius, so ties always resolve to a real layer."""
    return jnp.argmin(sums, axis=0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("window_size", "step"))
def adjust_offsets(
    offsets: jnp.ndarray,   # (2, low_h, low_w) int16
    winners: jnp.ndarray,   # (n_win_y, n_win_x) int32
    radius: jnp.ndarray,    # traced int32 scalar
    *,
    window_size: int,
    step: int,
) -> jnp.ndarray:
    """Commit each window's winning candidate (ref: adjustOffsetArrayKernelSDR.h:11-20)."""
    low_h, low_w = offsets.shape[1:]
    ideal_rel = (winners % radius) - radius // 2
    adj = _signed_square_i16(ideal_rel.astype(jnp.int16))
    adj_full = jnp.repeat(jnp.repeat(adj, window_size, axis=0), window_size, axis=1)
    adj_full = adj_full[:low_h, :low_w]
    plane = step & 1
    return offsets.at[plane].set(offsets[plane] + adj_full)


@functools.partial(jax.jit, static_argnames=("backend",))
def blur_flow(offsets: jnp.ndarray, backend: str = "auto") -> jnp.ndarray:
    """8x8 box blur, window [-4, 4), mirrored borders, truncating division by 64
    (ref: blurFlowKernelSDR.h:3-4,79-91). offsets: (2, low_h, low_w) int16.

    backend: "pallas" (fused single-pass VMEM kernel), "xla" (prefix sums), or
    "auto" (pallas on TPU, xla elsewhere). Both are bit-exact."""
    if backend == "auto":
        # axon = the tunneled TPU platform; anything else (cpu tests, gpu) uses XLA.
        backend = "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"
    if backend == "pallas":
        from hopperrender_tpu.ops import pallas_kernels

        return pallas_kernels.blur_flow_pallas(offsets)
    radius = 4
    _, low_h, low_w = offsets.shape
    padded = jnp.pad(
        offsets.astype(jnp.int32),
        ((0, 0), (radius, radius - 1), (radius, radius - 1)),
        mode="symmetric",
    )
    c = padded.cumsum(axis=1).cumsum(axis=2)
    c = jnp.pad(c, ((0, 0), (1, 0), (1, 0)))
    k = 2 * radius
    s = c[:, k:, k:] - c[:, :-k, k:] - c[:, k:, :-k] + c[:, :-k, :-k]
    s = s[:, :low_h, :low_w]
    q = jnp.sign(s) * (jnp.abs(s) // 64)  # C division truncates toward zero
    return q.astype(jnp.int16)


def window_schedule(low_h: int, low_w: int, num_iterations: int = 0) -> list[tuple[int, int]]:
    """Static (iteration, window_size) schedule (ref: opticalFlowCalcSDR.cpp:48-65,110)."""
    window = config.initial_window_size(low_h, low_w)
    iters = config.num_pyramid_iterations(window, num_iterations)
    sched = []
    for it in range(iters):
        sched.append((it, window))
        window = max(window >> 1, 1)
    return sched


@functools.partial(
    jax.jit,
    static_argnames=("low_h", "low_w", "res_scalar", "is_hdr", "num_iterations",
                     "num_layers"),
)
def pyramid_flow(
    f1y: jnp.ndarray,
    f1uv: jnp.ndarray,
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
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full pyramid loop (ref: opticalFlowCalcSDR.cpp:44-123).

    Returns (offsets, blurred_offsets, total_delta_raw) where total_delta_raw is the
    UN-normalized uint32 window-(0,0) sum of layer radius/2-1 at iteration 0 step 0
    (the host divides by low_h*low_w*{10,6}, ref: opticalFlowCalcSDR.cpp:91-94).

    num_layers statically bounds the cost volume: the caller may bucket it to the
    current search radius (e.g. 8 when radius <= 8) so the auto quality scaler's low
    end does half the gather work; radius stays a traced scalar within a bucket.
    Requires radius <= num_layers. (total_delta index radius//2-1 <= 7 < any bucket.)
    """
    offsets = jnp.zeros((2, low_h, low_w), dtype=jnp.int16)
    total_delta_raw = jnp.uint32(0)

    for iteration, window in window_schedule(low_h, low_w, num_iterations):
        for step in (0, 1):
            sums = delta_window_sums(
                f1y, f1uv, f2y, f2uv, offsets, radius, delta_scalar, neighbor_scalar,
                window_size=window, res_scalar=res_scalar, iteration=iteration,
                step=step, is_hdr=is_hdr, num_layers=num_layers,
            )
            if iteration == 0 and step == 0:
                total_delta_raw = jax.lax.dynamic_index_in_dim(
                    sums[:, 0, 0], radius // 2 - 1, keepdims=False
                )
            winners = lowest_layer(sums)
            offsets = adjust_offsets(
                offsets, winners, radius, window_size=window, step=step
            )

    blurred = blur_flow(offsets)
    return offsets, blurred, total_delta_raw

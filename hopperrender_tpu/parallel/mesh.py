"""Multi-chip sharding of the interpolation step over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2.6); its parallelism inventory is
SIMT pixels + candidate layers + a 1-pair pipeline. The TPU-native scale-out maps
those axes onto a 2-D device mesh:

  * "dp" — data parallelism over independent video STREAMS (a production frame
    server interpolates many streams concurrently; each stream's state is
    device-local, no cross-stream traffic).
  * "sp" — within-stream parallelism:
      - flow calculation shards the SEARCH-LAYER axis of the cost volume (the
        reference's 3rd grid dimension, ref: opticalFlowCalcSDR.cpp:46): each device
        evaluates MAX_R/n candidate layers, then an all-gather of the COMPACT window
        sums (a few KB — rides ICI) lets every device compute the identical
        argmin/adjust, keeping the offset array replicated with no further traffic.
      - warping shards OUTPUT ROWS: sources are replicated (a 4K P010 frame is
        ~24 MB — cheap next to HBM), each device gathers its row band.

Only the per-step window-sum all-gathers cross chips; frames move host->HBM once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hopperrender_tpu.ops import flow as flow_ops
from hopperrender_tpu.ops import flow_strip
from hopperrender_tpu.ops import warp as warp_ops
from hopperrender_tpu.ops import warp_band
from hopperrender_tpu.ops import warp_strip

MAX_R = flow_ops.MAX_R


def pyramid_flow_strip_sharded(
    ctx1: dict, f2y, f2uv, radius, delta_scalar, neighbor_scalar,
    *, low_h: int, low_w: int, res_scalar: int, is_hdr: bool, num_layers: int,
    apron: int, dim_y: int, dim_x: int, num_iterations: int = 0,
    axis_name: str, num_shards: int, plan: tuple | None = None,
):
    """Sharded twin of the PRODUCTION pyramid on the mesh, with the engine's
    host-planned tier dispatch (flow_strip.pyramid_flow_strip_planned):

      * U/M steps (dense-uniform / mode-corrected) run REPLICATED — they cost
        ~0.1-1 ms and need no collective; every device computes the identical
        sums from the replicated context and offsets.
      * G steps — the gather-bound work sharding exists to divide — shard the
        strip SEGMENT axis (window rows for step 0, cols for step 1) so each
        device issues 1/n of the gather indices (PERF.md: index count is the
        cost); coarse (patch) windows shard the LAYER axis. Only KB-scale
        compact window sums cross chips (ICI all-gather); the frame context
        is replicated.

    plan=None runs all-G (the tier-free baseline). Returns
    (offsets, blurred, total_delta_raw, sig) with the same validity sig as
    the single-device planned pyramid (per-step deviant counts + completion
    probe) so the host plan loop works unchanged on the mesh."""
    offsets = jnp.zeros((2, low_h, low_w), dtype=jnp.int16)
    total_delta_raw = jnp.uint32(0)
    shard = jax.lax.axis_index(axis_name)
    L = num_layers
    steps = flow_strip.plan_steps(low_h, low_w, num_iterations)
    if plan is None:
        plan = ("G",) * len(steps)
    assert len(plan) == len(steps)
    tiers_ok = flow_strip.uniform_fits(
        ctx1, low_h=low_h, low_w=low_w, res_scalar=res_scalar, apron=apron)
    assert tiers_ok or all(t == "G" for t in plan), \
        "U/M/V tiers need a low_dims-padded context (uniform_fits)"
    ndevs, ndists = [], []

    for tier, (iteration, window, step) in zip(plan, steps):
        n_wy = -(-low_h // window)
        n_wx = -(-low_w // window)
        n_desc = L * n_wy * n_wx
        kw = dict(window_size=window, res_scalar=res_scalar,
                  iteration=iteration, step=step, is_hdr=is_hdr,
                  apron=apron, dim_y=dim_y, dim_x=dim_x)
        fits = flow_strip.patch_fits(
            ctx1, low_h=low_h, low_w=low_w, window=window,
            res_scalar=res_scalar, apron=apron)
        strip_routed = not (fits and n_desc <= 4096)
        win_pk = ((offsets[0, ::window, ::window].astype(jnp.int32) << 16)
                  | (offsets[1, ::window, ::window].astype(jnp.int32)
                     & 0xFFFF))
        n_dev = jnp.sum((win_pk != flow_strip._dominant_offset(win_pk))
                        .astype(jnp.int32))
        ndevs.append(n_dev)
        count_dist = tier in flow_strip.VALUE_TIER_CAPS or (
            tier == "G" and strip_routed and tiers_ok)
        if count_dist:
            vcap = flow_strip.tier_cap(tier, window, low_h, low_w) \
                if tier in flow_strip.VALUE_TIER_CAPS \
                else max(flow_strip.VALUE_TIER_CAPS.values())
            vals, val_idx, n_distinct = flow_strip._window_value_index(
                win_pk, vcap)
            ndists.append(n_distinct)
        else:
            vals = val_idx = None
            ndists.append(jnp.int32(n_wy * n_wx))
        if tier == "U":
            sums = flow_strip.delta_window_sums_uniform(
                ctx1, f2y, f2uv, offsets, radius, delta_scalar,
                neighbor_scalar, num_layers=L, **kw)
        elif tier in flow_strip.MODE_TIER_CAPS:
            sums = flow_strip.delta_window_sums_mode(
                ctx1, f2y, f2uv, offsets, radius, delta_scalar,
                neighbor_scalar, num_layers=L,
                cap=flow_strip.tier_cap(tier, window, low_h, low_w), **kw)
        elif tier in flow_strip.VALUE_TIER_CAPS:
            sums = flow_strip.delta_window_sums_values(
                ctx1, f2y, f2uv, offsets, radius, delta_scalar,
                neighbor_scalar, vals, val_idx, num_layers=L,
                cap=flow_strip.tier_cap(tier, window, low_h, low_w), **kw)
        else:
            assert tier == "G", tier
            if not strip_routed:
                # Coarse: layer sharding (pad layers to the shard count).
                l_loc = -(-L // num_shards)
                sums_local = flow_strip.delta_window_sums_patch(
                    ctx1, f2y, f2uv, offsets, radius, delta_scalar,
                    neighbor_scalar, shard * l_loc, num_layers=l_loc, **kw)
                sums = jax.lax.all_gather(sums_local, axis_name, axis=0,
                                          tiled=True)[:L]
            else:
                # Fine: segment-axis sharding.
                n_seg = n_wy if step % 2 == 0 else n_wx
                s_loc = -(-n_seg // num_shards)
                sums_local = flow_strip.delta_window_sums_strip(
                    ctx1, f2y, f2uv, offsets, radius, delta_scalar,
                    neighbor_scalar, shard * s_loc, num_layers=L,
                    n_seg_local=s_loc, **kw)
                axis = 1 if step % 2 == 0 else 2
                sums = jax.lax.all_gather(sums_local, axis_name, axis=axis,
                                          tiled=True)
                sums = sums[:, :n_wy, :n_wx]
        if iteration == 0 and step == 0:
            total_delta_raw = jax.lax.dynamic_index_in_dim(
                sums[:, 0, 0], radius // 2 - 1, keepdims=False)
        winners = flow_ops.lowest_layer(sums)
        offsets = flow_ops.adjust_offsets(
            offsets, winners, radius, window_size=window, step=step)
        offsets = jax.lax.optimization_barrier(offsets)

    blurred = flow_ops.blur_flow(offsets)
    bound = jnp.max(jnp.abs(blurred.astype(jnp.int32))).astype(jnp.int32)
    sig = jnp.concatenate([jnp.stack(ndevs), jnp.stack(ndists), bound[None],
                           blurred[0, 0, 0].astype(jnp.int32)[None]])
    return offsets, blurred, total_delta_raw, sig


def pyramid_flow_sharded(
    f1y, f1uv, f2y, f2uv, radius, delta_scalar, neighbor_scalar,
    *, low_h: int, low_w: int, res_scalar: int, is_hdr: bool, axis_name: str,
    num_shards: int,
):
    """Layer-sharded pyramid loop (ref driver: opticalFlowCalcSDR.cpp:44-123).
    Call inside shard_map; returns replicated (offsets, blurred, total_delta_raw)."""
    assert MAX_R % num_shards == 0, "search layers must divide evenly across shards"
    layers_local = MAX_R // num_shards
    shard = jax.lax.axis_index(axis_name)
    layer_offset = shard * layers_local

    offsets = jnp.zeros((2, low_h, low_w), dtype=jnp.int16)
    total_delta_raw = jnp.uint32(0)

    for iteration, window in flow_ops.window_schedule(low_h, low_w):
        for step in (0, 1):
            sums_local = flow_ops.delta_window_sums(
                f1y, f1uv, f2y, f2uv, offsets, radius, delta_scalar, neighbor_scalar,
                layer_offset,
                window_size=window, res_scalar=res_scalar, iteration=iteration,
                step=step, is_hdr=is_hdr, num_layers=layers_local,
            )
            # Tiny compact sums ride ICI; every device then holds the full volume.
            sums = jax.lax.all_gather(sums_local, axis_name, axis=0, tiled=True)
            if iteration == 0 and step == 0:
                total_delta_raw = jax.lax.dynamic_index_in_dim(
                    sums[:, 0, 0], radius // 2 - 1, keepdims=False
                )
            winners = flow_ops.lowest_layer(sums)
            offsets = flow_ops.adjust_offsets(
                offsets, winners, radius, window_size=window, step=step
            )

    blurred = flow_ops.blur_flow(offsets)
    return offsets, blurred, total_delta_raw


def warp_frame_strip_sharded(
    wctx12: dict, wctx21: dict, flow, blending_scalar, black, white,
    *, res_scalar: int, mode: int, is_hdr: bool, dim_y: int, dim_x: int,
    apron: int, axis_name: str, num_shards: int,
):
    """Row-sharded PRODUCTION (strip-mined) warp: each device gathers only its
    band of Y and UV output runs from the replicated warp contexts — 1/n of
    the gather indices, the same lever as the sharded pyramid's G steps."""
    assert dim_y % (2 * num_shards) == 0, \
        "frame rows must split evenly (Y and UV)"
    rows_y = dim_y // num_shards
    rows_uv = (dim_y // 2) // num_shards
    shard = jax.lax.axis_index(axis_name)
    return warp_strip.warp_frame_strip(
        wctx12, wctx21, flow,
        jnp.asarray(blending_scalar, jnp.float32),
        jnp.asarray(black, jnp.float32), jnp.asarray(white, jnp.float32),
        shard * rows_y, shard * rows_uv,
        res_scalar=res_scalar, mode=mode, is_hdr=is_hdr,
        dim_y=dim_y, dim_x=dim_x, apron=apron,
        out_rows_y=rows_y, out_rows_uv=rows_uv)


def warp_frame_band_sharded(
    wctx12: dict, wctx21: dict, flow, blending_scalar, black, white,
    *, res_scalar: int, mode: int, is_hdr: bool, dim_y: int, dim_x: int,
    apron: int, axis_name: str, num_shards: int, interpret: bool = False,
    chain_bounds: tuple = (16, 16), apron_eff: int | None = None,
):
    """Row-BAND-sharded single-chip hot warp kernel (ops/warp_band.py) on the
    mesh: the Y and UV band grids are padded to a num_shards multiple and each
    device runs its contiguous run of bands against a dynamic-slice view of
    the packed sources — the Pallas kernel itself is unchanged (static band
    origins). Table builds and packing run replicated (KB/MB-scale, cheap
    next to the kernel's band DMAs, which this divides by num_shards).

    Returns the shard-LOCAL (y, uv) band rows at padded width; the caller's
    out_spec concatenates them over the row axis and crops to (dim_y, dim_x)
    outside the shard_map. blending_scalar may be a (T,) vector — the batched
    per-pair warp (warp_band t_batch) composed with the sharding: outputs
    gain a leading T axis and the row concat moves to axis 1."""
    shard = jax.lax.axis_index(axis_name)
    return warp_band.warp_frame_band(
        wctx12, wctx21, flow,
        jnp.asarray(blending_scalar, jnp.float32),
        jnp.asarray(black, jnp.float32), jnp.asarray(white, jnp.float32),
        res_scalar=res_scalar, mode=mode, is_hdr=is_hdr,
        dim_y=dim_y, dim_x=dim_x, apron=apron, interpret=interpret,
        chain_bounds=chain_bounds, apron_eff=apron_eff,
        num_shards=num_shards, shard_index=shard)


def warp_frame_sharded(
    src12_y, src12_uv, src21_y, src21_uv, flow, blending_scalar, black, white,
    *, res_scalar: int, mode: int, is_hdr: bool, axis_name: str, num_shards: int,
):
    """Row-sharded warp: this shard's band of Y and UV rows
    (ref launch split: opticalFlowCalcSDR.cpp:152-167)."""
    dim_y = src12_y.shape[0]
    assert dim_y % (2 * num_shards) == 0, "frame rows must split evenly (Y and UV)"
    rows_y = dim_y // num_shards
    rows_uv = (dim_y // 2) // num_shards
    shard = jax.lax.axis_index(axis_name)
    t = jnp.asarray(blending_scalar, jnp.float32)
    black = jnp.asarray(black, jnp.float32)
    white = jnp.asarray(white, jnp.float32)
    y = warp_ops.warp_frame_plane(
        src12_y, src12_uv, src21_y, src21_uv, flow, t, black, white,
        shard * rows_y,
        res_scalar=res_scalar, mode=mode, cz=0, is_hdr=is_hdr, out_rows=rows_y,
    )
    uv = warp_ops.warp_frame_plane(
        src12_y, src12_uv, src21_y, src21_uv, flow, t, black, white,
        shard * rows_uv,
        res_scalar=res_scalar, mode=mode, cz=1, is_hdr=is_hdr, out_rows=rows_uv,
    )
    return y, uv


def make_multichip_step(
    mesh: Mesh,
    frame_height: int,
    frame_width: int,
    *,
    low_h: int,
    low_w: int,
    res_scalar: int,
    is_hdr: bool = False,
    mode: int = 2,
    plan: tuple | None = None,
    warp_kernel: str = "auto",
    band_interpret: bool = False,
    band_apron_eff: int | None = None,
    t_batch: int = 1,
):
    """Build the jitted multi-chip interpolation step.

    Takes a batch of streams (leading axis sharded over "dp"); within each stream the
    flow layers/segments and warp rows shard over "sp". Inputs per stream: the
    3-frame ring (f0=N-2, f1=N-1, f2=N) and the previous pair's blurred flow (the
    1-pair pipeline, SURVEY.md §2.2). plan = the host-selected flow tier plan
    (flow_strip.predict_plan; None = all exact gathers). Returns
    (out_y, out_uv, new_blurred_flow, total_delta_raw, sig) — sig is the planned
    pyramid's validity vector so the host plan loop works on the mesh too.

    t_batch > 1 (band route only): the step's blending scalar becomes a
    (t_batch,) vector and out_y/out_uv gain a leading per-stream batch axis —
    ONE sharded launch produces all of a source interval's outputs
    (warp_band t_batch composed with the shard-major table fold).
    """
    n_sp = mesh.shape["sp"]
    use_strips = res_scalar >= 1
    cell = 1 << res_scalar
    apron = flow_strip.apron_for(low_h, low_w) if use_strips else 0
    # Production (strip) warp needs cell-aligned dims and even row bands.
    use_warp_strips = (use_strips and frame_height % cell == 0
                       and frame_width % cell == 0
                       and frame_height % (2 * n_sp) == 0)
    # Single-chip hot kernel on the mesh: row-BAND-sharded Pallas warp
    # (warp_frame_band_sharded) when the geometry qualifies. Same routing rule
    # as the engine (flow_engine: band for res_scalar 2/3, modes 0-2), opt-out
    # via warp_kernel="strip".
    use_warp_band = (warp_kernel != "strip" and use_warp_strips
                     and res_scalar in (2, 3) and mode in (0, 1, 2)
                     and warp_band.band_geometry_ok(
                         res_scalar=res_scalar, is_hdr=is_hdr,
                         dim_y=frame_height, dim_x=frame_width, apron=apron))
    if warp_kernel == "band":
        assert use_warp_band, "band kernel unsupported for this geometry"
    assert t_batch == 1 or use_warp_band, \
        "t_batch > 1 requires the band warp route"

    def per_stream(f0y, f0uv, f1y, f1uv, f2y, f2uv, flow_prev, radius, dscalar,
                   nscalar, t, black, white):
        sig = jnp.zeros((1,), jnp.int32)
        if use_strips:
            # Production strip/patch formulation: context replicated per shard
            # (built from the already-resident frame), segments/layers sharded.
            ctx1 = flow_strip.build_frame_context(
                f1y, f1uv, apron=apron, is_hdr=is_hdr,
                res_scalar=res_scalar if res_scalar <= 4 else None,
                low_dims=(low_h, low_w))
            _, blurred, delta_raw, sig = pyramid_flow_strip_sharded(
                ctx1, f2y, f2uv, radius, dscalar, nscalar,
                low_h=low_h, low_w=low_w, res_scalar=res_scalar, is_hdr=is_hdr,
                num_layers=MAX_R, apron=apron,
                dim_y=frame_height, dim_x=frame_width,
                axis_name="sp", num_shards=n_sp, plan=plan,
            )
        else:
            _, blurred, delta_raw = pyramid_flow_sharded(
                f1y, f1uv, f2y, f2uv, radius, dscalar, nscalar,
                low_h=low_h, low_w=low_w, res_scalar=res_scalar, is_hdr=is_hdr,
                axis_name="sp", num_shards=n_sp,
            )
        if use_warp_band:
            wc12 = warp_strip.build_warp_context(f0y, f0uv, apron=apron,
                                                 is_hdr=is_hdr)
            wc21 = warp_strip.build_warp_context(f1y, f1uv, apron=apron,
                                                 is_hdr=is_hdr)
            out_y, out_uv = warp_frame_band_sharded(
                wc12, wc21, flow_prev, t, black, white,
                res_scalar=res_scalar, mode=mode, is_hdr=is_hdr,
                dim_y=frame_height, dim_x=frame_width, apron=apron,
                axis_name="sp", num_shards=n_sp, interpret=band_interpret,
                apron_eff=band_apron_eff,
            )
        elif use_warp_strips:
            wc12 = warp_strip.build_warp_context(f0y, f0uv, apron=apron,
                                                 is_hdr=is_hdr)
            wc21 = warp_strip.build_warp_context(f1y, f1uv, apron=apron,
                                                 is_hdr=is_hdr)
            out_y, out_uv = warp_frame_strip_sharded(
                wc12, wc21, flow_prev, t, black, white,
                res_scalar=res_scalar, mode=mode, is_hdr=is_hdr,
                dim_y=frame_height, dim_x=frame_width, apron=apron,
                axis_name="sp", num_shards=n_sp,
            )
        else:
            out_y, out_uv = warp_frame_sharded(
                f0y, f0uv, f1y, f1uv, flow_prev, t, black, white,
                res_scalar=res_scalar, mode=mode, is_hdr=is_hdr,
                axis_name="sp", num_shards=n_sp,
            )
        return out_y, out_uv, blurred, delta_raw, sig

    def shard_body(f0y, f0uv, f1y, f1uv, f2y, f2uv, flow_prev, radius, dscalar,
                   nscalar, t, black, white):
        fn = jax.vmap(
            per_stream,
            in_axes=(0, 0, 0, 0, 0, 0, 0, None, None, None, None, None, None),
        )
        return fn(f0y, f0uv, f1y, f1uv, f2y, f2uv, flow_prev, radius, dscalar,
                  nscalar, t, black, white)

    frame_spec = P("dp", None, None)
    flow_spec = P("dp", None, None, None)
    scalar_spec = P()
    # Batched band outputs carry a (t_batch,) axis before the sharded rows.
    out_plane_spec = (P("dp", None, "sp", None) if t_batch > 1
                      else P("dp", "sp", None))
    out_specs = (
        out_plane_spec,        # out_y rows sharded
        out_plane_spec,        # out_uv rows sharded
        flow_spec,             # blurred flow replicated within sp
        P("dp"),               # per-stream delta
        P("dp", None),         # plan validity sig (replicated within sp)
    )

    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(frame_spec,) * 6 + (flow_spec,) + (scalar_spec,) * 6,
        out_specs=out_specs,
        check_vma=False,
    )
    if not use_warp_band:
        return jax.jit(sharded)

    # Band path: each shard returns its LOCAL run of band rows (the Y/UV band
    # grids are padded to an n_sp multiple inside warp_frame_band); the
    # concatenated global rows are >= the frame dims — crop outside the
    # shard_map where the global view exists.
    def run(*args):
        out_y, out_uv, blurred, delta, sig = sharded(*args)
        if t_batch > 1:
            return (out_y[:, :, :frame_height],
                    out_uv[:, :, :frame_height // 2], blurred, delta, sig)
        return (out_y[:, :frame_height], out_uv[:, :frame_height // 2],
                blurred, delta, sig)

    return jax.jit(run)

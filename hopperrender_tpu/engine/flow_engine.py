"""OpticalFlowEngine — device-resident interpolation engine.

TPU-native equivalent of the reference's OpticalFlowCalc/SDR/HDR classes
(ref: opticalFlowCalc.h:24-138, opticalFlowCalcSDR.cpp, opticalFlowCalcHDR.cpp):

  * 3-deep frame ring in HBM; slot 2 = newest frame N, slot 1 = N-1, slot 0 = N-2
    (ref: opticalFlowCalcSDR.cpp:19-29).
  * Flow computed between slots 1 and 2, while warping reads slots 0 and 1 with the
    PREVIOUS pair's blurred flow — the 1-pair software pipeline that gives the filter
    its 2-source-frame latency (ref: opticalFlowCalcSDR.cpp:79-80,121-123,154-156;
    SURVEY.md §2.2).
  * The reference's one mid-loop blocking readback of m_totalFrameDelta
    (ref: opticalFlowCalcSDR.cpp:91-94) becomes an async device scalar: the jitted
    pyramid returns it as an array and the host only syncs when the scene-change
    logic consumes it, after the whole flow computation has been dispatched.
  * Timing (ofc calc time / warp time, 240-frame avg/peak windows,
    ref: opticalFlowCalcSDR.cpp:118-138, config.h:17) is wall-clock around
    block_until_ready — the XLA analogue of OpenCL event profiling.

All compute is jitted with static shapes per (resolution, hdr) and traced scalars for
everything the auto quality scaler or user can change per frame (search radius, delta
and neighbor scalars, blending scalar, levels) so no re-jit happens during streaming.
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from hopperrender_tpu import config
from hopperrender_tpu.ops import flow as flow_ops
from hopperrender_tpu.ops import flow_strip
from hopperrender_tpu.ops import warp as warp_ops
from hopperrender_tpu.ops import warp_band
from hopperrender_tpu.ops import warp_strip
from hopperrender_tpu.ops import warp_viz


def _band_rs_enabled(res_scalar: int) -> bool:
    """Band-kernel routing gate per res_scalar: every supported layout is now
    chip-proven. rs >= 2 since round 2; the rs=1 layout (480p class, 2-px
    cells via the 16-bit slot packing) passed its chip gate in round 5
    (scripts/tpu_band_check.py rs1: all modes Y+UV exact + apron tier) after
    two fixes the gate itself caught — the SMEM displacement-table budget in
    _choose_geometry and the odd-x-cell-count UV supercell ceil
    (warp_band.py). HRT_BAND_RS1=0 opts 480p back to strips for A/Bs."""
    if os.environ.get("HRT_BAND_RS1") == "0":
        return res_scalar >= 2
    return res_scalar >= 1


def warp_uniform_tier() -> bool:
    """Uniform-subtile kernel tier (warp_band fscal bit 30): spread-0
    subtiles realign with 2 rolls instead of select chains — the dominant
    kernel cost on converged content (round-5 decomposition). Bit-exact
    (exact per-subtile certificate). HRT_UNIFORM_TIER=0 opts out for A/Bs."""
    return os.environ.get("HRT_UNIFORM_TIER", "1") != "0"


def warp_kernel_unroll() -> int:
    """Band-kernel group-loop unroll factor (warp_band kernel_unroll). Each
    (8,128) output group is a latency-bound serial chain; adjacent groups are
    independent, so unrolling interleaves chains in the VPU pipeline.
    Bit-exact at any factor (pure loop scheduling). Default 1 until the chip
    A/B (scripts/tpu_warp_decomp.py) picks the winner; HRT_WARP_UNROLL=N
    overrides for A/Bs."""
    return max(1, int(os.environ.get("HRT_WARP_UNROLL", "1")))


def batched_warp_enabled() -> bool:
    """Per-pair batched warp (warp_frames_batch): one table build + one
    band-kernel launch for ALL of a source interval's outputs. Bit-exact vs
    the per-output path (tests/test_round4.py, tests/test_fuzz_engine.py)
    AND chip-proven: scripts/tpu_band_check.py `batch` (SDR) and
    `hdr 4k batch smooth` (4K HDR, apron tier 32, T=5) both ran exact on a
    v5e chip (round 5 gate run) — so this is ON by default, the served
    dispatch shape. HRT_BATCHED_WARP=0 opts back out to the per-output
    dispatch for A/Bs."""
    return os.environ.get("HRT_BATCHED_WARP", "1") != "0"


def estimate_hbm_bytes(frame_height: int, frame_width: int, *, is_hdr: bool,
                       max_calc_res: int = config.MAX_CALC_RES,
                       warp_band_packed: bool | None = None) -> int:
    """Device-memory footprint estimate for one engine instance: the 3-deep frame
    ring, the per-frame flow/warp contexts, flow double buffer, and pyramid working
    set. The TPU analogue of the reference's pre-build VRAM formula
    (ref: opticalFlowCalc.cpp:45-110 detectDevices).

    The persistent terms are EXACT by construction: the context footprints come
    from `jax.eval_shape` over the real builders (no allocation, no compile), so
    they cannot drift as context layouts evolve — validated against the live
    engine's array ledger by scripts/tpu_hbm_check.py. Only the transient
    working-set term (_working_bytes) is a hand model."""
    h, w = frame_height, frame_width
    e = 2 if is_hdr else 1
    rs, low_h, low_w = config.calc_flow_dims(h, w, max_calc_res)
    a = flow_strip.apron_for(low_h, low_w) if rs >= 1 else 0
    dt = jnp.uint16 if is_hdr else jnp.uint8
    y_s = jax.ShapeDtypeStruct((h, w), dt)
    uv_s = jax.ShapeDtypeStruct((h // 2, w), dt)
    frames = 3 * (y_s.size + uv_s.size) * e

    def tree_bytes(tree) -> int:
        return sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(tree))

    if warp_band_packed is None:
        # Worst case / TPU deployment default: the engine pre-packs the band
        # kernel's u32 source layout into each warp context wherever the band
        # geometry is valid (flow_engine._build_wctx).
        warp_band_packed = (rs >= 1 and _band_rs_enabled(rs)
                            and warp_band.band_geometry_ok(
            res_scalar=rs, is_hdr=is_hdr, dim_y=h, dim_x=w, apron=a))

    if rs >= 1:
        flow_ctx = tree_bytes(jax.eval_shape(
            functools.partial(flow_strip.build_frame_context, apron=a,
                              is_hdr=is_hdr, res_scalar=rs,
                              low_dims=(low_h, low_w)), y_s, uv_s))

        def build_wctx(y, uv):
            ctx = warp_strip.build_warp_context(y, uv, apron=a, is_hdr=is_hdr)
            if warp_band_packed:
                ctx = warp_band.pack_band_context(
                    ctx, res_scalar=rs, is_hdr=is_hdr, dim_y=h, dim_x=w,
                    apron=a)
            return ctx

        warp_ctx = tree_bytes(jax.eval_shape(build_wctx, y_s, uv_s))
    else:  # reference-formulation fallback path holds only the raw frames
        flow_ctx = warp_ctx = 0
    contexts = 3 * (flow_ctx + warp_ctx)
    flow_bufs = 2 * 2 * low_h * low_w * 2
    return (frames + contexts + flow_bufs
            + _working_bytes(h, w, is_hdr=is_hdr, max_calc_res=max_calc_res))


def _working_bytes(frame_height: int, frame_width: int, *, is_hdr: bool,
                   max_calc_res: int = config.MAX_CALC_RES) -> int:
    """Transient (executable working-set) term of estimate_hbm_bytes; split out
    so scripts/tpu_hbm_check.py can validate the persistent terms against the
    engine's live-array ledger separately."""
    h, w = frame_height, frame_width
    _, low_h, low_w = config.calc_flow_dims(h, w, max_calc_res)
    # Pyramid working set: cost volume + strip intermediates (uint32 per layer px).
    working = config.MAX_SEARCH_RADIUS * low_h * low_w * 4 * 6
    # Warp output + blend intermediates.
    working += 4 * (h * w + (h // 2) * w) * 4
    return working


def check_device_memory(frame_height: int, frame_width: int, *, is_hdr: bool,
                        max_calc_res: int, device) -> None:
    """Fail fast with a clear message when the engine's footprint cannot fit the
    device (ref: opticalFlowCalc.cpp:45-110 validates VRAM before building)."""
    need = estimate_hbm_bytes(frame_height, frame_width, is_hdr=is_hdr,
                              max_calc_res=max_calc_res)
    limit = None
    try:
        stats = device.memory_stats()
        if stats:
            limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
    except Exception:  # backend without memory stats (CPU, tunneled) — skip
        return
    if limit and need > 0.95 * limit:
        raise RuntimeError(
            f"engine footprint ~{need / 1e9:.2f} GB exceeds device memory "
            f"{limit / 1e9:.2f} GB for {frame_width}x{frame_height} "
            f"{'HDR' if is_hdr else 'SDR'}; reduce the input resolution or "
            f"stream in SDR"
        )


class CalcTimeWindow:
    """avg/peak over CALC_TIME_INTERVAL frames (ref: opticalFlowCalcSDR.cpp:128-138)."""

    def __init__(self, interval: int = config.CALC_TIME_INTERVAL):
        self.interval = interval
        self.current = 0.0
        self.avg = 0.0
        self.peak = 0.0
        self._count = 0
        self._sum = 0.0

    def record(self, seconds: float) -> None:
        self.current = seconds
        if self._count >= self.interval:
            self.avg = self._sum / self._count
            self._count = 0
            self._sum = 0.0
            self.peak = seconds
        self._count += 1
        self._sum += seconds
        if seconds > self.peak:
            self.peak = seconds


class OpticalFlowEngine:
    """Single-device interpolation engine (SDR uint8 NV12 planes / HDR uint16 P010)."""

    def __init__(
        self,
        frame_height: int,
        frame_width: int,
        *,
        is_hdr: bool = False,
        delta_scalar: int = config.DEFAULT_DELTA_SCALAR,
        neighbor_scalar: int = config.DEFAULT_NEIGHBOR_SCALAR,
        black_level: float = float(config.DEFAULT_BLACK_LEVEL),
        white_level: float = float(config.DEFAULT_WHITE_LEVEL),
        max_calc_res: int = config.MAX_CALC_RES,
        num_iterations: int = config.NUM_ITERATIONS,
        device=None,
    ):
        if frame_height % 2 or frame_width % 2:
            raise ValueError("NV12/P010 frames require even dimensions")
        self.h = frame_height
        self.w = frame_width
        self.is_hdr = is_hdr
        self.res_scalar, self.low_h, self.low_w = config.calc_flow_dims(
            frame_height, frame_width, max_calc_res
        )
        self.search_radius = config.MIN_SEARCH_RADIUS
        self.num_iterations = num_iterations  # 0 = auto (ref: config.h:6)
        self.delta_scalar = delta_scalar
        self.neighbor_scalar = neighbor_scalar
        self.black_level = black_level
        self.white_level = white_level
        self.frame_count = 0
        self.total_frame_delta = 0
        self._pending_delta_raw = None  # device scalar, fetched lazily
        self.ofc_time = CalcTimeWindow()
        self.warp_time = CalcTimeWindow()
        # Honest device timing: block_until_ready returns at *dispatch* on some
        # runtimes (PERF.md), which would feed the auto-quality scaler ~0 ms
        # readings and pin it at max radius. A 1-element device->host fetch forces
        # completion everywhere (microseconds on a local host).
        self.timing_fetch = True
        self._device = device or jax.devices()[0]
        check_device_memory(frame_height, frame_width, is_hdr=is_hdr,
                            max_calc_res=max_calc_res, device=self._device)

        dtype = jnp.uint16 if is_hdr else jnp.uint8
        zero_y = jnp.zeros((self.h, self.w), dtype)
        zero_uv = jnp.zeros((self.h // 2, self.w), dtype)
        put = lambda a: jax.device_put(a, self._device)
        self._frames_y = [put(zero_y) for _ in range(3)]
        self._frames_uv = [put(zero_uv) for _ in range(3)]
        zero_flow = jnp.zeros((2, self.low_h, self.low_w), jnp.int16)
        # blurred[0] = previous pair's flow (consumed by warp); blurred[1] = newest.
        self._blurred = [put(zero_flow), put(zero_flow)]

        # Strip-mined flow path (PERF.md): needs res_scalar >= 1; contexts (mirror
        # apron + transposed planes) are built once per ingested frame and ride the
        # same ring as the frames. The apron is sized to the RADIUS BUCKET: the
        # pyramid's per-pair offset bound scales with the bucket's max candidate
        # step, so low buckets get ~12x smaller contexts/bands (48 px at the
        # radius-5 floor vs 576 at 16). Pending flows computed at a larger bucket
        # keep the larger apron until consumed (warp displacement soundness).
        self.use_strips = self.res_scalar >= 1
        self._bucket = self._radius_bucket()
        self._flow_buckets = [self._bucket, self._bucket]
        self._apron = flow_strip.apron_for(self.low_h, self.low_w, self._bucket)
        self._ctxs = [None, None, None]
        # Strip-mined warp (modes 0/1/2) needs cell-aligned dims as well.
        cell = 1 << self.res_scalar
        self.use_warp_strips = (
            self.use_strips and self.h % cell == 0 and self.w % cell == 0
        )
        self._wctxs = [None, None, None]
        # Pallas row-band warp (the fastest path, modes 0/1/2): used on real TPU
        # when the geometry qualifies; other platforms keep the XLA strip twin
        # (the band kernel's interpreter mode is only for tests).
        self.use_warp_band = (
            self.use_warp_strips
            and self._device.platform == "tpu"
            and _band_rs_enabled(self.res_scalar)
            and warp_band.band_geometry_ok(
                res_scalar=self.res_scalar, is_hdr=is_hdr,
                dim_y=self.h, dim_x=self.w, apron=self._apron)
        )
        self._band_interpret = False  # test hook
        # Flow tier dispatch: "planned" = host-side per-frame tier plan baked
        # statically into the executable (no per-step lax.cond tax — see
        # flow_strip.pyramid_flow_strip_planned), validated on device and
        # repaired+rerun on mispredict; "cond" = on-device per-step lax.cond
        # tiers; "gather" = exact gather kernels only.
        self.tier_mode = "planned" if self.use_strips else "gather"
        self._plans: dict = {}          # (bucket, num_iterations) -> plan
        self.plan_mispredicts = 0
        self.plan_reruns = 0
        # Host-known maxabs of each flow double-buffer slot (from the fetched
        # validity sig; None on the gather/cond paths) — certifies the band
        # warp's apron tier (warp_band.pick_apron). Rotates with _blurred.
        self._flow_bounds: list = [None, None]
        self.warp_apron_used = self._apron   # observability

    # The underlying ops are module-level jits with static argnames, so engines with
    # the same (resolution, hdr) share one compilation — no per-instance traces.

    def _radius_bucket(self) -> int:
        """Static cost-volume depth bucket for the current search radius."""
        return next(b for b in (5, 8, 12, flow_ops.MAX_R)
                    if self.search_radius <= b)

    def _build_ctx(self, y_dev, uv_dev):
        return flow_strip.build_frame_context(
            y_dev, uv_dev, apron=self._apron, is_hdr=self.is_hdr,
            res_scalar=self.res_scalar if self.res_scalar <= 4 else None,
            low_dims=(self.low_h, self.low_w))

    def _build_wctx(self, y_dev, uv_dev):
        ctx = warp_strip.build_warp_context(
            y_dev, uv_dev, apron=self._apron, is_hdr=self.is_hdr)
        if self.use_warp_band:
            # Pre-pack the band kernel's u32 source layout once per SOURCE
            # frame; repacking per output was the largest warp prep term
            # (chip-probed, PERF.md round 3 warp anatomy).
            ctx = warp_band.pack_band_context(
                ctx, res_scalar=self.res_scalar, is_hdr=self.is_hdr,
                dim_y=self.h, dim_x=self.w, apron=self._apron)
        return ctx

    # -- streaming API (mirrors OpticalFlowCalc) -----------------------------

    def _refresh_geometry(self) -> bool:
        """Re-derive bucket/apron (and the band-kernel eligibility, which is
        apron-dependent) from the current search radius. Returns True when the
        apron changed (contexts must be rebuilt)."""
        self._bucket = self._radius_bucket()
        # Apron follows the effective bucket: current radius or any pending
        # flow's bucket, whichever is larger (their displacements must fit).
        eff = max(self._bucket, *self._flow_buckets)
        apron = flow_strip.apron_for(self.low_h, self.low_w, eff) \
            if self.use_strips else 0
        rebuilt = apron != self._apron
        self._apron = apron
        if rebuilt and self.use_warp_strips:
            self.use_warp_band = (
                self._device.platform == "tpu"
                and _band_rs_enabled(self.res_scalar)
                and warp_band.band_geometry_ok(
                    res_scalar=self.res_scalar, is_hdr=self.is_hdr,
                    dim_y=self.h, dim_x=self.w, apron=apron))
        return rebuilt

    def update_frame(self, y, uv) -> None:
        """Ingest frame N and rotate the ring (ref: opticalFlowCalcSDR.cpp:19-29).
        Accepts host ndarrays (one host->HBM transfer each) or already
        device-resident jax arrays (zero-copy — the device-resident IO path)."""
        dtype = np.uint16 if self.is_hdr else np.uint8
        if isinstance(y, jax.Array):
            y_dev = jax.device_put(y, self._device)
            uv_dev = jax.device_put(uv, self._device)
        else:
            y_dev = jax.device_put(np.ascontiguousarray(y, dtype=dtype),
                                   self._device)
            uv_dev = jax.device_put(np.ascontiguousarray(uv, dtype=dtype),
                                    self._device)
        self._frames_y = [self._frames_y[1], self._frames_y[2], y_dev]
        self._frames_uv = [self._frames_uv[1], self._frames_uv[2], uv_dev]
        rebuilt = self._refresh_geometry()
        if self.use_strips:
            if rebuilt:  # re-derive older slots' contexts at the new apron
                self._ctxs = [
                    self._build_ctx(self._frames_y[i], self._frames_uv[i])
                    for i in range(2)] + [None]
            else:
                self._ctxs = [self._ctxs[1], self._ctxs[2], None]
            self._ctxs[2] = self._build_ctx(y_dev, uv_dev)
        if self.use_warp_strips:
            if rebuilt:
                self._wctxs = [
                    self._build_wctx(self._frames_y[i], self._frames_uv[i])
                    for i in range(2)] + [None]
            else:
                self._wctxs = [self._wctxs[1], self._wctxs[2], None]
            self._wctxs[2] = self._build_wctx(y_dev, uv_dev)
        self.frame_count += 1
        self._ofc_start = time.perf_counter()

    def _run_pyramid(self, ctx1, f1y, f1uv, f2y, f2uv, *, num_layers, apron,
                     radius=None, plan=None):
        """The engine's flow computation for one pair — the SINGLE definition
        used by both streaming (calculate_optical_flow) and bench_units(), so
        benchmarks measure exactly the served chain. Returns (offsets,
        blurred, delta_raw, sig) — sig is the planned path's validity vector
        (None on the cond/gather paths)."""
        scalars = (jnp.int32(self.search_radius if radius is None else radius),
                   jnp.int32(self.delta_scalar),
                   jnp.int32(self.neighbor_scalar))
        kw = dict(low_h=self.low_h, low_w=self.low_w,
                  res_scalar=self.res_scalar, is_hdr=self.is_hdr,
                  num_layers=num_layers, apron=apron,
                  dim_y=self.h, dim_x=self.w,
                  num_iterations=self.num_iterations)
        if self.use_strips and ctx1 is not None:
            if plan is not None:
                return flow_strip.pyramid_flow_strip_planned(
                    ctx1, f2y, f2uv, *scalars, plan=plan, **kw)
            off, blurred, raw = flow_strip.pyramid_flow_strip(
                ctx1, f2y, f2uv, *scalars,
                uniform_tier=self.tier_mode != "gather", **kw)
            return off, blurred, raw, None
        off, blurred, raw = flow_ops.pyramid_flow(
            f1y, f1uv, f2y, f2uv, *scalars,
            low_h=self.low_h, low_w=self.low_w, res_scalar=self.res_scalar,
            is_hdr=self.is_hdr, num_layers=num_layers,
            num_iterations=self.num_iterations,
        )
        return off, blurred, raw, None

    # -- planned tier dispatch (host-side, see flow_strip block comment) -----

    def _plan_key(self):
        return (self._bucket, self.num_iterations)

    def _current_plan(self, ctx) -> tuple:
        """The plan to run for this frame pair: the bucket's predicted plan,
        or the conservative default; all-G when the context cannot support
        the dense tiers (no/short decimated planes)."""
        n = len(flow_strip.plan_steps(self.low_h, self.low_w,
                                      self.num_iterations))
        if ctx is None or not flow_strip.uniform_fits(
                ctx, low_h=self.low_h, low_w=self.low_w,
                res_scalar=self.res_scalar, apron=self._apron):
            return ("G",) * n
        return self._plans.get(self._plan_key()) or flow_strip.default_plan(
            self.low_h, self.low_w, self.num_iterations)

    def _run_pyramid_planned(self, ctx1, f1y, f1uv, f2y, f2uv, *,
                             num_layers, apron):
        """Run the planned pyramid, validate the plan against the device's
        per-step deviant counts, repair+rerun on mispredict (at most once —
        the repaired plan is exact-by-construction), and store the next
        frame's prediction. The sig fetch is the honest-timing sync point.
        TPU-native analogue of the reference's host-driven per-frame
        adaptivity (ref: HopperRender.cpp:1438-1463)."""
        plan = self._current_plan(ctx1)
        out = self._run_pyramid(ctx1, f1y, f1uv, f2y, f2uv,
                                num_layers=num_layers, apron=apron, plan=plan)
        sig = np.asarray(out[3])   # forces completion (honest timing)
        bad = flow_strip.first_invalid_step(
            plan, sig, self.low_h, self.low_w, self.num_iterations)
        if bad is not None:
            self.plan_mispredicts += 1
            self.plan_reruns += 1
            plan = flow_strip.repair_plan(plan, bad)
            out = self._run_pyramid(ctx1, f1y, f1uv, f2y, f2uv,
                                    num_layers=num_layers, apron=apron,
                                    plan=plan)
            sig = np.asarray(out[3])
        # Warp apron certificate: maxabs of the flow this pair SETTLED on
        # (the rerun's sig when the plan was repaired).
        self._last_flow_bound = flow_strip.sig_flow_bound(sig)
        if flow_strip.uniform_fits(ctx1, low_h=self.low_h, low_w=self.low_w,
                                   res_scalar=self.res_scalar,
                                   apron=self._apron):
            self._plans[self._plan_key()] = flow_strip.predict_plan(
                sig, self.low_h, self.low_w, self.num_iterations)
        return out

    def settle_plan(self, y1, uv1, y2, uv2, *, max_rounds: int = 4) -> tuple:
        """Bench/test helper: iterate run -> validate -> predict on ONE frame
        pair until the prediction is a fixed point (valid plans yield
        bit-identical offsets, so one valid run's counts decide the stable
        plan — convergence takes <= 3 runs). Leaves the settled plan in the
        engine's plan cache and returns it."""
        if not self.use_strips:
            return ()
        self._refresh_geometry()
        ctx = self._build_ctx(y1, uv1)
        plan = self._current_plan(ctx)
        for _ in range(max_rounds):
            out = self._run_pyramid(ctx, y1, uv1, y2, uv2,
                                    num_layers=self._bucket,
                                    apron=self._apron, plan=plan)
            sig = np.asarray(out[3])
            bad = flow_strip.first_invalid_step(
                plan, sig, self.low_h, self.low_w, self.num_iterations)
            if bad is not None:
                plan = flow_strip.repair_plan(plan, bad)
                continue
            nxt = flow_strip.predict_plan(sig, self.low_h, self.low_w,
                                          self.num_iterations)
            self._plans[self._plan_key()] = nxt
            # Settle the warp apron tier too: benches measure the tier the
            # served engine would pick for this content.
            b = flow_strip.sig_flow_bound(sig)
            self._flow_bounds = [b, b]
            if nxt == plan:
                return plan
            plan = nxt
        return plan

    def calculate_optical_flow(self) -> None:
        """Compute flow for the newest pair (slots 1,2); swap the flow double buffer
        so warping uses the previous pair's flow (ref: opticalFlowCalcSDR.cpp:44-139)."""
        # Bucket the static cost-volume depth to the radius captured at
        # update_frame (the apron/context geometry was sized for it): fewer
        # layers AND a narrower candidate span as the auto scaler backs off —
        # spans 6/26/62/114 px for buckets 5/8/12/16. Compilations are cached
        # per visited bucket.
        num_layers = self._bucket
        self._flow_buckets = [self._flow_buckets[1], num_layers]
        if self.use_strips and self.tier_mode == "planned" \
                and self._ctxs[1] is not None:
            # Planned dispatch: the sig fetch inside doubles as the honest
            # completion sync (sig[-1] depends on the blurred flow), so the
            # recorded time covers any mispredict rerun too.
            _, blurred, delta_raw, _ = self._run_pyramid_planned(
                self._ctxs[1], self._frames_y[1], self._frames_uv[1],
                self._frames_y[2], self._frames_uv[2],
                num_layers=num_layers, apron=self._apron)
            self._blurred = [self._blurred[1], blurred]
            self._flow_bounds = [self._flow_bounds[1], self._last_flow_bound]
            self._pending_delta_raw = delta_raw
            self.ofc_time.record(time.perf_counter() - self._ofc_start)
            return
        _, blurred, delta_raw, _ = self._run_pyramid(
            self._ctxs[1], self._frames_y[1], self._frames_uv[1],
            self._frames_y[2], self._frames_uv[2],
            num_layers=num_layers, apron=self._apron)
        self._blurred = [self._blurred[1], blurred]
        self._flow_bounds = [self._flow_bounds[1], None]
        self._pending_delta_raw = delta_raw
        # Timing: dispatch-to-done around the flow computation (event-profiling
        # analogue). The 1-element fetch forces completion even on runtimes where
        # block_until_ready returns at dispatch (PERF.md).
        if self.timing_fetch:
            int(blurred[0, 0, 0])
        else:
            blurred.block_until_ready()
        self.ofc_time.record(time.perf_counter() - self._ofc_start)

    def fetch_total_frame_delta(self) -> int:
        """Sync point for the scene-change scalar; normalization is truncating integer
        division (ref: opticalFlowCalcSDR.cpp:92-94 /10, opticalFlowCalcHDR.cpp:93 /6)."""
        if self._pending_delta_raw is not None:
            norm = self.low_h * self.low_w * (6 if self.is_hdr else 10)
            self.total_frame_delta = int(self._pending_delta_raw) // norm
            self._pending_delta_raw = None
        return self.total_frame_delta

    def _levels(self) -> tuple[float, float]:
        """HDR pre-scales levels x256 (ref: opticalFlowCalcHDR.cpp:151-152)."""
        if self.is_hdr:
            return self.black_level * 256.0, self.white_level * 256.0
        return self.black_level, self.white_level

    def _band_plan(self, flow_bound, apron) -> tuple:
        """Host-planned band-kernel variant for this frame's certified flow
        bound: sets warp_apron_used (the apron tier) and warp_chain_bounds,
        returning the chain bounds. Chain bounds from the same certificate: a
        subtile's row residual spread is <= 2*bound + 7, so (32,32) routes
        EVERY subtile through the select-chain fast path on scattered flow up
        to |flow| <= 12 (the adversarial regime that otherwise rides per-cell
        chains); (16,16) stays the converged-content default."""
        # Chip A/B (round 4, 4K HDR r16 pan, slope method): tier 32 prices at
        # 17.0 ms/output vs 9.9 ms at the full bucket apron — the shrunken
        # per-band DMA windows LOSE to the full-apron layout's large
        # sequential copies on the real memory system, the opposite of the
        # geometric-traffic prediction. Tiers stay available (bit-exact, see
        # tests/test_warp_band.py) behind HRT_APRON_TIERS=1 for re-evaluation
        # on future backends; the default serves the measured-faster layout.
        if os.environ.get("HRT_APRON_TIERS") == "1":
            self.warp_apron_used = warp_band.pick_apron(flow_bound, apron)
        else:
            self.warp_apron_used = apron
        # Chain length is a FIRST-ORDER kernel cost (round-5 chip
        # decomposition: 6.0 ms/output at (16,16) vs 13.4 at (32,32), 4K HDR
        # r16) — so (32,32) is worth paying ONLY when the content is actually
        # scattered, i.e. the in-subtile spread would fail the (16,16)
        # certificate and storm the per-cell slow path. maxabs(flow) alone
        # over-triggers: converged-but-moving content (bound 5-12, e.g. a
        # 10 px/frame pan) has near-zero spread. The host's scatter signal is
        # the settled tier plan: an all-UNIFORM plan means the pyramid sees
        # one dominant offset per window — spread ~0 — so keep (16,16); any
        # M/V/G step means real dispersion. Mispredicts are safe: uncertified
        # subtiles ride the bit-exact slow path.
        cb = (16, 16)
        plan = self._plans.get(self._plan_key()) \
            if self.use_strips and self.tier_mode == "planned" else None
        all_u = plan is not None and all(s == "U" for s in plan)
        if flow_bound is not None and 16 < 2 * flow_bound + 8 <= 32:
            if not all_u:
                cb = (32, 32)
        elif flow_bound is not None and 2 * flow_bound + 8 <= 16 and all_u:
            # Converged content (all-U plan, small bound): the (8,8) chains
            # price at 1.68 ms/output vs 5.94 at (16,16) (round-5 sweep) and
            # the near-zero spread certifies them; exactly-uniform subtiles
            # skip the chains entirely (the uniform tier). Uncertified edge
            # subtiles ride the bit-exact slow path.
            cb = (8, 8)
        self.warp_chain_bounds = cb
        return cb

    def _run_warp(self, wctx0, wctx1, f0, f1, flow, blending_scalar,
                  mode: int, *, apron, flow_bound=None):
        """The engine's warp for one output frame — the SINGLE definition used
        by both streaming (warp_frames) and bench_units(). f0/f1 are the raw
        (y, uv) frame tuples for the non-strip fallback. flow_bound is the
        host-known maxabs of `flow` (from the fetched validity sig): it
        selects the band kernel's apron tier, shrinking the band DMA to what
        the flow can actually reach (warp_frame_band apron_eff) — exact, not
        speculative, since the sig was fetched before this warp dispatches."""
        black, white = self._levels()
        # Visualization modes on the fast formulations (bit-exact twins of the
        # gather path, tests/test_warp_strip.py):
        #   4 (grey flow): pure structured math, no source samples exist.
        #   3 (HSV flow):  the strip twin's blended samples + structured flow
        #                  upsample colorization.
        #   5 (side-by-side full res): source copy | fast mode-2 concat.
        #   6 (side-by-side 2x): Y and the UV U-outputs fully structured over
        #                  the fast mode-2 output; only the UV V-outputs
        #                  gather (H/4 x W/4 pixels, warp_viz docstring).
        if mode == 4 and self.use_warp_strips:
            return warp_strip.grey_flow_frame(
                flow, res_scalar=self.res_scalar, is_hdr=self.is_hdr,
                dim_y=self.h, dim_x=self.w)
        if mode == 3 and self.use_warp_strips and wctx0 is not None:
            if self.use_warp_band:
                # HSV overlay on the band kernel's raw mode-2 blend: the
                # strip-gather mode 3 costs 867 ms/output at 4K (round-5 viz
                # bench); this composition prices like mode 2 + elementwise.
                cb = self._band_plan(flow_bound, apron)
                raw_y, raw_uv = warp_band.warp_frame_band(
                    wctx0, wctx1, flow,
                    jnp.float32(blending_scalar), jnp.float32(black),
                    jnp.float32(white),
                    res_scalar=self.res_scalar, mode=2, is_hdr=self.is_hdr,
                    dim_y=self.h, dim_x=self.w, apron=apron,
                    apron_eff=self.warp_apron_used, chain_bounds=cb,
                    interpret=self._band_interpret,
                    kernel_unroll=warp_kernel_unroll(),
                    uniform_tier=warp_uniform_tier(), raw_blend=True)
                return warp_viz.hsv_flow_overlay(
                    raw_y, raw_uv, flow, jnp.float32(black),
                    jnp.float32(white), res_scalar=self.res_scalar,
                    is_hdr=self.is_hdr, dim_y=self.h, dim_x=self.w)
            return warp_strip.warp_frame_strip(
                wctx0, wctx1, flow,
                jnp.float32(blending_scalar), jnp.float32(black), jnp.float32(white),
                res_scalar=self.res_scalar, mode=3, is_hdr=self.is_hdr,
                dim_y=self.h, dim_x=self.w, apron=apron,
            )
        if mode in (5, 6) and self.use_warp_strips and wctx0 is not None \
                and f0 is not None and f1 is not None:
            w2y, w2uv = self._run_warp(wctx0, wctx1, f0, f1, flow,
                                       blending_scalar, 2, apron=apron,
                                       flow_bound=flow_bound)
            if mode == 5:
                return warp_viz.side_by_side_1(f0[0], f0[1], w2y, w2uv,
                                               dim_x=self.w)
            return warp_viz.side_by_side_2(
                f0[0], f0[1], f1[1], w2y, w2uv, flow,
                jnp.float32(blending_scalar), jnp.float32(white),
                res_scalar=self.res_scalar, is_hdr=self.is_hdr,
                dim_y=self.h, dim_x=self.w)
        if self.use_warp_band and mode in (0, 1, 2) and wctx0 is not None:
            cb = self._band_plan(flow_bound, apron)
            return warp_band.warp_frame_band(
                wctx0, wctx1, flow,
                jnp.float32(blending_scalar), jnp.float32(black), jnp.float32(white),
                res_scalar=self.res_scalar, mode=mode, is_hdr=self.is_hdr,
                dim_y=self.h, dim_x=self.w, apron=apron,
                apron_eff=self.warp_apron_used, chain_bounds=cb,
                interpret=self._band_interpret,
                kernel_unroll=warp_kernel_unroll(),
                uniform_tier=warp_uniform_tier(),
            )
        if self.use_warp_strips and mode in (0, 1, 2) and wctx0 is not None:
            return warp_strip.warp_frame_strip(
                wctx0, wctx1, flow,
                jnp.float32(blending_scalar), jnp.float32(black), jnp.float32(white),
                res_scalar=self.res_scalar, mode=mode, is_hdr=self.is_hdr,
                dim_y=self.h, dim_x=self.w, apron=apron,
            )
        return warp_ops.warp_frame(
            f0[0], f0[1], f1[0], f1[1],
            flow, jnp.float32(blending_scalar),
            jnp.float32(black), jnp.float32(white),
            res_scalar=self.res_scalar, mode=mode, is_hdr=self.is_hdr,
        )

    def warp_frames(self, blending_scalar: float, frame_output_mode: int):
        """Warp slots 0,1 with the previous pair's flow
        (ref: opticalFlowCalcSDR.cpp:141-168)."""
        if blending_scalar > 1.0:
            raise ValueError("Blending scalar is greater than 1.0")
        start = time.perf_counter()
        y, uv = self._run_warp(
            self._wctxs[0], self._wctxs[1],
            (self._frames_y[0], self._frames_uv[0]),
            (self._frames_y[1], self._frames_uv[1]),
            self._blurred[0], blending_scalar, int(frame_output_mode),
            apron=self._apron, flow_bound=self._flow_bounds[0])
        if self.timing_fetch:
            int(uv[0, 0])
        else:
            uv.block_until_ready()
        self.warp_time.record(time.perf_counter() - start)
        return y, uv

    def _run_warp_batch(self, wctx0, wctx1, flow, ts, mode: int, *,
                        apron, flow_bound=None):
        """Batched twin of _run_warp for the band path: one call, (T,) ts,
        (T, ...) outputs. Same host plan (apron tier + chain bounds).

        Bucket-5 t_batch cap: the 4K bucket-5 UV geometry (band 360, 3
        bands) deterministically crashes the TPU worker at t_batch >= 3
        (round-5 bisection: T=2 passes all repros incl. the bench chain
        shape and the chip gate; T=3/T=5 crash in three independent
        harnesses — bench, served, tpu_band_check). Until the Mosaic root
        cause lands, the floor bucket dispatches the batch in <=2-output
        chunks — bit-identical (tests/test_round5.py), costs one extra
        launch per interval at the bucket the scaler only visits under
        pressure."""
        cb = self._band_plan(flow_bound, apron)
        black, white = self._levels()
        chunk = 2 if self._bucket <= 5 else int(ts.shape[0])
        outs = []
        for i in range(0, int(ts.shape[0]), max(chunk, 1)):
            part = ts[i:i + chunk]
            if int(part.shape[0]) == 1:
                part = part[0]   # scalar call (no batch axis to strip)
            y, uv = warp_band.warp_frame_band(
                wctx0, wctx1, flow, part,
                jnp.float32(black), jnp.float32(white),
                res_scalar=self.res_scalar, mode=mode, is_hdr=self.is_hdr,
                dim_y=self.h, dim_x=self.w, apron=apron,
                apron_eff=self.warp_apron_used, chain_bounds=cb,
                interpret=self._band_interpret,
                kernel_unroll=warp_kernel_unroll(),
                uniform_tier=warp_uniform_tier())
            if int(part.ndim if hasattr(part, "ndim") else 1) == 0:
                y, uv = y[None], uv[None]
            outs.append((y, uv))
        if len(outs) == 1:
            return outs[0]
        return (jnp.concatenate([o[0] for o in outs], axis=0),
                jnp.concatenate([o[1] for o in outs], axis=0))

    def warp_frames_batch(self, blending_scalars, frame_output_mode: int):
        """All of one source interval's outputs in ONE dispatch: a single
        vmapped table build + a single band-kernel launch over the whole
        blending-scalar vector (warp_frame_band with a (T,) t operand). The
        per-output XLA prep (~1.8 ms of displacement/fast tables) and the
        dispatch round trip are paid ONCE per pair instead of per output —
        the lever that fits 5 warps/source into the 24->120 budget. Outputs
        are bit-identical to T warp_frames calls (tests/test_round4.py,
        tests/test_fuzz_engine.py). Falls back to the per-output path whenever the
        band kernel is not routed. Returns a list of (y, uv) device arrays.
        (ref analogue: the per-output WarpFrame loop, HopperRender.cpp:
        1031-1043/1191-1197 — collapsed host-side because every scalar of the
        interval is known as soon as the pair's flow is.)"""
        mode = int(frame_output_mode)
        scalars = [float(s) for s in blending_scalars]
        if any(s > 1.0 for s in scalars):
            raise ValueError("Blending scalar is greater than 1.0")
        if not (self.use_warp_band and mode in (0, 1, 2)
                and self._wctxs[0] is not None and len(scalars) > 1):
            return [self.warp_frames(s, mode) for s in scalars]
        start = time.perf_counter()
        y, uv = self._run_warp_batch(
            self._wctxs[0], self._wctxs[1], self._blurred[0],
            jnp.asarray(scalars, jnp.float32), mode,
            apron=self._apron, flow_bound=self._flow_bounds[0])
        if self.timing_fetch:
            int(uv[0, 0, 0])
        else:
            uv.block_until_ready()
        # The scaler consumes per-output warp durations (240-frame window):
        # attribute the batch evenly so window sums match the per-output path.
        per = (time.perf_counter() - start) / len(scalars)
        for _ in scalars:
            self.warp_time.record(per)
        return [(y[i], uv[i]) for i in range(len(scalars))]

    def copy_frame(self):
        """Passthrough of the pipeline-latency-matched slot
        (ref: opticalFlowCalcSDR.cpp:170-183)."""
        idx = 0 if self.frame_count >= 3 else (1 if self.frame_count >= 2 else 2)
        black, white = self._levels()
        start = time.perf_counter()
        y, uv = warp_ops.copy_frame(
            self._frames_y[idx], self._frames_uv[idx],
            jnp.float32(black), jnp.float32(white), is_hdr=self.is_hdr,
        )
        if self.timing_fetch:
            int(uv[0, 0])
        else:
            uv.block_until_ready()
        self.warp_time.record(time.perf_counter() - start)
        return y, uv

    def reset_stream(self) -> None:
        """Seek / new segment: restart the warmup (ref: HopperRender.cpp:840)."""
        self.frame_count = 0

    def bench_units(self):
        """Closures over the engine's EXACT compute chain for slope-method
        benchmarking (round-1 verdict: bench the served path, not a parallel
        re-implementation — bench.py drives these).

        flow_unit(y1, uv1, y2, uv2) = per-source-frame overhead: flow context
        build + warp context touch + pyramid (what update_frame +
        calculate_optical_flow dispatch per ingested frame), returning a
        device scalar. warp_unit(y1, uv1, y2, uv2, flow, t, mode) = warp
        context builds for BOTH sources + one warp (a conservative overcount:
        the engine builds one warp context per source frame, not two per
        output — bench.py therefore holds the frames loop-invariant so XLA
        hoists the builds, and accounts the per-source build separately via
        wctx_unit). wctx_unit(y, uv) = ONE warp-context build+pack, the
        engine's actual per-source-frame warp overhead. All route through
        the same _run_pyramid/_run_warp/_build_wctx the streaming path uses,
        at the current radius bucket. warp_batch_unit(..., ts) = the per-pair
        BATCHED warp (warp_frames_batch chain) over a (T,) scalar vector.
        Returns (flow_unit, warp_unit, wctx_unit, warp_batch_unit)."""
        self._refresh_geometry()
        num_layers = self._bucket
        apron = self._apron
        # Planned tier dispatch: bench with the bucket's SETTLED plan (call
        # settle_plan on the bench content first); fall back to the
        # conservative default plan when none was settled. The plan's
        # validity counters are part of the measured executable — the
        # benched chain is exactly the served chain.
        plan = None
        if self.use_strips and self.tier_mode == "planned":
            plan = self._plans.get(self._plan_key())

        def flow_unit(y1, uv1, y2, uv2):
            ctx = self._build_ctx(y1, uv1) if self.use_strips else None
            p = plan
            if p is not None and not flow_strip.uniform_fits(
                    ctx, low_h=self.low_h, low_w=self.low_w,
                    res_scalar=self.res_scalar, apron=apron):
                p = ("G",) * len(p)
            _, blurred, raw, sig = self._run_pyramid(
                ctx, y1, uv1, y2, uv2, num_layers=num_layers, apron=apron,
                plan=p)
            # Barrier: fusing the warp-context build into the pyramid's
            # compute region faults the TPU runtime (PERF.md fusion hazard).
            acc = raw + blurred[0, 0, 0].astype(jnp.uint32)
            if sig is not None:
                acc = acc + jnp.sum(sig).astype(jnp.uint32)
            acc = jax.lax.optimization_barrier(acc)
            # (The per-source warp-context build is measured by wctx_unit —
            # a 1-element touch here would mostly dead-code-eliminate anyway.)
            return acc

        def warp_unit(y1, uv1, y2, uv2, flow, t, mode=2):
            if self.use_warp_strips:
                w0 = self._build_wctx(y1, uv1)
                w1 = self._build_wctx(y2, uv2)
            else:
                w0 = w1 = None
            # Apron tier: the settled bound (settle_plan / streamed sig) —
            # exactly what the served path would pick for this content.
            y, uv = self._run_warp(w0, w1, (y1, uv1), (y2, uv2), flow, t,
                                   int(mode), apron=apron,
                                   flow_bound=self._flow_bounds[0])
            return (jnp.sum(y[0, :8].astype(jnp.uint32))
                    + jnp.sum(uv[0, :8].astype(jnp.uint32)))

        def warp_batch_unit(y1, uv1, y2, uv2, flow, ts, mode=2):
            """One per-pair BATCHED warp (all T outputs of a source interval
            in one dispatch) — the warp_frames_batch chain, context builds
            held loop-invariant exactly like warp_unit."""
            w0 = self._build_wctx(y1, uv1)
            w1 = self._build_wctx(y2, uv2)
            y, uv = self._run_warp_batch(w0, w1, flow, ts, int(mode),
                                         apron=apron,
                                         flow_bound=self._flow_bounds[0])
            return (jnp.sum(y[:, 0, :8].astype(jnp.uint32))
                    + jnp.sum(uv[:, 0, :8].astype(jnp.uint32)))

        def wctx_unit(y, uv):
            if not self.use_warp_strips:
                return jnp.uint32(0)
            w = self._build_wctx(y, uv)
            # Full-tree checksum: partial reads would let XLA dead-code the
            # pad/pack work this unit exists to measure.
            acc = jnp.uint32(0)
            for leaf in jax.tree.leaves(w):
                acc = acc + jnp.sum(leaf.astype(jnp.uint32))
            return acc

        return flow_unit, warp_unit, wctx_unit, warp_batch_unit

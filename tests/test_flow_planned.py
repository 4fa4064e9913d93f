"""Planned tier dispatch (host-side per-frame plans, no per-step lax.cond):
bit-exactness vs the gather formulation, validity counters, misprediction
detection + repair, and the engine's plan lifecycle."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_frame
from hopperrender_tpu.engine.flow_engine import OpticalFlowEngine
from hopperrender_tpu.ops import flow as flow_ops
from hopperrender_tpu.ops import flow_strip


def full_ctx(y, uv, apron, is_hdr, rs, low_dims):
    return flow_strip.build_frame_context(
        jnp.asarray(y), jnp.asarray(uv), apron=apron, is_hdr=is_hdr,
        res_scalar=rs, low_dims=low_dims)


def run_planned(ctx, f2y, f2uv, plan, *, low_h, low_w, rs, is_hdr, apron,
                h, w, radius=9):
    return flow_strip.pyramid_flow_strip_planned(
        ctx, jnp.asarray(f2y), jnp.asarray(f2uv),
        jnp.int32(radius), jnp.int32(8), jnp.int32(6),
        low_h=low_h, low_w=low_w, res_scalar=rs, is_hdr=is_hdr,
        apron=apron, dim_y=h, dim_x=w, plan=plan)


def pan_pair(h, w, shift, is_hdr=False):
    """A frame pair under pure global translation by `shift` full-res px."""
    rng = np.random.default_rng(7)
    dtype = np.uint16 if is_hdr else np.uint8
    canvas = rng.integers(0, 200, (h, w + 2 * abs(shift) + 8)).astype(dtype)
    canvas_uv = rng.integers(0, 200, (h // 2, w + 2 * abs(shift) + 8)).astype(dtype)
    x0 = abs(shift)
    f1 = (canvas[:, x0:x0 + w].copy(), canvas_uv[:, x0:x0 + w].copy())
    f2 = (canvas[:, x0 + shift:x0 + shift + w].copy(),
          canvas_uv[:, x0 + shift:x0 + shift + w].copy())
    return f1, f2


@pytest.mark.parametrize("is_hdr", [False, True])
def test_all_gather_plan_matches_reference(rng, is_hdr):
    """The all-G plan is the gather pyramid exactly, and sig has one count
    per step plus the completion probe."""
    h, w, rs, low_h, low_w = 64, 96, 2, 16, 24
    f1y, f1uv = make_frame(rng, h, w, is_hdr)
    f2y, f2uv = make_frame(rng, h, w, is_hdr)
    apron = flow_strip.apron_for(low_h, low_w)
    ctx = full_ctx(f1y, f1uv, apron, is_hdr, rs, (low_h, low_w))
    n = len(flow_strip.plan_steps(low_h, low_w))
    plan = ("G",) * n
    off, blur, raw, sig = run_planned(ctx, f2y, f2uv, plan, low_h=low_h,
                                      low_w=low_w, rs=rs, is_hdr=is_hdr,
                                      apron=apron, h=h, w=w)
    w_off, w_blur, w_raw = flow_ops.pyramid_flow(
        jnp.asarray(f1y), jnp.asarray(f1uv), jnp.asarray(f2y),
        jnp.asarray(f2uv), jnp.int32(9), jnp.int32(8), jnp.int32(6),
        low_h=low_h, low_w=low_w, res_scalar=rs, is_hdr=is_hdr)
    np.testing.assert_array_equal(np.asarray(off), np.asarray(w_off))
    np.testing.assert_array_equal(np.asarray(blur), np.asarray(w_blur))
    assert int(raw) == int(w_raw)
    assert sig.shape == (2 * n + 2,)  # [ndev, ndist, flow bound, probe]
    # Iteration-0 step-0 always starts from zeroed offsets => 0 deviants.
    assert int(sig[0]) == 0
    # The flow-bound entry certifies the warp apron tier exactly.
    assert flow_strip.sig_flow_bound(np.asarray(sig)) \
        == int(np.max(np.abs(np.asarray(blur).astype(np.int64))))
    # G plans are valid on any content.
    assert flow_strip.first_invalid_step(plan, np.asarray(sig),
                                         low_h, low_w) is None


def test_predicted_plan_is_valid_and_bit_exact_on_pan(rng):
    """On panning content, predict from one valid run -> the predicted plan
    contains dense tiers, revalidates, and reproduces the gather pyramid
    bit for bit."""
    h, w, rs, low_h, low_w = 64, 96, 2, 16, 24
    (f1y, f1uv), (f2y, f2uv) = pan_pair(h, w, 4)
    apron = flow_strip.apron_for(low_h, low_w)
    ctx = full_ctx(f1y, f1uv, apron, False, rs, (low_h, low_w))
    n = len(flow_strip.plan_steps(low_h, low_w))
    ref = run_planned(ctx, f2y, f2uv, ("G",) * n, low_h=low_h, low_w=low_w,
                      rs=rs, is_hdr=False, apron=apron, h=h, w=w)
    sig = np.asarray(ref[3])
    plan = flow_strip.predict_plan(sig, low_h, low_w)
    assert plan[0] == "U"
    assert any(t != "G" for t in plan[1:])  # dense tiers actually engage
    got = run_planned(ctx, f2y, f2uv, plan, low_h=low_h, low_w=low_w,
                      rs=rs, is_hdr=False, apron=apron, h=h, w=w)
    # The planned run must agree with the pure-gather run everywhere.
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    assert int(got[2]) == int(ref[2])
    got_sig = np.asarray(got[3])
    nn = len(plan)
    np.testing.assert_array_equal(got_sig[:nn], sig[:nn])  # same dev counts
    assert flow_strip.first_invalid_step(plan, got_sig, low_h, low_w) is None
    # Prediction is a fixed point on identical content.
    assert flow_strip.predict_plan(got_sig, low_h, low_w) == plan


def test_mispredict_detected_and_repaired(rng):
    """An over-optimistic all-U plan on random content must be flagged by the
    validity counters, and the repaired plan must equal the gather result."""
    h, w, rs, low_h, low_w = 64, 96, 2, 16, 24
    f1y, f1uv = make_frame(rng, h, w)
    f2y, f2uv = make_frame(rng, h, w)
    apron = flow_strip.apron_for(low_h, low_w)
    ctx = full_ctx(f1y, f1uv, apron, False, rs, (low_h, low_w))
    n = len(flow_strip.plan_steps(low_h, low_w))
    bad_plan = ("U",) * n
    out = run_planned(ctx, f2y, f2uv, bad_plan, low_h=low_h, low_w=low_w,
                      rs=rs, is_hdr=False, apron=apron, h=h, w=w)
    bad = flow_strip.first_invalid_step(bad_plan, np.asarray(out[3]),
                                        low_h, low_w)
    assert bad is not None and bad >= 1  # step 0 is provably uniform
    fixed = flow_strip.repair_plan(bad_plan, bad)
    assert fixed[:bad] == bad_plan[:bad] and set(fixed[bad:]) == {"G"}
    got = run_planned(ctx, f2y, f2uv, fixed, low_h=low_h, low_w=low_w,
                      rs=rs, is_hdr=False, apron=apron, h=h, w=w)
    ref = run_planned(ctx, f2y, f2uv, ("G",) * n, low_h=low_h, low_w=low_w,
                      rs=rs, is_hdr=False, apron=apron, h=h, w=w)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    # The repaired plan itself validates.
    assert flow_strip.first_invalid_step(
        fixed, np.asarray(got[3]), low_h, low_w) is None


def test_graduated_mode_caps_bit_exact(rng):
    """M0/M1 (small static caps) equal the full-cap mode kernel whenever the
    deviant count fits their cap."""
    h, w, rs, low_h, low_w = 64, 96, 2, 16, 24
    f1y, f1uv = make_frame(rng, h, w)
    f2y, f2uv = make_frame(rng, h, w)
    apron = flow_strip.apron_for(low_h, low_w)
    ctx = full_ctx(f1y, f1uv, apron, False, rs, (low_h, low_w))
    window, step, iteration = 2, 0, 5
    # Window-constant plane: dominant offset with 3 deviant windows.
    n_wy, n_wx = low_h // window, low_w // window
    grid = np.full((2, n_wy, n_wx), 4, np.int16)
    grid[:, 1, 2] = (9, -9)
    grid[0, 3, 5] = -1
    grid[1, 6, 7] = 16
    offsets = np.repeat(np.repeat(grid, window, 1), window, 2)
    args = (ctx, jnp.asarray(f2y), jnp.asarray(f2uv), jnp.asarray(offsets),
            jnp.int32(9), jnp.int32(8), jnp.int32(6))
    kw = dict(window_size=window, res_scalar=rs, iteration=iteration,
              step=step, is_hdr=False, num_layers=16, apron=apron,
              dim_y=h, dim_x=w)
    want = flow_strip.delta_window_sums_strip(*args, **kw)
    for tier in ("M0", "M1", "M"):
        got = flow_strip.delta_window_sums_mode(
            *args, cap=flow_strip.tier_cap(tier, window, low_h, low_w), **kw)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"tier {tier}")


@pytest.mark.parametrize("step", [0, 1])
@pytest.mark.parametrize("tier", ["V0", "V1"])
def test_value_tier_matches_strip(rng, tier, step):
    """The value-bucket tier equals the exact strip kernel whenever the
    distinct-value count fits its cap — scattered multi-valued offsets, not
    just dominant+corrections."""
    h, w, rs, low_h, low_w = 64, 96, 2, 16, 24
    f1y, f1uv = make_frame(rng, h, w)
    f2y, f2uv = make_frame(rng, h, w)
    apron = flow_strip.apron_for(low_h, low_w)
    ctx = full_ctx(f1y, f1uv, apron, False, rs, (low_h, low_w))
    window, iteration = 2, 5
    n_wy, n_wx = low_h // window, low_w // window
    # 12 distinct values scattered over the window grid.
    pool = np.array([[0, 0], [4, -4], [9, 1], [-1, -9], [16, 16], [-16, 4],
                     [1, 0], [0, 1], [25, -25], [-4, -4], [9, 9], [2, -2]],
                    np.int16)
    pick = rng.integers(0, len(pool), (n_wy, n_wx))
    grid = pool[pick].transpose(2, 0, 1)
    offsets = np.repeat(np.repeat(grid, window, 1), window, 2)
    args = (ctx, jnp.asarray(f2y), jnp.asarray(f2uv), jnp.asarray(offsets),
            jnp.int32(9), jnp.int32(8), jnp.int32(6))
    kw = dict(window_size=window, res_scalar=rs, iteration=iteration,
              step=step, is_hdr=False, num_layers=16, apron=apron,
              dim_y=h, dim_x=w)
    want = flow_strip.delta_window_sums_strip(*args, **kw)
    packed = ((grid[0].astype(np.int32) << 16)
              | (grid[1].astype(np.int32) & 0xFFFF))
    cap = flow_strip.tier_cap(tier, window, low_h, low_w)
    vals, val_idx, n_dist = flow_strip._window_value_index(
        jnp.asarray(packed), cap)
    assert int(n_dist) == len(np.unique(packed)) <= cap
    got = flow_strip.delta_window_sums_values(*args, vals, val_idx,
                                              cap=cap, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_engine_planned_matches_gather_stream(rng):
    """Streaming: the planned engine's flows/warps equal a tier-free gather
    engine's across a pan + content-change stream, with mispredicts detected
    and repaired transparently."""
    h, w = 64, 96
    eng_p = OpticalFlowEngine(h, w, max_calc_res=16)
    eng_g = OpticalFlowEngine(h, w, max_calc_res=16)
    assert eng_p.tier_mode == "planned"
    eng_g.tier_mode = "gather"

    rng2 = np.random.default_rng(3)
    frames = []
    (f1, f2) = pan_pair(h, w, 4)[0], None
    base_y = np.random.default_rng(11).integers(0, 200, (h, w + 24), dtype=np.uint8)
    base_uv = np.random.default_rng(12).integers(0, 200, (h // 2, w + 24), dtype=np.uint8)
    for i in range(5):  # pan stream
        frames.append((base_y[:, i * 2:i * 2 + w].copy(),
                       base_uv[:, i * 2:i * 2 + w].copy()))
    # Abrupt content change (forces mispredicts on the settled plan).
    for _ in range(3):
        y = rng2.integers(0, 256, (h, w), dtype=np.uint8)
        uv = rng2.integers(0, 256, (h // 2, w), dtype=np.uint8)
        frames.append((y, uv))

    for y, uv in frames:
        eng_p.update_frame(y, uv)
        eng_g.update_frame(y, uv)
        if eng_p.frame_count >= 3:
            eng_p.calculate_optical_flow()
            eng_g.calculate_optical_flow()
            assert (eng_p.fetch_total_frame_delta()
                    == eng_g.fetch_total_frame_delta())
            py, puv = eng_p.warp_frames(0.5, 2)
            gy, guv = eng_g.warp_frames(0.5, 2)
            np.testing.assert_array_equal(np.asarray(py), np.asarray(gy))
            np.testing.assert_array_equal(np.asarray(puv), np.asarray(guv))
    # The settled pan plan used dense tiers at some point, and the random
    # tail forced at least one detected+repaired mispredict.
    assert eng_p.plan_mispredicts >= 1
    assert any(t != "G" for p in eng_p._plans.values() for t in p)


def test_engine_settle_plan_fixed_point(rng):
    h, w = 64, 96
    eng = OpticalFlowEngine(h, w, max_calc_res=16)
    (f1y, f1uv), (f2y, f2uv) = pan_pair(h, w, 4)
    plan = eng.settle_plan(jnp.asarray(f1y), jnp.asarray(f1uv),
                           jnp.asarray(f2y), jnp.asarray(f2uv))
    assert plan and plan[0] == "U"
    assert eng._plans[eng._plan_key()] == plan
    # Settling again from the cached plan is an immediate fixed point.
    assert eng.settle_plan(jnp.asarray(f1y), jnp.asarray(f1uv),
                           jnp.asarray(f2y), jnp.asarray(f2uv)) == plan

"""Pallas row-band warp kernel vs the strip-mined twin: bit-exact equality in
interpret mode across modes, bit depths, res scalars, and displacement extremes
(ref behavior: warpFrameKernelSDR.h:116-184)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hopperrender_tpu.ops import warp_band, warp_strip

from conftest import make_frame


def build_inputs(rng, h, w, rs, is_hdr, apron, max_mag):
    low_h, low_w = h >> rs, w >> rs
    y1, uv1 = make_frame(rng, h, w, is_hdr)
    y2, uv2 = make_frame(rng, h, w, is_hdr)
    flow = rng.integers(-max_mag, max_mag + 1, (2, low_h, low_w)).astype(np.int16)
    c1 = warp_strip.build_warp_context(jnp.asarray(y1), jnp.asarray(uv1),
                                       apron=apron, is_hdr=is_hdr)
    c2 = warp_strip.build_warp_context(jnp.asarray(y2), jnp.asarray(uv2),
                                       apron=apron, is_hdr=is_hdr)
    return c1, c2, jnp.asarray(flow)


def run_both(c1, c2, flow, t, black, white, *, rs, mode, is_hdr, h, w, apron,
             chain_bounds=(16, 16)):
    ys, uvs = warp_strip.warp_frame_strip(
        c1, c2, flow, jnp.float32(t), jnp.float32(black), jnp.float32(white),
        res_scalar=rs, mode=mode, is_hdr=is_hdr, dim_y=h, dim_x=w, apron=apron)
    yb, uvb = warp_band.warp_frame_band(
        c1, c2, flow, jnp.float32(t), jnp.float32(black), jnp.float32(white),
        res_scalar=rs, mode=mode, is_hdr=is_hdr, dim_y=h, dim_x=w, apron=apron,
        interpret=True, chain_bounds=chain_bounds)
    return (np.asarray(ys), np.asarray(uvs)), (np.asarray(yb), np.asarray(uvb))


@pytest.mark.parametrize("is_hdr", [False, True])
@pytest.mark.parametrize("rs", [2, 3])
@pytest.mark.parametrize("mode", [0, 1, 2])
def test_band_matches_strip(rng, is_hdr, rs, mode):
    h, w, apron = 64, 128, 32
    c1, c2, flow = build_inputs(rng, h, w, rs, is_hdr, apron, max_mag=25)
    black = 16.0 * (256 if is_hdr else 1)
    white = 235.0 * (256 if is_hdr else 1)
    (ys, uvs), (yb, uvb) = run_both(c1, c2, flow, 0.375, black, white,
                                    rs=rs, mode=mode, is_hdr=is_hdr,
                                    h=h, w=w, apron=apron)
    np.testing.assert_array_equal(yb, ys)
    np.testing.assert_array_equal(uvb, uvs)


@pytest.mark.parametrize("t", [0.0, 0.5, 0.96875])
def test_band_blending_scalars(rng, t):
    h, w, apron = 64, 128, 32
    c1, c2, flow = build_inputs(rng, h, w, 2, False, apron, max_mag=10)
    (ys, uvs), (yb, uvb) = run_both(c1, c2, flow, t, 0.0, 255.0,
                                    rs=2, mode=2, is_hdr=False,
                                    h=h, w=w, apron=apron)
    np.testing.assert_array_equal(yb, ys)
    np.testing.assert_array_equal(uvb, uvs)


def test_band_extreme_displacements(rng):
    """Displacements at the apron bound exercise the clamped lane window and
    both sub-element parities."""
    h, w, apron = 64, 128, 48
    rs = 2
    low_h, low_w = h >> rs, w >> rs
    y1, uv1 = make_frame(rng, h, w, False)
    y2, uv2 = make_frame(rng, h, w, False)
    # All-corners flow: +/- apron-1 plus odd values for parity coverage.
    vals = np.array([-(apron - 1), -(apron - 2), -1, 0, 1, apron - 2, apron - 1])
    flow = rng.choice(vals, (2, low_h, low_w)).astype(np.int16)
    c1 = warp_strip.build_warp_context(jnp.asarray(y1), jnp.asarray(uv1),
                                       apron=apron, is_hdr=False)
    c2 = warp_strip.build_warp_context(jnp.asarray(y2), jnp.asarray(uv2),
                                       apron=apron, is_hdr=False)
    (ys, uvs), (yb, uvb) = run_both(c1, c2, jnp.asarray(flow), 1.0, 0.0, 255.0,
                                    rs=rs, mode=2, is_hdr=False,
                                    h=h, w=w, apron=apron)
    np.testing.assert_array_equal(yb, ys)
    np.testing.assert_array_equal(uvb, uvs)


def test_band_geometry_predicate():
    ok = warp_band.band_geometry_ok
    # The production configs must be band-compatible.
    assert ok(res_scalar=3, is_hdr=True, dim_y=2160, dim_x=3840, apron=576)
    assert ok(res_scalar=3, is_hdr=False, dim_y=2160, dim_x=3840, apron=576)
    assert ok(res_scalar=2, is_hdr=False, dim_y=1080, dim_x=1920, apron=576)
    # res_scalar 1 (480p class) is geometrically valid via the slot16 layout;
    # the ENGINE additionally gates it behind flow_engine._band_rs_enabled
    # until the Mosaic lowering is chip-validated (tpu_band_check.py rs1).
    assert ok(res_scalar=1, is_hdr=False, dim_y=480, dim_x=854, apron=576)
    assert not ok(res_scalar=0, is_hdr=False, dim_y=240, dim_x=426, apron=32)


def _smooth_flow(rng, low_h, low_w, base=(9, -13), wobble=1):
    """Near-constant flow: per-cell wobble of +-`wobble` around a base — the
    fast path's target content (blurred flow fields are locally smooth)."""
    f = np.stack([
        np.full((low_h, low_w), base[0], np.int16),
        np.full((low_h, low_w), base[1], np.int16),
    ])
    f += rng.integers(-wobble, wobble + 1, f.shape).astype(np.int16)
    return f


@pytest.mark.parametrize("is_hdr", [False, True])
@pytest.mark.parametrize("rs", [2, 3])
@pytest.mark.parametrize("mode", [0, 1, 2])
def test_band_fast_path_matches_strip(rng, is_hdr, rs, mode):
    """Smooth flow routes (nearly) every subtile through the select-chain fast
    path; outputs must stay bit-exact vs the strip twin."""
    h, w, apron = 64, 256, 32
    low_h, low_w = h >> rs, w >> rs
    y1, uv1 = make_frame(rng, h, w, is_hdr)
    y2, uv2 = make_frame(rng, h, w, is_hdr)
    flow = jnp.asarray(_smooth_flow(rng, low_h, low_w))
    c1 = warp_strip.build_warp_context(jnp.asarray(y1), jnp.asarray(uv1),
                                       apron=apron, is_hdr=is_hdr)
    c2 = warp_strip.build_warp_context(jnp.asarray(y2), jnp.asarray(uv2),
                                       apron=apron, is_hdr=is_hdr)
    (ys, uvs), (yb, uvb) = run_both(c1, c2, flow, 0.625, 0.0,
                                    65280.0 if is_hdr else 255.0,
                                    rs=rs, mode=mode, is_hdr=is_hdr,
                                    h=h, w=w, apron=apron)
    np.testing.assert_array_equal(yb, ys)
    np.testing.assert_array_equal(uvb, uvs)


def test_band_mixed_fast_slow_tiles(rng):
    """A flow that is smooth except for one violent region: fast and slow
    subtiles must coexist bit-exactly within one kernel launch."""
    h, w, apron = 64, 256, 48
    rs = 3
    low_h, low_w = h >> rs, w >> rs
    y1, uv1 = make_frame(rng, h, w, False)
    y2, uv2 = make_frame(rng, h, w, False)
    flow = _smooth_flow(rng, low_h, low_w, base=(4, 6), wobble=0)
    flow[:, :, : low_w // 2] = rng.integers(
        -(apron - 1), apron, (2, low_h, low_w // 2)).astype(np.int16)
    c1 = warp_strip.build_warp_context(jnp.asarray(y1), jnp.asarray(uv1),
                                       apron=apron, is_hdr=False)
    c2 = warp_strip.build_warp_context(jnp.asarray(y2), jnp.asarray(uv2),
                                       apron=apron, is_hdr=False)
    (ys, uvs), (yb, uvb) = run_both(c1, c2, jnp.asarray(flow), 0.25, 0.0,
                                    255.0, rs=rs, mode=2, is_hdr=False,
                                    h=h, w=w, apron=apron)
    np.testing.assert_array_equal(yb, ys)
    np.testing.assert_array_equal(uvb, uvs)


def test_fast_tables_certify_smooth_flow():
    """The per-subtile ok bit must engage for smooth flow (else the fast path
    silently never runs) and must clear when residual bounds are exceeded."""
    n_cr, n_tiles, cpt = 8, 1, 32
    cps, cb, cell, per32 = 32, 4, 8, 2
    smooth_r = np.full((n_cr, n_tiles * cpt), 40, np.int32)
    smooth_p = (np.arange(n_tiles * cpt, dtype=np.int32)[None] * cell
                + 7 + np.zeros((n_cr, 1), np.int32))
    fmap, fscal = warp_band._fast_tables(
        jnp.asarray(smooth_r), jnp.asarray(smooth_p), None, cell=cell,
        per32=per32, cb=cb, cps=cps, band_rows=64, n_tiles=n_tiles, cpt=cpt,
        c32_alloc=1024)
    assert bool((np.asarray(fscal) < 0).all()), "smooth tiles must certify"
    wild_r = smooth_r.copy()
    wild_r[0, 0] = 40 + warp_band.RES_V + 8   # row spread past the bound
    _, fscal2 = warp_band._fast_tables(
        jnp.asarray(wild_r), jnp.asarray(smooth_p), None, cell=cell,
        per32=per32, cb=cb, cps=cps, band_rows=64, n_tiles=n_tiles, cpt=cpt,
        c32_alloc=1024)
    assert not bool((np.asarray(fscal2) < 0).all())


@pytest.mark.parametrize("bounds", [(8, 8), (32, 32)])
@pytest.mark.parametrize("is_hdr", [False, True])
@pytest.mark.parametrize("flavor", ["smooth", "scattered", "mixed"])
def test_band_short_chain_bounds_match_strip(rng, is_hdr, flavor, bounds):
    """Non-default chain bounds: identical outputs on every flow — the
    per-subtile certificate is computed against the active bounds. (8,8)
    reroutes wide subtiles to the per-cell slow path; (32,32) certifies
    scattered flow (spread <= 24+7) through the fast path — the adversarial
    noise-content lever. Covers all-fast (uniform flow), widely scattered,
    and the mixed boundary."""
    h, w, rs, apron = 64, 128, 2, 32
    low_h, low_w = h >> rs, w >> rs
    c1, c2, _ = build_inputs(rng, h, w, rs, is_hdr, apron, max_mag=1)
    if flavor == "smooth":
        flow = np.broadcast_to(np.array([7, -5], np.int16)[:, None, None],
                               (2, low_h, low_w)).copy()
    elif flavor == "scattered":
        flow = rng.integers(-25, 26, (2, low_h, low_w)).astype(np.int16)
    else:  # spread just beyond 8: fails (8,8) certs, passes (16,16) ones
        base = np.array([3, 2], np.int16)[:, None, None]
        jit8 = rng.integers(0, 2, (2, low_h, low_w)).astype(np.int16) * 9
        flow = (base + jit8).astype(np.int16)
    flow = jnp.asarray(flow)
    black, white = 16.0, 235.0
    (ys, uvs), (yb, uvb) = run_both(c1, c2, flow, 0.375, black, white,
                                    rs=rs, mode=2, is_hdr=is_hdr,
                                    h=h, w=w, apron=apron,
                                    chain_bounds=bounds)
    np.testing.assert_array_equal(yb, ys)
    np.testing.assert_array_equal(uvb, uvs)

@pytest.mark.parametrize("is_hdr", [False, True])
@pytest.mark.parametrize("rs", [2, 3])
@pytest.mark.parametrize("mode", [0, 1, 2])
def test_band_apron_tier_matches_full(rng, is_hdr, rs, mode):
    """Host-planned apron tier: with the pack layout at the FULL apron, a
    kernel running at a smaller effective apron (shifted DMA windows) must be
    bit-identical whenever maxabs(flow) <= apron_eff. apron=64 vs aw=32
    exercises a non-trivial lane-shift residue for every per32."""
    h, w, apron = 64, 128, 64
    c1, c2, flow = build_inputs(rng, h, w, rs, is_hdr, apron, max_mag=31)
    kw = dict(res_scalar=rs, mode=mode, is_hdr=is_hdr, dim_y=h, dim_x=w,
              apron=apron, interpret=True)
    args = (flow, jnp.float32(0.375), jnp.float32(16.0), jnp.float32(235.0))
    want = warp_band.warp_frame_band(c1, c2, *args, **kw)
    got = warp_band.warp_frame_band(c1, c2, *args, apron_eff=32, **kw)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_band_apron_tier_with_prepack(rng):
    """The production path: per-source pre-pack at the full bucket apron,
    kernel at the tier — the pre-packed fields must be consumed (no repack)
    and the output must stay byte-identical. Also covers displacements at
    the tier bound (|flow| == apron_eff)."""
    h, w, rs, apron = 64, 128, 2, 64
    low_h, low_w = h >> rs, w >> rs
    rng2 = np.random.default_rng(7)
    y1, uv1 = make_frame(rng2, h, w, False)
    y2, uv2 = make_frame(rng2, h, w, False)
    vals = np.array([-32, -31, -1, 0, 1, 31, 32])
    flow = jnp.asarray(rng2.choice(vals, (2, low_h, low_w)).astype(np.int16))
    kw = dict(res_scalar=rs, is_hdr=False, dim_y=h, dim_x=w, apron=apron)
    c1 = warp_strip.build_warp_context(jnp.asarray(y1), jnp.asarray(uv1),
                                       apron=apron, is_hdr=False)
    c2 = warp_strip.build_warp_context(jnp.asarray(y2), jnp.asarray(uv2),
                                       apron=apron, is_hdr=False)
    p1 = warp_band.pack_band_context(c1, **kw)
    p2 = warp_band.pack_band_context(c2, **kw)
    args = (flow, jnp.float32(0.625), jnp.float32(0.0), jnp.float32(255.0))
    want = warp_band.warp_frame_band(c1, c2, *args, mode=2, interpret=True,
                                     **kw)
    got = warp_band.warp_frame_band(p1, p2, *args, mode=2, interpret=True,
                                    apron_eff=32, **kw)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_pick_apron():
    pick = warp_band.pick_apron
    assert pick(None, 576) == 576          # unknown bound -> full apron
    assert pick(3, 576) == 32
    assert pick(32, 576) == 32             # bound == tier is sound
    assert pick(33, 576) == 64
    assert pick(200, 576) == 256
    assert pick(300, 576) == 576
    assert pick(700, 576) == 576           # out of range -> full
    assert pick(5, 32) == 32               # never exceeds the bucket apron
    assert pick(40, 48) == 48


def test_band_prepacked_context_identical(rng):
    """pack_band_context pre-packs the u32 source layout per source frame;
    warp_frame_band must produce byte-identical output consuming the packed
    fields (and fall back to repacking when shapes mismatch)."""
    h, w, rs, apron = 64, 128, 2, 32
    c1, c2, flow = build_inputs(rng, h, w, rs, False, apron, max_mag=20)
    kw = dict(res_scalar=rs, is_hdr=False, dim_y=h, dim_x=w, apron=apron)
    p1 = warp_band.pack_band_context(c1, **kw)
    p2 = warp_band.pack_band_context(c2, **kw)
    assert "wpack_y" in p1 and "wpack_uv" in p1
    args = (flow, jnp.float32(0.375), jnp.float32(16.0), jnp.float32(235.0))
    want = warp_band.warp_frame_band(c1, c2, *args, mode=2, interpret=True,
                                     **kw)
    got = warp_band.warp_frame_band(p1, p2, *args, mode=2, interpret=True,
                                    **kw)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
    # Mismatched pack shapes (e.g. stale apron) must be ignored, not consumed.
    stale = dict(p1, wpack_y=p1["wpack_y"][:, :-8])
    got2 = warp_band.warp_frame_band(stale, p2, *args, mode=2, interpret=True,
                                     **kw)
    np.testing.assert_array_equal(np.asarray(got2[0]), np.asarray(want[0]))


def test_chain32_certifies_scattered_noise_flow(rng):
    """The adversarial-content claim behind (32,32) bounds: random |flow|<=12
    (bench.py --flow-content random) must certify EVERY subtile's fast path —
    row residual spread <= 2*12+7 < 32 — so noise content never rides the
    per-cell slow chains. Checked through the real table builder on a 4K-like
    band geometry (rs=3 HDR)."""
    import jax.numpy as jnp

    h, w, rs, is_hdr, apron = 256, 512, 3, True, 64
    low_h, low_w = h >> rs, w >> rs
    flow = jnp.asarray(
        rng.integers(-12, 13, (2, low_h, low_w)).astype(np.int16))
    y1, uv1 = make_frame(rng, h, w, is_hdr)
    c1 = warp_strip.build_warp_context(jnp.asarray(y1), jnp.asarray(uv1),
                                       apron=apron, is_hdr=is_hdr)
    # debug_prep_only forces the XLA table computation without the kernel.
    # Instead of running it, reach for the tables directly: replicate the
    # warp's Y-plane table build at chain_bounds=(32,32).
    from hopperrender_tpu.ops.warp_strip import _cell_displacements
    geoms = warp_band._geometries(res_scalar=rs, is_hdr=is_hdr, dim_y=h,
                                  dim_x=w, apron=apron,
                                  vmem_budget=10 << 20)
    (cell, per32, w32, gy), _ = geoms
    band_rows, n_tiles, c32_full, _ = gy
    tile_w32 = w32 // n_tiles
    # t near 1: dy12 = round(flow * t) spans the full +-12, so the
    # per-subtile row spread is 24 and the 8-align slack pushes residuals to
    # 31 — the exact (32,32) boundary. (At t=0.5 displacements halve and even
    # (16,16) certifies; the tier matters at the cadence's outer phases.)
    dx12, dy12, *_ = _cell_displacements(flow, jnp.float32(0.96875), rs,
                                         low_h, low_w)
    n_cy, n_cx = h // cell, w // cell
    cpt = (tile_w32 * per32) // cell
    row_idx = np.clip(np.arange(n_cy), 0, low_h - 1)
    col_idx = np.clip(np.arange(n_cx), 0, low_w - 1)
    dyc = np.asarray(dy12)[row_idx][:, col_idx]
    dxc = np.asarray(dx12)[row_idx][:, col_idx]
    cx_in_tile = np.arange(n_cx) % cpt
    r = jnp.asarray(dyc + apron)
    p = jnp.asarray(cx_in_tile[None, :] * cell + dxc + apron)
    _, fscal = warp_band._fast_tables(
        r, p, None, cell=cell, per32=per32, cb=cell // per32,
        cps=(128 * per32) // cell, band_rows=band_rows, n_tiles=n_tiles,
        cpt=cpt, c32_alloc=512, res_v=32, res_h=32)
    ok_frac = float((np.asarray(fscal) < 0).mean())
    assert ok_frac == 1.0, f"only {ok_frac:.2%} of subtiles certified"
    # And at the (16,16) default the SAME flow must fail broadly (the reason
    # the tier exists).
    _, fscal16 = warp_band._fast_tables(
        r, p, None, cell=cell, per32=per32, cb=cell // per32,
        cps=(128 * per32) // cell, band_rows=band_rows, n_tiles=n_tiles,
        cpt=cpt, c32_alloc=512, res_v=16, res_h=16)
    assert float((np.asarray(fscal16) < 0).mean()) < 0.5


@pytest.mark.parametrize("is_hdr", [False, True])
@pytest.mark.parametrize("mode", [0, 1, 2])
def test_band_res_scalar1_matches_strip(rng, is_hdr, mode):
    """res_scalar 1 (the 480p class, 2-px cells): HDR packs natively (2 u16
    per lane -> one cell per lane); SDR uses the 16-bit slot layout. Both
    must be bit-exact vs the strip twin — this is the layout that makes the
    band kernel cover EVERY production config's modes 0/1/2."""
    h, w, apron, rs = 64, 256, 32, 1
    c1, c2, flow = build_inputs(rng, h, w, rs, is_hdr, apron, max_mag=25)
    black = 16.0 * (256 if is_hdr else 1)
    white = 235.0 * (256 if is_hdr else 1)
    (ys, uvs), (yb, uvb) = run_both(c1, c2, flow, 0.375, black, white,
                                    rs=rs, mode=mode, is_hdr=is_hdr,
                                    h=h, w=w, apron=apron)
    np.testing.assert_array_equal(yb, ys)
    np.testing.assert_array_equal(uvb, uvs)


def test_band_res_scalar1_prepack_tier(rng):
    """rs=1 with the production extras stacked: per-source pre-pack consumed
    + apron tier + (32,32) chain bounds, bit-exact vs strip."""
    h, w, apron, rs = 64, 256, 64, 1
    c1, c2, flow = build_inputs(rng, h, w, rs, False, apron, max_mag=12)
    kw = dict(res_scalar=rs, is_hdr=False, dim_y=h, dim_x=w, apron=apron)
    p1 = warp_band.pack_band_context(c1, **kw)
    p2 = warp_band.pack_band_context(c2, **kw)
    assert "wpack_y" in p1
    args = (flow, jnp.float32(0.96875), jnp.float32(0.0), jnp.float32(255.0))
    want = warp_strip.warp_frame_strip(c1, c2, *args, mode=2, **kw)
    got = warp_band.warp_frame_band(p1, p2, *args, mode=2, interpret=True,
                                    apron_eff=32, chain_bounds=(32, 32), **kw)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))


@pytest.mark.parametrize("is_hdr", [False, True])
def test_band_res_scalar1_odd_cell_count(rng, is_hdr):
    """rs=1 at a width with an ODD x-cell count (w = 2 mod 4, the 854-wide
    480p class): the last UV supercell holds only one real cell, which a
    floor supercell count dropped entirely — its pair then came from an
    edge-pad supercell carrying the wrong flow column (round-5 chip gate:
    cols 852/853 mismatched at 480x854). Pins the ceil supercell count."""
    h, w, apron, rs = 64, 214, 32, 1   # n_cx = 107 (odd), n_scx = 54
    assert (w // 2) % 2 == 1
    c1, c2, flow = build_inputs(rng, h, w, rs, is_hdr, apron, max_mag=25)
    black = 16.0 * (256 if is_hdr else 1)
    white = 235.0 * (256 if is_hdr else 1)
    (ys, uvs), (yb, uvb) = run_both(c1, c2, flow, 0.375, black, white,
                                    rs=rs, mode=2, is_hdr=is_hdr,
                                    h=h, w=w, apron=apron)
    np.testing.assert_array_equal(yb, ys)
    np.testing.assert_array_equal(uvb, uvs)

"""Multi-chip sharding on the virtual 8-device CPU mesh: numerical equality with the
single-device path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from conftest import make_flow, make_frame
from hopperrender_tpu.ops import flow as flow_ops
from hopperrender_tpu.ops import warp as warp_ops
from hopperrender_tpu.parallel.mesh import make_multichip_step


def make_mesh(dp, sp):
    devs = np.array(jax.devices()[: dp * sp]).reshape(dp, sp)
    return Mesh(devs, ("dp", "sp"))


@pytest.mark.parametrize("dp,sp", [(1, 1), (1, 4), (2, 4), (8, 1), (1, 8)])
def test_multichip_matches_single_device(rng, dp, sp):
    h, w = 32, 64
    rs = 1
    low_h, low_w = 16, 32
    B = dp  # one stream per dp shard
    is_hdr = False

    streams = []
    for _ in range(B):
        f0 = make_frame(rng, h, w)
        f1 = make_frame(rng, h, w)
        f2 = make_frame(rng, h, w)
        fl = make_flow(rng, low_h, low_w, max_mag=5)
        streams.append((f0, f1, f2, fl))

    def stack(i, plane):
        return jnp.stack([jnp.asarray(s[i][plane]) for s in streams])

    f0y, f0uv = stack(0, 0), stack(0, 1)
    f1y, f1uv = stack(1, 0), stack(1, 1)
    f2y, f2uv = stack(2, 0), stack(2, 1)
    flow_prev = jnp.stack([jnp.asarray(s[3]) for s in streams])

    mesh = make_mesh(dp, sp)
    step = make_multichip_step(mesh, h, w, low_h=low_h, low_w=low_w,
                               res_scalar=rs, is_hdr=is_hdr, mode=2)
    radius, dsc, nsc = jnp.int32(9), jnp.int32(8), jnp.int32(6)
    t, black, white = jnp.float32(0.375), jnp.float32(0.0), jnp.float32(255.0)
    out_y, out_uv, blurred, delta = step(
        f0y, f0uv, f1y, f1uv, f2y, f2uv, flow_prev, radius, dsc, nsc, t, black, white)

    # Single-device reference per stream.
    for b, (f0, f1, f2, fl) in enumerate(streams):
        _, blur_1d, delta_1d = flow_ops.pyramid_flow(
            jnp.asarray(f1[0]), jnp.asarray(f1[1]), jnp.asarray(f2[0]), jnp.asarray(f2[1]),
            radius, dsc, nsc, low_h=low_h, low_w=low_w, res_scalar=rs, is_hdr=is_hdr)
        wy, wuv = warp_ops.warp_frame(
            jnp.asarray(f0[0]), jnp.asarray(f0[1]), jnp.asarray(f1[0]), jnp.asarray(f1[1]),
            jnp.asarray(fl), t, black, white, res_scalar=rs, mode=2, is_hdr=is_hdr)
        np.testing.assert_array_equal(np.asarray(blurred[b]), np.asarray(blur_1d))
        assert int(delta[b]) == int(delta_1d)
        np.testing.assert_array_equal(np.asarray(out_y[b]), np.asarray(wy))
        np.testing.assert_array_equal(np.asarray(out_uv[b]), np.asarray(wuv))


def test_row_offset_warp_equivalence(rng):
    """warp_frame_plane with out_rows/row_offset must tile the full-plane result."""
    h, w = 16, 24
    s12y, s12uv = make_frame(rng, h, w)
    s21y, s21uv = make_frame(rng, h, w)
    fl = jnp.asarray(make_flow(rng, 8, 12, max_mag=6))
    t = jnp.float32(0.5)
    black, white = jnp.float32(0.0), jnp.float32(255.0)
    args = (jnp.asarray(s12y), jnp.asarray(s12uv), jnp.asarray(s21y), jnp.asarray(s21uv),
            fl, t, black, white)
    kw = dict(res_scalar=1, mode=6, is_hdr=False)
    full = warp_ops.warp_frame_plane(*args, cz=0, **kw)
    bands = [warp_ops.warp_frame_plane(*args, jnp.int32(r), cz=0, out_rows=4, **kw)
             for r in range(0, h, 4)]
    np.testing.assert_array_equal(np.asarray(jnp.concatenate(bands)), np.asarray(full))


def test_layer_offset_delta_sums_equivalence(rng):
    """Sharded layer ranges must tile the full cost volume."""
    h, w = 16, 24
    low_h, low_w = 8, 12
    f1y, f1uv = make_frame(rng, h, w)
    f2y, f2uv = make_frame(rng, h, w)
    offsets = jnp.asarray(make_flow(rng, low_h, low_w, max_mag=4))
    args = (jnp.asarray(f1y), jnp.asarray(f1uv), jnp.asarray(f2y), jnp.asarray(f2uv),
            offsets, jnp.int32(9), jnp.int32(8), jnp.int32(6))
    kw = dict(window_size=4, res_scalar=1, iteration=4, step=0, is_hdr=False)
    full = flow_ops.delta_window_sums(*args, **kw)
    parts = [flow_ops.delta_window_sums(*args, jnp.int32(off), num_layers=4, **kw)
             for off in range(0, 16, 4)]
    np.testing.assert_array_equal(np.asarray(jnp.concatenate(parts)), np.asarray(full))

"""Probe 2: primitives for a residual-select warp/flow fast path.

The per-cell chain costs ~60-140 cyc and moves 128 useful bytes (chain_probe
results). A tile-granular fast path would use ONE coarse displacement per
(8,128) output tile plus small per-cell residuals resolved densely:
  vertical: K_v compare-selects over band rows (per-lane row residual)
  horizontal: K_h static lane-slices of a wide register (per-lane col residual)
This probe measures those building blocks per tile (slope over a runtime loop
count, same methodology as chain_probe).
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 512
ROWS, W32 = 512, 1024


def make_kernel(variant: str):
    KV = 17   # vertical residual options (+-8 rows)
    KH = 17   # horizontal residual options (+-8 lanes)

    def kernel(n_ref, tab_ref, band_ref, res_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        def body(i, acc):
            j = i & (T - 1)
            r0 = tab_ref[0, j]
            c = tab_ref[1, j]
            c32 = c >> 2
            la = pl.multiple_of(jnp.minimum(c32 & ~127, W32 - 256), 128)
            ra = pl.multiple_of((r0 >> 3) << 3, 8)

            if variant == "slice_static":
                # one static lane-slice of a (8,256) value
                w = band_ref[pl.ds(ra, 8), pl.ds(la, 256)]
                return acc ^ w[:, 37:165]
            if variant == "slice_static_x17":
                w = band_ref[pl.ds(ra, 8), pl.ds(la, 256)]
                r = acc
                for s in range(KH):
                    r = r ^ w[:, 8 + s:136 + s]
                return r
            if variant == "vsel_x17":
                # vertical residual select: KV row-groups, compare+merge
                dy = res_ref[:]           # (8,128) per-lane residual 0..KV-1
                r = acc
                for s in range(KV):
                    w = band_ref[pl.ds(ra + 8 * (s % 3), 8), pl.ds(la, 128)]
                    r = jnp.where(dy == s, w, r)
                return r
            if variant == "fastpath_tile":
                # full simulated fast path: load (24,256); vertical KV selects
                # from rolled row views; horizontal KH static slices w/ select
                dy = res_ref[:]
                w0 = band_ref[pl.ds(ra, 8), pl.ds(la, 256)]
                w1 = band_ref[pl.ds(ra + 8, 8), pl.ds(la, 256)]
                w2 = band_ref[pl.ds(ra + 16, 8), pl.ds(la, 256)]
                vert = jnp.zeros((8, 256), jnp.uint32)
                for s in range(KV):
                    src = (w0, w1, w2)[s % 3]
                    vert = jnp.where((dy == s % KV)[:, :128], src, vert) \
                        if False else jnp.where(
                            jnp.concatenate([dy == s, dy == s], axis=1),
                            src, vert)
                r = acc
                for s in range(KH):
                    r = jnp.where(dy == s, vert[:, s:s + 128], r)
                return r
            if variant == "transpose8":
                w = band_ref[pl.ds(ra, 8), pl.ds(la, 128)]
                return acc ^ w.T[:8, :128] if False else acc ^ jnp.transpose(
                    w)[:8, :128]
            if variant in ("dyngather_ax0_8", "dyngather_ax0_32",
                           "dyngather_ax0_256", "dyngather_ax1_8",
                           "dyngather_ax1_32"):
                rows = {"dyngather_ax0_8": 8, "dyngather_ax0_32": 32,
                        "dyngather_ax0_256": 256, "dyngather_ax1_8": 8,
                        "dyngather_ax1_32": 32}[variant]
                axis = 0 if "ax0" in variant else 1
                w = band_ref[pl.ds(ra & ~31, rows), pl.ds(la, 128)]
                idx = (res_ref[:] + r0)[:rows % 8 + 8, :] if False else None
                ii = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), axis)
                jj = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1 - axis)
                dyn = (ii + jj + r0) % (rows if axis == 0 else 128)
                g = jnp.take_along_axis(w, dyn, axis=axis)
                return acc ^ g[:8, :128]
            if variant == "cond_branch":
                w = jax.lax.cond(
                    (r0 & 1) == 0,
                    lambda: band_ref[pl.ds(ra, 8), pl.ds(la, 128)],
                    lambda: band_ref[pl.ds(ra + 8, 8), pl.ds(la, 128)])
                return acc ^ w
            raise ValueError(variant)

        n = n_ref[0, 0]
        acc = jnp.zeros((8, 128), jnp.uint32)
        acc = jax.lax.fori_loop(0, n, body, acc)
        out_ref[:] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("variant",))
def run(n, tab, band, res, *, variant: str):
    return pl.pallas_call(
        make_kernel(variant),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
    )(n, tab, band, res)


def main():
    variants = sys.argv[1:] or [
        "slice_static", "slice_static_x17", "vsel_x17", "fastpath_tile",
        "transpose8", "cond_branch", "dyngather_ax0_8", "dyngather_ax0_32", "dyngather_ax0_256", "dyngather_ax1_8", "dyngather_ax1_32",
    ]
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    band = jnp.asarray(rng.integers(0, 2**32, (ROWS, W32), dtype=np.uint32))
    hz = 940e6

    def tab_for(salt):
        t = np.stack([
            rng.integers(0, ROWS - 32, T),
            rng.integers(0, (W32 - 64) * 4, T),
            rng.integers(0, 8, T),
        ]).astype(np.int32)
        t[0, 0] = salt % (ROWS - 32)
        return jnp.asarray(t)

    res = jnp.asarray(rng.integers(0, 17, (8, 128), dtype=np.int32))
    n1, n2 = 20_000, 120_000
    salt = 0
    for v in variants:
        try:
            times = {}
            for n in (n1, n2):
                nn = jnp.full((1, 1), n, jnp.int32)
                np.asarray(run(nn, tab_for(salt), band, res, variant=v))
                salt += 1
                best = 1e9
                for _ in range(3):
                    tb = tab_for(salt); salt += 1
                    t0 = time.perf_counter()
                    np.asarray(run(nn, tb, band, res, variant=v))
                    best = min(best, time.perf_counter() - t0)
                times[n] = best
            per = (times[n2] - times[n1]) / (n2 - n1)
            print(f"{v:18s} {per * 1e9:9.1f} ns/iter  ~{per * hz:7.1f} cyc"
                  f"  (t{n1//1000}k={times[n1]*1e3:.1f}ms t{n2//1000}k="
                  f"{times[n2]*1e3:.1f}ms)", flush=True)
        except Exception as e:
            print(f"{v:18s} FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)


if __name__ == "__main__":
    main()

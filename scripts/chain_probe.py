"""Per-chain cost probe on the real chip: what does one dynamic fetch-realign
chain (the warp band kernel's fetch_cell / the planned flow gather kernel's
inner loop) actually cost, and where does the time go?

Each variant runs N chains in a fori_loop inside ONE Pallas kernel; N is a
runtime scalar so one executable serves all N (slope over N = cycles/chain
with loop overhead and memoization excluded). Offsets come from an SMEM table
(realistic scalar-unit load), salted per call to beat the runtime's
(executable, inputs) memoization.

Usage: python scripts/chain_probe.py [variant ...]
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 512          # offset table entries
ROWS, W32 = 512, 1024   # VMEM band: 2 MB u32


def make_kernel(variant: str):
    def kernel(n_ref, tab_ref, band_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        def body(i, acc):
            j = i & (T - 1)
            r0 = tab_ref[0, j]                  # 0..ROWS-16
            c = tab_ref[1, j]                   # byte col, 0..(W32-64)*4
            t_sub = tab_ref[2, j] & 7           # target sublane
            c32 = c >> 2
            sub = c & 3
            la = pl.multiple_of(jnp.minimum(c32 & ~127, W32 - 256), 128)
            ra = pl.multiple_of((r0 >> 3) << 3, 8)
            if variant == "empty":
                return acc + r0.astype(jnp.uint32)
            if variant == "smem_only":
                return acc + (r0 + c + t_sub).astype(jnp.uint32)
            if variant == "load8x128":
                w = band_ref[pl.ds(ra, 8), pl.ds(la, 128)]
                return acc ^ w
            if variant == "load8x256":
                w = band_ref[pl.ds(ra, 8), pl.ds(la, 256)]
                return acc ^ w[:, :128]
            if variant == "load16x256":
                w = band_ref[pl.ds(ra, 16), pl.ds(la, 256)]
                return acc ^ w[:8, :128]
            if variant == "roll0":
                w = band_ref[pl.ds(ra, 16), pl.ds(la, 256)]
                w = pltpu.roll(w, (16 - (r0 - ra)) & 15, axis=0)[:8]
                return acc ^ w[:, :128]
            if variant == "roll0_static":
                w = band_ref[pl.ds(ra, 16), pl.ds(la, 256)]
                w = pltpu.roll(w, 5, axis=0)[:8]
                return acc ^ w[:, :128]
            if variant == "roll1":
                w = band_ref[pl.ds(ra, 8), pl.ds(la, 256)]
                s = jnp.remainder(0 - (c32 - la), 256)
                w = pltpu.roll(w, s, axis=1)
                return acc ^ w[:, :128]
            if variant == "roll1_static":
                w = band_ref[pl.ds(ra, 8), pl.ds(la, 256)]
                w = pltpu.roll(w, 37, axis=1)
                return acc ^ w[:, :128]
            if variant == "roll1_128":
                w = band_ref[pl.ds(ra, 8), pl.ds(la, 128)]
                s = jnp.remainder(0 - (c32 - la), 128)
                w = pltpu.roll(w, s, axis=1)
                return acc ^ w
            # full chains
            if variant == "full":
                w = band_ref[pl.ds(ra, 16), pl.ds(la, 256)]
                w = pltpu.roll(w, (16 - (r0 - ra)) & 15, axis=0)[:8]
            elif variant == "full_aligned_rows":
                w = band_ref[pl.ds(ra, 8), pl.ds(la, 256)]
            else:
                raise ValueError(variant)
            s = jnp.remainder(0 - (c32 - la), 256)
            w = pltpu.roll(w, s, axis=1)
            wm1 = pltpu.roll(w, 255, axis=1)
            sh = (jnp.uint32(8) * sub.astype(jnp.uint32))
            sh2 = (jnp.uint32(32) - sh) & jnp.uint32(31)
            w = jnp.where(sub == 0, w, (w >> sh) | (wm1 << sh2))
            mask = (lane >= t_sub) & (lane < t_sub + 16)
            return jnp.where(mask, w[:, :128], acc)

        n = n_ref[0, 0]
        acc = jnp.zeros((8, 128), jnp.uint32)
        acc = jax.lax.fori_loop(0, n, body, acc)
        out_ref[:] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("variant",))
def run(n, tab, band, *, variant: str):
    return pl.pallas_call(
        make_kernel(variant),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
    )(n, tab, band)


def main():
    variants = sys.argv[1:] or [
        "empty", "smem_only", "load8x128", "load8x256", "load16x256",
        "roll0", "roll0_static", "roll1", "roll1_static", "roll1_128",
        "full", "full_aligned_rows",
    ]
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    band = jnp.asarray(rng.integers(0, 2**32, (ROWS, W32), dtype=np.uint32))
    hz = 940e6  # v5e TensorCore clock (approx) for the cycles column

    def tab_for(salt):
        t = np.stack([
            rng.integers(0, ROWS - 16, T),
            rng.integers(0, (W32 - 64) * 4, T),
            rng.integers(0, 8, T),
        ]).astype(np.int32)
        t[0, 0] = salt % (ROWS - 16)
        return jnp.asarray(t)

    n1, n2 = 20_000, 120_000
    salt = 0
    for v in variants:
        try:
            times = {}
            for n in (n1, n2):
                nn = jnp.full((1, 1), n, jnp.int32)
                np.asarray(run(nn, tab_for(salt), band, variant=v)); salt += 1
                best = 1e9
                for _ in range(3):
                    tb = tab_for(salt); salt += 1
                    t0 = time.perf_counter()
                    np.asarray(run(nn, tb, band, variant=v))
                    best = min(best, time.perf_counter() - t0)
                times[n] = best
            per = (times[n2] - times[n1]) / (n2 - n1)
            print(f"{v:20s} {per * 1e9:9.1f} ns/chain  ~{per * hz:7.1f} cyc"
                  f"  (t{n1//1000}k={times[n1]*1e3:.1f}ms t{n2//1000}k="
                  f"{times[n2]*1e3:.1f}ms)", flush=True)
        except Exception as e:
            print(f"{v:20s} FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()

"""Two chip probes that decide the round-2 flow-kernel design:

1. Mosaic vector-index ops: does jnp.take_along_axis / vector-index gather
   lower inside a Pallas TPU kernel (per-lane dynamic row select)?
2. XLA block-gather rate vs trailing-block size: PERF.md established
   ~10 ns/descriptor at 8-16 B blocks; if that rate holds at 32-128 B the
   strip path's index count (and time) drops proportionally.
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_mosaic_vector_ops():
    x = jnp.arange(64 * 256, dtype=jnp.int32).reshape(64, 256)
    idx8 = jnp.tile(jnp.arange(8, dtype=jnp.int32)[:, None], (1, 128)) * 3 % 64

    def k_take_sublane(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:, :128], i_ref[:], axis=0)

    def k_take_lane(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:8, :], i_ref[:] + 7, axis=1)

    def k_vec_index(x_ref, i_ref, o_ref):
        rows = i_ref[:]
        o_ref[:] = x_ref[:, :128][rows, jax.lax.broadcasted_iota(
            jnp.int32, (8, 128), 1)]

    for name, kern in (("take_along_sublane", k_take_sublane),
                       ("take_along_lane", k_take_lane),
                       ("vector_index", k_vec_index)):
        try:
            out = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            )(x, idx8)
            np.asarray(out)
            print(f"MOSAIC {name}: OK", flush=True)
        except Exception as e:
            print(f"MOSAIC {name}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)


@functools.partial(jax.jit, static_argnames=("g32", "n_idx", "k"))
def block_gather_chain(plane32, salt, *, g32: int, n_idx: int, k: int):
    """k chained block-gathers of n_idx (g32 u32-lane) blocks."""
    rows, cols = plane32.shape
    nb = cols // g32
    blocks = plane32.reshape(rows, nb, g32)
    acc = salt
    for i in range(k):
        key = jax.random.key(i)
        ri = jax.random.randint(key, (n_idx,), 0, rows) + (acc % 2)
        bi = jax.random.randint(key, (n_idx,), 0, nb)
        g = blocks[jnp.clip(ri, 0, rows - 1), bi]          # (n_idx, g32)
        acc = jax.lax.optimization_barrier(
            acc + jnp.sum(g[:, 0].astype(jnp.uint32)))
    return acc


def probe_block_gather_rates():
    rng = np.random.default_rng(0)
    # ~16 MB u32 operand (4K-frame scale).
    plane = jnp.asarray(rng.integers(0, 2**32, (4096, 1024), dtype=np.uint32))
    n_idx = 400_000
    for g32 in (2, 4, 8, 16, 32, 64):
        try:
            times = {}
            for k in (1, 3):
                int(block_gather_chain(plane, jnp.uint32(k), g32=g32,
                                       n_idx=n_idx, k=k))
                best = 1e9
                for r in range(3):
                    t0 = time.perf_counter()
                    int(block_gather_chain(plane, jnp.uint32(100 + r), g32=g32,
                                           n_idx=n_idx, k=k))
                    best = min(best, time.perf_counter() - t0)
                times[k] = best
            per = (times[3] - times[1]) / 2
            print(f"XLA block gather {g32*4:4d} B: {per/n_idx*1e9:7.2f} ns/idx "
                  f"({n_idx*g32*4/per/1e9:6.2f} GB/s)", flush=True)
        except Exception as e:
            print(f"XLA block gather {g32*4:4d} B: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    which = sys.argv[1:] or ["mosaic", "xla"]
    if "mosaic" in which:
        probe_mosaic_vector_ops()
    if "xla" in which:
        probe_block_gather_rates()

"""Probe which Mosaic lowerings this toolchain accepts (real TPU, tiny kernels)."""
import sys
import traceback
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def run(name, kernel, refshape=(128, 256), outshape=(8, 256)):
    x = jnp.arange(np.prod(refshape), dtype=jnp.int32).reshape(refshape)
    idx = jnp.array([5, 128], jnp.int32)
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(outshape, jnp.int32),
        )(idx, x)
        np.asarray(out)
        print(f"PROBE {name}: OK", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:300]
        print(f"PROBE {name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return False

def k_dyn_sublane(i_ref, x_ref, o_ref):
    r0 = i_ref[0]
    o_ref[:] = x_ref[pl.ds(r0, 8), :]

def k_dyn_sublane_aligned(i_ref, x_ref, o_ref):
    r0 = pl.multiple_of((i_ref[0] >> 3) << 3, 8)
    o_ref[:] = x_ref[pl.ds(r0, 8), :]

def k_dyn_lane_aligned(i_ref, x_ref, o_ref):
    la = pl.multiple_of(i_ref[1] & ~127, 128)
    o_ref[:] = x_ref[:8, pl.ds(la, 256)]

def k_dyn_both(i_ref, x_ref, o_ref):
    r0 = i_ref[0]
    la = pl.multiple_of(i_ref[1] & ~127, 128)
    o_ref[:] = x_ref[pl.ds(r0, 8), pl.ds(la, 256)]

def k_dyn_roll_lane(i_ref, x_ref, o_ref):
    s = i_ref[0]
    o_ref[:] = pltpu.roll(x_ref[:8, :256], s, axis=1)

def k_dyn_roll_sublane(i_ref, x_ref, o_ref):
    s = i_ref[0]
    w = pltpu.roll(x_ref[pl.ds(0, 16), :256], s, axis=0)
    o_ref[:] = w[:8]

def k_dyn_sublane_16(i_ref, x_ref, o_ref):
    ra = pl.multiple_of((i_ref[0] >> 3) << 3, 8)
    w = x_ref[pl.ds(ra, 16), :256]
    s = jnp.remainder(16 - (i_ref[0] - ra), 16)
    w = pltpu.roll(w, s, axis=0)
    o_ref[:] = w[:8]

which = sys.argv[1:] or ["sublane", "sublane_aligned", "lane", "both", "roll_lane", "roll_sublane", "sublane16"]
table = {
    "sublane": k_dyn_sublane, "sublane_aligned": k_dyn_sublane_aligned,
    "lane": k_dyn_lane_aligned, "both": k_dyn_both,
    "roll_lane": k_dyn_roll_lane, "roll_sublane": k_dyn_roll_sublane,
    "sublane16": k_dyn_sublane_16,
}
print("device:", jax.devices()[0], flush=True)
for name in which:
    run(name, table[name])

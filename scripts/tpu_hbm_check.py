"""Validate estimate_hbm_bytes against the device allocator (VERDICT r2 #8).

Builds the 4K HDR engine on the real chip, streams enough frames to populate
the 3-deep ring + contexts + flow double buffer, runs one pyramid + warp, and
compares the engine's pre-build footprint formula
(flow_engine.estimate_hbm_bytes, the analogue of the reference's VRAM formula,
ref: opticalFlowCalc.cpp:45-110) against the allocator's measured
bytes_in_use growth / peak_bytes_in_use.

Usage: PYTHONPATH=/root/repo python scripts/tpu_hbm_check.py [config]
"""

from __future__ import annotations

import sys

import numpy as np


def stats(dev):
    try:
        s = dev.memory_stats()
    except Exception as e:  # tunneled backends may not expose stats
        print(f"memory_stats unavailable: {e}")
        return None
    return s or None


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hopperrender_tpu.utils import compile_cache
    compile_cache.enable()
    from hopperrender_tpu.engine import flow_engine
    from hopperrender_tpu.vio import nv12

    name = sys.argv[1] if len(sys.argv) > 1 else "4k-hdr"
    h, w, is_hdr = {"4k-hdr": (2160, 3840, True),
                    "4k-sdr": (2160, 3840, False),
                    "1080p-sdr": (1080, 1920, False)}[name]
    dev = jax.devices()[0]
    print("device:", dev)
    s0 = stats(dev)
    base = s0.get("bytes_in_use", 0) if s0 else 0
    if s0:
        print(f"bytes_in_use before: {base / 1e6:.1f} MB")

    est = flow_engine.estimate_hbm_bytes(h, w, is_hdr=is_hdr)
    print(f"estimate_hbm_bytes({name}) = {est / 1e9:.3f} GB")
    est_fn = flow_engine.estimate_hbm_bytes  # re-evaluated after engine build

    eng = flow_engine.OpticalFlowEngine(h, w, is_hdr=is_hdr)
    # Stream at MAX radius so the engine's contexts are built at the same
    # worst-case bucket/apron the pre-check formula assumes.
    from hopperrender_tpu import config as hcfg
    eng.search_radius = hcfg.MAX_SEARCH_RADIUS
    rng = np.random.default_rng(0)
    for i in range(3):
        y, uv = nv12.synthetic_frame(rng, h, w, is_hdr=is_hdr,
                                     motion_x=i * 2, coherent=True)
        eng.update_frame(y, uv)
    eng.calculate_optical_flow()
    y, uv = eng.warp_frames(0.5, 2)
    int(np.asarray(uv[:1, :1]))  # force completion

    # Live-array ledger: every persistent device array the engine holds
    # (frame ring, flow/warp contexts, flow double buffer). Validates the
    # formula's persistent terms on backends whose allocator stats are hidden
    # (the tunneled axon plugin returns none).
    import jax as _jax
    ledger = 0
    for tree in (eng._frames_y, eng._frames_uv, eng._ctxs, eng._wctxs,
                 eng._blurred):
        for leaf in _jax.tree.leaves(tree):
            if hasattr(leaf, "nbytes"):
                ledger += leaf.nbytes
    persistent_est = est_fn(
        h, w, is_hdr=is_hdr, warp_band_packed=eng.use_warp_band) \
        - flow_engine._working_bytes(h, w, is_hdr=is_hdr)
    ratio_l = persistent_est / max(1, ledger)
    print(f"live persistent arrays (ring + contexts + flows): "
          f"{ledger / 1e6:.1f} MB; formula persistent terms "
          f"{persistent_est / 1e6:.1f} MB; ratio {ratio_l:.2f} "
          f"({'OK' if 0.75 <= ratio_l <= 1.33 else 'DRIFTED'} — persistent "
          f"terms should track the ledger within ~25%)")

    s1 = stats(dev)
    if not s1:
        print("RESULT: allocator stats unavailable on this backend; peak "
              "(working-set) term unvalidated here — persistent terms "
              "validated against the live-array ledger above.")
        return
    used = s1.get("bytes_in_use", 0) - base
    peak = s1.get("peak_bytes_in_use", 0)
    print(f"bytes_in_use after: {s1.get('bytes_in_use', 0) / 1e6:.1f} MB "
          f"(delta {used / 1e6:.1f} MB); peak {peak / 1e6:.1f} MB")
    ratio = est / max(1, peak - base)
    print(f"RESULT: estimate / measured-peak-delta = {ratio:.2f} "
          f"({'OK' if 0.5 <= ratio <= 2.0 else 'DRIFTED'} — formula should "
          f"stay within ~2x of the allocator)")


if __name__ == "__main__":
    main()

"""Pinned-output regression net: deterministic synthetic streams through the full
FrameServer, with SHA-256 digests of every output frame pinned in
tests/fixtures/digests.json.

This freezes today's bit-exact behavior (validated against the literal OpenCL
translation) across future refactors/optimization rounds: ANY unintended change to
flow search, warping, cadence, scene gating, or levels flips a digest.

Integer-exact configurations only (modes 0/1 and flow state); blend/levels outputs
carry the documented 1-LSB float latitude and are excluded from pinning.

Regenerate intentionally with:  python tests/test_regression_digests.py --regen
"""

import hashlib
import json
import os
import sys

import numpy as np

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "digests.json")

CONFIGS = {
    # name: (h, w, max_calc_res, is_hdr, mode, radius, frames)
    "sdr_rs1_mode0": (80, 96, 40, False, 0, 7, 6),
    "sdr_rs2_mode1": (128, 160, 32, False, 1, 16, 6),
    "hdr_rs1_mode0": (80, 96, 40, True, 0, 9, 6),
    "sdr_rs0_mode0": (56, 72, 64, False, 0, 5, 6),   # reference (non-strip) path
}


def _stream(name):
    h, w, mcr, is_hdr, mode, radius, n = CONFIGS[name]
    from hopperrender_tpu.config import Settings
    from hopperrender_tpu.server.frame_server import FrameServer
    from hopperrender_tpu.vio import nv12

    srv = FrameServer(w, h, source_fps=24.0, is_hdr=is_hdr,
                      settings=Settings(target_fps=60.0, use_display_fps=False,
                                        frame_output=mode, auto_quality=False,
                                        max_calc_res=mcr))
    rng = np.random.default_rng(2026)
    digest = hashlib.sha256()
    for i in range(n):
        y, uv = nv12.synthetic_frame(rng, h, w, is_hdr=is_hdr, motion_x=i * 2)
        srv.engine and setattr(srv.engine, "search_radius", radius)
        for out in srv.push_frame(y, uv):
            digest.update(np.asarray(out.y).tobytes())
            digest.update(np.asarray(out.uv).tobytes())
            digest.update(np.int64(out.start_time).tobytes())
            digest.update(b"\x01" if out.interpolated else b"\x00")
    return digest.hexdigest()


def test_pinned_digests():
    with open(FIXTURE) as f:
        pinned = json.load(f)
    for name in CONFIGS:
        assert _stream(name) == pinned[name], (
            f"output digest changed for {name} — if intentional, regenerate with "
            f"`python tests/test_regression_digests.py --regen` and justify in the "
            f"commit message")


if __name__ == "__main__":
    if "--regen" in sys.argv:
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        digests = {name: _stream(name) for name in CONFIGS}
        with open(FIXTURE, "w") as f:
            json.dump(digests, f, indent=2)
        print(f"wrote {FIXTURE}:")
        print(json.dumps(digests, indent=2))

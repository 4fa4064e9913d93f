"""ffmpeg-gated end-to-end integration: encode a clip with ffmpeg, decode it
to NV12, interpolate through the CLI, and validate the output with ffprobe.

Skipped when ffmpeg/ffprobe are absent (they are not baked into the CI image);
on developer machines with ffmpeg this drives the same external-tool seams the
production deployment uses (vio.video ffprobe rate detection, raw NV12 piping).
"""

import json
import shutil
import subprocess
import sys

import numpy as np
import pytest

from hopperrender_tpu.vio import nv12
from hopperrender_tpu.vio.video import Y4MReader

ffmpeg = shutil.which("ffmpeg")
ffprobe = shutil.which("ffprobe")
pytestmark = pytest.mark.skipif(
    not (ffmpeg and ffprobe), reason="ffmpeg/ffprobe not installed")


def test_ffmpeg_roundtrip_interpolation(tmp_path):
    w, h = 192, 108
    rng = np.random.default_rng(5)
    raw = tmp_path / "src.nv12"
    with open(raw, "wb") as f:
        for i in range(10):
            y, uv = nv12.synthetic_frame(rng, h, w, motion_x=i * 2,
                                         coherent=True)
            f.write(nv12.pack(y, uv).tobytes())

    # Encode -> decode back to NV12 (exercises ffmpeg's pixel-format path).
    mp4 = tmp_path / "clip.mp4"
    subprocess.run(
        [ffmpeg, "-y", "-loglevel", "error", "-f", "rawvideo", "-pix_fmt",
         "nv12", "-s", f"{w}x{h}", "-r", "24", "-i", str(raw), "-c:v",
         "libx264", "-qp", "0", "-pix_fmt", "yuv420p", str(mp4)], check=True)
    back = tmp_path / "back.nv12"
    subprocess.run(
        [ffmpeg, "-y", "-loglevel", "error", "-i", str(mp4), "-f", "rawvideo",
         "-pix_fmt", "nv12", str(back)], check=True)

    out = tmp_path / "out.y4m"
    import os
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "-m", "hopperrender_tpu", "interpolate", str(back),
         str(out), "--width", str(w), "--height", str(h), "--fps", "24",
         "--target-fps", "60"], check=True, env=env)

    frames = list(Y4MReader(str(out)))
    # 10 sources at 24->60 with the 2-frame warmup: ~2.5 outputs per source.
    assert 23 <= len(frames) <= 27

    info = json.loads(subprocess.run(
        [ffprobe, "-v", "error", "-print_format", "json", "-show_streams",
         str(mp4)], check=True, capture_output=True).stdout)
    rate = info["streams"][0]["r_frame_rate"]
    num, den = (int(p) for p in rate.split("/"))
    assert abs(num / den - 24.0) < 0.01

"""Native library (pack/unpack/ring) and the threaded pipelined server."""

import threading

import numpy as np
import pytest

from hopperrender_tpu import native
from hopperrender_tpu.config import Settings
from hopperrender_tpu.server.frame_server import FrameServer
from hopperrender_tpu.server.pipeline import PipelinedServer
from hopperrender_tpu.vio import nv12


@pytest.mark.parametrize("is_hdr", [False, True])
def test_native_pack_unpack_parity(rng, is_hdr):
    h, w, stride = 32, 40, 48
    dtype = np.uint16 if is_hdr else np.uint8
    hi = 65536 if is_hdr else 256
    buf = rng.integers(0, hi, nv12.frame_size_samples(h, stride), dtype=dtype)
    y1, uv1 = native.unpack(buf, h, w, stride, is_hdr=is_hdr)
    y2, uv2 = nv12.unpack(buf, h, w, stride, is_hdr=is_hdr)
    np.testing.assert_array_equal(y1, y2)
    np.testing.assert_array_equal(uv1, uv2)
    np.testing.assert_array_equal(native.pack(y1, uv1, stride), nv12.pack(y2, uv2, stride))


def test_ring_fifo_and_meta():
    ring = native.FrameRing(4, 256)
    for i in range(4):
        assert ring.push(bytes([i]) * (i + 1), meta=(i, i * 10, 0, 0))
    assert not ring.push(b"x", timeout=0)  # full, non-blocking
    for i in range(4):
        data, meta = ring.pop()
        assert data == bytes([i]) * (i + 1)
        assert meta[:2] == (i, i * 10)
    assert ring.pop(timeout=0.05) is None  # empty times out
    ring.close()
    assert ring.pop() is None  # closed + drained


def test_ring_oversize_rejected():
    ring = native.FrameRing(2, 16)
    with pytest.raises(ValueError):
        ring.push(b"z" * 17)


def test_ring_blocking_backpressure():
    ring = native.FrameRing(2, 64)
    ring.push(b"a")
    ring.push(b"b")
    popped = []

    def consumer():
        for _ in range(3):
            popped.append(ring.pop(timeout=5)[0])

    t = threading.Thread(target=consumer)
    t.start()
    assert ring.push(b"c", timeout=5)  # unblocks once consumer pops
    t.join(timeout=5)
    assert popped == [b"a", b"b", b"c"]


def test_pipelined_server_end_to_end(rng):
    server = FrameServer(48, 32, source_fps=24.0,
                         settings=Settings(target_fps=60.0, use_display_fps=False))
    pipe = PipelinedServer(server, input_slots=4, output_slots=8)
    n = 6
    for i in range(n):
        y, uv = nv12.synthetic_frame(rng, 32, 48, motion_x=i)
        pipe.feed(y, uv)
    pipe.close()
    outs = list(pipe.outputs(timeout=30))
    pipe.join()
    assert pipe.stats.frames_in == n
    assert len(outs) == pipe.stats.frames_out
    # 24->60 with warmup: at least 2 passthroughs + interpolated outputs after
    assert len(outs) >= n
    assert any(o.interpolated for o in outs)
    # Presentation order strictly increasing
    starts = [o.start_time for o in outs]
    assert starts == sorted(starts)
    # Frames roundtrip the rings intact (dtype/shape)
    assert outs[0].y.shape == (32, 48)


def test_pipelined_server_error_propagates(rng):
    server = FrameServer(48, 32, source_fps=24.0,
                         settings=Settings(target_fps=60.0, use_display_fps=False))
    pipe = PipelinedServer(server, input_slots=2, output_slots=2)
    # Feed a frame of the wrong size: engine thread must fail and surface it.
    bad = np.zeros(nv12.frame_size_samples(32, 48) // 2, np.uint8)
    pipe._in_ring.push(bad)
    pipe.close()
    with pytest.raises(RuntimeError, match="engine thread failed"):
        list(pipe.outputs(timeout=10))


def test_pipelined_server_strip_path(rng):
    """Pipeline end-to-end at a geometry where the strip kernels are active
    (res_scalar >= 1): outputs must be genuine interpolations."""
    from hopperrender_tpu.config import Settings

    h, w = 72, 96  # max_calc_res 36 -> rs=1
    server = FrameServer(w, h, source_fps=24.0,
                         settings=Settings(target_fps=60.0, use_display_fps=False,
                                           max_calc_res=36))
    pipe = PipelinedServer(server, input_slots=4, output_slots=16)
    for i in range(5):
        y, uv = nv12.synthetic_frame(rng, h, w, motion_x=i * 2)
        pipe.feed(y, uv)
    pipe.close()
    outs = list(pipe.outputs(timeout=60))
    pipe.join()
    assert server.engine.use_strips and server.engine.use_warp_strips
    assert any(o.interpolated for o in outs)
    assert outs[0].y.shape == (h, w)


def test_pipelined_server_wedged_device_detection(rng):
    """Failure-detection depth: a device call that HANGS (dead accelerator
    transport — it blocks inside dispatch rather than raising) must flip
    healthy() False via the engine-call heartbeat, while a live pipeline
    reports healthy. The /healthz endpoint surfaces it as 503."""
    import json
    import time as _time
    import urllib.request

    from hopperrender_tpu.server.status_http import StatusServer

    server = FrameServer(48, 32, source_fps=24.0,
                         settings=Settings(target_fps=60.0,
                                           use_display_fps=False))
    pipe = PipelinedServer(server, input_slots=2, output_slots=4)
    status = StatusServer(server, pipeline=pipe)
    url = f"http://{status.host}:{status.port}/healthz"
    try:
        assert pipe.healthy() and pipe.stall_seconds() == 0.0
        assert urllib.request.urlopen(url).status == 200

        # Simulate the wedge: push_frame blocks until released.
        gate = __import__("threading").Event()
        orig = server.push_frame
        server.push_frame = lambda *a, **kw: (gate.wait(), orig(*a, **kw))[1]
        y, uv = nv12.synthetic_frame(rng, 32, 48)
        pipe.feed(y, uv)
        for _ in range(200):          # wait for the worker to enter the call
            if pipe.stall_seconds() > 0.01:
                break
            _time.sleep(0.01)
        assert pipe.stall_seconds() > 0.01
        assert not pipe.healthy(stall_limit=0.005)
        assert pipe.healthy(stall_limit=60.0)  # within budget still healthy
        # /healthz goes 503 with the stall age once past the default limit.
        pipe_healthy_default = pipe.healthy()
        try:
            urllib.request.urlopen(url)
            code, body = 200, None
        except urllib.error.HTTPError as e:
            code, body = e.code, json.loads(e.read())
        assert (code == 200) == pipe_healthy_default
        gate.set()
        pipe.close()
        list(pipe.outputs(timeout=30))  # drains after release
        pipe.join()
        assert pipe.healthy()
    finally:
        gate.set()
        status.close()


def test_native_so_search_order(tmp_path, monkeypatch):
    """Library resolution precedence (packaging contract, setup.py bundling):
    HRT_NATIVE_LIB env override > pip-installed copy in the package dir >
    repo-layout native/ build output > None (then lazy build)."""
    env_so = tmp_path / "env" / "libhrt_native.so"
    pkg_so = tmp_path / "pkg" / "libhrt_native.so"
    repo_so = tmp_path / "repo" / "native" / "libhrt_native.so"
    for p in (env_so, pkg_so, repo_so):
        p.parent.mkdir(parents=True)
        p.write_bytes(b"")
    monkeypatch.setattr(native, "_PKG_DIR", str(pkg_so.parent))
    monkeypatch.setattr(native, "_SO_PATH", str(repo_so))
    monkeypatch.setenv("HRT_NATIVE_LIB", str(env_so))
    assert native._find_so() == str(env_so)
    monkeypatch.delenv("HRT_NATIVE_LIB")
    assert native._find_so() == str(pkg_so)
    pkg_so.unlink()
    assert native._find_so() == str(repo_so)
    repo_so.unlink()
    assert native._find_so() is None

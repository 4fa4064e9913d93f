"""Pipelined streaming mode: decode thread -> frame ring -> engine thread -> output
ring -> consumer.

This is the runtime equivalent of the reference's push-model streaming graph: the
upstream decoder thread pushes samples into the filter while the downstream renderer
consumes from a 5-deep output pool, letting decode, GPU work and presentation overlap
(ref: CTransformFilter::Receive transfrm.cpp:302-380; DecideBufferSize
HopperRender.cpp:529-541). Here the pools are native preallocated rings
(hopperrender_tpu.native.FrameRing) and the engine runs on its own thread so host
decode and TPU dispatch overlap.
"""

from __future__ import annotations

import dataclasses
import threading

import numpy as np

from hopperrender_tpu.native import FrameRing, pack as native_pack, unpack as native_unpack
from hopperrender_tpu.server.frame_server import FrameServer, OutputFrame
from hopperrender_tpu.utils.logging import get_logger
from hopperrender_tpu.vio import nv12

log = get_logger("pipeline")


@dataclasses.dataclass
class PipelineStats:
    frames_in: int = 0
    frames_out: int = 0
    input_ring_high_water: int = 0


class PipelinedServer:
    """Threaded wrapper around FrameServer.

    Producer side: feed(y, uv, pts) / feed_packed(buf, pts) — blocks when the input
    pool is full (backpressure, like the upstream pin blocking on the allocator).
    Consumer side: iterate outputs() — yields OutputFrame until close() + drained.
    """

    def __init__(self, server: FrameServer, *, input_slots: int = 8,
                 output_slots: int = 16):
        self.server = server
        elem = 2 if server.is_hdr else 1
        slot = nv12.frame_size_samples(server.height, server.width) * elem
        self._in_ring = FrameRing(input_slots, slot)
        self._out_ring = FrameRing(output_slots, slot)
        self._out_meta: dict[int, OutputFrame] = {}
        self._meta_lock = threading.Lock()
        self._seq = 0
        self.stats = PipelineStats()
        self._error: BaseException | None = None
        self._worker = threading.Thread(target=self._run, name="hrt-engine", daemon=True)
        self._worker.start()

    # -- producer -------------------------------------------------------------

    def feed(self, y: np.ndarray, uv: np.ndarray, *, pts: int = -1) -> None:
        self.feed_packed(native_pack(y, uv), pts=pts)

    def feed_packed(self, buf, *, pts: int = -1) -> None:
        if self._error:
            raise RuntimeError("engine thread failed") from self._error
        data = buf if isinstance(buf, np.ndarray) else np.frombuffer(buf, np.uint8)
        self._in_ring.push(data, meta=(pts, 0, 0, 0), timeout=None)
        self.stats.frames_in += 1
        self.stats.input_ring_high_water = max(
            self.stats.input_ring_high_water, len(self._in_ring))

    def close(self) -> None:
        """No more input; the engine drains, then the output ring closes."""
        self._in_ring.close()

    # -- engine thread ----------------------------------------------------------

    def _run(self) -> None:
        try:
            while True:
                item = self._in_ring.pop(timeout=None)
                if item is None:  # closed and drained
                    break
                buf, meta = item
                pts = meta[0] if meta[0] >= 0 else None
                y, uv = native_unpack(buf, self.server.height, self.server.width,
                                      is_hdr=self.server.is_hdr)
                for out in self.server.push_frame(y, uv, pts=pts):
                    with self._meta_lock:
                        seq = self._seq
                        self._seq += 1
                        self._out_meta[seq] = out
                    payload = native_pack(out.y, out.uv)
                    self._out_ring.push(payload, meta=(seq, out.start_time,
                                                       out.end_time, 0), timeout=None)
                    self.stats.frames_out += 1
        except BaseException as e:  # surfaced to both producer and consumer
            self._error = e
            log.error("engine thread failed: %s", e)
        finally:
            self._out_ring.close()

    # -- consumer ---------------------------------------------------------------

    def outputs(self, timeout: float | None = None):
        """Yield OutputFrame objects in presentation order until drained."""
        while True:
            item = self._out_ring.pop(timeout=timeout)
            if item is None:
                if self._error:
                    raise RuntimeError("engine thread failed") from self._error
                return
            _, meta = item
            with self._meta_lock:
                out = self._out_meta.pop(meta[0])
            yield out

    def join(self) -> None:
        self._worker.join()

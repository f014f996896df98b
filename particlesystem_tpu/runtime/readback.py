"""Double-buffered async host readback for render loops.

BASELINE config 5: "double-buffered async readback render loop ... so the
sim loop never syncs with the display."  The reference's equivalent is the
CUDA-OpenGL VBO interop path plus per-stage ``pmFetchMemory`` pulls
(``particleSystem.cpp:1781-1786``), both synchronous.

Design: the sim thread publishes device arrays; JAX's async dispatch means
``np.asarray`` on the *previous* frame's buffer overlaps the *current*
frame's compute.  The host copy lands in the native lock-free SPSC ring
(``native/psnative.cpp``) that a render/IO consumer drains at its own pace;
when the consumer is behind, frames are dropped rather than ever stalling
the device queue.  Pure-Python deque fallback when the native library is
unavailable.
"""

from __future__ import annotations

import collections
import ctypes
from typing import Optional

import numpy as np

from ..utils.native import get_lib


class FrameRing:
    """SPSC frame ring over the native library (Python fallback included)."""

    def __init__(self, frame_bytes: int, depth: int = 3):
        self.frame_bytes = int(frame_bytes)
        self.depth = int(depth)
        self._lib = get_lib()
        if self._lib is not None:
            self._ring = self._lib.ps_ring_create(self.frame_bytes, self.depth)
            self._deque = None
        else:
            self._ring = None
            self._deque = collections.deque(maxlen=depth)

    def push(self, frame: np.ndarray) -> bool:
        """Publish one frame (host array).  False = ring full, frame dropped."""
        buf = np.ascontiguousarray(frame)
        if buf.nbytes > self.frame_bytes:
            raise ValueError(f"frame {buf.nbytes}B > ring {self.frame_bytes}B")
        if self._lib is not None:
            return bool(self._lib.ps_ring_try_push(
                self._ring, buf.ctypes.data_as(ctypes.c_void_p), buf.nbytes))
        if len(self._deque) >= self.depth:
            return False
        self._deque.append(buf.copy())
        return True

    def pop(self, shape, dtype=np.float32) -> Optional[np.ndarray]:
        """Consume one frame; None when empty."""
        out = np.empty(shape, dtype)
        if self._lib is not None:
            ok = self._lib.ps_ring_try_pop(
                self._ring, out.ctypes.data_as(ctypes.c_void_p), out.nbytes)
            return out if ok else None
        if not self._deque:
            return None
        src = self._deque.popleft()
        out[...] = src.view(dtype).reshape(shape)
        return out

    def fill(self) -> int:
        if self._lib is not None:
            return int(self._lib.ps_ring_fill(self._ring))
        return len(self._deque)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and self._ring:
            self._lib.ps_ring_destroy(self._ring)
            self._ring = None


class AsyncReadback:
    """Double-buffered device->host publisher.

    ``publish(device_array)`` keeps the PREVIOUS frame's device reference and
    materializes it to host only after the next frame has been dispatched —
    the device-to-host DMA overlaps the next frame's compute, and the sim
    thread never blocks on the ring (full ring drops the frame).
    """

    def __init__(self, frame_bytes: int, depth: int = 3):
        self.ring = FrameRing(frame_bytes, depth)
        self._pending = None
        self.published = 0
        self.dropped = 0

    def publish(self, device_array) -> None:
        prev, self._pending = self._pending, device_array
        if prev is not None:
            self._emit(prev)

    def flush(self) -> None:
        if self._pending is not None:
            self._emit(self._pending)
            self._pending = None

    def _emit(self, arr) -> None:
        try:
            import jax
            arr = jax.block_until_ready(arr)
        except Exception:
            pass
        host = np.asarray(arr)  # async dispatch already overlapped the copy
        if self.ring.push(host):
            self.published += 1
        else:
            self.dropped += 1

"""Host image processing: fast JPEG read, area resize, alpha paste.

Responsibility-parity with the reference's `src/improc.py` (SURVEY.md §3
"Image proc": libjpeg-turbo JPEG read via jpeg4py, `resize_by_factor` with
area interpolation, `paste_over` alpha compositing). Decode goes through the
native C extension (`native/jpegdec.c`, threaded libjpeg) when it builds,
with a transparent cv2 fallback; everything returns RGB uint8 numpy arrays.
"""
from __future__ import annotations

import numpy as np

from metro_pose3d_tpu import native as _native_loader

_native = None
_native_tried = False


def _get_native():
    global _native, _native_tried
    if not _native_tried:
        _native = _native_loader.load()
        _native_tried = True
    return _native


def have_native() -> bool:
    return _get_native() is not None


def decode_jpeg_bytes(data: bytes) -> np.ndarray:
    """JPEG bytes -> RGB uint8 [H, W, 3]."""
    nat = _get_native()
    if nat is not None:
        try:
            buf, h, w = nat.decode_jpeg(data)
            return np.frombuffer(buf, np.uint8).reshape(h, w, 3)
        except ValueError:
            pass  # corrupt per libjpeg; let cv2 try (it is more lenient)
    import cv2

    img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("could not decode image")
    return np.ascontiguousarray(img[..., ::-1])


def decode_jpeg_batch(items, threads: int = 4):
    """list[bytes] -> list[RGB uint8 array]; threaded native decode."""
    nat = _get_native()
    if nat is not None:
        out = nat.decode_jpeg_batch(list(items), int(threads))
        decoded = []
        for data, res in zip(items, out):
            if res is None:
                decoded.append(decode_jpeg_bytes(data))  # cv2 rescue
            else:
                buf, h, w = res
                decoded.append(np.frombuffer(buf, np.uint8).reshape(h, w, 3))
        return decoded
    return [decode_jpeg_bytes(d) for d in items]


def imread(path: str) -> np.ndarray:
    """Image file -> RGB uint8 (JPEG through the native path)."""
    if str(path).lower().endswith((".jpg", ".jpeg")):
        with open(path, "rb") as f:
            return decode_jpeg_bytes(f.read())
    import cv2

    img = cv2.imread(str(path))
    if img is None:
        raise FileNotFoundError(path)
    return np.ascontiguousarray(img[..., ::-1])


class _FrameCache:
    """Thread-safe byte-budgeted LRU of decoded frames, keyed by path.

    Cold JPEG decode is the host feed's bottleneck (~64 frames/s/core,
    BASELINE.md): one fresh 1 MP frame per crop would need ~78 cores/chip
    to sustain 5k crops/s, while H36M-style protocols reuse each frame for
    several crops and revisit frames every epoch. The loader's worker
    THREADS share this cache (pipeline/loader.py uses a thread pool, so one
    process-wide dict serves all workers). Entries are read-only by
    convention — `prepare_example` never mutates its source frame.
    """

    def __init__(self, budget_mb: int = 2048):
        import collections
        import threading

        self._lock = threading.Lock()
        self._entries = collections.OrderedDict()
        self._bytes = 0
        self._budget = budget_mb * (1 << 20)
        self.hits = 0
        self.misses = 0

    def set_budget_mb(self, budget_mb: int):
        with self._lock:
            self._budget = budget_mb * (1 << 20)
            self._evict()

    def _evict(self):
        while self._bytes > self._budget and self._entries:
            _, old = self._entries.popitem(last=False)
            self._bytes -= old.nbytes

    def get(self, path: str) -> np.ndarray:
        with self._lock:
            img = self._entries.get(path)
            if img is not None:
                self._entries.move_to_end(path)
                self.hits += 1
                return img
            self.misses += 1
        img = imread(path)  # decode OUTSIDE the lock (threads overlap)
        # Enforce the read-only contract: downstream code aliases cached
        # frames (np.ascontiguousarray returns the SAME object for
        # contiguous input), so an accidental in-place edit must raise
        # instead of corrupting every later crop of this frame.
        img.flags.writeable = False
        with self._lock:
            if path not in self._entries:
                self._entries[path] = img
                self._bytes += img.nbytes
                self._evict()
        return img

    def clear(self):
        with self._lock:
            self._entries.clear()
            self._bytes = 0


FRAME_CACHE = _FrameCache()


def imread_cached(path: str) -> np.ndarray:
    """`imread` through the process-wide decoded-frame LRU (treat the
    result as read-only). Budget: `FRAME_CACHE.set_budget_mb`."""
    return FRAME_CACHE.get(str(path))


def extract_tile_native(img: np.ndarray, x0, y0, x1, y1, factor, tile_side):
    """ROI slice + integer-area decimation + zero pad -> [T, T, C] uint8.

    `img` may be HxWx3 (RGB) or HxW (single-channel masks: returns [T, T]).
    Native when available; numpy fallback is exact for factor==1 and
    averages full factor x factor blocks otherwise (same as the C path).
    """
    nat = _get_native()
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    gray = img.ndim == 2
    ch = 1 if gray else img.shape[2]
    if nat is not None:
        # pass the contiguous ndarray directly: the extension's 'y*' arg
        # format takes any C-contiguous buffer, so no tobytes() frame copy
        buf = nat.extract_tile(img, h, w, int(x0), int(y0),
                               int(x1), int(y1), int(factor), int(tile_side),
                               ch)
        out = np.frombuffer(buf, np.uint8).reshape(tile_side, tile_side, ch)
        return out[..., 0].copy() if gray else out.copy()
    tile = np.zeros((tile_side, tile_side, ch), np.uint8)
    roi = img[y0:y1, x0:x1]
    roi = roi.reshape(*roi.shape[:2], ch)  # robust to a clipped/empty slice
    if roi.size:
        if factor > 1:
            oh, ow = roi.shape[0] // factor, roi.shape[1] // factor
            oh, ow = max(oh, 1), max(ow, 1)
            # effective per-axis block side: a ROI dimension thinner than
            # `factor` still yields one output row/col, averaged over the
            # pixels that exist (the C engine mirrors this exactly)
            by = factor if roi.shape[0] >= factor else roi.shape[0]
            bx = factor if roi.shape[1] >= factor else roi.shape[1]
            r = roi[: oh * by, : ow * bx].reshape(oh, by, ow, bx, ch)
            n = by * bx
            roi = ((r.sum((1, 3), dtype=np.uint32) + n // 2)
                   // n).astype(np.uint8)
        roi = roi[:tile_side, :tile_side]
        tile[: roi.shape[0], : roi.shape[1]] = roi
    return tile[..., 0] if gray else tile


def white_balance(img: np.ndarray, strength: float = 1.0) -> np.ndarray:
    """Gray-world white balance (the reference's host-side color-adjust
    primitive). `strength` in [0, 1] interpolates toward full correction."""
    img_f = img.astype(np.float32)
    means = img_f.reshape(-1, img_f.shape[-1]).mean(0)
    gray = means.mean()
    gains = gray / np.maximum(means, 1e-6)
    gains = 1.0 + (gains - 1.0) * strength
    return np.clip(img_f * gains, 0, 255).astype(np.uint8)


def resize_by_factor(img: np.ndarray, factor: float) -> np.ndarray:
    """Anti-aliased resize by a scale factor (area for shrink, linear for
    grow) — the reference's `improc.resize_by_factor` contract."""
    import cv2

    new_size = (
        max(1, int(round(img.shape[1] * factor))),
        max(1, int(round(img.shape[0] * factor))),
    )
    interp = cv2.INTER_AREA if factor < 1.0 else cv2.INTER_LINEAR
    return cv2.resize(img, new_size, interpolation=interp)


def paste_over(im_src: np.ndarray, im_dst: np.ndarray, center_xy) -> np.ndarray:
    """Alpha-composite RGBA `im_src` over RGB `im_dst` centered at center_xy
    (the reference's occluder-pasting primitive; the on-device equivalent is
    ops/occlusion.py — this host version serves dataset tooling/demos)."""
    h_s, w_s = im_src.shape[:2]
    h_d, w_d = im_dst.shape[:2]
    cx, cy = center_xy
    x0 = int(round(cx - w_s / 2))
    y0 = int(round(cy - h_s / 2))
    x1, y1 = x0 + w_s, y0 + h_s
    dx0, dy0 = max(x0, 0), max(y0, 0)
    dx1, dy1 = min(x1, w_d), min(y1, h_d)
    if dx0 >= dx1 or dy0 >= dy1:
        return im_dst
    sx0, sy0 = dx0 - x0, dy0 - y0
    sx1, sy1 = sx0 + (dx1 - dx0), sy0 + (dy1 - dy0)
    src = im_src[sy0:sy1, sx0:sx1]
    out = im_dst.copy()
    region = out[dy0:dy1, dx0:dx1].astype(np.float32)
    alpha = src[..., 3:4].astype(np.float32) / 255.0
    rgb = src[..., :3].astype(np.float32)
    out[dy0:dy1, dx0:dx1] = (alpha * rgb + (1 - alpha) * region).astype(np.uint8)
    return out

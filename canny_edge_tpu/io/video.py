"""Frame sources for batch/stream processing.

The reference captures one frame from a webcam (src/main.cpp:78-115, with a
TODO to make the count adjustable).  In a datacenter there is no camera; the
equivalents here are file-backed and synthetic frame sources that yield
uint8 grayscale frames, plus a batcher that groups them for the batched /
sharded pipelines.  The optional C++ feeder (canny_edge_tpu.runtime)
provides a double-buffered producer thread behind the same iterator
interface.
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator

import numpy as np

from .imageio import bgr_to_gray, load_grayscale, synthetic_image

IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".pgm", ".ppm", ".tif",
              ".tiff", ".webp"}


def frames_from_video(path: str, max_frames: int | None = None,
                      grayscale: bool = True) -> Iterator[np.ndarray]:
    """Decode frames from a video file (or camera index) via OpenCV.

    The capture is opened eagerly so a bad source raises here (where
    callers can report it cleanly) rather than on first iteration.
    """
    import cv2

    cap = cv2.VideoCapture(int(path) if str(path).isdigit() else path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video source: {path}")
    return _video_frames(cap, max_frames, grayscale)


def _video_frames(cap, max_frames, grayscale) -> Iterator[np.ndarray]:
    from .imageio import bgr_to_gray as _b2g

    try:
        n = 0
        while max_frames is None or n < max_frames:
            ok, frame = cap.read()
            if not ok:
                break
            if grayscale:
                frame = _b2g(frame) if frame.ndim == 3 else frame
            yield frame.astype(np.uint8)
            n += 1
    finally:
        cap.release()


def frames_from_dir(path: str) -> Iterator[np.ndarray]:
    names = sorted(f for f in os.listdir(path)
                   if os.path.splitext(f)[1].lower() in IMAGE_EXTS)
    if not names:
        raise FileNotFoundError(f"no images in directory: {path}")
    for name in names:
        yield load_grayscale(os.path.join(path, name))


def frames_synthetic(h: int, w: int, count: int,
                     seed: int = 0) -> Iterator[np.ndarray]:
    for i in range(count):
        yield synthetic_image(h, w, seed=seed + i)


def open_source(spec: str, max_frames: int | None = None
                ) -> Iterator[np.ndarray]:
    """Open a frame source.

    ``spec`` is an image path, a video path, a directory of images, a camera
    index, or ``synthetic:HxWxN`` (e.g. ``synthetic:1080x1920x64``).
    """
    if spec.startswith("synthetic:"):
        dims = spec.split(":", 1)[1].split("x")
        h, w = int(dims[0]), int(dims[1])
        n = int(dims[2]) if len(dims) > 2 else 1
        if max_frames is not None:
            n = min(n, max_frames)
        return frames_synthetic(h, w, n)
    if os.path.isdir(spec):
        # validate eagerly (frames_from_dir is a generator)
        if not any(os.path.splitext(f)[1].lower() in IMAGE_EXTS
                   for f in os.listdir(spec)):
            raise FileNotFoundError(f"no images in directory: {spec}")
        return _take(frames_from_dir(spec), max_frames)
    ext = os.path.splitext(spec)[1].lower()
    if ext in IMAGE_EXTS:
        return _take(iter([load_grayscale(spec)]), max_frames)
    return frames_from_video(spec, max_frames)


def _take(it: Iterator[np.ndarray], n: int | None) -> Iterator[np.ndarray]:
    if n is None:
        yield from it
        return
    for i, f in enumerate(it):
        if i >= n:
            break
        yield f


def batched(frames: Iterable[np.ndarray], batch_size: int,
            pad_to_full: bool = False) -> Iterator[np.ndarray]:
    """Group frames into (B, H, W) batches (last batch may be short, or
    padded with zero frames when ``pad_to_full``)."""
    buf: list[np.ndarray] = []
    for f in frames:
        buf.append(f)
        if len(buf) == batch_size:
            yield np.stack(buf)
            buf = []
    if buf:
        if pad_to_full:
            pad = [np.zeros_like(buf[0])] * (batch_size - len(buf))
            yield np.stack(buf + pad)
        else:
            yield np.stack(buf)

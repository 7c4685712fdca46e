"""Flow-overlay rendering — the headless replacement for the GUI window and
video writer (``src/FftMethod.cpp:1859-1897``, ``cv::line`` overlays with 5x
exaggeration at ``:1861``; window setup ``src/optic_flow.cpp:918-924``).
Writes plain PGM/PPM so observability needs no extra dependencies.
"""

from __future__ import annotations

import numpy as np


def _draw_line(img: np.ndarray, x0: int, y0: int, x1: int, y1: int, value: int):
    """Bresenham line, clipped to the image."""
    h, w = img.shape
    dx, dy = abs(x1 - x0), -abs(y1 - y0)
    sx = 1 if x0 < x1 else -1
    sy = 1 if y0 < y1 else -1
    err = dx + dy
    x, y = x0, y0
    for _ in range(4 * (dx - dy) + 1):
        if 0 <= x < w and 0 <= y < h:
            img[y, x] = value
        if x == x1 and y == y1:
            break
        e2 = 2 * err
        if e2 >= dy:
            err += dy
            x += sx
        if e2 <= dx:
            err += dx
            y += sy
    return img


def flow_overlay(
    frame: np.ndarray,
    shifts: np.ndarray,
    patch: int,
    *,
    exaggeration: float = 5.0,
    value: int = 255,
) -> np.ndarray:
    """Draw per-window flow vectors from each window centre, 5x exaggerated
    like the reference GUI (``src/FftMethod.cpp:1859-1864``).  Invalid (NaN)
    windows are skipped (the reference draws them thin; skipping reads
    better in a still image)."""
    img = np.asarray(frame, np.float32).copy()
    img = np.clip(img, 0, 255).astype(np.uint8)
    shifts = np.asarray(shifts).reshape(-1, 2)
    # grid side from the shift count (block-matching engines emit a single
    # aggregated vector; the FFT engine a qxq grid)
    q = max(int(round(len(shifts) ** 0.5)), 1)
    patch = frame.shape[0] // q
    for j in range(q):
        for i in range(q):
            s = shifts[i + q * j]
            if not np.all(np.isfinite(s)):
                continue
            x0 = i * patch + patch // 2
            y0 = j * patch + patch // 2
            _draw_line(
                img, x0, y0,
                int(x0 + s[0] * exaggeration), int(y0 + s[1] * exaggeration), value,
            )
    return img


def save_pgm(path: str, img: np.ndarray):
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(f"P5\n{img.shape[1]} {img.shape[0]}\n255\n".encode())
        f.write(img.tobytes())


def load_pgm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        assert f.readline().strip() == b"P5"
        w, h = map(int, f.readline().split())
        maxv = int(f.readline())
        data = np.frombuffer(f.read(), np.uint8, count=w * h)
    return data.reshape(h, w)

"""Pure-NumPy oracle implementing the reference kernel math exactly.

This is the golden model for conformance tests: a line-for-line transcription
of the *math* (not the code) of ``cl/FftMethod.cl`` — normalized cross-power
with FLT_EPSILON (``:979``), fftshift + SEARCH_RADIUS masking (``:737``,
``:826``), min-index argmax (``:1250-1253``), and the positive-only radius-3
weighted centroid with an epsilon-seeded denominator (``refine``,
``:1315-1379``).
"""

import numpy as np

FLT_EPSILON = float(np.finfo(np.float32).eps)


def phase_correlate_oracle(curr, prev, search_radius=55, centroid_radius=3):
    """Single-patch phase correlation. Returns (shift_xy, maxval)."""
    curr = np.asarray(curr, dtype=np.float32)
    prev = np.asarray(prev, dtype=np.float32)
    n = curr.shape[-1]

    f1 = np.fft.fft2(curr)
    f2 = np.fft.fft2(prev)
    r = f1 * np.conj(f2)
    r = r / np.sqrt(r.real**2 + r.imag**2 + FLT_EPSILON)
    surf = np.fft.ifft2(r).real.astype(np.float32)
    surf = np.fft.fftshift(surf)

    keep = np.abs(np.arange(n) - n // 2) <= search_radius
    surf = np.where(keep[:, None] & keep[None, :], surf, np.float32(0.0))

    loc = int(np.argmax(surf))
    maxval = surf.flat[loc]
    yc, xc = divmod(loc, n)

    ymin, ymax = max(yc - centroid_radius, 0), min(yc + centroid_radius, n - 1)
    xmin, xmax = max(xc - centroid_radius, 0), min(xc + centroid_radius, n - 1)
    win = surf[ymin : ymax + 1, xmin : xmax + 1].astype(np.float64)
    ys, xs = np.mgrid[ymin : ymax + 1, xmin : xmax + 1]
    pos = win > 0.0
    denom = win[pos].sum() + FLT_EPSILON
    cx = (win[pos] * xs[pos]).sum() / denom - (n // 2)
    cy = (win[pos] * ys[pos]).sum() / denom - (n // 2)
    return np.array([cx, cy]), maxval


def fourier_shift(img, dx, dy):
    """Exact circular sub-pixel shift: out(x) = img(x - (dx, dy))."""
    img = np.asarray(img, dtype=np.float64)
    ny, nx = img.shape
    fy = np.fft.fftfreq(ny)[:, None]
    fx = np.fft.fftfreq(nx)[None, :]
    phase = np.exp(-2j * np.pi * (fx * dx + fy * dy))
    return np.fft.ifft2(np.fft.fft2(img) * phase).real


def smooth_random_image(rng, n, cutoff=0.15, lo=0.0, hi=255.0):
    """Band-limited random texture (avoids aliasing under sub-pixel shifts)."""
    img = rng.standard_normal((n, n))
    f = np.fft.fft2(img)
    fy = np.abs(np.fft.fftfreq(n))[:, None]
    fx = np.abs(np.fft.fftfreq(n))[None, :]
    f *= np.exp(-((fx**2 + fy**2) / (2 * cutoff**2)))
    img = np.fft.ifft2(f).real
    img -= img.min()
    img /= img.max()
    return (lo + img * (hi - lo)).astype(np.float32)

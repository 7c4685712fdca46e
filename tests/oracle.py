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


def make_accuracy_pairs(rng, n_pairs, size=480, patch=120, max_shift=25.0,
                        cutoff=0.35):
    """uint8 frame pairs with known sub-pixel shifts + the oracle's
    per-patch answers — the ONE definition shared by the builder accuracy
    table (``scripts/accuracy_report.py``) and the driver artifact's
    on-chip accuracy stage (``bench.py``), so the two published numbers
    can never drift apart.

    Frames are quantized to 8-bit AFTER the exact Fourier shift — the
    camera contract (CV_8U capture, ``src/optic_flow.cpp:1465``) and what
    the engine carries (``quantize_8bit``).  The oracle consumes the SAME
    uint8 pixels, so diffing an engine's shifts against ``oracle_shifts``
    isolates backend fidelity; quantization noise lands against ``truth``
    where it belongs.  Returns ``(prev, curr, truth, oracle_shifts)`` with
    shapes ``[B, size, size]`` / ``[B, 2]`` / ``[B, (size//patch)**2, 2]``
    (content-motion sign, matching ``FlowResult.shifts``)."""
    prevs, currs, truth = [], [], []
    for _ in range(n_pairs):
        base = smooth_random_image(rng, size, cutoff=cutoff)
        d = rng.uniform(-max_shift, max_shift, 2)
        prevs.append(np.clip(np.rint(base), 0, 255).astype(np.uint8))
        currs.append(np.clip(
            np.rint(fourier_shift(base, d[0], d[1])), 0, 255
        ).astype(np.uint8))
        truth.append(d)
    prev, curr = np.stack(prevs), np.stack(currs)
    q = size // patch
    osh = np.empty((n_pairs, q * q, 2))
    for b in range(n_pairs):
        for j in range(q):
            for i in range(q):
                sl = (slice(j * patch, (j + 1) * patch),
                      slice(i * patch, (i + 1) * patch))
                sh, _ = phase_correlate_oracle(curr[b][sl], prev[b][sl])
                osh[b, j * q + i] = np.asarray(sh)
    return prev, curr, np.stack(truth), osh


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

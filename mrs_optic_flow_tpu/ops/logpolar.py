"""On-device log-polar resampling (``cv::logPolar`` equivalent).

Feeds the scale/rotation estimator (``src/scaleRotationEstimator.cpp:34-148``):
phase correlation of two log-polar images turns scale into an x-shift and
rotation into a y-shift, decoded as ``scale = exp(dx / M)`` and
``rot = (dy / Ky) * pi/180`` with ``Ky = resolution / 360``
(``src/scaleRotationEstimator.cpp:28``, ``:123-124``).

Sampling convention matches OpenCV's dense inverse map (``cv::logPolar`` is
``warpPolar(..., WARP_POLAR_LOG)`` in the OpenCV 4.x the reference builds
against): output pixel ``(row=phi_idx, col=rho_idx)`` samples the source at
``center + (exp(rho_idx / M) - 1) * (cos(phi), sin(phi))`` with
``phi = phi_idx * 2*pi / rows`` — the ``-1`` pins rho=0 exactly to the
centre and is verified to 1e-5 against ``cv2.warpPolar`` in
``tests/test_logpolar.py``.  Two interpolators:

- ``interp="lanczos4"`` (default) — the reference's request
  (``cv::INTER_LANCZOS4``, ``src/scaleRotationEstimator.cpp:113``): an 8x8
  separable-weight windowed-sinc tap stencil with per-axis normalized
  weights and zero border (``cv::remap`` BORDER_CONSTANT semantics);
- ``interp="bilinear"`` — 2x2 tap stencil, same border semantics.

TPU-first execution: the resample is computed as ONE-HOT SEPARABLE MATMULS,
not gathers.  For each output row (fixed phi) the per-axis tap weights are
scattered into dense ``[C, N]`` matrices (8 broadcast compares per axis) and
contracted against the image on the MXU:

    T[y, c]  = sum_x img[y, x] * Wx[c, x]        (matmul)
    out[c]   = sum_y Wy[c, y] * T[y, c]          (elementwise + reduce)

Gathers run at ~1e9 elements/s on v5e — the tap-loop formulation cost
~13 ms/frame and a slice-stencil variant ~19 ms/frame (and its ``[P, 8, 8]``
temp pads 16x to the ``(8, 128)`` tile, OOMing at fleet batch); the one-hot
matmul form is dense, layout-friendly, and batches over frames on the MXU.
Output rows are processed in chunks under ``lax.map`` to bound the dense
weight temporaries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


#: the 8 Lanczos-4 taps around floor(coord)
_LANCZOS4_OFFSETS = np.arange(-3, 5)


def _lanczos4_weights(frac: jnp.ndarray) -> jnp.ndarray:
    """Normalized Lanczos-4 weights ``[..., 8]`` for fractional offsets
    ``frac`` in [0, 1).  ``L(t) = sinc(t) * sinc(t/4)`` for ``|t| < 4``;
    per-sample normalization to unit sum mirrors OpenCV's
    ``interpolateLanczos4`` coefficient tables."""
    t = frac[..., None] - jnp.asarray(_LANCZOS4_OFFSETS, jnp.float32)
    # jnp.sinc is the normalized sinc: sin(pi t)/(pi t), sinc(0) = 1
    w = jnp.sinc(t) * jnp.sinc(t / 4.0)
    return w / jnp.sum(w, axis=-1, keepdims=True)


def _bilinear_weights(frac: jnp.ndarray) -> jnp.ndarray:
    """Bilinear weights ``[..., 2]`` for taps at offsets (0, 1)."""
    return jnp.stack([1.0 - frac, frac], axis=-1)


def _one_hot_weight_matrix(
    idx0: jnp.ndarray, w: jnp.ndarray, offsets: np.ndarray, n: int
) -> jnp.ndarray:
    """Scatter per-pixel tap weights into a dense ``[..., N]`` matrix.

    ``idx0`` ``[...,]`` int32 tap origins, ``w`` ``[..., T]`` weights,
    ``offsets`` the T tap offsets.  Out-of-range taps fall outside the iota
    and contribute nothing — exactly ``cv::remap`` BORDER_CONSTANT zeros.
    """
    iota = jnp.arange(n, dtype=jnp.int32)
    dense = jnp.zeros(idx0.shape + (n,), jnp.float32)
    for k, off in enumerate(offsets):
        hit = (idx0 + np.int32(off))[..., None] == iota  # [..., N]
        dense = dense + hit.astype(jnp.float32) * w[..., k : k + 1]
    return dense


def _resample_separable(
    img: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    *,
    offsets: np.ndarray,
    weight_fn,
    rows_per_chunk: int = 8,
    img_exact_bf16: bool = False,
) -> jnp.ndarray:
    """Sample ``img`` [H, W] at float coords (``y``, ``x``) [R, C] with a
    separable tap stencil via one-hot matmuls (module docstring).  Output
    rows are processed ``rows_per_chunk`` at a time under ``lax.map``; the
    dense weight temporaries per chunk are ``2 * G * C * N`` floats."""
    h, w = img.shape[-2], img.shape[-1]
    r, c = y.shape

    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = weight_fn((y - y0).astype(jnp.float32))  # [R, C, T]
    wx = weight_fn((x - x0).astype(jnp.float32))
    # clamp origins into a harmless range: any stencil fully outside the
    # image has all-zero one-hot rows anyway, and the clamp keeps the int32
    # compare domain tight (exp(rho/M) can reach ~1e4 off-image)
    y0i = jnp.clip(y0, -16.0, h + 16.0).astype(jnp.int32)
    x0i = jnp.clip(x0, -16.0, w + 16.0).astype(jnp.int32)

    g = min(rows_per_chunk, r)
    n_chunks = -(-r // g)
    pad_rows = n_chunks * g - r

    def _chunks(a):
        if pad_rows:
            a = jnp.pad(a, ((0, pad_rows),) + ((0, 0),) * (a.ndim - 1))
        return a.reshape((n_chunks, g) + a.shape[1:])

    def _split(a):
        hi = a.astype(jnp.bfloat16)
        lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    img_hi, img_lo = _split(img)

    def _one(args):
        y0c, x0c, wyc, wxc = args  # [G, C](, T)
        wx_d = _one_hot_weight_matrix(x0c, wxc, offsets, w)  # [G, C, N]
        wy_d = _one_hot_weight_matrix(y0c, wyc, offsets, h)  # [G, C, N]
        # T1[g, y, c] = sum_x img[y, x] * wx_d[g, c, x] on the MXU, via the
        # bf16 hi/lo operand split (3 passes ~ 2e-5 relative error — the
        # flow kernel's bf16x3 trick; Precision.HIGHEST measured ~3x slower)
        wx_hi, wx_lo = _split(wx_d)

        def ein(a, b):
            return jnp.einsum("yx,gcx->gyc", a, b,
                              preferred_element_type=jnp.float32)

        t1 = ein(img_hi, wx_hi) + ein(img_hi, wx_lo)
        if not img_exact_bf16:
            t1 = t1 + ein(img_lo, wx_hi)
        # (8-bit integer frames are exact in bf16, so img_lo == 0 and its
        # pass is dropped — the flow kernel's uint8-exact trick)
        # out[g, c] = sum_y wy_d[g, c, y] * T1[g, y, c] — pinned to HIGHEST:
        # if XLA routes this batched dot to the MXU, default precision would
        # round both f32 operands to bf16 (~4e-3 relative), silently undoing
        # the hi/lo split above; as a VPU f32 multiply-reduce the pin is free
        return jnp.einsum("gcy,gyc->gc", wy_d, t1,
                          precision=jax.lax.Precision.HIGHEST)

    out = jax.lax.map(
        _one, (_chunks(y0i), _chunks(x0i), _chunks(wy), _chunks(wx))
    )
    return out.reshape(-1, c)[:r]


def logpolar(
    img: jnp.ndarray,
    magnitude,
    *,
    resolution: int | None = None,
    interp: str = "lanczos4",
    rows_per_chunk: int = 8,
) -> jnp.ndarray:
    """Log-polar transform of a square ``[N, N]`` image.

    ``magnitude`` is the reference's ``optimM`` scale parameter
    (``scale_rot_magnitude``, ``config/default.yaml:14``) — a Python float
    (it comes from config; a concrete array is accepted and canonicalized).
    It is STATIC: with the rho grid known at trace time, every output
    column whose radius exceeds the farthest sample any stencil tap can
    touch (image corner + tap margin) is provably all-zero under the
    BORDER_CONSTANT semantics, so only the live columns (rounded up to the
    128-lane tile) are resampled and the zeros are concatenated back —
    bit-identical output with fewer matmul FLOPs at the production
    geometry (480 px, optimM 49.9: rays exit the image by rho ~ 293, so
    384 of 480 columns are computed).

    ``resolution`` sets the output size (defaults to N — the reference's
    square geometry); a smaller output trades decode resolution for speed,
    with the decode constants rescaled by the caller (see
    ``ScaleRotationEstimator``).  ``rows_per_chunk`` bounds the dense
    one-hot weight temporaries (output rows per ``lax.map`` step).
    """
    return _logpolar_impl(
        img,
        magnitude=float(magnitude),
        resolution=resolution,
        interp=interp,
        rows_per_chunk=int(rows_per_chunk),
    )


@functools.partial(
    jax.jit,
    static_argnames=("magnitude", "resolution", "interp", "rows_per_chunk"),
)
def _logpolar_impl(
    img: jnp.ndarray,
    *,
    magnitude: float,
    resolution: int | None,
    interp: str,
    rows_per_chunk: int,
) -> jnp.ndarray:
    n = img.shape[-1]
    res = resolution or n
    # 8-bit integer frames (the node's uint8 grayscale carry) are exact in
    # bf16 — the resample drops its low-order image pass (1 of 3 MXU passes)
    exact = jnp.issubdtype(img.dtype, jnp.integer) and img.dtype.itemsize == 1
    img = img.astype(jnp.float32)
    if interp == "lanczos4":
        offsets, weight_fn = _LANCZOS4_OFFSETS, _lanczos4_weights
    elif interp == "bilinear":
        offsets, weight_fn = np.arange(2), _bilinear_weights
    else:
        raise ValueError(
            f"unknown interp {interp!r} (expected 'lanczos4' or 'bilinear')"
        )

    # static rho trim: a tap at integer index floor(coord)+off contributes
    # only if it lands in [0, n); with off in [min_off, max_off] the sample
    # coordinate must lie in (-max_off - 1, n - min_off) per axis, so any
    # sample farther from the centre (n/2, n/2) than the corner of that box
    # (conservatively +|offsets| margin) hits only zeros
    margin = float(max(abs(int(offsets[0])), int(offsets[-1]))) + 1.0
    r_max = float(np.sqrt(2.0)) * (n / 2.0 + margin)
    rho_np = np.arange(res, dtype=np.float64)
    r_np = np.exp(rho_np / magnitude) - 1.0
    c_used = int(np.searchsorted(r_np > r_max, True))
    # round the live-column count up to the 128-lane tile: a non-aligned C
    # sits minor-most in every temporary ([G, y, C] / [G, C]) and measured
    # SLOWER than no trim at all (480 px step: C=304 -> 3.03 ms vs 2.38 ms
    # untrimmed); lane-aligned C=384 -> 1.81 ms (scripts/tune_lp_chunk.py)
    c_used = min(res, -(-max(c_used, 1) // 128) * 128)

    rho = jnp.arange(c_used, dtype=jnp.float32)
    phi = jnp.arange(res, dtype=jnp.float32) * (2.0 * jnp.pi / res)
    r = jnp.exp(rho / jnp.float32(magnitude)) - 1.0
    cx = n / 2.0
    cy = n / 2.0
    x = cx + r[None, :] * jnp.cos(phi)[:, None]
    y = cy + r[None, :] * jnp.sin(phi)[:, None]
    out = _resample_separable(
        img, y, x, offsets=offsets, weight_fn=weight_fn,
        rows_per_chunk=rows_per_chunk, img_exact_bf16=exact,
    )
    if c_used < res:
        out = jnp.concatenate(
            [out, jnp.zeros((res, res - c_used), jnp.float32)], axis=-1
        )
    return out

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
- ``interp="bilinear"`` — ``jax.scipy.ndimage.map_coordinates`` order 1,
  cheaper; the accuracy delta on the scale/rotation decode is quantified in
  ``tests/test_logpolar.py`` and ``docs/PERFORMANCE.md``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _lanczos4_tap_offsets() -> np.ndarray:
    return np.arange(-3, 5)  # 8 taps around floor(coord)


def _lanczos4_weights(frac: jnp.ndarray) -> jnp.ndarray:
    """Normalized Lanczos-4 weights ``[..., 8]`` for fractional offsets
    ``frac`` in [0, 1).  ``L(t) = sinc(t) * sinc(t/4)`` for ``|t| < 4``;
    per-sample normalization to unit sum mirrors OpenCV's
    ``interpolateLanczos4`` coefficient tables."""
    t = frac[..., None] - jnp.asarray(_lanczos4_tap_offsets(), jnp.float32)
    # jnp.sinc is the normalized sinc: sin(pi t)/(pi t), sinc(0) = 1
    w = jnp.sinc(t) * jnp.sinc(t / 4.0)
    return w / jnp.sum(w, axis=-1, keepdims=True)


def _resample_lanczos4(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img`` [H, W] at float coords (``y``, ``x``) [R, C] with an
    8x8 Lanczos-4 stencil; out-of-bounds taps contribute zero (the
    ``cv::remap`` BORDER_CONSTANT border the reference's ``cv::logPolar``
    uses).

    TPU-first layout: the stencil is fetched as ONE contiguous ``[8, 8]``
    slice per output pixel (vmapped ``dynamic_slice`` on a zero-padded
    image — XLA lowers it to a gather of 64-element slices) instead of 64
    independent elementwise gathers.  Elementwise gathers run at ~1e9
    elem/s on v5e, which made the tap loop ~13 ms/frame at 480^2; the
    slice fetch amortizes the gather cost across the whole stencil."""
    h, w = img.shape[-2], img.shape[-1]
    pad = 8
    padded = jnp.pad(img, pad)  # zeros = BORDER_CONSTANT taps

    # any sample farther than 4 px outside the image has an all-zero stencil
    y = jnp.clip(y, -5.0, h + 5.0)
    x = jnp.clip(x, -5.0, w + 5.0)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = _lanczos4_weights((y - y0).astype(jnp.float32))  # [R, C, 8]
    wx = _lanczos4_weights((x - x0).astype(jnp.float32))
    # stencil origin = floor - 3 shifted into padded coords (always in range
    # thanks to the clip above: floor(-5) - 3 + 8 = 0)
    y0i = y0.astype(jnp.int32) - 3 + pad
    x0i = x0.astype(jnp.int32) - 3 + pad

    shape = y.shape
    st = jax.vmap(
        lambda yy, xx: jax.lax.dynamic_slice(padded, (yy, xx), (8, 8))
    )(y0i.reshape(-1), x0i.reshape(-1)).reshape(shape + (8, 8))
    return jnp.einsum("...yx,...y,...x->...", st, wy, wx)


@functools.partial(jax.jit, static_argnames=("resolution", "interp"))
def logpolar(
    img: jnp.ndarray,
    magnitude: jnp.ndarray,
    *,
    resolution: int | None = None,
    interp: str = "lanczos4",
) -> jnp.ndarray:
    """Log-polar transform of a square ``[N, N]`` image.

    ``magnitude`` is the reference's ``optimM`` scale parameter
    (``scale_rot_magnitude``, ``config/default.yaml:14``).  ``resolution``
    sets the output size (defaults to N — the reference's square geometry);
    a smaller output trades decode resolution for speed, with the decode
    constants rescaled by the caller (see ``ScaleRotationEstimator``).
    """
    n = img.shape[-1]
    res = resolution or n
    img = img.astype(jnp.float32)
    rho = jnp.arange(res, dtype=jnp.float32)
    phi = jnp.arange(res, dtype=jnp.float32) * (2.0 * jnp.pi / res)
    r = jnp.exp(rho / magnitude) - 1.0
    cx = n / 2.0
    cy = n / 2.0
    x = cx + r[None, :] * jnp.cos(phi)[:, None]
    y = cy + r[None, :] * jnp.sin(phi)[:, None]
    if interp == "lanczos4":
        return _resample_lanczos4(img, y, x)
    if interp == "bilinear":
        return jax.scipy.ndimage.map_coordinates(
            img, [y, x], order=1, mode="constant", cval=0.0
        )
    raise ValueError(f"unknown interp {interp!r} (expected 'lanczos4' or 'bilinear')")

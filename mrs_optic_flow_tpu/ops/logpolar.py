"""On-device log-polar resampling (``cv::logPolar`` equivalent).

Feeds the scale/rotation estimator (``src/scaleRotationEstimator.cpp:34-148``):
phase correlation of two log-polar images turns scale into an x-shift and
rotation into a y-shift, decoded as ``scale = exp(dx / M)`` and
``rot = (dy / Ky) * pi/180`` with ``Ky = resolution / 360``
(``src/scaleRotationEstimator.cpp:28``, ``:123-124``).

Sampling convention matches OpenCV's dense inverse map: output pixel
``(row=phi_idx, col=rho_idx)`` samples the source at
``center + exp(rho_idx / M) * (cos(phi), sin(phi))`` with
``phi = phi_idx * 2*pi / rows``.  Interpolation is bilinear
(``jax.scipy.ndimage.map_coordinates`` order 1); the reference requests
Lanczos4 (``:113``) — a quality difference on textureless images only,
and the phase-correlation decode is identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("resolution",))
def logpolar(
    img: jnp.ndarray, magnitude: jnp.ndarray, *, resolution: int | None = None
) -> jnp.ndarray:
    """Log-polar transform of a square ``[N, N]`` image.

    ``magnitude`` is the reference's ``optimM`` scale parameter
    (``scale_rot_magnitude``, ``config/default.yaml:14``).
    """
    n = img.shape[-1]
    res = resolution or n
    rho = jnp.arange(res, dtype=jnp.float32)
    phi = jnp.arange(res, dtype=jnp.float32) * (2.0 * jnp.pi / res)
    r = jnp.exp(rho / magnitude)
    cx = n / 2.0
    cy = n / 2.0
    x = cx + r[None, :] * jnp.cos(phi)[:, None]
    y = cy + r[None, :] * jnp.sin(phi)[:, None]
    return jax.scipy.ndimage.map_coordinates(
        img.astype(jnp.float32), [y, x], order=1, mode="constant", cval=0.0
    )

"""Pinhole camera / primary-ray generation.

Parity target (ref shaders/raygen.rgen:50-57):
  screenPos = pixel + (r1, r2)           # subpixel jitter
  inUV      = screenPos / (W, H)
  d         = inUV * 2 - 1
  origin    = (0, -1, 5)
  target    = (d.x, d.y - 1, 2)
  direction = normalize(target - origin)

Generalized as target = center + d.x*right + d.y*up (see CameraConfig).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .config import CameraConfig


def generate_rays(px, py, r1, r2, cam: CameraConfig, width: int, height: int):
    """px, py: int arrays (pixel column/row); r1, r2: jitter in [0,1].

    Returns (origin, direction), each (..., 3) float32.
    """
    sx = px.astype(jnp.float32) + r1
    sy = py.astype(jnp.float32) + r2
    dx = sx * np.float32(2.0 / width) - np.float32(1.0)
    dy = sy * np.float32(2.0 / height) - np.float32(1.0)

    center = jnp.asarray(cam.center, jnp.float32)
    right = jnp.asarray(cam.right, jnp.float32)
    up = jnp.asarray(cam.up, jnp.float32)
    origin = jnp.asarray(cam.origin, jnp.float32)

    target = center + dx[..., None] * right + dy[..., None] * up
    d = target - origin
    d = d * jax_rsqrt_sum(d)
    o = jnp.broadcast_to(origin, d.shape)
    return o, d


def jax_rsqrt_sum(v):
    import jax.lax as lax

    return lax.rsqrt(jnp.sum(v * v, axis=-1, keepdims=True))

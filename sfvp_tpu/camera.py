"""Pinhole camera / primary-ray generation.

Parity target (ref shaders/raygen.rgen:50-57):
  screenPos = pixel + (r1, r2)           # subpixel jitter
  inUV      = screenPos / (W, H)
  d         = inUV * 2 - 1
  origin    = (0, -1, 5)
  target    = (d.x, d.y - 1, 2)
  direction = normalize(target - origin)

Generalized as target = center + d.x*right + d.y*up (see CameraConfig).
SoA core; thin array wrapper for tools/tests.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .config import CameraConfig
from .utils import vec


def generate_rays_soa(px, py, r1, r2, cam: CameraConfig, width: int, height: int):
    """px, py: int arrays (pixel column/row); r1, r2: jitter in [0,1].
    Returns (origin, direction) as component tuples."""
    dx = (px.astype(jnp.float32) + r1) * np.float32(2.0 / width) - np.float32(1.0)
    dy = (py.astype(jnp.float32) + r2) * np.float32(2.0 / height) - np.float32(1.0)

    cx, cy, cz = (np.float32(c) for c in cam.center)
    rx, ry, rz = (np.float32(c) for c in cam.right)
    ux, uy, uz = (np.float32(c) for c in cam.up)
    ox, oy, oz = (np.float32(c) for c in cam.origin)

    d = (
        cx + dx * rx + dy * ux - ox,
        cy + dx * ry + dy * uy - oy,
        cz + dx * rz + dy * uz - oz,
    )
    d = vec.normalize(d)
    o = (
        jnp.full_like(d[0], ox),
        jnp.full_like(d[1], oy),
        jnp.full_like(d[2], oz),
    )
    return o, d


def generate_rays(px, py, r1, r2, cam: CameraConfig, width: int, height: int):
    o, d = generate_rays_soa(px, py, r1, r2, cam, width, height)
    return vec.to_array(o), vec.to_array(d)

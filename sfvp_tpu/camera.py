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


def apply_thin_lens_soa(o, d, rl1, rl2, cam: CameraConfig):
    """Thin-lens depth of field (extension; the reference camera is a pure
    pinhole, ref raygen.rgen:50-57): offset each origin by a concentric
    disk sample of radius ``cam.lens_radius`` in the lens plane and re-aim
    at the focal point ``origin + d * focus_dist``. The focal plane maps
    exactly (objects there stay sharp); elsewhere blurs with circle of
    confusion proportional to |depth - focus_dist|.

    rl1, rl2: uniforms in [0, 1) (drawn by the integrator ONLY when
    lens_radius > 0, so pinhole RNG streams are untouched)."""
    if cam.focus_dist <= 0.0:
        raise ValueError(
            f"thin-lens camera needs focus_dist > 0 (got "
            f"{cam.focus_dist}); with the focal plane at distance 0 every "
            f"ray re-aims at its own origin and the render degenerates"
        )
    lr = np.float32(cam.lens_radius)
    fd = np.float32(cam.focus_dist)
    # uniform disk (polar; radius sqrt for uniform area density)
    rad = lr * jnp.sqrt(jnp.maximum(rl1, 0.0))
    phi = np.float32(2.0 * np.pi) * rl2
    lx = rad * jnp.cos(phi)
    ly = rad * jnp.sin(phi)
    # lens basis: normalized image-plane axes
    rn = vec.normalize(tuple(np.float32(c) for c in cam.right))
    un = vec.normalize(tuple(np.float32(c) for c in cam.up))
    # the focal point lies on the focal PLANE at depth focus_dist along
    # the camera forward axis (t = fd / cos), so a flat wall at that
    # depth stays sharp across the whole frame
    fwd = vec.normalize(tuple(
        np.float32(c) - np.float32(oc)
        for c, oc in zip(cam.center, cam.origin)
    ))
    t_focal = fd / jnp.maximum(vec.dot(d, fwd), np.float32(1e-4))
    focal = vec.add(o, vec.scale(d, t_focal))
    o2 = (
        o[0] + lx * rn[0] + ly * un[0],
        o[1] + lx * rn[1] + ly * un[1],
        o[2] + lx * rn[2] + ly * un[2],
    )
    d2 = vec.normalize(vec.sub(focal, o2))
    return o2, d2


def generate_rays(px, py, r1, r2, cam: CameraConfig, width: int, height: int):
    o, d = generate_rays_soa(px, py, r1, r2, cam, width, height)
    return vec.to_array(o), vec.to_array(d)

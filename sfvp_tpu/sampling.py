"""Direction sampling and the tangent-frame construction.

Parity targets (ref shaders/raygen.rgen:14-39):
  - ``createCoordinateSystem``: branch on |N.x| > |N.y|
  - ``sampleHemisphere``: *uniform* hemisphere, z = rand1, pdf = 1/(2*pi)
  - ``sampleDirection``: rotate hemisphere sample into the normal's frame

Plus a cosine-weighted variant (not in the reference) for fast mode.
Core implementations are SoA (component tuples of (N,) arrays — see
utils/vec.py); thin array-interface wrappers are kept for tests/tools.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .utils import vec

TWO_PI = np.float32(2.0 * np.pi)
INV_TWO_PI = np.float32(1.0 / (2.0 * np.pi))
INV_PI = np.float32(1.0 / np.pi)


# ----------------------------- SoA core -----------------------------------


def coordinate_system_soa(n):
    """Tangent + bitangent for normal n, ref shaders/raygen.rgen:14-21."""
    nx, ny, nz = n
    use_x = jnp.abs(nx) > jnp.abs(ny)
    inv_a = jax.lax.rsqrt(nx * nx + nz * nz)
    inv_b = jax.lax.rsqrt(ny * ny + nz * nz)
    t = (
        jnp.where(use_x, nz * inv_a, 0.0),
        jnp.where(use_x, 0.0, -nz * inv_b),
        jnp.where(use_x, -nx * inv_a, ny * inv_b),
    )
    b = vec.cross(n, t)
    return t, b


def hemisphere_uniform_local(r1, r2):
    """Uniform hemisphere in local coords; pdf = 1/(2*pi). z = r1 directly,
    ref shaders/raygen.rgen:23-30."""
    s = jnp.sqrt(jnp.maximum(0.0, 1.0 - r1 * r1))
    phi = TWO_PI * r2
    return (jnp.cos(phi) * s, jnp.sin(phi) * s, r1)


def hemisphere_cosine_local(r1, r2):
    """Cosine-weighted hemisphere; pdf = cos(theta)/pi; cos(theta)=sqrt(1-r1)."""
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - r1))
    s = jnp.sqrt(jnp.maximum(0.0, r1))
    phi = TWO_PI * r2
    return (jnp.cos(phi) * s, jnp.sin(phi) * s, z)


def to_world_soa(local_dir, n):
    t, b = coordinate_system_soa(n)
    lx, ly, lz = local_dir
    return vec.add(vec.add(vec.scale(t, lx), vec.scale(b, ly)), vec.scale(n, lz))


def sample_direction_uniform_soa(r1, r2, n):
    """ref shaders/raygen.rgen:32-39: uniform hemisphere around n."""
    return to_world_soa(hemisphere_uniform_local(r1, r2), n)


def sample_direction_cosine_soa(r1, r2, n):
    return to_world_soa(hemisphere_cosine_local(r1, r2), n)


# ------------------------ array-interface wrappers -------------------------


def coordinate_system(n):
    t, b = coordinate_system_soa(vec.from_array(n))
    return vec.to_array(t), vec.to_array(b)


def sample_hemisphere_uniform(r1, r2):
    return vec.to_array(hemisphere_uniform_local(r1, r2))


def sample_hemisphere_cosine(r1, r2):
    return vec.to_array(hemisphere_cosine_local(r1, r2))


def to_world(local_dir, n):
    return vec.to_array(to_world_soa(vec.from_array(local_dir), vec.from_array(n)))


def sample_direction_uniform(r1, r2, n):
    return vec.to_array(sample_direction_uniform_soa(r1, r2, vec.from_array(n)))


def sample_direction_cosine(r1, r2, n):
    return vec.to_array(sample_direction_cosine_soa(r1, r2, vec.from_array(n)))

"""Direction sampling and the tangent-frame construction.

Parity targets (ref shaders/raygen.rgen:14-39):
  - ``createCoordinateSystem``: branch on |N.x| > |N.y|
  - ``sampleHemisphere``: *uniform* hemisphere, z = rand1, pdf = 1/(2*pi)
  - ``sampleDirection``: rotate hemisphere sample into the normal's frame

Plus a cosine-weighted variant (not in the reference) for fast mode.
All functions take/return (..., 3)-shaped float32 arrays and are vectorized
over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

TWO_PI = np.float32(2.0 * np.pi)
INV_TWO_PI = np.float32(1.0 / (2.0 * np.pi))
INV_PI = np.float32(1.0 / np.pi)


def coordinate_system(n):
    """Tangent + bitangent for normal n, ref shaders/raygen.rgen:14-21.

    T = (n.z, 0, -n.x)/sqrt(nx^2+nz^2)   if |n.x| > |n.y|
        (0, -n.z, n.y)/sqrt(ny^2+nz^2)   otherwise
    B = cross(n, T)
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    use_x = jnp.abs(nx) > jnp.abs(ny)
    inv_a = jax_rsqrt(nx * nx + nz * nz)
    inv_b = jax_rsqrt(ny * ny + nz * nz)
    tx = jnp.where(use_x, nz * inv_a, 0.0)
    ty = jnp.where(use_x, 0.0, -nz * inv_b)
    tz = jnp.where(use_x, -nx * inv_a, ny * inv_b)
    t = jnp.stack([tx, ty, tz], axis=-1)
    b = jnp.cross(n, t)
    return t, b


def jax_rsqrt(x):
    import jax.lax as lax

    return lax.rsqrt(x)


def sample_hemisphere_uniform(r1, r2):
    """Uniform hemisphere sample in local (T,B,N) coords; pdf = 1/(2*pi).
    ref shaders/raygen.rgen:23-30. Note sqrt(1 - r1^2): r1 is z directly."""
    s = jnp.sqrt(jnp.maximum(0.0, 1.0 - r1 * r1))
    phi = TWO_PI * r2
    return jnp.stack([jnp.cos(phi) * s, jnp.sin(phi) * s, r1], axis=-1)


def sample_hemisphere_cosine(r1, r2):
    """Cosine-weighted hemisphere sample; pdf = cos(theta)/pi."""
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - r1))
    s = jnp.sqrt(jnp.maximum(0.0, r1))
    phi = TWO_PI * r2
    return jnp.stack([jnp.cos(phi) * s, jnp.sin(phi) * s, z], axis=-1)


def to_world(local_dir, n):
    """Rotate a local (T,B,N) direction into world space around normal n."""
    t, b = coordinate_system(n)
    return (
        local_dir[..., 0:1] * t
        + local_dir[..., 1:2] * b
        + local_dir[..., 2:3] * n
    )


def sample_direction_uniform(r1, r2, n):
    """ref shaders/raygen.rgen:32-39: uniform hemisphere around n."""
    return to_world(sample_hemisphere_uniform(r1, r2), n)


def sample_direction_cosine(r1, r2, n):
    return to_world(sample_hemisphere_cosine(r1, r2), n)

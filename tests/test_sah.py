"""Binned-SAH builder (accel/sah.py): invariants, traversal ≡ brute force,
wide-collapse compatibility, and tree quality vs the Morton LBVH
(SURVEY.md §4 item 1 applied to the second builder)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sfvp_tpu.accel.lbvh import bvh_from_arrays, check_invariants
from sfvp_tpu.accel.sah import sah_bvh_from_arrays
from sfvp_tpu.accel.wide import build_wide_from_buffers
from sfvp_tpu.kernels.bvh_traverse import make_trace_bvh_jnp
from sfvp_tpu.kernels.intersect import trace_brute_jnp
from sfvp_tpu.scene.buffers import from_arrays


def _random_soup(n, seed=0, spread=10.0):
    g = np.random.default_rng(seed)
    centers = g.uniform(-spread, spread, (n, 1, 3))
    tris = centers + g.normal(0, 0.6, (n, 3, 3))
    return tris.astype(np.float32)


def _random_rays(n, seed=1, spread=12.0):
    g = np.random.default_rng(seed)
    o = g.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = g.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("n", [1, 5, 36, 500, 2000])
def test_invariants_random_soup(n):
    tris = _random_soup(n, seed=n)
    bvh = sah_bvh_from_arrays(tris, leaf_size=8)
    check_invariants(bvh, tris)
    assert bvh.count.max() <= 8


def test_invariants_degenerate_identical_centroids():
    # all triangles share one centroid: the median fallback must still
    # split below the max_leaf cap
    tri = _random_soup(1, seed=3)[0]
    tris = np.repeat(tri[None], 37, axis=0)
    bvh = sah_bvh_from_arrays(tris, leaf_size=8)
    check_invariants(bvh, tris)
    assert bvh.count.max() <= 8


@pytest.mark.parametrize("n,seed", [(36, 2), (200, 3), (1000, 4)])
def test_traversal_equals_brute_force(n, seed):
    tris = _random_soup(n, seed=seed)
    z = np.zeros((len(tris), 3), np.float32)
    buffers = from_arrays(tris, z, z)
    bvh = sah_bvh_from_arrays(tris, leaf_size=8)
    trace_bvh = make_trace_bvh_jnp(bvh)
    o, d = _random_rays(512, seed=seed + 100)
    h_brute = trace_brute_jnp(o, d, buffers, 1e-3, 1e4)
    h_bvh = trace_bvh(o, d, buffers, 1e-3, 1e4)
    bt = np.asarray(h_brute.t)
    vt = np.asarray(h_bvh.t)
    np.testing.assert_array_equal(np.isinf(bt), np.isinf(vt))
    fin = np.isfinite(bt)
    np.testing.assert_allclose(vt[fin], bt[fin], rtol=1e-5, atol=1e-6)
    assert (np.asarray(h_brute.prim) == np.asarray(h_bvh.prim)).mean() > 0.995


def test_wide_collapse_from_sah(cornell_buffers):
    wide = build_wide_from_buffers(cornell_buffers, builder="sah")
    # every original primitive appears exactly once in the leaf rows
    prims = wide.prim_rows[wide.prim_rows >= 0]
    assert sorted(prims.tolist()) == list(range(cornell_buffers.num_tris))


def test_sah_cost_not_worse_than_lbvh():
    """SAH tree quality (surface-area cost) must never regress below the
    Morton build on a clustered scene."""
    tris = _random_soup(3000, seed=11, spread=25.0)

    def sah_cost(b):
        dx = b.bmax_x - b.bmin_x
        dy = b.bmax_y - b.bmin_y
        dz = b.bmax_z - b.bmin_z
        area = dx * dy + dy * dz + dz * dx
        w = np.where(b.count > 0, b.count, 1)
        return float((area * w).sum() / max(area[0], 1e-30))

    s = sah_cost(sah_bvh_from_arrays(tris, leaf_size=8))
    l = sah_cost(bvh_from_arrays(tris, leaf_size=8))
    assert s <= l * 1.02, (s, l)


def test_wide_collapse_fill():
    """The absorb-small-subtrees-first collapse must produce well-filled
    wide nodes (the blind 3-level cut averaged ~4.2 of 8 children)."""
    from sfvp_tpu.accel.wide import build_wide
    from sfvp_tpu.scene.buffers import from_arrays

    tris = _random_soup(20_000, seed=7)
    z = np.zeros((len(tris), 3), np.float32)
    buffers = from_arrays(tris, z, z)
    bvh = sah_bvh_from_arrays(tris, leaf_size=8)
    wide = build_wide(bvh, np.zeros((len(tris), 7), np.float32))
    fill = (wide.nodes[:, 56:64] > 0.5).sum() / wide.nodes.shape[0]
    assert fill >= 5.0, fill
    # parity of content: every primitive in exactly one leaf slot
    prims = wide.prim_rows[wide.prim_rows >= 0]
    assert sorted(prims.tolist()) == list(range(len(tris)))
    assert buffers.num_tris == len(tris)


def test_builder_auto_dispatch(cornell_buffers):
    w_auto = build_wide_from_buffers(cornell_buffers, builder="auto")
    w_sah = build_wide_from_buffers(cornell_buffers, builder="sah")
    np.testing.assert_array_equal(w_auto.nodes, w_sah.nodes)
    np.testing.assert_array_equal(w_auto.tris, w_sah.tris)

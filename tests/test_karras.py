"""Karras-2012 on-device topology emission (accel/karras.py): must equal
the host sequential emitter exactly on distinct morton codes, and produce a
valid (invariant-checked, traversal-equivalent) tree on duplicate codes."""

import numpy as np
import jax.numpy as jnp

from sfvp_tpu.accel.device_build import build_bvh_on_device
from sfvp_tpu.accel.karras import _collapse_thread_depth, karras_ranges
from sfvp_tpu.accel.lbvh import (
    bvh_from_arrays, check_invariants, emit_topology, topology_to_links,
)
from sfvp_tpu.kernels.bvh_traverse import make_trace_bvh_jnp
from sfvp_tpu.kernels.intersect import trace_brute_jnp
from sfvp_tpu.scene.buffers import from_arrays


def _grid_tris(n):
    """Triangles on a jittered 3D grid: guaranteed-distinct morton codes."""
    g = np.random.default_rng(3)
    side = int(np.ceil(n ** (1 / 3)))
    idx = np.arange(n)
    base = np.stack([idx % side, (idx // side) % side, idx // side**2],
                    axis=1).astype(np.float32)
    tris = base[:, None, :] + g.normal(0, 0.05, (n, 3, 3)).astype(np.float32)
    return tris.astype(np.float32)


def test_karras_topology_equals_host_on_distinct_codes():
    for n, leaf in ((37, 4), (500, 8), (1024, 8)):
        tris = _grid_tris(n)
        host = bvh_from_arrays(tris, leaf_size=leaf)
        z = np.zeros((n, 3), np.float32)
        dev = build_bvh_on_device(from_arrays(tris, z, z), leaf_size=leaf)
        assert dev.num_nodes == host.num_nodes, (n, leaf)
        np.testing.assert_array_equal(dev.skip, host.skip)
        np.testing.assert_array_equal(dev.first, host.first)
        np.testing.assert_array_equal(dev.count, host.count)
        np.testing.assert_array_equal(dev.prim_id, host.prim_id)
        np.testing.assert_allclose(dev.bmin_y, host.bmin_y, rtol=1e-6)
        np.testing.assert_allclose(dev.bmax_z, host.bmax_z, rtol=1e-6)


def test_karras_ranges_cover_tree():
    """Root covers everything; children partition each kept node's range."""
    codes = np.sort(np.random.default_rng(5).integers(
        0, 2**30, 300).astype(np.uint32))
    lo, hi, gamma = (np.asarray(a) for a in
                     karras_ranges(jnp.asarray(codes)))
    assert lo[0] == 0 and hi[0] == len(codes) - 1
    assert np.all((gamma >= lo) & (gamma < hi))


def test_karras_duplicate_codes_valid():
    """All-identical morton codes (worst-case ties): tree must still be a
    valid partition and traverse identically to brute force."""
    n = 257
    g = np.random.default_rng(11)
    center = np.zeros((n, 1, 3), np.float32)
    tris = (center + g.normal(0, 1e-7, (n, 3, 3))).astype(np.float32)
    z = np.zeros((n, 3), np.float32)
    buffers = from_arrays(tris, z, z)
    bvh = build_bvh_on_device(buffers, leaf_size=8)
    check_invariants(bvh, tris)

    o = jnp.asarray(g.uniform(-2, 2, (128, 3)), jnp.float32)
    d = g.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    h_ref = trace_brute_jnp(o, d, buffers, 1e-3, 1e4)
    h_dev = make_trace_bvh_jnp(bvh)(o, d, buffers, 1e-3, 1e4)
    np.testing.assert_array_equal(
        np.isinf(np.asarray(h_ref.t)), np.isinf(np.asarray(h_dev.t)))


def test_karras_collapse_leaf_sizes():
    codes = jnp.asarray(np.sort(np.random.default_rng(13).integers(
        0, 2**30, 600).astype(np.uint32)))
    lo, hi, gamma = karras_ranges(codes)
    skip, first, count, depth, valid, m = _collapse_thread_depth(
        lo, hi, gamma, 8)
    m = int(m)
    count = np.asarray(count)[:m]
    first = np.asarray(first)[:m]
    leaves = count > 0
    assert count[leaves].max() <= 8 and count[leaves].min() >= 1
    # leaves tile [0, T) exactly once
    covered = np.zeros(600, bool)
    for f, c in zip(first[leaves], count[leaves]):
        assert not covered[f:f + c].any()
        covered[f:f + c] = True
    assert covered.all()

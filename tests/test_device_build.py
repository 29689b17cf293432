"""On-device LBVH build (morton + sort + bounds on device, topology on
host) must produce a valid tree that traverses identically to brute force,
and matches the host builder's topology when quantization agrees."""

import numpy as np
import jax.numpy as jnp
import pytest

from sfvp_tpu.accel.device_build import (
    build_bvh_on_device, morton_codes_device, sort_by_codes_device,
)
from sfvp_tpu.accel.lbvh import bvh_from_arrays, check_invariants, _morton_codes
from sfvp_tpu.kernels.bvh_traverse import make_trace_bvh_jnp
from sfvp_tpu.kernels.intersect import trace_brute_jnp
from sfvp_tpu.scene.buffers import from_arrays


def _soup(n, seed=0):
    g = np.random.default_rng(seed)
    return (
        g.uniform(-5, 5, (n, 1, 3)) + g.normal(0, 0.5, (n, 3, 3))
    ).astype(np.float32)


def test_device_morton_matches_host():
    tris = _soup(500, seed=1)
    host_codes = _morton_codes(0.5 * (tris.min(1) + tris.max(1)))
    dev_codes = np.asarray(
        morton_codes_device(
            jnp.asarray(tris[:, 0]), jnp.asarray(tris[:, 1]),
            jnp.asarray(tris[:, 2]),
        )
    )
    assert (host_codes == dev_codes).mean() > 0.999  # quantization edge ulps


def test_device_sort_stable():
    codes = jnp.asarray(np.array([5, 1, 5, 3, 1], np.uint32))
    cs, order = sort_by_codes_device(codes)
    np.testing.assert_array_equal(np.asarray(cs), [1, 1, 3, 5, 5])
    np.testing.assert_array_equal(np.asarray(order), [1, 4, 3, 0, 2])


@pytest.mark.parametrize("n", [40, 500, 1200])
def test_device_build_valid_and_equivalent(n):
    tris = _soup(n, seed=n)
    z = np.zeros((n, 3), np.float32)
    buffers = from_arrays(tris, z, z)
    bvh = build_bvh_on_device(buffers, leaf_size=8)
    check_invariants(bvh, tris)

    g = np.random.default_rng(7)
    o = jnp.asarray(g.uniform(-6, 6, (256, 3)), jnp.float32)
    d = g.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    h_ref = trace_brute_jnp(o, d, buffers, 1e-3, 1e4)
    h_dev = make_trace_bvh_jnp(bvh)(o, d, buffers, 1e-3, 1e4)
    np.testing.assert_array_equal(
        np.isinf(np.asarray(h_ref.t)), np.isinf(np.asarray(h_dev.t))
    )
    fin = np.isfinite(np.asarray(h_ref.t))
    np.testing.assert_allclose(
        np.asarray(h_dev.t)[fin], np.asarray(h_ref.t)[fin], rtol=1e-5
    )


def test_device_build_matches_host_topology():
    tris = _soup(300, seed=9)
    z = np.zeros((300, 3), np.float32)
    buffers = from_arrays(tris, z, z)
    dev = build_bvh_on_device(buffers, leaf_size=8)
    host = bvh_from_arrays(tris, leaf_size=8)
    if dev.num_nodes == host.num_nodes:
        np.testing.assert_array_equal(dev.skip, host.skip)
        np.testing.assert_array_equal(dev.prim_id, host.prim_id)
        np.testing.assert_allclose(dev.bmin_x, host.bmin_x, rtol=1e-6)
    else:  # rare quantization ulp differences change splits; still valid
        check_invariants(dev, tris)

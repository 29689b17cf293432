"""LBVH build invariants + traversal ≡ brute force equivalence
(SURVEY.md §4 item 1: every tri in exactly one leaf, parent AABBs contain
children, traversal matches brute force on random rays)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sfvp_tpu.accel.lbvh import BVH, build_bvh, bvh_from_arrays, check_invariants, morton3d
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


def test_morton_basics():
    # interleave pattern: x gets bit 2, y bit 1, z bit 0
    assert int(morton3d(np.array([1]), np.array([0]), np.array([0]))[0]) == 4
    assert int(morton3d(np.array([0]), np.array([1]), np.array([0]))[0]) == 2
    assert int(morton3d(np.array([0]), np.array([0]), np.array([1]))[0]) == 1
    assert int(morton3d(np.array([1023]), np.array([1023]), np.array([1023]))[0]) == (1 << 30) - 1
    # locality: nearby quantized points share high bits
    a = morton3d(np.array([512]), np.array([512]), np.array([512]))[0]
    b = morton3d(np.array([513]), np.array([512]), np.array([512]))[0]
    c = morton3d(np.array([0]), np.array([1023]), np.array([0]))[0]
    assert (int(a) ^ int(b)) < (int(a) ^ int(c))


@pytest.mark.parametrize("n,leaf", [(1, 4), (5, 1), (36, 4), (500, 4), (500, 8)])
def test_invariants_random_soup(n, leaf):
    tris = _random_soup(n, seed=n)
    bvh = bvh_from_arrays(tris, leaf_size=leaf)
    check_invariants(bvh, tris)
    assert bvh.count.max() <= leaf
    assert (bvh.count > 0).sum() >= (n + leaf - 1) // leaf / 2  # sane leaf count


def test_invariants_cornell(cornell):
    tris = cornell.triangles()
    bvh = bvh_from_arrays(tris, leaf_size=4)
    check_invariants(bvh, tris)
    # root AABB == scene AABB
    np.testing.assert_allclose(
        [bvh.bmin_x[0], bvh.bmin_y[0], bvh.bmin_z[0]],
        tris.reshape(-1, 3).min(axis=0), rtol=1e-6,
    )


def _equiv_check(tris, rays_seed, nrays=512, t_min=1e-3, t_max=1e4, leaf=4):
    z = np.zeros((len(tris), 3), np.float32)
    buffers = from_arrays(tris, z, z)
    bvh = bvh_from_arrays(tris, leaf_size=leaf)
    trace_bvh = make_trace_bvh_jnp(bvh)
    o, d = _random_rays(nrays, seed=rays_seed)
    h_brute = trace_brute_jnp(o, d, buffers, t_min, t_max)
    h_bvh = trace_bvh(o, d, buffers, t_min, t_max)
    bt = np.asarray(h_brute.t)
    vt = np.asarray(h_bvh.t)
    # same hit/miss pattern
    np.testing.assert_array_equal(np.isinf(bt), np.isinf(vt))
    fin = np.isfinite(bt)
    np.testing.assert_allclose(vt[fin], bt[fin], rtol=1e-5, atol=1e-6)
    # prim ids equal except fp-tie cases
    agree = (np.asarray(h_brute.prim) == np.asarray(h_bvh.prim))
    assert agree.mean() > 0.995, agree.mean()


@pytest.mark.parametrize("n,seed,leaf", [(36, 2, 4), (200, 3, 4), (1000, 4, 8), (7, 5, 1)])
def test_traversal_equals_brute_force(n, seed, leaf):
    _equiv_check(_random_soup(n, seed=seed), rays_seed=seed + 100, leaf=leaf)


def test_traversal_cornell_interior_rays(cornell, cornell_buffers):
    tris = cornell.triangles()
    bvh = bvh_from_arrays(tris, leaf_size=4)
    trace_bvh = make_trace_bvh_jnp(bvh)
    g = np.random.default_rng(7)
    o = np.stack(
        [g.uniform(-0.9, 0.9, 512), g.uniform(-1.9, -0.1, 512), g.uniform(-0.9, 0.9, 512)],
        axis=1,
    ).astype(np.float32)
    d = g.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    h_brute = trace_brute_jnp(jnp.asarray(o), jnp.asarray(d), cornell_buffers, 1e-3, 1e4)
    h_bvh = trace_bvh(jnp.asarray(o), jnp.asarray(d), cornell_buffers, 1e-3, 1e4)
    assert (np.asarray(h_brute.prim) == np.asarray(h_bvh.prim)).mean() > 0.995
    fin = np.isfinite(np.asarray(h_brute.t))
    np.testing.assert_allclose(
        np.asarray(h_bvh.t)[fin], np.asarray(h_brute.t)[fin], rtol=1e-5
    )


def test_inactive_rays_skip_traversal(cornell, cornell_buffers):
    tris = cornell.triangles()
    bvh = bvh_from_arrays(tris, leaf_size=4)
    trace_bvh = make_trace_bvh_jnp(bvh)
    o = jnp.asarray([[0.0, -1.0, 0.0]] * 4, jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0]] * 4, jnp.float32)
    act = jnp.asarray([True, False, True, False])
    h = trace_bvh(o, d, cornell_buffers, 1e-3, 1e4, active=act)
    assert np.isfinite(np.asarray(h.t))[0] and np.isfinite(np.asarray(h.t))[2]
    assert np.isinf(np.asarray(h.t))[1] and np.isinf(np.asarray(h.t))[3]


def test_end_to_end_render_with_bvh(cornell):
    """Full integrator with traversal='bvh' must statistically match brute."""
    import dataclasses
    import jax
    from sfvp_tpu import RenderConfig, init_state, make_render_step, upload
    from sfvp_tpu.accel import build_bvh as build

    cfg = RenderConfig(width=16, height=16, spp_per_step=32, max_depth=4,
                       traversal="bvh", backend="jnp")
    buffers = upload(cornell)
    bvh = build(buffers, leaf_size=4)
    step_bvh = jax.jit(make_render_step(cfg, buffers, trace_fn=make_trace_bvh_jnp(bvh)))
    step_brute = jax.jit(make_render_step(cfg, buffers))
    a = np.asarray(step_bvh(init_state(16, 16)).accum)
    b = np.asarray(step_brute(init_state(16, 16)).accum)
    # identical sample streams + equivalent traversal -> near-identical image
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

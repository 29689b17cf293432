"""Moller-Trumbore + brute-force trace tests vs analytic oracles.
Replaces the reference's opaque hardware traversal (traceRayEXT,
ref shaders/raygen.rgen:63-75) with testable software semantics."""

import numpy as np
import jax.numpy as jnp

from sfvp_tpu.kernels.intersect import Hit, moller_trumbore, trace_brute_jnp
from sfvp_tpu.scene.buffers import from_arrays


def _buffers(tris, pad_to=None):
    tris = np.asarray(tris, np.float32)
    z = np.zeros((len(tris), 3), np.float32)
    return from_arrays(tris, z, z, pad_to=pad_to)


UNIT_TRI = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]  # z=0 plane


def test_mt_analytic_hit():
    o = jnp.asarray([[0.25, 0.25, 1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    tri = np.asarray(UNIT_TRI, np.float32)
    valid, t, u, v = moller_trumbore(o, d, tri[0], tri[1], tri[2], 1e-3, 1e4)
    assert bool(valid[0])
    assert float(t[0]) == np.float32(1.0)
    assert float(u[0]) == np.float32(0.25)
    assert float(v[0]) == np.float32(0.25)


def test_mt_no_backface_culling():
    # hit from both sides (ref main.cpp:525: TriangleFacingCullDisable)
    tri = np.asarray(UNIT_TRI, np.float32)
    o_front = jnp.asarray([[0.2, 0.2, 1.0]], jnp.float32)
    o_back = jnp.asarray([[0.2, 0.2, -1.0]], jnp.float32)
    d_down = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    d_up = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    for o, d in [(o_front, d_down), (o_back, d_up)]:
        valid, t, _, _ = moller_trumbore(o, d, tri[0], tri[1], tri[2], 1e-3, 1e4)
        assert bool(valid[0]) and float(t[0]) == 1.0


def test_mt_miss_outside_barycentric():
    tri = np.asarray(UNIT_TRI, np.float32)
    o = jnp.asarray([[0.9, 0.9, 1.0]], jnp.float32)  # u+v>1
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    valid, *_ = moller_trumbore(o, d, tri[0], tri[1], tri[2], 1e-3, 1e4)
    assert not bool(valid[0])


def test_mt_parallel_ray():
    tri = np.asarray(UNIT_TRI, np.float32)
    o = jnp.asarray([[0.2, 0.2, 1.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)  # parallel to plane
    valid, *_ = moller_trumbore(o, d, tri[0], tri[1], tri[2], 1e-3, 1e4)
    assert not bool(valid[0])


def test_t_window():
    tri = np.asarray(UNIT_TRI, np.float32)
    o = jnp.asarray([[0.2, 0.2, 1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    # t=1; excluded when t_max < 1 or t_min > 1 (strict: t>tmin, t<tmax,
    # ref raygen.rgen:72-73 passes 0.001/10000 to traceRayEXT)
    valid, *_ = moller_trumbore(o, d, tri[0], tri[1], tri[2], 1e-3, 0.5)
    assert not bool(valid[0])
    valid, *_ = moller_trumbore(o, d, tri[0], tri[1], tri[2], 2.0, 1e4)
    assert not bool(valid[0])


def test_trace_closest_of_two():
    near = [[-1, -1, 0.5], [1, -1, 0.5], [0, 2, 0.5]]
    far = [[-1, -1, 0.0], [1, -1, 0.0], [0, 2, 0.0]]
    buf = _buffers([far, near])
    o = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    hit = trace_brute_jnp(o, d, buf, 1e-3, 1e4)
    assert int(hit.prim[0]) == 1  # the nearer triangle
    assert float(hit.t[0]) == np.float32(0.5)


def test_trace_miss_is_inf():
    buf = _buffers([UNIT_TRI])
    o = jnp.asarray([[5.0, 5.0, 1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    hit = trace_brute_jnp(o, d, buf, 1e-3, 1e4)
    assert np.isinf(float(hit.t[0]))
    assert int(hit.prim[0]) == -1


def test_padded_triangles_never_hit():
    buf = _buffers([UNIT_TRI], pad_to=8)
    g = np.random.default_rng(0)
    o = jnp.asarray(g.normal(size=(128, 3)), jnp.float32)
    d = jnp.asarray(g.normal(size=(128, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    hit = trace_brute_jnp(o, d, buf, 1e-3, 1e4)
    assert int(jnp.max(hit.prim)) <= 0  # only tri 0 or miss


def test_inactive_rays_report_miss():
    buf = _buffers([UNIT_TRI])
    o = jnp.asarray([[0.2, 0.2, 1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    hit = trace_brute_jnp(o, d, buf, 1e-3, 1e4, active=jnp.asarray([False]))
    assert int(hit.prim[0]) == -1 and np.isinf(float(hit.t[0]))


def _numpy_brute_oracle(o, d, tris, t_min, t_max):
    """Independent float64 numpy closest-hit oracle."""
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    best_t = np.full(len(o), np.inf)
    best_p = np.full(len(o), -1, np.int64)
    for i, (a, b, c) in enumerate(np.asarray(tris, np.float64)):
        e1, e2 = b - a, c - a
        pvec = np.cross(d, e2)
        det = (e1 * pvec).sum(-1)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / det
            tvec = o - a
            u = (tvec * pvec).sum(-1) * inv
            qvec = np.cross(tvec, e1)
            v = (d * qvec).sum(-1) * inv
            t = (e2 * qvec).sum(-1) * inv
        ok = (
            (np.abs(det) > 1e-12)
            & (u >= 0)
            & (v >= 0)
            & (u + v <= 1)
            & (t > t_min)
            & (t < t_max)
            & (t < best_t)
        )
        best_t = np.where(ok, t, best_t)
        best_p = np.where(ok, i, best_p)
    return best_t, best_p


def test_cornell_random_rays_vs_oracle(cornell, cornell_buffers):
    """trace_brute_jnp == independent numpy oracle on rays from inside the
    box (the scene the reference actually renders)."""
    g = np.random.default_rng(42)
    o = np.stack(
        [
            g.uniform(-0.9, 0.9, 256),
            g.uniform(-1.9, -0.1, 256),
            g.uniform(-0.9, 0.9, 256),
        ],
        axis=1,
    ).astype(np.float32)
    d = g.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    hit = trace_brute_jnp(jnp.asarray(o), jnp.asarray(d), cornell_buffers, 1e-3, 1e4)
    et, ep = _numpy_brute_oracle(o, d, cornell.triangles(), 1e-3, 1e4)
    # primitive ids must agree except where two surfaces are within fp noise
    agree = np.asarray(hit.prim) == ep
    assert agree.mean() > 0.99
    finite = np.isfinite(et)
    np.testing.assert_allclose(
        np.asarray(hit.t)[finite & agree], et[finite & agree], rtol=2e-4
    )
    # misses agree exactly
    np.testing.assert_array_equal(np.isinf(np.asarray(hit.t)), np.isinf(et))

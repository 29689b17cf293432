"""Sampling-library distribution and frame tests
(parity target: ref shaders/raygen.rgen:14-39)."""

import numpy as np

from sfvp_tpu import sampling


def _rand2(n, seed=0):
    g = np.random.default_rng(seed)
    return (
        g.random(n, dtype=np.float32),
        g.random(n, dtype=np.float32),
    )


def test_coordinate_system_orthonormal(rng_np):
    n = rng_np.normal(size=(1000, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    t, b = sampling.coordinate_system(n)
    t, b = np.asarray(t), np.asarray(b)
    np.testing.assert_allclose(np.sum(t * n, axis=1), 0, atol=2e-6)
    np.testing.assert_allclose(np.sum(t * b, axis=1), 0, atol=2e-6)
    np.testing.assert_allclose(np.linalg.norm(t, axis=1), 1, atol=2e-5)
    np.testing.assert_allclose(np.linalg.norm(b, axis=1), 1, atol=2e-5)


def test_coordinate_system_branch():
    """Exact values of the reference's branchy tangent construction."""
    n = np.array([[0.8, 0.1, 0.6], [0.1, 0.9, 0.3]], np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    t, _ = sampling.coordinate_system(n)
    t = np.asarray(t)
    # |n.x|>|n.y|: T = (n.z, 0, -n.x)/sqrt(nx^2+nz^2)
    e0 = np.array([n[0, 2], 0, -n[0, 0]]) / np.sqrt(n[0, 0] ** 2 + n[0, 2] ** 2)
    np.testing.assert_allclose(t[0], e0, atol=1e-6)
    # else: T = (0, -n.z, n.y)/sqrt(ny^2+nz^2)
    e1 = np.array([0, -n[1, 2], n[1, 1]]) / np.sqrt(n[1, 1] ** 2 + n[1, 2] ** 2)
    np.testing.assert_allclose(t[1], e1, atol=1e-6)


def test_uniform_hemisphere_stats():
    r1, r2 = _rand2(200_000)
    d = np.asarray(sampling.sample_hemisphere_uniform(r1, r2))
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1, atol=1e-5)
    assert np.all(d[:, 2] >= 0)
    # z = r1 uniform -> mean cos(theta) = 1/2
    assert abs(d[:, 2].mean() - 0.5) < 0.005
    # azimuthal uniformity
    assert abs(d[:, 0].mean()) < 0.005 and abs(d[:, 1].mean()) < 0.005


def test_cosine_hemisphere_stats():
    r1, r2 = _rand2(200_000, seed=7)
    d = np.asarray(sampling.sample_hemisphere_cosine(r1, r2))
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1, atol=1e-5)
    # pdf cos/pi -> E[cos] = 2/3
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.005


def test_sample_direction_in_normal_hemisphere(rng_np):
    n = rng_np.normal(size=(5000, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    r1, r2 = _rand2(5000, seed=3)
    d = np.asarray(sampling.sample_direction_uniform(r1, r2, n))
    cos = np.sum(d * n, axis=1)
    np.testing.assert_allclose(cos, r1, atol=1e-5)  # z-component == r1

"""Bit-exactness of the PCG recipes vs independent oracles.

Three implementations are cross-checked: jnp (production), numpy mirror,
and a pure-Python big-int evaluation of the GLSL source semantics
(ref shaders/common.glsl:13-37) written directly in this test.
"""

import numpy as np

from sfvp_tpu import rng

M32 = 0xFFFFFFFF


def pcg_pyint(state: int):
    prev = (state * 747796405 + 2891336453) & M32
    shift = ((prev >> 28) + 4) & 31
    word = (((prev >> shift) ^ prev) * 277803737) & M32
    return ((word >> 22) ^ word) & M32, prev


def pcg2d_pyint(vx: int, vy: int):
    k, c = 1664525, 1013904223
    vx = (vx * k + c) & M32
    vy = (vy * k + c) & M32
    vx = (vx + vy * k) & M32
    vy = (vy + vx * k) & M32
    vx ^= vx >> 16
    vy ^= vy >> 16
    vx = (vx + vy * k) & M32
    vy = (vy + vx * k) & M32
    vx ^= vx >> 16
    vy ^= vy >> 16
    return vx, vy


def test_pcg_bit_exact(rng_np):
    states = rng_np.integers(0, 2**32, size=256, dtype=np.uint32)
    jv, js = rng.pcg(np.asarray(states))
    nvals = []
    nstates = []
    for s in states:
        v, ns = pcg_pyint(int(s))
        nvals.append(v)
        nstates.append(ns)
    np.testing.assert_array_equal(np.asarray(jv), np.asarray(nvals, np.uint32))
    np.testing.assert_array_equal(np.asarray(js), np.asarray(nstates, np.uint32))
    # numpy mirror agrees too
    for s in states[:32]:
        v, ns = rng.pcg_np(s)
        ev, ens = pcg_pyint(int(s))
        assert int(v) == ev and int(ns) == ens


def test_pcg2d_bit_exact(rng_np):
    vx = rng_np.integers(0, 2**32, size=256, dtype=np.uint32)
    vy = rng_np.integers(0, 2**32, size=256, dtype=np.uint32)
    jx, jy = rng.pcg2d(np.asarray(vx), np.asarray(vy))
    ex, ey = zip(*(pcg2d_pyint(int(a), int(b)) for a, b in zip(vx, vy)))
    np.testing.assert_array_equal(np.asarray(jx), np.asarray(ex, np.uint32))
    np.testing.assert_array_equal(np.asarray(jy), np.asarray(ey, np.uint32))


def test_rand_scale_quirk():
    # float(0xffffffffu) rounds to 2^32 in fp32 -> scale is exactly 2^-32
    assert float(rng._RAND_SCALE) == 2.0**-32


def test_rand_stream(rng_np):
    seeds = rng_np.integers(0, 2**32, size=64, dtype=np.uint32)
    u, ns = rng.rand(np.asarray(seeds))
    for i, s in enumerate(seeds):
        ev, ens = pcg_pyint(int(s))
        expected = np.float32(np.float32(ev) * np.float32(2.0**-32))
        assert float(u[i]) == float(expected)
        assert int(ns[i]) == ens
    assert float(np.max(u)) <= 1.0 and float(np.min(u)) >= 0.0


def test_sample_seed_formula():
    """seed = s.x + s.y of pcg2d(pixel * (sample + spp*frame + 1)),
    ref shaders/raygen.rgen:47-48."""
    px, py, sample, frame, spp = 17, 23, 5, 42, 32
    m = (sample + spp * frame + 1) & M32
    ex, ey = pcg2d_pyint((px * m) & M32, (py * m) & M32)
    expected = (ex + ey) & M32
    got = rng.sample_seed(
        np.asarray([px], np.uint32),
        np.asarray([py], np.uint32),
        np.uint32(sample),
        np.int32(frame),
        spp,
    )
    assert int(got[0]) == expected


def test_rand_uniformity():
    # chi-square-ish sanity: 1M draws from sequential seeds, 16 bins
    seeds = np.arange(1_000_000, dtype=np.uint32)
    u, _ = rng.rand(np.asarray(seeds))
    hist, _ = np.histogram(np.asarray(u), bins=16, range=(0, 1))
    expected = len(seeds) / 16
    assert np.all(np.abs(hist - expected) < 5 * np.sqrt(expected))

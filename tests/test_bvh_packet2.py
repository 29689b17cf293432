"""v2 packet-traversal kernel (kernels/bvh_packet2.py) equivalence tests
(interpret mode): must agree with brute force on hits AND payloads, for both
the VMEM-resident and the HBM-streamed (DMA leaf ring) triangle paths, at
several interleave widths.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfvp_tpu.accel.lbvh import bvh_from_arrays
from sfvp_tpu.accel.wide import LEAF_TRIS, build_wide, materials_array
from sfvp_tpu.kernels.bvh_packet2 import make_packet_trace2
from sfvp_tpu.kernels.intersect import trace_brute_jnp
from sfvp_tpu.scene.buffers import from_arrays


def _soup(n, seed=0, spread=5.0):
    g = np.random.default_rng(seed)
    return (
        g.uniform(-spread, spread, (n, 1, 3)) + g.normal(0, 0.8, (n, 3, 3))
    ).astype(np.float32)


def _rays(m, seed=1, spread=6.0):
    g = np.random.default_rng(seed)
    o = g.uniform(-spread, spread, (m, 3)).astype(np.float32)
    d = g.normal(size=(m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _setup(n_tris=60, seed=3):
    tris = _soup(n_tris, seed=seed)
    g = np.random.default_rng(seed + 1)
    kd = g.uniform(0, 1, (n_tris, 3)).astype(np.float32)
    ke = g.uniform(0, 1, (n_tris, 3)).astype(np.float32)
    buffers = from_arrays(tris, kd, ke)
    wide = build_wide(
        bvh_from_arrays(tris, leaf_size=LEAF_TRIS), materials_array(buffers)
    )
    return tris, kd, ke, buffers, wide


def _check_against_brute(pay, o, d, buffers, kd, m):
    hit = trace_brute_jnp(
        (o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]),
        buffers, 1e-3, 1e4,
    )
    bt = np.where(np.asarray(hit.prim) >= 0, np.asarray(hit.t), np.inf)
    np.testing.assert_allclose(np.asarray(pay.t), bt, rtol=1e-4, atol=1e-5)
    hit_mask = np.isfinite(bt)
    # payload albedo must be the winning triangle's Kd
    want = kd[np.maximum(np.asarray(hit.prim), 0)]
    got = np.stack([np.asarray(c) for c in pay.albedo], axis=1)
    np.testing.assert_allclose(got[hit_mask], want[hit_mask],
                               rtol=1e-5, atol=1e-6)
    assert np.all(got[~hit_mask] == 0.0)


@pytest.mark.parametrize("n_packets", [1, 2, 4])
def test_packet2_matches_brute(n_packets):
    tris, kd, ke, buffers, wide = _setup()
    trace = make_packet_trace2(wide, t_min=1e-3, n_packets=n_packets,
                               interpret=True)
    m = 1024 * max(n_packets, 2) + 512  # force padding + multiple blocks
    o, d = _rays(m, seed=6)
    pay = trace((o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]), 1e4)
    _check_against_brute(pay, o, d, buffers, kd, m)


def test_packet2_tiny_leaf_queue_spills():
    """A 2-entry leaf queue forces the spill-to-stack path constantly;
    results must not change."""
    tris, kd, ke, buffers, wide = _setup(n_tris=120, seed=9)
    trace = make_packet_trace2(wide, t_min=1e-3, n_packets=2, leaf_q=2,
                               interpret=True)
    o, d = _rays(2048, seed=10)
    pay = trace((o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]), 1e4)
    _check_against_brute(pay, o, d, buffers, kd, 2048)


def test_packet2_streamed_matches_resident():
    """HBM-streamed triangle rows (DMA ring) == VMEM-resident results."""
    tris, kd, ke, buffers, wide = _setup(n_tris=100, seed=12)
    tr_res = make_packet_trace2(wide, t_min=1e-3, n_packets=2,
                                interpret=True)
    tr_str = make_packet_trace2(wide, t_min=1e-3, n_packets=2,
                                interpret=True, stream_tris=True)
    o, d = _rays(2048, seed=13)
    soa = ((o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]))
    pa = tr_res(*soa, 1e4)
    pb = tr_str(*soa, 1e4)
    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packet2_active_mask():
    tris, kd, ke, buffers, wide = _setup()
    trace = make_packet_trace2(wide, t_min=1e-3, n_packets=2, interpret=True)
    o, d = _rays(1500, seed=20)
    active = jnp.asarray(np.random.default_rng(21).uniform(size=1500) < 0.5)
    pay = trace((o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]),
                1e4, active=active)
    assert np.all(np.isinf(np.asarray(pay.t)[~np.asarray(active)]))

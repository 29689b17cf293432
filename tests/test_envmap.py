"""Environment-map sky (extension; the reference sky is the constant
(0.7, 0.6, 0.5), ref miss.rmiss:10): equirect direction mapping, miss-path
lookup in the integrator, and dispatch routing."""

import numpy as np
import jax
import jax.numpy as jnp

from sfvp_tpu import RenderConfig, init_state, make_render_step, upload
from sfvp_tpu.render.png import encode_png
from sfvp_tpu.scene.objload import Scene
from sfvp_tpu.scene.textures import build_texture_table, sample_environment


def _quadrant_env(tmp_path):
    """Equirect image: top half red, bottom half blue; left/right split
    green channel."""
    img = np.zeros((8, 16, 3), np.uint8)
    img[:4, :, 0] = 255    # top (+y): red
    img[4:, :, 2] = 255    # bottom (-y): blue
    img[:, 8:, 1] = 255    # second half of longitude: +green
    p = tmp_path / "env.png"
    p.write_bytes(encode_png(img))
    return str(p)


def test_equirect_direction_mapping(tmp_path):
    table = build_texture_table([_quadrant_env(tmp_path)], srgb=False)
    d = (
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32),   # x: +x, -x, +x
        jnp.asarray([0.9, -0.9, 0.0], jnp.float32),  # up, down, equator
        jnp.asarray([0.1, 0.1, 0.0], jnp.float32),
    )
    from sfvp_tpu.utils import vec

    d = vec.normalize(d)
    r, g, b = sample_environment(table, d)
    # up -> red half, down -> blue half
    assert float(r[0]) > 0.8 and float(b[0]) < 0.2
    assert float(b[1]) > 0.8 and float(r[1]) < 0.2
    assert np.isfinite(np.asarray([r, g, b])).all()


def _far_tri_scene(env_path):
    """One distant tiny triangle (so the tracer has geometry) + env sky."""
    tris = [[[1000.0, 1000, 1000], [1001, 1000, 1000], [1000, 1001, 1000]]]
    return Scene(
        vertices=np.asarray(tris, np.float32).reshape(-1, 3),
        indices=np.arange(3, dtype=np.uint32),
        face_diffuse=np.zeros((1, 3), np.float32),
        face_emission=np.zeros((1, 3), np.float32),
        face_specular=np.zeros((1, 3), np.float32),
        face_mat_type=np.zeros((1,), np.int32),
        env_map=env_path,
    )


def test_miss_samples_environment(tmp_path):
    """Depth-1 render of an all-miss view == direct env lookup of the
    camera ray directions."""
    from sfvp_tpu.camera import generate_rays_soa

    env = _quadrant_env(tmp_path)
    scene = _far_tri_scene(env)
    buffers = upload(scene)
    assert buffers.env is not None
    cfg = RenderConfig(width=8, height=8, spp_per_step=1, max_depth=1)
    st = jax.jit(make_render_step(cfg, buffers))(init_state(8, 8))
    img = np.asarray(st.accum)

    # expected: env color along each pixel's (jittered) primary ray — use
    # the same seeds via the rng module
    from sfvp_tpu import rng

    idx = np.arange(64, dtype=np.int64)
    px = jnp.asarray(idx % 8, jnp.uint32)
    py = jnp.asarray(idx // 8, jnp.uint32)
    seed = rng.sample_seed(px, py, jnp.zeros(64, jnp.uint32),
                           jnp.zeros((), jnp.int32), 1)
    r1, seed = rng.rand(seed)
    r2, seed = rng.rand(seed)
    o, d = generate_rays_soa(px.astype(jnp.float32), py.astype(jnp.float32),
                             r1, r2, cfg.camera, 8, 8)
    exp = np.stack(
        [np.asarray(c) for c in sample_environment(buffers.env, d)], axis=-1
    ).reshape(8, 8, 3)
    np.testing.assert_allclose(img, exp, rtol=1e-5, atol=1e-6)


def test_dispatch_env_routes_off_megakernel(tmp_path):
    from sfvp_tpu.dispatch import select_render_step

    scene = _far_tri_scene(_quadrant_env(tmp_path))
    buffers = upload(scene)
    cfg = RenderConfig(width=8, height=8, spp_per_step=2, max_depth=2,
                       backend="pallas")
    step = select_render_step(cfg, buffers)
    out = jax.jit(lambda s: step(s, 0))(init_state(8, 8))
    assert np.isfinite(np.asarray(out.accum)).all()

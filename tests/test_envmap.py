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


def test_dispatch_small_env_fuses_on_megakernel(tmp_path):
    """A VMEM-sized env map stays on the fused regen megakernel (the
    separable one-hot MXU fetch, kernels/imgfetch.py)."""
    from sfvp_tpu.dispatch import select_render_step

    scene = _far_tri_scene(_quadrant_env(tmp_path))
    buffers = upload(scene)
    cfg = RenderConfig(width=8, height=8, spp_per_step=2, max_depth=2,
                       backend="pallas")
    step = select_render_step(cfg, buffers)
    assert step.__module__ == "sfvp_tpu.kernels.megakernel_regen"
    out = jax.jit(lambda s: step(s, 0))(init_state(8, 8))
    assert np.isfinite(np.asarray(out.accum)).all()


def test_dispatch_env_fallbacks(tmp_path):
    """Env NEE (env-only scene under use_nee) fuses on the regen
    megakernel since round 3 (in-kernel CDF inversion). Oversized env
    maps stay on BOTH fused regen kernels via deferred miss records
    since round 4, and NEE + oversized fuses too since round 5
    (deferred per-bounce NEE records + resident pooled proposal CDF) —
    NO env configuration leaves the fused kernels anymore."""
    import dataclasses

    import jax.numpy as jnp

    from sfvp_tpu.dispatch import select_render_step
    from sfvp_tpu.scene.textures import TextureTable

    scene = _far_tri_scene(_quadrant_env(tmp_path))
    buffers = upload(scene)
    cfg = RenderConfig(width=8, height=8, spp_per_step=2, max_depth=2,
                       backend="pallas")

    # env NEE: the scene has no emissive tris, so use_nee importance-
    # samples the environment — fused in-kernel since round 3
    step = select_render_step(dataclasses.replace(cfg, use_nee=True),
                              buffers)
    assert step.__module__ == "sfvp_tpu.kernels.megakernel_regen"
    out = jax.jit(lambda s: step(s, 0))(init_state(8, 8))
    assert np.isfinite(np.asarray(out.accum)).all()

    # oversized map (1024x512 packs to 6MB > ENV_VMEM_MAX_BYTES)
    big_h, big_w = 512, 1024
    n = big_h * big_w
    big_env = TextureTable(
        tr=jnp.zeros((n,), jnp.float32), tg=jnp.zeros((n,), jnp.float32),
        tb=jnp.zeros((n,), jnp.float32),
        off=jnp.zeros((1,), jnp.int32),
        width=jnp.full((1,), big_w, jnp.int32),
        height=jnp.full((1,), big_h, jnp.int32),
    )
    big_buffers = buffers._replace(env=big_env)
    step = select_render_step(cfg, big_buffers)
    assert step.__module__ == "sfvp_tpu.kernels.megakernel_regen"
    step = select_render_step(dataclasses.replace(cfg, use_nee=True),
                              big_buffers)
    assert step.__module__ == "sfvp_tpu.kernels.megakernel_regen"


def _big_env_table(big_h=512, big_w=1024):
    """An OVERSIZED equirect map (1024x512 packs to 6MB >
    ENV_VMEM_MAX_BYTES) with non-trivial content, built directly as a
    TextureTable so the test stays cheap."""
    from sfvp_tpu.scene.textures import TextureTable

    n = big_h * big_w
    g = np.linspace(0.0, 1.0, n, dtype=np.float32)
    return TextureTable(
        tr=jnp.asarray(g),
        tg=jnp.asarray(np.ascontiguousarray(g[::-1])),
        tb=jnp.asarray(np.mod(g * 7.0, 1.0)),
        off=jnp.zeros((1,), jnp.int32),
        width=jnp.full((1,), big_w, jnp.int32),
        height=jnp.full((1,), big_h, jnp.int32),
    )


def test_bvh_megakernel_deferred_env_equivalence():
    """OVERSIZED env maps stay on the fused BVH regen kernel via DEFERRED
    miss shading (round-4 VERDICT item 5): a miss terminates its sample,
    so the kernel records one (dir, weight) per (pixel, sample) into
    output planes and the step shades them with the wavefront loop's
    exact sample_environment gather — dispatch routes there, and the
    image matches the wavefront integrator on identical sample streams.
    Since round 5 env NEE fuses too (deferred per-bounce NEE records +
    resident pooled proposal CDF, defer_env_nee)."""
    import dataclasses

    from sfvp_tpu.dispatch import select_render_step, select_trace_fn
    from sfvp_tpu.scene.procedural import sphere_mesh

    scene = sphere_mesh(n_lat=16, n_lon=16, bump=0.3)
    buffers = upload(scene)._replace(env=_big_env_table())
    cfg = RenderConfig(width=16, height=8, spp_per_step=2, max_depth=3,
                       sampling="cosine", use_rr=True,
                       backend="pallas", traversal="bvh")
    step = select_render_step(cfg, buffers)
    assert step.__module__ == "sfvp_tpu.kernels.megakernel_bvh"
    step_nee = select_render_step(
        dataclasses.replace(cfg, use_nee=True), buffers)
    assert step_nee.__module__ == "sfvp_tpu.kernels.megakernel_bvh"

    a = jax.jit(make_render_step(
        cfg, buffers, trace_fn=select_trace_fn(cfg, buffers)
    ))(init_state(8, 16))
    b = jax.jit(step)(init_state(8, 16))
    np.testing.assert_allclose(
        np.asarray(a.accum), np.asarray(b.accum), rtol=1e-4, atol=1e-6
    )
    assert float(a.mrays) == float(b.mrays)


def test_brute_megakernel_deferred_env_equivalence(cornell_buffers):
    """Same deferred-miss mechanism on the BRUTE regen megakernel
    (small scenes + oversized skies): routes fused and matches the jnp
    wavefront integrator."""
    from sfvp_tpu.dispatch import select_render_step

    buffers = cornell_buffers._replace(env=_big_env_table())
    cfg = RenderConfig(width=16, height=8, spp_per_step=2, max_depth=3,
                       sampling="cosine", backend="pallas",
                       traversal="brute")
    step = select_render_step(cfg, buffers)
    assert step.__module__ == "sfvp_tpu.kernels.megakernel_regen"
    a = jax.jit(make_render_step(cfg, buffers))(init_state(8, 16))
    b = jax.jit(step)(init_state(8, 16))
    np.testing.assert_allclose(
        np.asarray(a.accum), np.asarray(b.accum), rtol=1e-4, atol=1e-6
    )
    assert float(a.mrays) == float(b.mrays)


def _env_equiv_case(tmp_path, make_kernel_step, n_tris, **cfg_kw):
    """Shared harness: interpret-mode fused kernel vs the jnp wavefront
    oracle on an env-lit scene with an area light."""
    from sfvp_tpu.dispatch import select_trace_fn
    from sfvp_tpu.scene.buffers import from_arrays
    from sfvp_tpu.scene.textures import build_texture_table

    g = np.random.default_rng(7)
    img = (g.uniform(0, 1, (8, 16, 3)) * 255).astype(np.uint8)
    p = tmp_path / "sky.png"
    p.write_bytes(encode_png(img))
    env = build_texture_table([str(p)], srgb=False)

    tris = (g.uniform(-4, 4, (n_tris, 1, 3))
            + g.normal(0, 0.5, (n_tris, 3, 3))).astype(np.float32)
    kd = g.uniform(0.2, 0.9, (n_tris, 3)).astype(np.float32)
    ke = np.zeros((n_tris, 3), np.float32)
    if not cfg_kw.pop("env_only", False):
        ke[0] = 5.0
    buffers = from_arrays(tris, kd, ke, env=env)

    from sfvp_tpu.integrate.wavefront import make_render_step as mk_wave

    cfg = RenderConfig(width=16, height=16, spp_per_step=4, max_depth=4,
                       **cfg_kw)
    wave = mk_wave(cfg, buffers, trace_fn=select_trace_fn(cfg, buffers),
                   global_shape=(16, 16))
    kern = make_kernel_step(cfg, buffers, global_shape=(16, 16),
                            interpret=True)
    st = init_state(16, 16)
    a = np.asarray(wave(st).accum)
    b = np.asarray(kern(st).accum)
    err = np.max(np.abs(a - b)) / max(1e-6, float(np.max(np.abs(a))))
    assert err < 2e-3, err
    assert float(np.max(a)) > 0


def test_regen_megakernel_env_equivalence(tmp_path):
    from sfvp_tpu.kernels.megakernel_regen import make_regen_render_step

    _env_equiv_case(tmp_path, make_regen_render_step, 6)
    _env_equiv_case(tmp_path, make_regen_render_step, 6,
                    use_nee=True, use_mis=True, sampling="cosine")


def test_bvh_megakernel_env_equivalence(tmp_path):
    from sfvp_tpu.kernels.megakernel_bvh import make_bvh_regen_render_step

    _env_equiv_case(tmp_path, make_bvh_regen_render_step, 40,
                    use_nee=True, use_mis=True, sampling="cosine")


def test_regen_megakernel_combined_nee_equivalence(tmp_path):
    """A scene with BOTH an area light and an env map under NEE runs both
    strategies per bounce, in-kernel, matching the wavefront (the MIS
    variant is covered by test_regen_megakernel_env_equivalence)."""
    from sfvp_tpu.kernels.megakernel_regen import make_regen_render_step

    _env_equiv_case(tmp_path, make_regen_render_step, 6,
                    use_nee=True, sampling="cosine")


def test_bvh_megakernel_combined_nee_equivalence(tmp_path):
    from sfvp_tpu.kernels.megakernel_bvh import make_bvh_regen_render_step

    _env_equiv_case(tmp_path, make_bvh_regen_render_step, 40,
                    use_nee=True, sampling="cosine")


def test_regen_megakernel_env_nee_equivalence(tmp_path):
    """In-kernel env NEE (env-only scene): the separable exact-
    searchsorted CDF inversion + in-kernel shadow rays match the
    wavefront estimator, with and without MIS."""
    from sfvp_tpu.kernels.megakernel_regen import make_regen_render_step

    _env_equiv_case(tmp_path, make_regen_render_step, 6,
                    env_only=True, use_nee=True)
    _env_equiv_case(tmp_path, make_regen_render_step, 6,
                    env_only=True, use_nee=True, use_mis=True,
                    sampling="cosine")


def test_bvh_megakernel_env_nee_equivalence(tmp_path):
    from sfvp_tpu.kernels.megakernel_bvh import make_bvh_regen_render_step

    _env_equiv_case(tmp_path, make_bvh_regen_render_step, 40,
                    env_only=True, use_nee=True, use_mis=True,
                    sampling="cosine")


def test_env_cdf_inversion_exact():
    """The separable in-kernel CDF inversion (row-end count + one-hot MXU
    row select, kernels/imgfetch.py) picks bitwise the same texel as the
    wavefront's jnp.searchsorted, and returns its exact pdf."""
    import jax.numpy as jnp

    from sfvp_tpu.integrate.lights import build_env_distribution, env_pdf
    from sfvp_tpu.kernels.imgfetch import (
        env_cdf_sample_rows, env_pdf_sa_rows, pack_env_dist_transposed,
    )
    from sfvp_tpu.scene.textures import TextureTable

    g = np.random.default_rng(0)
    H, W = 16, 32
    img = (g.random((H, W, 3)).astype(np.float32) * 5)
    img[3, 7] = 500.0  # a sun
    table = TextureTable(
        tr=jnp.asarray(img[..., 0].reshape(-1)),
        tg=jnp.asarray(img[..., 1].reshape(-1)),
        tb=jnp.asarray(img[..., 2].reshape(-1)),
        off=jnp.asarray([0], jnp.int32),
        width=jnp.asarray([W], jnp.int32),
        height=jnp.asarray([H], jnp.int32),
    )
    dist = build_env_distribution(table)
    cp, re = pack_env_dist_transposed(dist)

    r_sel = g.random((8, 128)).astype(np.float32)
    # boundary cases: 0, 1, and an exact CDF entry (tie -> side="right")
    r_sel[0, 0] = 0.0
    r_sel[0, 1] = 1.0
    r_sel[0, 2] = float(np.asarray(dist.cdf)[37])
    rowp, colp, pdfp = env_cdf_sample_rows(
        jnp.asarray(cp), jnp.asarray(re), jnp.asarray(r_sel), H, W)
    ti_ref = np.asarray(jnp.minimum(
        jnp.searchsorted(dist.cdf, r_sel.reshape(-1), side="right"),
        H * W - 1,
    ))
    ti = (np.asarray(rowp) * W + np.asarray(colp)).reshape(-1)
    np.testing.assert_array_equal(ti.astype(np.int64), ti_ref)
    np.testing.assert_array_equal(
        np.asarray(pdfp).reshape(-1), np.asarray(dist.pdf_flat)[ti_ref])

    # env_pdf_sa_rows matches env_pdf to polynomial-trig accuracy
    d = g.standard_normal((3, 8, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    mine = np.asarray(env_pdf_sa_rows(
        jnp.asarray(cp), tuple(jnp.asarray(c) for c in d), H, W))
    ref = np.asarray(env_pdf(dist, tuple(jnp.asarray(c) for c in d)))
    rel = np.abs(mine - ref) / np.maximum(ref, 1e-12)
    assert rel.max() < 1e-4, rel.max()


def _floor_scene(env_path):
    big = 50.0
    tris = [
        [[-big, 0, -big], [big, 0, -big], [big, 0, big]],
        [[-big, 0, -big], [big, 0, big], [-big, 0, big]],
    ]
    return Scene(
        vertices=np.asarray(tris, np.float32).reshape(-1, 3),
        indices=np.arange(6, dtype=np.uint32),
        face_diffuse=np.full((2, 3), 0.7, np.float32),
        face_emission=np.zeros((2, 3), np.float32),
        face_specular=np.zeros((2, 3), np.float32),
        face_mat_type=np.zeros((2,), np.int32),
        env_map=env_path,
    )


def _sun_env(tmp_path):
    """Dim sky + tiny very bright sun: the env-NEE stress case."""
    img = np.full((16, 32, 3), 3, np.uint8)
    img[3:5, 7:9] = 255
    p = tmp_path / "sun.png"
    p.write_bytes(encode_png(img))
    return str(p)


def test_env_nee_unbiased_and_lower_variance(tmp_path):
    """Importance-sampling the environment must agree with BSDF-only in
    the mean and cut the noise dramatically on a sun-dominated map."""
    import dataclasses

    from sfvp_tpu.config import CameraConfig

    scene = _floor_scene(_sun_env(tmp_path))
    buffers = upload(scene)
    cam = CameraConfig.look_at(origin=(0, 2.0, 4.0), target=(0, 0, 0),
                               fov_y_deg=45)
    base = RenderConfig(width=12, height=12, spp_per_step=512, max_depth=2,
                        camera=cam, sampling="cosine")

    def render(cfg):
        step = jax.jit(make_render_step(cfg, buffers))
        return np.asarray(step(init_state(12, 12)).accum)

    img_bsdf = render(base)
    img_nee = render(dataclasses.replace(base, use_nee=True))
    img_mis = render(dataclasses.replace(base, use_nee=True, use_mis=True))

    # floor region (bottom rows look at the floor)
    floor = slice(7, 12)
    mb = img_bsdf[floor].mean()
    mn = img_nee[floor].mean()
    mm = img_mis[floor].mean()
    assert mb > 0
    assert abs(mn - mb) / mb < 0.25, (mn, mb)   # MC-loose agreement
    assert abs(mm - mb) / mb < 0.25, (mm, mb)

    # per-pixel scatter on the floor: NEE must be far tighter than BSDF
    def rel_std(img):
        v = img[floor, :, 0]
        return float(v.std() / max(v.mean(), 1e-6))

    assert rel_std(img_nee) < 0.5 * rel_std(img_bsdf), (
        rel_std(img_nee), rel_std(img_bsdf))
    assert np.isfinite(img_nee).all() and np.isfinite(img_mis).all()


def _floor_lamp_scene(env_path):
    """Floor + a small bright emissive quad above it: area light AND env
    sky in one scene — the combined-NEE case."""
    big, s, h = 50.0, 0.6, 1.5
    tris = [
        [[-big, 0, -big], [big, 0, -big], [big, 0, big]],
        [[-big, 0, -big], [big, 0, big], [-big, 0, big]],
        [[-s, h, -s], [s, h, -s], [s, h, s]],
        [[-s, h, -s], [s, h, s], [-s, h, s]],
    ]
    diffuse = np.full((4, 3), 0.7, np.float32)
    diffuse[2:] = 0.0
    emission = np.zeros((4, 3), np.float32)
    emission[2:] = 6.0
    return Scene(
        vertices=np.asarray(tris, np.float32).reshape(-1, 3),
        indices=np.arange(12, dtype=np.uint32),
        face_diffuse=diffuse,
        face_emission=emission,
        face_specular=np.zeros((4, 3), np.float32),
        face_mat_type=np.zeros((4,), np.int32),
        env_map=env_path,
    )


def test_combined_area_and_env_nee(tmp_path):
    """A scene with BOTH area lights and an env map light-samples both
    per bounce: means agree with BSDF-only, variance drops, with and
    without MIS (each source pairs its own balance heuristic)."""
    import dataclasses

    from sfvp_tpu.config import CameraConfig

    scene = _floor_lamp_scene(_sun_env(tmp_path))
    buffers = upload(scene)
    cam = CameraConfig.look_at(origin=(0, 2.0, 4.0), target=(0, 0, 0),
                               fov_y_deg=45)
    base = RenderConfig(width=12, height=12, spp_per_step=512, max_depth=2,
                        camera=cam, sampling="cosine")

    floor = slice(7, 12)

    def render(cfg):
        """Two independent frames: (running mean, per-pixel frame noise).

        The floor has real spatial structure (the lamp gradient), so
        frame-to-frame deviation — not spatial scatter — is the noise
        proxy here."""
        step = jax.jit(make_render_step(cfg, buffers))
        s0 = step(init_state(12, 12))
        f0 = np.asarray(s0.accum)
        s1 = step(s0)
        mean2 = np.asarray(s1.accum)
        f1 = 2.0 * mean2 - f0
        noise = float(np.abs(f0 - f1)[floor].mean())
        return mean2, noise

    img_bsdf, noise_bsdf = render(base)
    img_nee, noise_nee = render(dataclasses.replace(base, use_nee=True))
    img_mis, noise_mis = render(
        dataclasses.replace(base, use_nee=True, use_mis=True))

    mb = img_bsdf[floor].mean()
    mn = img_nee[floor].mean()
    mm = img_mis[floor].mean()
    assert mb > 0
    assert abs(mn - mb) / mb < 0.25, (mn, mb)
    assert abs(mm - mb) / mb < 0.25, (mm, mb)

    # both the sun and the lamp are light-sampled: frame noise collapses
    assert noise_nee < 0.5 * noise_bsdf, (noise_nee, noise_bsdf)
    assert noise_mis < 0.5 * noise_bsdf, (noise_mis, noise_bsdf)
    assert np.isfinite(img_nee).all() and np.isfinite(img_mis).all()


def test_env_distribution_coarse_proposal():
    """Oversized maps get a POOLED coarse proposal (round-5 deferred env
    NEE): env_distribution_for caps the grid at (256, 512), keeps full
    support (pdf > 0 everywhere, so deferring the full-res radiance
    fetch stays unbiased), normalizes, and concentrates mass where the
    fine map is bright. Resident-size maps keep the exact texel CDF."""
    from sfvp_tpu.integrate.lights import (
        ENV_DIST_MAX_H, build_env_distribution, env_distribution_for,
    )
    from sfvp_tpu.scene.textures import TextureTable

    def table(h, w, img):
        return TextureTable(
            tr=jnp.asarray(img.reshape(-1)),
            tg=jnp.asarray(img.reshape(-1)),
            tb=jnp.asarray(img.reshape(-1)),
            off=jnp.zeros((1,), jnp.int32),
            width=jnp.full((1,), w, jnp.int32),
            height=jnp.full((1,), h, jnp.int32),
        )

    # resident-size map: exact per-texel CDF (dims = map dims)
    small = table(16, 32, np.random.default_rng(0).random(
        (16, 32)).astype(np.float32))
    ds = env_distribution_for(small)
    assert (ds.height, ds.width) == (16, 32)

    # oversized map with a bright sun block
    h, w = 512, 1024
    img = np.full((h, w), 0.01, np.float32)
    img[100:108, 300:308] = 1000.0
    big = table(h, w, img)
    dc = env_distribution_for(big)
    assert (dc.height, dc.width) == (ENV_DIST_MAX_H, 2 * ENV_DIST_MAX_H)
    pdf = np.asarray(dc.pdf_flat)
    assert (pdf > 0).all()                       # full support
    np.testing.assert_allclose(pdf.sum(), 1.0, rtol=1e-5)
    cdf = np.asarray(dc.cdf)
    assert cdf[-1] > 1.0 - 1e-5 and (np.diff(cdf) >= 0).all()
    # the sun's coarse region (rows/cols halve: 512->256, 1024->512; the
    # fine + coarse dilates spread its mass over a ~6x6 coarse block)
    sun = pdf.reshape(ENV_DIST_MAX_H, 2 * ENV_DIST_MAX_H)[47:58, 146:159]
    assert sun.sum() > 0.5, sun.sum()            # mass concentrates there

    # pooling conserves what it pools: coarse == fine weights summed into
    # coarse cells (up to the dilate/floor), checked via the 4x4 case
    d44 = build_env_distribution(table(8, 16, np.ones((8, 16), np.float32)),
                                 max_h=4)
    assert (d44.height, d44.width) == (4, 8)
    np.testing.assert_allclose(np.asarray(d44.pdf_flat).sum(), 1.0,
                               rtol=1e-5)


def test_deferred_env_nee_equivalence(tmp_path):
    """Round-5 VERDICT item 3: env NEE on an OVERSIZED map runs fused —
    the kernel samples the resident pooled proposal CDF, traces the
    shadow ray in-kernel, and records (dir, w*vis*brdf*cos*mis/pdf) per
    (sample, bounce); the step gathers full-res radiance once,
    post-kernel. Must match the wavefront oracle (which shares the same
    coarse proposal via env_distribution_for) on identical streams —
    both kernels, with and without MIS."""
    from sfvp_tpu.dispatch import select_trace_fn
    from sfvp_tpu.kernels.megakernel_bvh import make_bvh_regen_render_step
    from sfvp_tpu.kernels.megakernel_regen import make_regen_render_step
    from sfvp_tpu.integrate.wavefront import make_render_step as mk_wave
    from sfvp_tpu.scene.buffers import from_arrays

    g = np.random.default_rng(3)
    env = _big_env_table()
    tris = (g.uniform(-4, 4, (12, 1, 3))
            + g.normal(0, 0.5, (12, 3, 3))).astype(np.float32)
    kd = g.uniform(0.2, 0.9, (12, 3)).astype(np.float32)
    ke = np.zeros((12, 3), np.float32)
    ke[0] = 5.0  # one area light: combined area + env NEE, both deferred-
    #              compatible (only the ENV radiance defers)
    buffers = from_arrays(tris, kd, ke, env=env)

    for mk, trav in ((make_bvh_regen_render_step, "bvh"),
                     (make_regen_render_step, "brute")):
        for mis in (False, True):
            cfg = RenderConfig(width=16, height=16, spp_per_step=2,
                               max_depth=3, use_nee=True, use_mis=mis,
                               sampling="cosine", backend="pallas",
                               traversal=trav)
            wave = mk_wave(cfg, buffers,
                           trace_fn=select_trace_fn(cfg, buffers),
                           global_shape=(16, 16))
            kern = mk(cfg, buffers, global_shape=(16, 16), interpret=True)
            st = init_state(16, 16)
            a = np.asarray(wave(st).accum)
            b = np.asarray(kern(st).accum)
            err = np.max(np.abs(a - b)) / max(1e-6, float(np.max(np.abs(a))))
            assert err < 2e-3, (trav, mis, err)
            assert float(np.max(a)) > 0


def test_deferred_env_nee_dispatch_debug(tmp_path, capfd, monkeypatch):
    """--nee with a 2048x1024-class sky routes to the measured-fastest
    path (the wavefront loop since the round-5 on-device A/B —
    test_oversized_env_nee_prefers_wavefront pins the decision), runs
    finite, and SFVP_DISPATCH_DEBUG shows the gates. The fused
    deferred-NEE machinery stays covered by the equivalence tests above
    via explicit megakernel_bvh knobs."""
    from sfvp_tpu.dispatch import select_render_step
    from sfvp_tpu.scene.procedural import sphere_mesh

    monkeypatch.setenv("SFVP_DISPATCH_DEBUG", "1")
    scene = sphere_mesh(n_lat=16, n_lon=16, bump=0.3)
    buffers = upload(scene)._replace(env=_big_env_table())
    cfg = RenderConfig(width=16, height=8, spp_per_step=2, max_depth=3,
                       use_nee=True, use_mis=True, sampling="cosine",
                       backend="pallas", traversal="bvh")
    step = select_render_step(cfg, buffers)
    err = capfd.readouterr().err
    assert "wavefront" in err
    out = jax.jit(lambda s: step(s, 0))(init_state(8, 16))
    assert np.isfinite(np.asarray(out.accum)).all()


def test_oversized_env_nee_prefers_wavefront(capfd, monkeypatch):
    """Env NEE on an OVERSIZED map routes to the WAVEFRONT loop on the
    bvh branch — the round-5 on-device A/B measured the fused
    deferred-NEE route at 0.65 (streamed) / 0.69 (resident, raised
    Mosaic cap) Mrays/s vs ~0.9 wavefront on the 100k/2048x1024 bench
    (PROBE_ENVNEE_ROWS_r05.json: the per-(sample, bounce) records
    multiply the post-kernel radiance gather by max_depth). Non-NEE
    oversized skies must STAY fused (deferred miss records, 4.77)."""
    from sfvp_tpu.dispatch import select_render_step
    from sfvp_tpu.scene.procedural import sphere_mesh

    monkeypatch.setenv("SFVP_DISPATCH_DEBUG", "1")
    buffers = upload(sphere_mesh(n_lat=16, n_lon=16, bump=0.3))._replace(
        env=_big_env_table())
    cfg = RenderConfig(width=16, height=8, spp_per_step=2, max_depth=3,
                       use_nee=True, use_mis=True, sampling="cosine",
                       backend="pallas", traversal="bvh")
    select_render_step(cfg, buffers)
    err = capfd.readouterr().err
    assert "wavefront" in err
    # without NEE the same sky stays fused via deferred miss records
    import dataclasses

    nonee = dataclasses.replace(cfg, use_nee=False, use_mis=False)
    select_render_step(nonee, buffers)
    err = capfd.readouterr().err
    assert "megakernel_bvh" in err and "env_deferred=True" in err


def test_coarse_proposal_unbiased(tmp_path):
    """The pooled coarse proposal changes only the SAMPLING density, not
    the estimator's mean: wavefront env NEE with the coarse proposal
    agrees with the exact-texel-CDF estimator and with BSDF-only in the
    mean, and still collapses noise vs BSDF-only on a sun map (jnp
    path, so this also pins sample_env over a coarse dist)."""
    import dataclasses

    from sfvp_tpu.config import CameraConfig
    from sfvp_tpu.integrate import lights as L

    scene = _floor_scene(_sun_env(tmp_path))
    buffers = upload(scene)
    cam = CameraConfig.look_at(origin=(0, 2.0, 4.0), target=(0, 0, 0),
                               fov_y_deg=45)
    base = RenderConfig(width=12, height=12, spp_per_step=512, max_depth=2,
                        camera=cam, sampling="cosine")

    def render(cfg, coarse):
        if coarse:
            # force the pooled proposal on this (resident-size) map
            orig = L.env_distribution_for
            L.env_distribution_for = (
                lambda t: L.build_env_distribution(t, max_h=8))
        try:
            step = jax.jit(make_render_step(cfg, buffers))
            return np.asarray(step(init_state(12, 12)).accum)
        finally:
            if coarse:
                L.env_distribution_for = orig

    img_bsdf = render(base, False)
    img_exact = render(dataclasses.replace(base, use_nee=True), False)
    img_coarse = render(dataclasses.replace(base, use_nee=True), True)

    floor = slice(7, 12)
    mb = img_bsdf[floor].mean()
    me = img_exact[floor].mean()
    mc = img_coarse[floor].mean()
    assert mb > 0
    assert abs(me - mb) / mb < 0.25, (me, mb)
    assert abs(mc - mb) / mb < 0.25, (mc, mb)
    assert abs(mc - me) / me < 0.2, (mc, me)

    def rel_std(img):
        v = img[floor, :, 0]
        return float(v.std() / max(v.mean(), 1e-6))

    # a 2x-pooled proposal is coarser than the exact CDF (the jitter
    # covers 4 fine texels per draw) but must still beat BSDF sampling
    # on a sun-dominated map
    assert rel_std(img_coarse) < 0.8 * rel_std(img_bsdf), (
        rel_std(img_coarse), rel_std(img_bsdf))
    assert np.isfinite(img_coarse).all()


def test_env_distribution_integrates():
    """E[1/pdf] over env-importance samples == 4pi (the sampler covers the
    sphere with the advertised density)."""
    import jax.numpy as jnp

    from sfvp_tpu.integrate.lights import build_env_distribution, sample_env

    g = np.random.default_rng(2)
    img = g.integers(1, 255, (8, 16, 3)).astype(np.uint8)
    import tempfile

    p = tempfile.mktemp(suffix=".png")
    open(p, "wb").write(encode_png(img))
    try:
        table = build_texture_table([p], srgb=False)
        dist = build_env_distribution(table)
        n = 100_000
        _, pdf = sample_env(
            dist,
            jnp.asarray(g.uniform(size=n), jnp.float32),
            jnp.asarray(g.uniform(size=n), jnp.float32),
            jnp.asarray(g.uniform(size=n), jnp.float32),
        )
        est = float(jnp.mean(1.0 / pdf))
        assert abs(est - 4 * np.pi) / (4 * np.pi) < 0.05, est
    finally:
        import os

        os.unlink(p)

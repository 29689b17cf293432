"""map_Kd texture support (extension — the reference's materials are flat
Kd/Ke, ref main.cpp:47-56): image decoding, vt/map_Kd ingest (Python and
native loaders), bilinear sampling math, and a textured render."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfvp_tpu import RenderConfig, init_state, load_obj, make_render_step, upload
from sfvp_tpu.render.png import encode_png
from sfvp_tpu.scene.image_io import decode_png, decode_ppm, load_image
from sfvp_tpu.scene.textures import TextureTable, build_texture_table, sample_bilinear


def _checker_u8(n=8, scale=4):
    """(n*scale, n*scale, 3) checkerboard, red/white."""
    yy, xx = np.mgrid[0:n, 0:n]
    cells = ((xx + yy) % 2).astype(np.uint8)
    img = np.where(cells[..., None] > 0, [255, 255, 255], [255, 0, 0])
    return np.repeat(np.repeat(img.astype(np.uint8), scale, 0), scale, 1)


def test_png_roundtrip_all_filters():
    """decode(encode(x)) == x; zlib may pick any filter per row, so also
    hand-build streams per filter type via a reference image shift."""
    g = np.random.default_rng(0)
    img = g.integers(0, 256, (23, 17, 3), np.uint8)
    assert (decode_png(encode_png(img)) == img).all()
    # a gradient image exercises sub/up/average/paeth choices at higher
    # compression levels
    grad = (np.arange(64)[:, None, None] + np.arange(64)[None, :, None]
            + np.arange(3)[None, None, :]).astype(np.uint8)
    assert (decode_png(encode_png(grad, compress_level=9)) == grad).all()


def test_ppm_decode_with_comment():
    img = _checker_u8(4, 1)
    data = b"P6\n# a comment\n4 4\n255\n" + img.tobytes()
    assert (decode_ppm(data) == img).all()


def test_load_image_srgb(tmp_path):
    img = np.full((4, 4, 3), 128, np.uint8)
    p = tmp_path / "t.png"
    p.write_bytes(encode_png(img))
    lin = load_image(str(p))
    # sRGB 128/255 -> ~0.2158 linear
    np.testing.assert_allclose(lin, 0.21586, rtol=1e-3)
    raw = load_image(str(p), srgb=False)
    np.testing.assert_allclose(raw, 128 / 255.0, rtol=1e-6)


def test_bilinear_sampling_math():
    """2x2 texture with distinct corners: center = mean; texel centers are
    exact; tex_id -1 = white."""
    tex = np.zeros((2, 2, 3), np.float32)
    tex[0, 0] = [1, 0, 0]   # top-left (v=1 side in OBJ coords)
    tex[0, 1] = [0, 1, 0]
    tex[1, 0] = [0, 0, 1]
    tex[1, 1] = [1, 1, 1]
    table = TextureTable(
        tr=jnp.asarray(tex[..., 0].reshape(-1)),
        tg=jnp.asarray(tex[..., 1].reshape(-1)),
        tb=jnp.asarray(tex[..., 2].reshape(-1)),
        off=jnp.asarray([0], jnp.int32),
        width=jnp.asarray([2], jnp.int32),
        height=jnp.asarray([2], jnp.int32),
    )
    tid = jnp.asarray([0, 0, -1], jnp.int32)
    u = jnp.asarray([0.5, 0.25, 0.7], jnp.float32)
    v = jnp.asarray([0.5, 0.75, 0.7], jnp.float32)
    r, g, b = sample_bilinear(table, tid, u, v)
    # center of the texture = average of the 4 texels
    np.testing.assert_allclose(
        [r[0], g[0], b[0]], [0.5, 0.5, 0.5], rtol=1e-6)
    # (0.25, 0.75) in OBJ coords = texel center row 0, col 0
    np.testing.assert_allclose([r[1], g[1], b[1]], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose([r[2], g[2], b[2]], [1, 1, 1], atol=1e-6)


def _write_textured_scene(tmp_path, native_suffix=""):
    img = _checker_u8(8, 4)
    (tmp_path / f"check{native_suffix}.png").write_bytes(encode_png(img))
    (tmp_path / f"m{native_suffix}.mtl").write_text(
        f"newmtl tex\nKd 1 1 1\nmap_Kd check{native_suffix}.png\n"
    )
    # a quad in the z=0 plane facing +z, with full [0,1]^2 vt
    (tmp_path / f"s{native_suffix}.obj").write_text(
        f"mtllib m{native_suffix}.mtl\n"
        "v -1 -1 0\nv 1 -1 0\nv 1 1 0\nv -1 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "usemtl tex\nf 1/1 2/2 3/3 4/4\n"
    )
    return str(tmp_path / f"s{native_suffix}.obj")


def _encode_hdr_flat(img: np.ndarray) -> bytes:
    """Minimal Radiance writer (flat scanlines) for round-trip tests."""
    h, w = img.shape[:2]
    header = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + (
        f"-Y {h} +X {w}\n".encode()
    )
    maxc = img.max(axis=-1)
    nz = maxc > 1e-32
    _, e = np.frexp(np.maximum(maxc, 1e-32))  # 2^(e-1) <= max < 2^e
    scale = np.where(nz, 256.0 / np.exp2(e.astype(np.float64)), 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(nz, e + 128, 0).astype(np.uint8)
    return header + rgbe.tobytes()


def test_hdr_decode_flat_roundtrip():
    from sfvp_tpu.scene.image_io import decode_hdr

    g = np.random.default_rng(0)
    img = (g.random((6, 7, 3)).astype(np.float32) * 40.0)
    img[0, 0] = 0.0  # zero pixel -> e = 0 path
    out = decode_hdr(_encode_hdr_flat(img))
    assert out.shape == (6, 7, 3)
    # RGBE quantization: shared exponent 2^e with max < 2^e, floor-
    # rounded 8-bit mantissas -> error bounded by one step = 2^e/256
    # <= max/128 per component
    step = img.max(axis=-1, keepdims=True) / 128.0
    assert (np.abs(out - img) <= step + 1e-4).all()


def test_hdr_decode_rle_scanline():
    """Hand-built new-style RLE scanline: runs + literals must decode to
    the same pixels as the equivalent flat scanline."""
    from sfvp_tpu.scene.image_io import decode_hdr

    w = 16
    row = np.zeros((1, w, 3), np.float32)
    row[0, :8] = [2.0, 4.0, 8.0]
    row[0, 8:] = [0.5, 0.25, 0.125]
    flat = decode_hdr(_encode_hdr_flat(row))

    # same row, RLE-encoded: per-plane [run 8 of a, run 8 of b]
    rgbe = np.zeros((w, 4), np.uint8)
    m, e = np.frexp(np.maximum(row[0].max(-1), 1e-32))
    rgbe[:, 3] = (e + 128).astype(np.uint8)
    scale = 256.0 / np.exp2(e)
    rgbe[:, :3] = np.clip(row[0] * scale[:, None], 0, 255).astype(np.uint8)
    payload = bytes([2, 2, 0, w])
    for c in range(4):
        payload += bytes([128 + 8, rgbe[0, c], 128 + 8, rgbe[8, c]])
    data = (b"#?RADIANCE\n\n" + f"-Y 1 +X {w}\n".encode() + payload)
    out = decode_hdr(data)
    np.testing.assert_allclose(out, flat, rtol=1e-6)


def test_hdr_env_preserves_radiance_above_one(tmp_path):
    """An .hdr sky with a 500x sun must reach the env sampler unclipped
    (the whole point of HDR IBL — 8-bit formats clip at 1.0)."""
    from sfvp_tpu.scene.textures import sample_environment
    import jax.numpy as jnp

    img = np.full((8, 16, 3), 0.2, np.float32)
    img[2, 5] = [500.0, 400.0, 300.0]
    p = tmp_path / "sky.hdr"
    p.write_bytes(_encode_hdr_flat(img))
    table = build_texture_table([str(p)])
    assert float(np.asarray(table.tr).max()) > 100.0
    # direction hitting texel (row 2, col 5): theta=(2.5/8)pi, phi from u
    theta = (2 + 0.5) * np.pi / 8
    phi = ((5 + 0.5) / 16) * 2 * np.pi - np.pi
    d = (jnp.asarray([np.sin(theta) * np.cos(phi)], jnp.float32),
         jnp.asarray([np.cos(theta)], jnp.float32),
         jnp.asarray([np.sin(theta) * np.sin(phi)], jnp.float32))
    r, g, b = sample_environment(table, d)
    assert float(r[0]) > 100.0


def test_obj_vt_map_kd_ingest(tmp_path):
    p = _write_textured_scene(tmp_path)
    s = load_obj(p, native="never")
    assert s.face_tex.tolist() == [0, 0]
    assert len(s.texture_paths) == 1
    # fan triangulation: tri0 = corners (1,2,3), tri1 = (1,3,4); note the
    # Y-flip does NOT apply to vt
    np.testing.assert_allclose(s.face_uv[0], [[0, 0], [1, 0], [1, 1]])
    np.testing.assert_allclose(s.face_uv[1], [[0, 0], [1, 1], [0, 1]])


def test_native_loader_texture_parity(tmp_path):
    from sfvp_tpu import native as native_mod

    if not native_mod.available():
        if not native_mod.build():
            pytest.skip("native library unavailable")
    p = _write_textured_scene(tmp_path, native_suffix="_n")
    a = load_obj(p, native="never")
    b = load_obj(p, native="require")
    np.testing.assert_array_equal(a.face_uv, b.face_uv)
    np.testing.assert_array_equal(a.face_tex, b.face_tex)
    assert a.texture_paths == b.texture_paths


def test_textured_render(tmp_path):
    """Camera facing the checkered quad: rendered pixels on opposite
    checker cells differ; untextured control renders flat."""
    from sfvp_tpu.config import CameraConfig

    p = _write_textured_scene(tmp_path)
    scene = load_obj(p)
    buffers = upload(scene)
    assert buffers.has_textures
    cam = CameraConfig.look_at(origin=(0, 0, 2.5), target=(0, 0, 0),
                               fov_y_deg=45)
    cfg = RenderConfig(width=32, height=32, spp_per_step=16, max_depth=1,
                       camera=cam, sampling="cosine",
                       sky_emission=(1.0, 1.0, 1.0))
    # depth 1: pure sky-lit albedo is not possible (depth-1 paths add only
    # emission), so use depth 2: hit quad -> bounce -> sky lighting
    import dataclasses

    cfg = dataclasses.replace(cfg, max_depth=2)
    step = jax.jit(make_render_step(cfg, buffers))
    img = np.asarray(step(init_state(32, 32)).accum)
    assert np.isfinite(img).all()
    # green channel: white cells reflect sky, red cells kill green
    center = img[8:24, 8:24, 1]
    assert center.max() > 4 * max(center.min(), 1e-6)


def test_dispatch_textured_small_scene_fuses_on_regen(tmp_path):
    """Small textured scenes with a VMEM-sized atlas fuse on the brute
    regen megakernel (dispatch.py no longer gates brute on has_tex)."""
    from sfvp_tpu.dispatch import select_render_step

    p = _write_textured_scene(tmp_path)
    buffers = upload(load_obj(p))
    cfg = RenderConfig(width=8, height=8, spp_per_step=2, max_depth=2,
                       backend="pallas")
    step = select_render_step(cfg, buffers)
    assert step.__module__ == "sfvp_tpu.kernels.megakernel_regen"
    out = jax.jit(lambda s: step(s, 0))(init_state(8, 8))
    assert np.isfinite(np.asarray(out.accum)).all()


def test_textured_packet_payload_equivalence(tmp_path):
    """Textured scenes through the Pallas packet kernels: the leaf rows
    carry per-corner vt + texid (accel/wide.py tris_aux), the payload
    returns the interpolated uv, and the shade phase's bilinear gather
    reproduces the jnp traced path exactly — for the v1 packet kernel,
    the v2 pipelined kernel, and the HBM-streamed v2 variant."""
    from sfvp_tpu.accel.wide import build_wide_from_buffers
    from sfvp_tpu.config import CameraConfig
    from sfvp_tpu.kernels.bvh_packet import make_packet_trace
    from sfvp_tpu.kernels.bvh_packet2 import make_packet_trace2

    p = _write_textured_scene(tmp_path)
    buffers = upload(load_obj(p))
    wide = build_wide_from_buffers(buffers)
    assert wide.tris_aux is not None
    cam = CameraConfig.look_at(origin=(0, 0, 2.5), target=(0, 0, 0),
                               fov_y_deg=45)
    cfg = RenderConfig(width=16, height=16, spp_per_step=2, max_depth=2,
                       camera=cam, sampling="cosine",
                       sky_emission=(1.0, 1.0, 1.0))
    ref = jax.jit(make_render_step(cfg, buffers))(init_state(16, 16))
    assert float(np.asarray(ref.accum).std()) > 0  # checker actually shows
    traces = [
        make_packet_trace(wide, t_min=cfg.t_min, interpret=True),
        make_packet_trace2(wide, t_min=cfg.t_min, interpret=True),
        make_packet_trace2(wide, t_min=cfg.t_min, interpret=True,
                           stream_tris=True),
    ]
    for tr in traces:
        step = make_render_step(cfg, buffers, trace_payload_fn=tr)
        out = jax.jit(step)(init_state(16, 16))
        np.testing.assert_allclose(
            np.asarray(out.accum), np.asarray(ref.accum),
            rtol=1e-5, atol=1e-6,
        )


def test_untextured_payload_has_no_tex_planes():
    """Untextured scenes must not pay for the 3 extra payload planes."""
    from sfvp_tpu.accel.wide import build_wide_from_buffers
    from sfvp_tpu.kernels.bvh_packet import make_packet_trace

    buffers = upload(load_obj())
    wide = build_wide_from_buffers(buffers)
    assert wide.tris_aux is None
    trace = make_packet_trace(wide, t_min=1e-3, interpret=True)
    o = (jnp.zeros((128,)), jnp.full((128,), -1.0), jnp.full((128,), 5.0))
    d = (jnp.zeros((128,)), jnp.zeros((128,)), jnp.full((128,), -1.0))
    pay = trace(o, d, 1e4)
    assert pay.texid is None and pay.texu is None


def _multi_tex_buffers():
    """40-tri scene with two different-sized textures + untextured faces
    (the fused-kernel atlas stress shape)."""
    from sfvp_tpu.scene.buffers import from_arrays

    def chan(h, w, seed):
        return np.random.default_rng(seed).uniform(
            0.05, 1.0, (h * w,)).astype(np.float32)

    h1, w1, h2, w2 = 8, 16, 16, 8
    tex = TextureTable(
        tr=jnp.asarray(np.concatenate([chan(h1, w1, 1), chan(h2, w2, 2)])),
        tg=jnp.asarray(np.concatenate([chan(h1, w1, 3), chan(h2, w2, 4)])),
        tb=jnp.asarray(np.concatenate([chan(h1, w1, 5), chan(h2, w2, 6)])),
        off=jnp.asarray(np.array([0, h1 * w1], np.int32)),
        width=jnp.asarray(np.array([w1, w2], np.int32)),
        height=jnp.asarray(np.array([h1, h2], np.int32)),
    )
    g = np.random.default_rng(3)
    T = 40
    tris = (g.uniform(-4, 4, (T, 1, 3))
            + g.normal(0, 0.5, (T, 3, 3))).astype(np.float32)
    kd = g.uniform(0.2, 0.9, (T, 3)).astype(np.float32)
    ke = np.zeros((T, 3), np.float32)
    ke[0] = 5.0
    uv = g.uniform(-0.3, 1.3, (T, 3, 2)).astype(np.float32)
    face_tex = (np.arange(T) % 3 - 1).astype(np.int32)  # -1, 0, 1 mix
    return from_arrays(tris, kd, ke, face_uv=uv, face_tex=face_tex,
                       textures=tex)


def test_bvh_megakernel_texture_equivalence():
    """The fused BVH regen megakernel's in-kernel atlas fetch
    (kernels/imgfetch.py separable one-hot gather) matches the wavefront
    integrator on a mixed multi-texture scene, incl. NEE+MIS and the
    HBM-streamed triangle path."""
    from sfvp_tpu.dispatch import select_trace_fn
    from sfvp_tpu.kernels.megakernel_bvh import make_bvh_regen_render_step

    buffers = _multi_tex_buffers()
    # (cfg kwargs, stream_tris, smem_leaf) — the smem_leaf rows pin the
    # SMEM leaf ring's parallel AUX (uv/texid) ring bitwise against the
    # lane-extract path on both resident and streamed sources.
    for kw, stream, sl in ((dict(), False, False),
                           (dict(use_nee=True, use_mis=True,
                                 sampling="cosine"), False, True),
                           (dict(use_nee=True, use_mis=True,
                                 sampling="cosine"), True, False),
                           (dict(use_nee=True, use_mis=True,
                                 sampling="cosine"), True, True)):
        cfg = RenderConfig(width=16, height=16, spp_per_step=4,
                           max_depth=4, **kw)
        wave = make_render_step(
            cfg, buffers, trace_fn=select_trace_fn(cfg, buffers),
            global_shape=(16, 16))
        kern = make_bvh_regen_render_step(
            cfg, buffers, global_shape=(16, 16), interpret=True,
            stream_tris=stream, smem_leaf=sl)
        st = init_state(16, 16)
        a = np.asarray(wave(st).accum)
        b = np.asarray(kern(st).accum)
        err = np.max(np.abs(a - b)) / max(1e-6, float(np.max(np.abs(a))))
        assert err < 2e-3, (kw, stream, err)
        assert float(np.max(a)) > 0


def test_brute_regen_texture_equivalence():
    """The brute-force regen megakernel's in-kernel atlas fetch
    (scene_table rows 20-26 + kernels/imgfetch.py) matches the jnp
    wavefront integrator on a mixed multi-texture scene, incl. NEE+MIS."""
    from sfvp_tpu.kernels.megakernel_regen import make_regen_render_step

    buffers = _multi_tex_buffers()
    for kw in (dict(),
               dict(use_nee=True, use_mis=True, sampling="cosine")):
        cfg = RenderConfig(width=16, height=16, spp_per_step=2,
                           max_depth=3, **kw)
        a = jax.jit(make_render_step(cfg, buffers))(init_state(16, 16))
        b = jax.jit(make_regen_render_step(cfg, buffers, interpret=True))(
            init_state(16, 16)
        )
        an, bn = np.asarray(a.accum), np.asarray(b.accum)
        err = np.max(np.abs(an - bn)) / max(1e-6, float(np.max(np.abs(an))))
        assert err < 2e-3, (kw, err)
        assert float(np.max(an)) > 0


def test_dispatch_textured_scene_fuses_on_bvh_megakernel():
    """A VMEM-sized atlas keeps textured bvh scenes on the fused regen
    megakernel; an oversized atlas falls back to the wavefront loop."""
    from sfvp_tpu.dispatch import select_render_step

    buffers = _multi_tex_buffers()
    cfg = RenderConfig(width=8, height=8, spp_per_step=2, max_depth=2,
                       backend="pallas", traversal="bvh")
    step = select_render_step(cfg, buffers)
    assert step.__module__ == "sfvp_tpu.kernels.megakernel_bvh"

    big = 1024
    n = big * big
    big_tex = TextureTable(
        tr=jnp.zeros((n,), jnp.float32), tg=jnp.zeros((n,), jnp.float32),
        tb=jnp.zeros((n,), jnp.float32),
        off=jnp.zeros((1,), jnp.int32),
        width=jnp.full((1,), big, jnp.int32),
        height=jnp.full((1,), big, jnp.int32),
    )
    step = select_render_step(cfg, buffers._replace(textures=big_tex))
    assert step.__module__ == "sfvp_tpu.integrate.wavefront"

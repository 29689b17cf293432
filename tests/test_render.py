"""Driver, PNG, checkpoint/resume, and CLI tests."""

import json
import os
import struct
import zlib

import numpy as np
import pytest

from sfvp_tpu import RenderConfig, Renderer
from sfvp_tpu.render.checkpoint import load_checkpoint, save_checkpoint
from sfvp_tpu.render.png import tonemap_srgb_u8, tonemap_unorm_u8, write_png


def _read_png(path):
    """Minimal PNG reader (filter-0, 8-bit RGB) for roundtrip testing."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, w = 8, b"", None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bits, ctype = struct.unpack(">IIBB", payload[:10])
            assert bits == 8 and ctype == 2
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    rows = [raw[y * stride + 1 : (y + 1) * stride] for y in range(h)]
    img = np.frombuffer(b"".join(rows), np.uint8).reshape(h, w, 3)
    return img


def test_png_roundtrip(tmp_path):
    img = (np.arange(16 * 8 * 3, dtype=np.uint32) % 256).astype(np.uint8)
    img = img.reshape(16, 8, 3)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    np.testing.assert_array_equal(_read_png(p), img)


def test_tonemap_unorm_matches_reference_quantization():
    # imageStore to rgba8 unorm = clamp + round-to-nearest
    # (ties at .5 are implementation-defined in Vulkan's unorm convert;
    # avoid testing the tie itself)
    x = np.asarray([[-0.5, 0.0, 0.499 / 255, 0.51 / 255, 1.0, 2.0]], np.float32)
    out = tonemap_unorm_u8(x[..., None].repeat(3, -1))
    np.testing.assert_array_equal(out[0, :, 0], [0, 0, 0, 1, 255, 255])


def test_tonemap_srgb_monotonic():
    x = np.linspace(0, 1, 100, dtype=np.float32).reshape(1, -1, 1).repeat(3, -1)
    out = tonemap_srgb_u8(x)
    assert (np.diff(out[0, :, 0].astype(int)) >= 0).all()


def test_checkpoint_roundtrip(tmp_path, cornell):
    cfg = RenderConfig(width=8, height=8, spp_per_step=2, max_depth=2)
    r = Renderer(cfg, cornell)
    r.step(3)
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, r.state, cfg.config_hash())
    state, h = load_checkpoint(p, cfg.config_hash())
    np.testing.assert_array_equal(np.asarray(state.accum), np.asarray(r.state.accum))
    assert int(state.frame) == 3


def test_checkpoint_config_mismatch(tmp_path, cornell):
    cfg = RenderConfig(width=8, height=8, spp_per_step=2, max_depth=2)
    r = Renderer(cfg, cornell)
    r.step(1)
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, r.state, cfg.config_hash())
    with pytest.raises(ValueError, match="hash"):
        load_checkpoint(p, "deadbeef")


def test_resume_continues_running_mean(tmp_path, cornell):
    """render 4 steps straight == render 2, checkpoint, resume, render 2."""
    cfg = RenderConfig(width=8, height=8, spp_per_step=2, max_depth=3)
    a = Renderer(cfg, cornell)
    a.step(4)

    b = Renderer(cfg, cornell)
    b.step(2)
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, b.state, cfg.config_hash())
    c = Renderer(cfg, cornell)
    c.resume(p)
    c.step(2)
    np.testing.assert_allclose(
        np.asarray(a.state.accum), np.asarray(c.state.accum), rtol=1e-6, atol=1e-7
    )


def test_driver_run_writes_outputs(tmp_path, cornell):
    cfg = RenderConfig(width=8, height=8, spp_per_step=2, max_depth=2)
    out = str(tmp_path / "img.png")
    log = str(tmp_path / "log.jsonl")
    ckpt = str(tmp_path / "c.npz")
    r = Renderer(cfg, cornell)
    img = r.run(
        steps=3, out=out, frame_every=2, checkpoint_path=ckpt,
        checkpoint_every=2, log_path=log, progress=False,
    )
    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / "img_step00002.png"))
    assert os.path.exists(ckpt)
    recs = [json.loads(l) for l in open(log)]
    assert len(recs) == 3 and recs[-1]["step"] == 3
    assert img.shape == (8, 8, 3)


def test_cli_smoke(tmp_path):
    from sfvp_tpu.cli import main

    out = str(tmp_path / "cli.png")
    rc = main([
        "--width", "8", "--height", "8", "--steps", "1", "--spp", "2",
        "--max-depth", "2", "--out", out, "--quiet", "--backend", "jnp",
    ])
    assert rc == 0 and os.path.exists(out)
    img = _read_png(out)
    assert img.shape == (8, 8, 3)


def test_cli_procedural_scene(tmp_path):
    """--scene sphere renders through the BVH path with a framing camera."""
    from sfvp_tpu.cli import main

    out = str(tmp_path / "sph.png")
    rc = main([
        "--scene", "sphere", "--scene-tris", "800",
        "--width", "16", "--height", "16", "--steps", "1", "--spp", "2",
        "--max-depth", "2", "--out", out, "--quiet", "--backend", "jnp",
        "--sampling", "cosine",
    ])
    assert rc == 0
    img = _read_png(out)
    assert img.shape == (16, 16, 3)
    # sphere must be visible: interior darker than the sky border
    assert img[8, 8].mean() < img[0, 0].mean()


def test_cli_devices_flag(capsys):
    from sfvp_tpu.cli import main

    assert main(["--devices"]) == 0
    outp = capsys.readouterr().out
    assert "platform" in outp


def test_dist_checkpoint_roundtrip(tmp_path, cornell):
    """Sharded accumulators checkpoint (host-gathered) and resume into a
    single-device Renderer exactly."""
    from sfvp_tpu import RenderConfig, Renderer
    from sfvp_tpu.dist import DistRenderer
    from sfvp_tpu.render.checkpoint import load_checkpoint, save_checkpoint

    cfg = RenderConfig(width=16, height=16, spp_per_step=2, max_depth=3,
                       backend="jnp")
    dr = DistRenderer(cfg, cornell)
    dr.step(2)
    p = str(tmp_path / "dist.npz")
    save_checkpoint(p, dr.state, cfg.config_hash())

    r = Renderer(cfg, cornell)
    r.resume(p)
    r.step(1)
    # equals 3 straight single-device steps (sharded == single invariant)
    ref = Renderer(cfg, cornell)
    ref.step(3)
    np.testing.assert_allclose(
        np.asarray(r.state.accum), np.asarray(ref.state.accum),
        rtol=1e-5, atol=1e-7,
    )


def test_thin_lens_dof(cornell):
    """Thin-lens camera: hash-stable when closed; a color edge at the
    focal plane stays sharp, off the focal plane it blurs."""
    import dataclasses

    import jax
    import numpy as np

    from sfvp_tpu import RenderConfig, init_state, make_render_step, upload
    from sfvp_tpu.config import CameraConfig
    from sfvp_tpu.scene.objload import Scene

    # pinhole hash unchanged by the new camera fields
    base = RenderConfig(width=32, height=16, spp_per_step=64, max_depth=2,
                        sampling="cosine")
    assert base.config_hash() == dataclasses.replace(
        base, camera=CameraConfig(lens_radius=0.0)).config_hash()
    open_lens = dataclasses.replace(
        base, camera=CameraConfig(lens_radius=0.25, focus_dist=3.0))
    assert open_lens.config_hash() != base.config_hash()

    def split_wall(z):
        """Vertical red|green color edge at x=0 in the plane z=z."""
        tris = [
            [[-50.0, -50, z], [0, -50, z], [0, 50, z]],
            [[-50.0, -50, z], [0, 50, z], [-50, 50, z]],
            [[0.0, -50, z], [50, -50, z], [50, 50, z]],
            [[0.0, -50, z], [50, 50, z], [0, 50, z]],
        ]
        return Scene(
            vertices=np.asarray(tris, np.float32).reshape(-1, 3),
            indices=np.arange(12, dtype=np.uint32),
            face_diffuse=np.asarray(
                [[0.9, 0.05, 0.05]] * 2 + [[0.05, 0.9, 0.05]] * 2,
                np.float32),
            face_emission=np.zeros((4, 3), np.float32),
            face_specular=np.zeros((4, 3), np.float32),
            face_mat_type=np.zeros((4,), np.int32),
        )

    def edge_sharpness(cfg, z):
        buffers = upload(split_wall(z))
        step = jax.jit(make_render_step(cfg, buffers))
        st = step(step(init_state(16, 32)))
        img = np.asarray(st.accum)
        # red-minus-green column profile; sharpness = max column gradient
        prof = (img[..., 0] - img[..., 1]).mean(axis=0)
        return float(np.abs(np.diff(prof)).max())

    # camera at (0,-1,5) looking -z; focal plane z = 5 - 3 = 2
    for z in (2.0, -2.0):
        pin = edge_sharpness(base, z)
        lens = edge_sharpness(open_lens, z)
        if z == 2.0:  # at focus: edge as sharp as the pinhole
            assert lens > 0.75 * pin, (z, pin, lens)
        else:         # out of focus: clearly blurred
            assert lens < 0.55 * pin, (z, pin, lens)

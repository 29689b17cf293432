"""EXR (HDR) export tests: bit-exact roundtrip, external-decoder
validation (cv2, when present), and driver/CLI integration."""

import os

import numpy as np
import pytest

from sfvp_tpu.render.exr import read_exr, write_exr


def _hdr_image():
    g = np.random.default_rng(3)
    img = g.random((12, 17, 3), dtype=np.float32) * 20.0
    img[0, 0] = [0.0, 1e-8, 17.0]     # reference light intensity range
    img[1, 1] = [123.5, 0.25, 3e4]    # values far outside [0,1]
    return img


def test_exr_roundtrip_bit_exact(tmp_path):
    img = _hdr_image()
    p = str(tmp_path / "x.exr")
    write_exr(p, img)
    np.testing.assert_array_equal(read_exr(p), img)


def test_exr_external_decoder(tmp_path):
    cv2 = pytest.importorskip("cv2")
    img = _hdr_image()
    p = str(tmp_path / "x.exr")
    write_exr(p, img)
    os.environ["OPENCV_IO_ENABLE_OPENEXR"] = "1"
    got = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    if got is None:
        pytest.skip("cv2 built without OpenEXR support")
    got_rgb = got[:, :, ::-1]  # cv2 returns BGR
    np.testing.assert_array_equal(got_rgb, img)


def test_exr_shape_validation(tmp_path):
    with pytest.raises(ValueError, match="expected"):
        write_exr(str(tmp_path / "bad.exr"), np.zeros((4, 4)))


def test_driver_exr_output(tmp_path, cornell):
    from sfvp_tpu import RenderConfig, Renderer

    cfg = RenderConfig(width=8, height=8, spp_per_step=2, max_depth=2)
    out = str(tmp_path / "img.exr")
    img = Renderer(cfg, cornell).run(steps=1, out=out, progress=False)
    # EXR preserves the raw f32 accumulator exactly (no quantization)
    np.testing.assert_array_equal(read_exr(out), img)


def test_cli_exr_output(tmp_path):
    from sfvp_tpu.cli import main

    out = str(tmp_path / "cli.exr")
    rc = main([
        "--width", "8", "--height", "8", "--steps", "1", "--spp", "2",
        "--max-depth", "2", "--out", out, "--quiet", "--backend", "jnp",
    ])
    assert rc == 0
    img = read_exr(out)
    assert img.shape == (8, 8, 3) and img.dtype == np.float32
    assert np.isfinite(img).all()

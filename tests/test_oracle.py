"""Independent-oracle parity (VERDICT r1 missing-item #1): the framework's
parity mode must match a literal float32 NumPy transcription of the Vulkan
reference's shaders (tools/oracle_ref.py — zero shared code with sfvp_tpu)
at float32-rounding level, because both consume the same PCG stream.

This is the non-self-referential leg of the <=2% RMSE quality claim: a bug
shared by the jnp integrator and the Pallas kernels (which share rng.py /
sampling.py) cannot hide from this oracle.
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import oracle_ref  # noqa: E402

from sfvp_tpu import RenderConfig, init_state, load_obj, upload  # noqa: E402
from sfvp_tpu.integrate.wavefront import make_render_step  # noqa: E402
from sfvp_tpu.scene import cornell_box_path  # noqa: E402


def test_oracle_rng_matches_glsl_recipes():
    """The oracle's PCG must itself match the GLSL recipes bit-for-bit
    (cross-check against the framework's independently written rng_np)."""
    from sfvp_tpu import rng

    seeds = np.asarray([0, 1, 42, 0xDEADBEEF, 2**32 - 1], np.uint32)
    v_o, s_o = oracle_ref.pcg(seeds)
    v_f, s_f = rng.pcg_np(seeds)
    np.testing.assert_array_equal(v_o, v_f)
    np.testing.assert_array_equal(s_o, s_f)

    ax, ay = oracle_ref.pcg2d(seeds, seeds[::-1].copy())
    bx, by = rng.pcg2d_np(seeds, seeds[::-1].copy())
    np.testing.assert_array_equal(ax, bx)
    np.testing.assert_array_equal(ay, by)


def test_oracle_scene_ingest_matches():
    """Oracle's own OBJ/MTL parse must agree with the framework loader on
    the canonical Cornell asset (36 tris, same geometry and materials)."""
    tris, kd, ke = oracle_ref.load_scene(cornell_box_path())
    scene = load_obj()
    assert tris.shape == (36, 3, 3)
    np.testing.assert_allclose(tris, scene.triangles(), rtol=0, atol=0)
    np.testing.assert_allclose(kd, np.asarray(scene.face_diffuse), rtol=0, atol=0)
    np.testing.assert_allclose(ke, np.asarray(scene.face_emission), rtol=0, atol=0)


@pytest.mark.parametrize("frames", [2])
def test_framework_matches_independent_oracle(frames):
    """Parity-mode progressive render == independent oracle to f32 rounding."""
    size, spp = 32, 32
    img_o = oracle_ref.render(cornell_box_path(), size, size, frames, spp=spp)

    cfg = RenderConfig(width=size, height=size, spp_per_step=spp, max_depth=8)
    step = jax.jit(make_render_step(cfg, upload(load_obj())))
    st = init_state(size, size)
    for _ in range(frames):
        st = step(st)
    img_f = np.asarray(st.accum)

    rel = np.sqrt(((img_f - img_o) ** 2).mean()) / np.sqrt((img_o**2).mean())
    # the 2% budget is the product target; actual agreement is fp rounding
    assert rel < 1e-5, f"relative RMSE vs independent oracle: {rel}"
    assert np.abs(img_f - img_o).max() < 1e-4

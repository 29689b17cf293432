"""Multi-chip sharding tests on the 8-virtual-device CPU mesh (see
conftest). The invariant: an N-chip render is pixel-identical to the 1-chip
render of the same config (tile-disjoint pixels, global-coordinate seeds)."""

import numpy as np
import jax
import pytest

from sfvp_tpu import RenderConfig, init_state, make_render_step, upload
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

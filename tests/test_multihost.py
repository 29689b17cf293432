"""Multi-host plumbing (dist/multihost.py). A real DCN mesh needs multiple
processes; these tests pin the single-process behavior the plumbing must
preserve (no-op init, fully-addressable fast paths) and the local-slab
arithmetic used for process-local state creation."""

import numpy as np
import jax
from jax.sharding import PartitionSpec as P

from sfvp_tpu.dist import default_mesh
from sfvp_tpu.dist.multihost import fetch_global, init_distributed, make_global_array


def test_init_distributed_single_process_noop():
    assert init_distributed() is False
    # idempotent
    assert init_distributed() is False
    assert jax.process_count() == 1


def test_make_global_array_fully_addressable():
    mesh = default_mesh()
    x = np.arange(8 * 4 * 3, dtype=np.float32).reshape(8, 4, 3)
    arr = make_global_array(mesh, P("rows", None, None), x)
    assert arr.shape == (8, 4, 3)
    assert len(arr.addressable_shards) == 8
    np.testing.assert_array_equal(np.asarray(arr), x)


def test_fetch_global_fully_addressable():
    mesh = default_mesh()
    x = np.ones((8, 4), np.float32)
    arr = make_global_array(mesh, P("rows", None), x)
    np.testing.assert_array_equal(fetch_global(arr), x)


def test_dist_renderer_single_process_still_works(cornell):
    from sfvp_tpu import RenderConfig
    from sfvp_tpu.dist import DistRenderer

    cfg = RenderConfig(width=16, height=16, spp_per_step=2, max_depth=2)
    r = DistRenderer(cfg, cornell)
    r.step(1)
    img = r.image()
    assert img.shape == (16, 16, 3) and np.isfinite(img).all()

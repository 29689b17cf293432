"""Worker for the 2-process multihost test (tests/test_multihost.py).

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the parent);
together they form an 8-device global mesh across a real jax.distributed
runtime, so the non-fully-addressable branches of dist/multihost.py
(make_array_from_process_local_data, process_allgather) actually execute.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from sfvp_tpu.dist import default_mesh  # noqa: E402
from sfvp_tpu.dist.multihost import (  # noqa: E402
    fetch_global,
    init_distributed,
    make_global_array,
)


def main() -> int:
    multi = init_distributed()
    assert multi, "expected a multi-process runtime"
    assert jax.process_count() == 2, jax.process_count()
    pid = jax.process_index()
    mesh = default_mesh()
    n = int(mesh.devices.size)
    assert n == 8, n

    # --- raw plumbing: process-local slab -> global array -> allgather ---
    h, w = 16, 4
    rows_local = h // jax.process_count()
    local = np.full((rows_local, w, 3), float(pid), np.float32)
    arr = make_global_array(mesh, P("rows", None, None), local)
    assert not arr.is_fully_addressable
    out = fetch_global(arr)  # process_allgather over the fake DCN
    assert out.shape == (h, w, 3)
    assert (out[:rows_local] == 0.0).all()
    assert (out[rows_local:] == 1.0).all()

    # --- full DistRenderer across processes: pixel-identical promise ---
    from sfvp_tpu import RenderConfig, init_state, load_obj, upload
    from sfvp_tpu.dist import DistRenderer
    from sfvp_tpu.integrate.wavefront import make_render_step

    scene = load_obj()
    cfg = RenderConfig(width=16, height=16, spp_per_step=1, max_depth=2)
    r = DistRenderer(cfg, scene, mesh=mesh)
    r.step(1)
    img = r.image()

    ref = np.asarray(
        jax.jit(make_render_step(cfg, upload(scene)))(
            init_state(16, 16)
        ).accum
    )
    np.testing.assert_array_equal(img, ref)

    print(f"MULTIHOST_OK {pid}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

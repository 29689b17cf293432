"""Sensitivity probe: what does the ordered-push SORT NETWORK cost?

The per-node-pop scalar chain is the recorded bottleneck of incoherent
traversal (docs/ROADMAP.md). The u8-box probe settled the box loads at
~2% of the GI step via a +48-duplicate-load shadow run; this probe does
the same for the 19-comparator bitonic network that orders child pushes
(19 compares + 76 selects per node pop): `shadow_sort=k` re-sorts the
already-sorted key/code lists k extra times — strictly-descending input
means every comparator's `<` is False, so each pass is the identity and
the render stays bitwise-identical while the network's op count
multiplies by (1+k).

If doubling (or tripling) the network barely moves the step, cheaper
ordering schemes (rank-based insertion, partial networks, skip-on-
npush<=1) are dead on arrival; if it moves the step a lot, the network
is the next lever.

Times the fused GI step (the BENCH_SUITE gi_100k workload shape) at
shadow_sort = 0 / 1 / 2 and checks bitwise identity. One JSON line.

Usage: python -u benchmarks/probe_sort_shadow.py [--tris 100000 --size 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tris", type=int, default=100_000)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--spp", type=int, default=8)
    p.add_argument("--depth", type=int, default=8)
    a = p.parse_args()

    import numpy as np
    import jax

    from sfvp_tpu import RenderConfig, init_state, upload
    from sfvp_tpu.accel.wide import build_wide_from_buffers
    from sfvp_tpu.config import CameraConfig
    from sfvp_tpu.kernels.megakernel_bvh import make_bvh_regen_render_step
    from sfvp_tpu.scene.procedural import sphere_mesh
    from sfvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    n = max(32, int(np.sqrt(a.tris / 2)))
    scene = sphere_mesh(n_lat=n, n_lon=n, bump=0.3)
    buffers = upload(scene)
    wide = build_wide_from_buffers(buffers)
    cam = CameraConfig.look_at(origin=(0.0, 2.2, 5.0), target=(0, 0, 0),
                               fov_y_deg=50)
    cfg = RenderConfig(width=a.size, height=a.size, spp_per_step=a.spp,
                       max_depth=a.depth, camera=cam, sampling="cosine",
                       sky_emission=(0.8, 0.85, 1.0), use_rr=True)

    results = {
        "tris": int(scene.num_triangles),
        "nodes": int(wide.nodes.shape[0]),
    }
    ref_img = None
    for k in (0, 1, 2):
        step = jax.jit(
            make_bvh_regen_render_step(cfg, buffers, wide=wide,
                                       shadow_sort=k),
        )
        st = init_state(a.size, a.size)
        st = step(st)
        jax.block_until_ready(st.accum)
        img = np.asarray(st.accum)
        if ref_img is None:
            ref_img = img
        else:
            assert np.array_equal(ref_img, img), (
                f"shadow_sort={k} is not bitwise-identical")
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            st = step(st)
        jax.block_until_ready(st.accum)
        dt = (time.perf_counter() - t0) / reps
        results[f"gi_step_s_shadow{k}"] = round(dt, 4)
    r0 = results["gi_step_s_shadow0"]
    results["net_cost_frac_est"] = round(
        results["gi_step_s_shadow1"] / r0 - 1.0, 4)
    results["net_cost_frac_est_x2"] = round(
        (results["gi_step_s_shadow2"] / r0 - 1.0) / 2.0, 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

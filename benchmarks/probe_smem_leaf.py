"""A/B probe: smem_leaf — SMEM 2-slot leaf-row ring + scalar loads vs
the shipping dynamic-VMEM-row load + 128 lane extracts per leaf pop.

micro_leaf_cost.py measured the extract chain at ~191 ns/pop and SMEM
scalar loads as FREE (they dual-issue with the consuming Moller-Trumbore
scalar math) — IF the row DMA rides the prefetch ring (leaf->leaf
adjacency 70-78%, sim_packets.py). This probe measures the end-to-end
effect on the fused BVH regen kernel:

  gi_100k      resident tri rows, VMEM->SMEM ring   (bench gi config @512)
  streamed_500k HBM tri rows, HBM->SMEM ring        (bench streamed config)

Bitwise identity between the two variants is asserted per workload (the
ring only changes WHERE the same 128 floats are read from). One JSON
line.

Usage: python -u benchmarks/probe_smem_leaf.py [--size 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _time_pair(cfg, buffers, size, reps=3, **kw):
    import jax
    import numpy as np

    from sfvp_tpu import init_state
    from sfvp_tpu.kernels.megakernel_bvh import make_bvh_regen_render_step

    out = {}
    ref = None
    for sl in (False, True):
        step = jax.jit(
            make_bvh_regen_render_step(cfg, buffers, smem_leaf=sl, **kw))
        st = step(init_state(size, size))
        jax.block_until_ready(st.accum)
        img = np.asarray(st.accum)
        if ref is None:
            ref = img
        else:
            assert np.array_equal(ref, img), "smem_leaf not bitwise-identical"
        t0 = time.perf_counter()
        for _ in range(reps):
            st = step(st)
        jax.block_until_ready(st.accum)
        out[sl] = (time.perf_counter() - t0) / reps
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--skip-streamed", action="store_true")
    a = p.parse_args()

    import numpy as np

    from sfvp_tpu import RenderConfig, upload
    from sfvp_tpu.config import CameraConfig
    from sfvp_tpu.scene.procedural import sphere_mesh
    from sfvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cam = CameraConfig.look_at(origin=(0.0, 2.2, 5.0), target=(0, 0, 0),
                               fov_y_deg=50)
    results = {"round": 4, "probe": "smem_leaf", "size": a.size}

    # gi_100k class: resident rows, NEE+RR (both traversal sites hot)
    n = 224
    buffers = upload(sphere_mesh(n_lat=n, n_lon=n, bump=0.3))
    cfg = RenderConfig(width=a.size, height=a.size, spp_per_step=8,
                       max_depth=8, camera=cam, sampling="cosine",
                       sky_emission=(0.8, 0.85, 1.0), use_nee=True,
                       use_rr=True, backend="pallas")
    t = _time_pair(cfg, buffers, a.size)
    results["gi_100k_step_s_extract"] = round(t[False], 4)
    results["gi_100k_step_s_smem_leaf"] = round(t[True], 4)
    results["gi_100k_speedup"] = round(t[False] / t[True], 4)
    print(json.dumps(results), flush=True)

    if not a.skip_streamed:
        buffers = upload(sphere_mesh(n_lat=500, n_lon=500, bump=0.3))
        cfg = RenderConfig(width=a.size, height=a.size, spp_per_step=8,
                           max_depth=8, camera=cam, sampling="cosine",
                           sky_emission=(0.8, 0.85, 1.0), backend="pallas")
        t = _time_pair(cfg, buffers, a.size, stream_tris=True)
        results["streamed_500k_step_s_vmem_ring"] = round(t[False], 4)
        results["streamed_500k_step_s_smem_ring"] = round(t[True], 4)
        results["streamed_500k_speedup"] = round(t[False] / t[True], 4)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

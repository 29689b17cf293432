"""Probe: full node table in SMEM (megakernel_bvh smem_boxes) vs VMEM
node rows + lane extracts.

Motivation: node pops are bound by the serial scalar chain — dynamic
VMEM row load -> 48 lane extracts -> slab tests. With smem_boxes the 48
box scalars come from SMEM (like the child codes already do), so a node
pop does ZERO VMEM traffic and the whole chain starts at scalar-load
latency. Cost: 192B/node of scalar memory (auto-gated by
SMEM_BOXES_MAX_BYTES).

Times the fused GI step (RR + cosine sky-lit — the BENCH_SUITE gi_100k
workload shape) with smem_boxes off/on. One JSON line.

Usage: python -u benchmarks/probe_smem_boxes.py [--tris 100000 --size 512]
"""

from __future__ import annotations

import argparse
import json
import time


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
        "codes_kb": round(wide.codes_nbytes / 1024, 1),
        "boxes_kb": round(wide.nodes.shape[0] * 48 * 4 / 1024, 1),
    }
    for sb in (False, True):
        step = jax.jit(
            make_bvh_regen_render_step(cfg, buffers, wide=wide,
                                       smem_codes=True, smem_boxes=sb),
        )
        st = init_state(a.size, a.size)
        st = step(st)
        jax.block_until_ready(st.accum)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            st = step(st)
        jax.block_until_ready(st.accum)
        dt = (time.perf_counter() - t0) / reps
        results[f"gi_step_s_boxes{int(sb)}"] = round(dt, 4)
        results[f"gi_mrays_boxes{int(sb)}"] = round(
            float(st.mrays) / float(st.frame) / dt, 2)
    r0 = results["gi_step_s_boxes0"]
    r1 = results["gi_step_s_boxes1"]
    results["speedup"] = round(r0 / r1, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

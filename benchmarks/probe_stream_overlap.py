"""Probe (round-4 VERDICT item 6): how much of the streamed regen
kernel's step is the blocking per-leaf HBM->VMEM DMA?

Method: the same scene, same kernel, stream_tris forced True vs False
(traversal and output are identical; only load_tri_row differs). The
on/off delta IS the total streaming overhead — the ceiling on what any
DMA-overlap scheme (2-slot ring, decoupled queue) could recover. Run at
a size that fits VMEM both ways (default 100k tris); the per-leaf cost
scales with leaf pops, so the fraction transfers to the 500k scene.

Combine with sim_packets.py --leaf-adjacency (the fraction of leaf pops
whose predecessor pop is also a leaf — the pops where a ring prefetch
issued before the predecessor's 8 intersection tests has real work to
hide behind) to price the realistic recovery before building a kernel.

One JSON line. Usage: python -u benchmarks/probe_stream_overlap.py
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
    p.add_argument("--steps", type=int, default=3)
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

    res = {"tris": int(buffers.num_tris), "nodes": int(wide.nodes.shape[0]),
           "size": a.size}
    for stream in (False, True):
        step = jax.jit(make_bvh_regen_render_step(
            cfg, buffers, wide=wide, block_rows=cfg.packet_block_rows,
            stream_tris=stream), donate_argnums=(0,))
        state = init_state(cfg.height, cfg.width)
        state = step(state)
        jax.block_until_ready(state.accum)
        t0 = time.perf_counter()
        for _ in range(a.steps):
            state = step(state)
        jax.block_until_ready(state.accum)
        key = "stream_s_per_step" if stream else "resident_s_per_step"
        res[key] = round((time.perf_counter() - t0) / a.steps, 4)
    res["stream_overhead_frac"] = round(
        1.0 - res["resident_s_per_step"] / res["stream_s_per_step"], 4)
    print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

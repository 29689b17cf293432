"""A/B probe: two-level (instanced TLAS) per-pop context cost.

Round-5 VERDICT item 1: the instanced bench (50 instances / ~220k
flattened tris) sits at 1.59 Mrays/s and the round-4 ledger blames
instance-context scalar work per pop. This probe times the EXACT bench
config (bench.py bench_instanced_tlas) on the current tree and prints a
content hash of the first accumulated step so two runs (e.g. HEAD vs a
working-tree change) can assert bitwise identity across the change.

Usage: python -u benchmarks/probe_tlas_ctx.py [--size 512] [--rows N]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--rows", type=int, default=0,
                   help="override tlas_block_rows (0 = config default)")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--tag", default="tree")
    p.add_argument("--smem-leaf", action="store_true",
                   help="bypass dispatch: fused two-level kernel with "
                        "the SMEM leaf ring (instance-guarded prefetch)")
    p.add_argument("--no-defer-xform", action="store_true")
    a = p.parse_args()

    import dataclasses

    import jax
    import numpy as np

    from sfvp_tpu import init_state
    from sfvp_tpu.config import CameraConfig
    from sfvp_tpu.dispatch import select_instanced_render_step
    from sfvp_tpu.scene.procedural import instanced_field
    from sfvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # EXACT mirror of bench.py bench_instanced_tlas (_gi_cfg defaults)
    from sfvp_tpu import RenderConfig

    cfg = RenderConfig(
        width=a.size, height=a.size, spp_per_step=8, max_depth=8,
        sampling="cosine", sky_emission=(0.8, 0.85, 1.0),
        backend="pallas",
        camera=CameraConfig.look_at(origin=(10.5, 7.5, 10.5),
                                    target=(0, 0.6, 0), fov_y_deg=50),
    )
    if a.rows:
        cfg = dataclasses.replace(cfg, tlas_block_rows=a.rows)

    insts = instanced_field(n_tris=220_000, n_inst=49)
    if a.smem_leaf or a.no_defer_xform:
        from sfvp_tpu.accel.instances import flatten_instances
        from sfvp_tpu.accel.tlas import build_two_level
        from sfvp_tpu.kernels.megakernel_bvh import (
            make_bvh_regen_render_step,
        )
        from sfvp_tpu.scene import upload

        flat = upload(flatten_instances(insts))
        tl = build_two_level(insts)
        step_fn = make_bvh_regen_render_step(
            cfg, flat, tl=tl, block_rows=cfg.tlas_block_rows,
            smem_leaf=a.smem_leaf,
            defer_inst_xform=not a.no_defer_xform)
    else:
        step_fn, _ = select_instanced_render_step(cfg, insts)
    step = jax.jit(step_fn)

    t0 = time.perf_counter()
    st = step(init_state(cfg.height, cfg.width))
    jax.block_until_ready(st.accum)
    compile_s = time.perf_counter() - t0
    digest = hashlib.sha256(
        np.asarray(st.accum).tobytes()).hexdigest()[:16]

    m0 = float(st.mrays)
    t0 = time.perf_counter()
    for _ in range(a.reps):
        st = step(st)
    jax.block_until_ready(st.accum)
    dt = time.perf_counter() - t0
    mrays = (float(st.mrays) - m0) / dt

    print(json.dumps({
        "probe": "tlas_ctx", "tag": a.tag, "size": a.size,
        "rows": a.rows or cfg.tlas_block_rows,
        "mrays_per_s": round(mrays, 3),
        "s_per_step": round(dt / a.reps, 4),
        "step1_sha": digest, "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()

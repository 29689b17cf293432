"""A/B the push-time leaf-DMA prefetch (push_pf) — round-5 VERDICT
item 7, the last unprobed member of the streamed-DMA family.

The shipping ring hides a leaf's DMA only behind the PREVIOUS leaf pop
(pop-time peek; leaf->leaf adjacency 70-78% on the 500k wave), so ~1 in
4 leaf pops still waits on a blocking copy. push_pf issues the DMA from
the PUSHING node pop instead, whenever the node's new stack top is a
leaf: the copy then overlaps the 8 stack writes, the while_loop
backedge + branch dispatch (the 18.7% fixed iteration cost measured by
PROBE_POP_BUDGET_r05) and the leaf pop's front-end. No spill handling:
the predicted code IS the new top, so the very next pop consumes it.

Ship gate (VERDICT): >=1.15x on the streamed_500k bench config, else
record the numbers and close the family permanently.

Usage: python -u benchmarks/probe_push_pf.py [--size 512] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _time_step(step_fn, cfg, reps):
    import jax

    from sfvp_tpu import init_state

    import numpy as np

    step = jax.jit(step_fn)
    st = step(init_state(cfg.height, cfg.width))
    jax.block_until_ready(st.accum)
    img = np.asarray(st.accum).copy()
    m0 = float(st.mrays)
    t0 = time.perf_counter()
    for _ in range(reps):
        st = step(st)
    jax.block_until_ready(st.accum)
    dt = time.perf_counter() - t0
    return (float(st.mrays) - m0) / dt, dt / reps, img


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--skip-instanced", action="store_true")
    a = p.parse_args()

    import numpy as np

    from sfvp_tpu import RenderConfig, upload
    from sfvp_tpu.config import CameraConfig
    from sfvp_tpu.kernels.megakernel_bvh import make_bvh_regen_render_step
    from sfvp_tpu.scene.procedural import instanced_field, sphere_mesh
    from sfvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    out = {"probe": "push_pf", "size": a.size}

    cam = CameraConfig.look_at(origin=(0.0, 2.2, 5.0),
                               target=(0.0, 0.0, 0.0), fov_y_deg=50.0)

    # 1) the VERDICT target: streamed 500k (exact bench config at --size)
    big = upload(sphere_mesh(n_lat=500, n_lon=500, bump=0.3))
    cfg = RenderConfig(width=a.size, height=a.size, spp_per_step=8,
                       max_depth=8, sampling="cosine", camera=cam,
                       sky_emission=(0.8, 0.85, 1.0), backend="pallas")
    for tag, pf in (("stream_base", False), ("stream_pf", True)):
        mrays, sps, img = _time_step(
            make_bvh_regen_render_step(cfg, big, stream_tris=True,
                                       smem_leaf=True, push_pf=pf),
            cfg, a.reps)
        out[tag] = round(mrays, 3)
        out[tag + "_s_per_step"] = round(sps, 4)
        if pf:
            assert np.array_equal(ref, img), "push_pf not bitwise-identical"
        else:
            ref = img
        print(tag, out[tag], flush=True)
    out["stream_speedup"] = round(out["stream_pf"] / out["stream_base"], 3)

    # 2) resident GI w/ SMEM ring + NEE (both loops exercised)
    gi = upload(sphere_mesh(n_lat=224, n_lon=224, bump=0.3))
    gcfg = RenderConfig(width=a.size, height=a.size, spp_per_step=8,
                        max_depth=8, sampling="cosine", camera=cam,
                        sky_emission=(0.8, 0.85, 1.0), backend="pallas",
                        use_nee=True, use_rr=True)
    for tag, pf in (("gi_base", False), ("gi_pf", True)):
        mrays, sps, img = _time_step(
            make_bvh_regen_render_step(gcfg, gi, smem_leaf=True,
                                       push_pf=pf),
            gcfg, a.reps)
        out[tag] = round(mrays, 3)
        if pf:
            assert np.array_equal(ref, img), "push_pf not bitwise-identical"
        else:
            ref = img
        print(tag, out[tag], flush=True)
    out["gi_speedup"] = round(out["gi_pf"] / out["gi_base"], 3)

    # 3) instanced two-level w/ the instance-guarded SMEM ring
    if not a.skip_instanced:
        from sfvp_tpu.accel.instances import flatten_instances
        from sfvp_tpu.accel.tlas import build_two_level

        insts = instanced_field(n_tris=220_000, n_inst=49)
        flat = upload(flatten_instances(insts))
        tl = build_two_level(insts)
        icfg = RenderConfig(
            width=a.size, height=a.size, spp_per_step=8, max_depth=8,
            sampling="cosine", sky_emission=(0.8, 0.85, 1.0),
            backend="pallas",
            camera=CameraConfig.look_at(origin=(10.5, 7.5, 10.5),
                                        target=(0, 0.6, 0), fov_y_deg=50),
        )
        for tag, pf in (("tlas_base", False), ("tlas_pf", True)):
            mrays, sps, img = _time_step(
                make_bvh_regen_render_step(
                    icfg, flat, tl=tl, block_rows=icfg.tlas_block_rows,
                    smem_leaf=True, push_pf=pf),
                icfg, a.reps)
            out[tag] = round(mrays, 3)
            if pf:
                assert np.array_equal(ref, img), \
                    "push_pf not bitwise-identical (two-level)"
            else:
                ref = img
            print(tag, out[tag], flush=True)
        out["tlas_speedup"] = round(out["tlas_pf"] / out["tlas_base"], 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

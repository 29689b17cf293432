"""A/B the two per-iteration-overhead attacks priced by
PROBE_POP_BUDGET_r05 (fixed while_loop iteration cost = 18.7% of the
fused GI step): scratch_pay (hit payload planes move from the traversal
carry into persistent VMEM scratch, shrinking every lax.cond join to
(sp, bt)) and pop_unroll (up to N stack pops per while iteration,
amortizing the loop bookkeeping). Both are bitwise-identical
(CPU-interpret checked + asserted on-device here).

Usage: python -u benchmarks/probe_loop_overhead.py [--size 512]
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
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--reps", type=int, default=3)
    a = p.parse_args()

    import jax
    import numpy as np

    from sfvp_tpu import RenderConfig, init_state, upload
    from sfvp_tpu.config import CameraConfig
    from sfvp_tpu.kernels.megakernel_bvh import make_bvh_regen_render_step
    from sfvp_tpu.scene.procedural import sphere_mesh
    from sfvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cam = CameraConfig.look_at(origin=(0.0, 2.2, 5.0), target=(0.0, 0.0, 0.0),
                               fov_y_deg=50.0)
    buffers = upload(sphere_mesh(n_lat=224, n_lon=224, bump=0.3))
    cfg = RenderConfig(width=a.size, height=a.size, spp_per_step=8,
                       max_depth=8, sampling="cosine", camera=cam,
                       sky_emission=(0.8, 0.85, 1.0), backend="pallas",
                       use_nee=True, use_rr=True)

    out = {"probe": "loop_overhead", "size": a.size}
    ref = None
    for tag, kw in (("base", {}),
                    ("scratch", {"scratch_pay": True}),
                    ("unroll2", {"pop_unroll": 2}),
                    ("both", {"scratch_pay": True, "pop_unroll": 2}),
                    ("both3", {"scratch_pay": True, "pop_unroll": 3})):
        step = jax.jit(make_bvh_regen_render_step(
            cfg, buffers, smem_leaf=True, **kw))
        st = step(init_state(cfg.height, cfg.width))
        jax.block_until_ready(st.accum)
        img = np.asarray(st.accum)
        if ref is None:
            ref = img
        else:
            assert np.array_equal(ref, img), f"{tag} not bitwise-identical"
        t0 = time.perf_counter()
        for _ in range(a.reps):
            st = step(st)
        jax.block_until_ready(st.accum)
        out[tag + "_s_per_step"] = round(
            (time.perf_counter() - t0) / a.reps, 4)
        print(tag, out[tag + "_s_per_step"], flush=True)
    b = out["base_s_per_step"]
    for tag in ("scratch", "unroll2", "both", "both3"):
        out[tag + "_speedup"] = round(b / out[tag + "_s_per_step"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

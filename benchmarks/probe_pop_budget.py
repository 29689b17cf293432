"""Complete the per-pop SCALAR-chain decomposition of the fused GI step
(round-5 VERDICT item 2): round-4/5 probes priced box loads (~2%), the
sort network (5-7%), reductions (~0), leaf extracts (ring'd away), and
vector slab/MT work (~10% combined, probe_vec_budget.py). The three
unpriced members are the PUSH writes (8 SMEM stores + popcount chain),
the CODE loads (8 SMEM loads per node pop), and the while_loop's fixed
per-iteration overhead (cond eval, carry threading, branch setup).

Each gets a CSE-proof bitwise-identical duplicate knob in
megakernel_bvh (shadow_push / shadow_code / shadow_iters); the share is
the slope:  share ~= (t(shadow=1) - t(base)) / t(base).

shadow_iters=1 DOUBLES the iteration count with no-op filler
iterations, so its slope prices (fixed overhead + one lax.cond) per
iteration — an upper bound on what fusing node+leaf handling into one
iteration could recover.

Usage: python -u benchmarks/probe_pop_budget.py [--size 512]
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

    out = {"probe": "pop_budget", "size": a.size}
    ref = None
    for tag, kw in (("base", {}),
                    ("push", {"shadow_push": 1}),
                    ("code", {"shadow_code": 1}),
                    ("iters", {"shadow_iters": 1})):
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
    b = out["base_s_per_step"]
    for tag in ("push", "code", "iters"):
        out[tag + "_share"] = round(out[tag + "_s_per_step"] / b - 1.0, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

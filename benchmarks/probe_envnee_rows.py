"""Env NEE on the oversized sky: streamed r=8 vs RESIDENT r=4.

The deferred-NEE record planes (2*6*spp*max_depth*r rows, ~3.5MB at
spp8/depth8/r8) push the 100k-tri scene 112KB past the 16MB scoped VMEM
limit, so dispatch streams the triangle rows — and the streamed+NEE
step measured 0.65 Mrays/s in the round-5 suite, BELOW the ~0.9
wavefront fallback the fused path replaced. block_rows is an execution
knob (bitwise-invariant): halving it halves every record block, which
frees ~1.8MB and lets the scene stay VMEM-resident.

Usage: python -u benchmarks/probe_envnee_rows.py [--size 512]
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
    p.add_argument("--all-legs", action="store_true")
    a = p.parse_args()

    import jax
    import numpy as np
    import jax.numpy as jnp

    from sfvp_tpu import RenderConfig, init_state, upload
    from sfvp_tpu.config import CameraConfig
    from sfvp_tpu.kernels.megakernel_bvh import make_bvh_regen_render_step
    from sfvp_tpu.scene.procedural import sphere_mesh
    from sfvp_tpu.scene.textures import TextureTable
    from sfvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # exact bench_env_big_nee_100k scene/config
    h_, w_ = 1024, 2048
    sky = np.tile(np.linspace(0.05, 0.4, h_, dtype=np.float32)[:, None],
                  (1, w_))
    sky[180:196, 1400:1416] = 200.0
    flat = sky.reshape(-1)
    big = TextureTable(
        tr=jnp.asarray(flat), tg=jnp.asarray(flat * 0.9 + 0.02),
        tb=jnp.asarray(flat * 0.7 + 0.05),
        off=jnp.zeros((1,), np.int32),
        width=jnp.full((1,), w_, np.int32),
        height=jnp.full((1,), h_, np.int32),
    )
    buffers = upload(sphere_mesh(n_lat=224, n_lon=224, bump=0.3))._replace(
        env=big)
    cam = CameraConfig.look_at(origin=(0.0, 2.2, 5.0),
                               target=(0.0, 0.0, 0.0), fov_y_deg=50.0)
    cfg = RenderConfig(width=a.size, height=a.size, spp_per_step=8,
                       max_depth=8, sampling="cosine", camera=cam,
                       sky_emission=(0.8, 0.85, 1.0), backend="pallas",
                       use_nee=True, use_mis=True, use_rr=True)

    out = {"probe": "envnee_rows", "size": a.size}
    ref = None
    # r=4 blocks violate the (8, 128) sublane tiling (remote compile
    # exit 1, recorded in this probe's first run) — the shipping fix
    # keeps r=8 RESIDENT and raises Mosaic's scoped-VMEM cap instead
    legs = [("resident_r8_lim",
             {"block_rows": 8, "vmem_limit_bytes": 28 * 2**20})]
    if a.all_legs:
        # streamed r8 = the pre-fix route (0.65 in BENCH_SUITE r5-pre)
        legs += [("stream_r8", {"stream_tris": True, "block_rows": 8})]
    for tag, kw in legs:
        try:
            step = jax.jit(make_bvh_regen_render_step(
                cfg, buffers, smem_leaf=True, **kw))
            st = step(init_state(cfg.height, cfg.width))
            jax.block_until_ready(st.accum)
        except Exception as e:
            out[tag + "_error"] = f"{type(e).__name__}: {str(e)[:200]}"
            print(tag, "ERROR", out[tag + "_error"], flush=True)
            continue
        img = np.asarray(st.accum)
        if ref is None:
            ref = img
        else:
            out[tag + "_bitwise"] = bool(np.array_equal(ref, img))
        m0 = float(st.mrays)
        t0 = time.perf_counter()
        for _ in range(a.reps):
            st = step(st)
        jax.block_until_ready(st.accum)
        dt = time.perf_counter() - t0
        out[tag] = round((float(st.mrays) - m0) / dt, 3)
        print(tag, out[tag], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

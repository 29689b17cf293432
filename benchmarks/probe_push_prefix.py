"""A/B probe: prefix-push (unconditional sorted-child stack writes +
popcount) vs the conditional per-child push chain.

The round-4 budget left ~85% of the node-pop cost in "push/pop logic,
code loads, while_loop overhead". The push epilogue was 8 scf.if
branches plus an 8-deep serial sp add chain; since non-pushed children
sort to the END (their keys are exactly -inf), the pushes are a prefix
and all 8 writes can go to sp+ci unconditionally (dead writes above the
new top are never read). This probe times the shipping tree on the GI /
streamed / instanced bench configs; bitwise identity is pinned by the
step-1 sha (compare across git revisions).

Usage: python -u benchmarks/probe_push_prefix.py [--size 512] [--tag X]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _run(cfg, buffers, reps=3):
    import jax
    import numpy as np

    from sfvp_tpu import init_state
    from sfvp_tpu.dispatch import select_render_step

    step = jax.jit(select_render_step(cfg, buffers))
    st = step(init_state(cfg.height, cfg.width))
    jax.block_until_ready(st.accum)
    digest = hashlib.sha256(np.asarray(st.accum).tobytes()).hexdigest()[:16]
    m0 = float(st.mrays)
    t0 = time.perf_counter()
    for _ in range(reps):
        st = step(st)
    jax.block_until_ready(st.accum)
    dt = time.perf_counter() - t0
    return (float(st.mrays) - m0) / dt, dt / reps, digest


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--tag", default="tree")
    p.add_argument("--workloads", default="gi,streamed")
    a = p.parse_args()

    from sfvp_tpu import RenderConfig, upload
    from sfvp_tpu.config import CameraConfig
    from sfvp_tpu.scene.procedural import sphere_mesh
    from sfvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cam = CameraConfig.look_at(origin=(0.0, 2.2, 5.0), target=(0.0, 0.0, 0.0),
                               fov_y_deg=50.0)
    out = {"probe": "push_prefix", "tag": a.tag, "size": a.size}
    for wl in a.workloads.split(","):
        if wl == "gi":
            buffers = upload(sphere_mesh(n_lat=224, n_lon=224, bump=0.3))
            cfg = RenderConfig(width=a.size, height=a.size, spp_per_step=8,
                               max_depth=8, sampling="cosine", camera=cam,
                               sky_emission=(0.8, 0.85, 1.0),
                               backend="pallas", use_nee=True, use_rr=True)
        elif wl == "streamed":
            buffers = upload(sphere_mesh(n_lat=500, n_lon=500, bump=0.3))
            cfg = RenderConfig(width=a.size, height=a.size, spp_per_step=8,
                               max_depth=8, sampling="cosine", camera=cam,
                               sky_emission=(0.8, 0.85, 1.0),
                               backend="pallas", stream_tris=True)
        else:
            raise SystemExit(f"unknown workload {wl}")
        mrays, s_step, sha = _run(cfg, buffers)
        out[wl] = {"mrays_per_s": round(mrays, 3),
                   "s_per_step": round(s_step, 4), "step1_sha": sha}
    print(json.dumps(out))


if __name__ == "__main__":
    main()

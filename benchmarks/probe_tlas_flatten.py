"""Probe: the instanced bench scene FLATTENED through the single-level
fused kernel (220k world-space tris, streamed rows) vs the two-level
TLAS kernel. The host pop simulator says the flattened tree pops the
SAME (2.5 vs 2.76 pops/ray on the bounce wave, probe_tlas_pops.py), so
any throughput gap is pure per-iteration structure cost — and a big gap
makes flatten-when-it-fits a legitimate dispatch route (instancing is a
memory feature; PBRT flattens small scenes for exactly this reason).

Usage: python -u benchmarks/probe_tlas_flatten.py [--size 512]
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
    p.add_argument("--reps", type=int, default=3)
    a = p.parse_args()

    import jax
    import numpy as np

    from sfvp_tpu import init_state
    from sfvp_tpu.accel.instances import flatten_instances
    from sfvp_tpu.config import CameraConfig, RenderConfig
    from sfvp_tpu.dispatch import select_render_step
    from sfvp_tpu.scene import upload
    from sfvp_tpu.scene.procedural import instanced_field
    from sfvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = RenderConfig(
        width=a.size, height=a.size, spp_per_step=8, max_depth=8,
        sampling="cosine", sky_emission=(0.8, 0.85, 1.0),
        backend="pallas",
        camera=CameraConfig.look_at(origin=(10.5, 7.5, 10.5),
                                    target=(0, 0.6, 0), fov_y_deg=50),
    )
    insts = instanced_field(n_tris=220_000, n_inst=49)
    flat = upload(flatten_instances(insts))
    step = jax.jit(select_render_step(cfg, flat))

    t0 = time.perf_counter()
    st = step(init_state(cfg.height, cfg.width))
    jax.block_until_ready(st.accum)
    compile_s = time.perf_counter() - t0
    digest = hashlib.sha256(np.asarray(st.accum).tobytes()).hexdigest()[:16]

    m0 = float(st.mrays)
    t0 = time.perf_counter()
    for _ in range(a.reps):
        st = step(st)
    jax.block_until_ready(st.accum)
    dt = time.perf_counter() - t0
    mrays = (float(st.mrays) - m0) / dt
    print(json.dumps({
        "probe": "tlas_flatten", "size": a.size, "tris": flat.num_tris,
        "mrays_per_s": round(mrays, 3),
        "s_per_step": round(dt / a.reps, 4),
        "step1_sha": digest, "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()

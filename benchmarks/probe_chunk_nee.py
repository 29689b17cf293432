"""Probe (round-4 VERDICT item 4): fused BVH regen kernel vs sorted
wavefront loop for NEE configs with folded sample waves (spp_chunk > 1).

The round-3 dispatch preference (`prefer_wavefront` on use_nee and
spp_chunk > 1, dispatch.py) was measured BEFORE the SMEM node tables
landed (0.20 wavefront vs 0.28 fused s/step on the 100k MIS bench at
512^2 chunk=8). This re-measures both paths at:

  --workload mis100k : 100k-tri sphere, 512^2 x 8spp x depth 8,
                       NEE + MIS + RR, cosine, spp_chunk=8
                       (the original preference's exact config)
  --workload city    : bench_city_sorted's config — 2048^2 x 4spp,
                       city (mirror windows, ~1134 emissive tris),
                       NEE + RR, spp_chunk=4

Forcing: fused = make_bvh_regen_render_step directly; wavefront =
make_render_step + packet_trace_kwargs (exactly what dispatch builds on
each side of the gate). Image equivalence between the two is separately
pinned (tests/test_bvh_regen.py); spp_chunk only permutes the f32
summation order (test_spp_chunk_invariance), so re-gating is image-safe.

One JSON line. Usage: python -u benchmarks/probe_chunk_nee.py --workload mis100k
"""

from __future__ import annotations

import argparse
import json
import time


def _measure(step_fn, cfg, steps, warmup):
    import jax

    from sfvp_tpu import init_state

    step = jax.jit(step_fn, donate_argnums=(0,))
    state = init_state(cfg.height, cfg.width)
    for _ in range(warmup):
        state = step(state)
        jax.block_until_ready(state.accum)
    m0 = float(state.mrays)
    t0 = time.perf_counter()
    for _ in range(steps):
        state = step(state)
    jax.block_until_ready(state.accum)
    dt = time.perf_counter() - t0
    return dt / steps, (float(state.mrays) - m0) / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workload", choices=("mis100k", "city"),
                   default="mis100k")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--side", choices=("both", "fused", "wavefront"),
                   default="both")
    a = p.parse_args()

    from sfvp_tpu import RenderConfig, upload
    from sfvp_tpu.accel.wide import build_wide_from_buffers
    from sfvp_tpu.config import CameraConfig
    from sfvp_tpu.dispatch import packet_trace_kwargs
    from sfvp_tpu.integrate.wavefront import make_render_step
    from sfvp_tpu.kernels.megakernel_bvh import make_bvh_regen_render_step
    from sfvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if a.workload == "mis100k":
        from sfvp_tpu.scene.procedural import sphere_mesh

        scene = sphere_mesh(n_lat=224, n_lon=224, bump=0.3)
        cam = CameraConfig.look_at(origin=(0.0, 2.2, 5.0), target=(0, 0, 0),
                                   fov_y_deg=50)
        cfg = RenderConfig(width=512, height=512, spp_per_step=8, max_depth=8,
                           camera=cam, sampling="cosine",
                           sky_emission=(0.8, 0.85, 1.0), use_nee=True,
                           use_mis=True, use_rr=True, spp_chunk=8)
    else:
        from sfvp_tpu.scene.procedural import city_mesh

        scene = city_mesh(n_buildings=96, subdiv=9, glossy_ground=True)
        cam = CameraConfig.look_at(origin=(13.0, 9.0, 13.0),
                                   target=(0.0, 0.8, 0.0), fov_y_deg=55.0)
        cfg = RenderConfig(width=2048, height=2048, spp_per_step=4,
                           max_depth=8, camera=cam, sampling="cosine",
                           sky_emission=(0.8, 0.85, 1.0), use_nee=True,
                           use_rr=True, spp_chunk=4)

    buffers = upload(scene)
    wide = build_wide_from_buffers(buffers)
    res = {"workload": a.workload, "tris": int(buffers.num_tris),
           "nodes": int(wide.nodes.shape[0]), "spp_chunk": cfg.spp_chunk,
           "size": cfg.width}

    if a.side in ("both", "fused"):
        fused = make_bvh_regen_render_step(
            cfg, buffers, wide=wide, block_rows=cfg.packet_block_rows,
            stream_tris=False)
        s, m = _measure(fused, cfg, a.steps, a.warmup)
        res["fused_s_per_step"] = round(s, 4)
        res["fused_mrays"] = round(m, 2)
        print(json.dumps(res), flush=True)
    if a.side in ("both", "wavefront"):
        wf = make_render_step(cfg, buffers,
                              **packet_trace_kwargs(cfg, wide, stream=False))
        s, m = _measure(wf, cfg, a.steps, a.warmup)
        res["wavefront_s_per_step"] = round(s, 4)
        res["wavefront_mrays"] = round(m, 2)
    if "fused_s_per_step" in res and "wavefront_s_per_step" in res:
        res["fused_speedup"] = round(
            res["wavefront_s_per_step"] / res["fused_s_per_step"], 3)
    print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

"""Probe: per-child stack codes from SMEM scalar loads vs VMEM lane
extracts (kernels/bvh_packet.py smem_codes flag).

Motivation (sim_packets.py --ser round-3 numbers): traversal is bound by
the serial scalar chain per pop, not vector width. The SMEM codes table
removes 16 of 64 lane extracts AND takes the push-code computation off
the VMEM row-load dependency (codes depend only on the popped index).

Measures the packet-trace kernel on primary + bounce waves and the fused
GI megakernel step, smem_codes on vs off. One JSON line.

Usage: python -u benchmarks/probe_smem_codes.py [--tris 100000]
"""

from __future__ import annotations

import argparse
import json
import time


def timeit(fn, *args, reps=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tris", type=int, default=100_000)
    p.add_argument("--size", type=int, default=512)
    a = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from sfvp_tpu import RenderConfig, init_state, upload
    from sfvp_tpu.accel.wide import build_wide_from_buffers
    from sfvp_tpu.camera import generate_rays_soa
    from sfvp_tpu.config import CameraConfig
    from sfvp_tpu.kernels.bvh_packet import make_packet_trace
    from sfvp_tpu.kernels.megakernel_bvh import make_bvh_regen_render_step
    from sfvp_tpu.sampling import sample_direction_cosine_soa
    from sfvp_tpu.scene.procedural import sphere_mesh
    from sfvp_tpu.utils import vec
    from sfvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    n = max(32, int(np.sqrt(a.tris / 2)))
    scene = sphere_mesh(n_lat=n, n_lon=n, bump=0.3)
    buffers = upload(scene)
    wide = build_wide_from_buffers(buffers)
    cam = CameraConfig.look_at(origin=(0, 0, 4), target=(0, 0, 0),
                               fov_y_deg=50)
    cfg = RenderConfig(width=a.size, height=a.size, spp_per_step=4,
                       max_depth=4, camera=cam, sampling="cosine")
    m = a.size * a.size * cfg.spp_per_step

    @jax.jit
    def waves(key, trace_t):
        idx = jnp.arange(m, dtype=jnp.int32)
        pix = idx // cfg.spp_per_step
        px = (pix % a.size).astype(jnp.float32)
        py = (pix // a.size).astype(jnp.float32)
        r1 = jax.random.uniform(key, (m,))
        r2 = jax.random.uniform(jax.random.fold_in(key, 1), (m,))
        return generate_rays_soa(px, py, r1, r2, cfg.camera, a.size, a.size)

    results = {"tris": int(scene.num_triangles), "rays_m": m,
               "codes_kb": round(wide.codes.nbytes / 1024, 1)}
    key = jax.random.PRNGKey(0)
    o, d = jax.jit(lambda k: waves(k, None))(key)

    for smem in (False, True):
        trace = make_packet_trace(wide, t_min=cfg.t_min, smem_codes=smem)
        tfun = jax.jit(lambda o, d: trace(o, d, cfg.t_max).t)
        dt = timeit(tfun, o, d)
        results[f"trace_primary_mrays_smem{int(smem)}"] = round(
            m / dt / 1e6, 1)
        # bounce wave from the primary hits
        pay = jax.jit(lambda o, d: trace(o, d, cfg.t_max))(o, d)
        w = 1.0 - pay.u - pay.v
        pos = vec.add(vec.add(vec.scale(pay.p0, w), vec.scale(pay.p1, pay.u)),
                      vec.scale(pay.p2, pay.v))
        nrm = vec.cross(vec.sub(pay.p1, pay.p0), vec.sub(pay.p2, pay.p0))
        inv = jax.lax.rsqrt(jnp.maximum(vec.dot(nrm, nrm), 1e-30))
        normal = vec.scale(nrm, -inv)
        r3 = jax.random.uniform(jax.random.fold_in(key, 2), (m,))
        r4 = jax.random.uniform(jax.random.fold_in(key, 3), (m,))
        bd = sample_direction_cosine_soa(r3, r4, normal)
        live = jnp.logical_not(jnp.isinf(pay.t))
        tfun2 = jax.jit(lambda o, d, act: trace(o, d, cfg.t_max, active=act).t)
        dt = timeit(tfun2, pos, bd, live)
        results[f"trace_bounce_mrays_smem{int(smem)}"] = round(
            m / dt / 1e6, 1)
        # fused GI step
        step = jax.jit(
            make_bvh_regen_render_step(cfg, buffers, wide=wide,
                                       smem_codes=smem),
        )
        st = init_state(a.size, a.size)
        st = step(st)
        jax.block_until_ready(st.accum)
        t0 = time.perf_counter()
        st = step(st)
        jax.block_until_ready(st.accum)
        dt = time.perf_counter() - t0
        results[f"gi_step_s_smem{int(smem)}"] = round(dt, 3)
        results[f"gi_mrays_smem{int(smem)}"] = round(
            float(st.mrays) / 2 / dt, 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

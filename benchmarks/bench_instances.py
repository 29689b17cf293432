"""Packet-level TLAS benchmark (VERDICT r1 #6): N instances of a shared
mesh, in-kernel two-level traversal vs the round-1 host-unrolled path.

    python -u benchmarks/bench_instances.py --instances 1000 --unrolled-at 20
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--instances", type=int, default=1000)
    p.add_argument("--unrolled-at", type=int, default=20,
                   help="instance count for the unrolled baseline (its "
                        "cost is linear in N; compiling 1000 unrolled "
                        "traversals is infeasible, which is the point)")
    p.add_argument("--size", type=int, default=512)
    a = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from sfvp_tpu.accel.instances import Instance, make_instanced_trace
    from sfvp_tpu.accel.tlas import build_two_level
    from sfvp_tpu.camera import generate_rays_soa
    from sfvp_tpu.config import CameraConfig
    from sfvp_tpu.kernels.bvh_tlas import make_two_level_trace
    from sfvp_tpu.scene.procedural import sphere_mesh
    from sfvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    mesh = sphere_mesh(n_lat=16, n_lon=16, bump=0.2)  # ~480 tris, shared

    def grid_instances(n):
        g = np.random.default_rng(0)
        side = int(np.ceil(n ** (1 / 3)))
        out = []
        for i in range(n):
            x = (i % side - side / 2) * 2.5
            y = ((i // side) % side - side / 2) * 2.5
            z = (i // side**2 - side / 2) * 2.5
            s = float(g.uniform(0.5, 1.0))
            m = np.hstack([np.eye(3, dtype=np.float32) * s,
                           np.array([[x], [y], [z]], np.float32)])
            out.append(Instance(scene=mesh, transform=m))
        return out

    side = int(np.ceil(a.instances ** (1 / 3)))
    cam = CameraConfig.look_at(
        origin=(0, 0, side * 2.5 * 1.6), target=(0, 0, 0), fov_y_deg=55)
    m_rays = a.size * a.size

    @jax.jit
    def rays(key):
        idx = jnp.arange(m_rays, dtype=jnp.int32)
        px = (idx % a.size).astype(jnp.float32)
        py = (idx // a.size).astype(jnp.float32)
        r1 = jax.random.uniform(key, (m_rays,))
        r2 = jax.random.uniform(jax.random.fold_in(key, 1), (m_rays,))
        return generate_rays_soa(px, py, r1, r2, cam, a.size, a.size)

    o, d = rays(jax.random.PRNGKey(0))
    jax.block_until_ready(o[0])

    def timeit(f, *args, reps=3):
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    res = {"mesh_tris": mesh.num_triangles, "rays": m_rays}

    instances = grid_instances(a.instances)
    t0 = time.perf_counter()
    tl = build_two_level(instances)
    res["tlas_build_s"] = round(time.perf_counter() - t0, 2)
    trace = make_two_level_trace(tl, t_min=1e-3)
    f_tl = jax.jit(lambda o, d: trace(o, d, 1e4).t)
    dt = timeit(f_tl, o, d)
    res[f"tlas_n{a.instances}_mrays"] = round(m_rays / dt / 1e6, 2)
    print(json.dumps(res), flush=True)

    n_u = a.unrolled_at
    inst_u = grid_instances(n_u)
    tl_u = build_two_level(inst_u)
    trace_u = make_two_level_trace(tl_u, t_min=1e-3)
    f_tlu = jax.jit(lambda o, d: trace_u(o, d, 1e4).t)
    dt_tl_u = timeit(f_tlu, o, d)
    res[f"tlas_n{n_u}_mrays"] = round(m_rays / dt_tl_u / 1e6, 2)
    print(json.dumps(res), flush=True)

    try:
        # the unrolled baseline runs on a 65536-ray subset: its Mrays/s is
        # ray-count independent, and the full 262k-ray unrolled HLO has
        # intermittently faulted the remote compiler (opaque UNAVAILABLE)
        n_sub = min(65536, m_rays)
        o_s = tuple(c[:n_sub] for c in o)
        d_s = tuple(c[:n_sub] for c in d)
        unrolled = make_instanced_trace(inst_u, leaf_size=8)
        f_un = jax.jit(lambda o, d: unrolled(o, d, None, 1e-3, 1e4).t)
        dt_un = timeit(f_un, o_s, d_s, reps=1)
        res[f"unrolled_n{n_u}_mrays"] = round(n_sub / dt_un / 1e6, 2)
        speed = (dt_un / n_sub) / (dt_tl_u / m_rays)
        res[f"speedup_at_n{n_u}"] = round(speed, 1)
        # the unrolled path is linear in N; project its N=target cost
        res[f"projected_speedup_n{a.instances}"] = round(
            (dt_un / n_sub * a.instances / n_u) / (dt / m_rays), 1)
    except Exception as e:  # noqa: BLE001
        res["unrolled_error"] = str(e)[:120]
    print(json.dumps(res))


if __name__ == "__main__":
    main()

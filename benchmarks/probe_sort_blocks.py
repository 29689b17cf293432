"""Probe: (a) per-bounce sort strategies, (b) v1 packet block_rows scan on
coherent vs incoherent waves. One JSON line per measurement.

Usage: python -u benchmarks/probe_sort_blocks.py --size 512
"""

from __future__ import annotations

import argparse
import json
import time


def timeit(fn, *args, reps=5):
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
    p.add_argument("--spp", type=int, default=4)
    p.add_argument("--rows", default="2,4,8,16")
    a = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from sfvp_tpu import RenderConfig, upload
    from sfvp_tpu.accel.wide import build_wide_from_buffers
    from sfvp_tpu.camera import generate_rays_soa
    from sfvp_tpu.config import CameraConfig
    from sfvp_tpu.kernels.bvh_packet import make_packet_trace
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
    cfg = RenderConfig(width=a.size, height=a.size, spp_per_step=a.spp,
                       max_depth=4, camera=cam, sampling="cosine")
    base_trace = make_packet_trace(wide, t_min=cfg.t_min, block_rows=8)
    m = a.size * a.size * a.spp

    @jax.jit
    def make_waves(key):
        idx = jnp.arange(m, dtype=jnp.int32)
        ts = cfg.packet_tile_size
        tpw = a.size // ts
        pix = idx // a.spp
        tile = pix // (ts * ts)
        within = pix % (ts * ts)
        px = (tile % tpw) * ts + within % ts
        py = (tile // tpw) * ts + within // ts
        r1 = jax.random.uniform(key, (m,))
        r2 = jax.random.uniform(jax.random.fold_in(key, 1), (m,))
        o, d = generate_rays_soa(px.astype(jnp.float32),
                                 py.astype(jnp.float32), r1, r2,
                                 cfg.camera, a.size, a.size)
        pay = base_trace(o, d, cfg.t_max)
        miss = jnp.isinf(pay.t)
        w = 1.0 - pay.u - pay.v
        position = vec.add(
            vec.add(vec.scale(pay.p0, w), vec.scale(pay.p1, pay.u)),
            vec.scale(pay.p2, pay.v))
        nrm = vec.cross(vec.sub(pay.p1, pay.p0), vec.sub(pay.p2, pay.p0))
        inv = jax.lax.rsqrt(jnp.maximum(vec.dot(nrm, nrm), 1e-30))
        normal = vec.scale(nrm, -inv)
        r3 = jax.random.uniform(jax.random.fold_in(key, 2), (m,))
        r4 = jax.random.uniform(jax.random.fold_in(key, 3), (m,))
        nd = sample_direction_cosine_soa(r3, r4, normal)
        return o, d, position, nd, jnp.logical_not(miss)

    lo = np.asarray([-2.0, -2.0, -2.0], np.float32)
    inv_extent = np.asarray([0.25, 0.25, 0.25], np.float32)

    def sortkey(o, d, live):
        def q7(c, k):
            x = jnp.clip((c - lo[k]) * inv_extent[k], 0.0, 1.0)
            return (x * 127.0).astype(jnp.int32)

        def expand7(v):
            v = (v | (v << 8)) & 0x100F00F
            v = (v | (v << 4)) & 0x10C30C3
            v = (v | (v << 2)) & 0x1249249
            return v

        morton = ((expand7(q7(o[0], 0)) << 2) | (expand7(q7(o[1], 1)) << 1)
                  | expand7(q7(o[2], 2)))
        octant = ((d[0] >= 0).astype(jnp.int32) * 4
                  + (d[1] >= 0).astype(jnp.int32) * 2
                  + (d[2] >= 0).astype(jnp.int32))
        return jnp.where(live, (octant << 21) | morton, jnp.int32(2**30))

    key = jax.random.PRNGKey(0)
    o, d, bo, bd, live = make_waves(key)
    jax.block_until_ready(live)
    ones = jnp.ones((m,), bool)

    # ---- sort strategies on the full 17-array integrator carry -----------
    carry = (bo[0], bo[1], bo[2], bd[0], bd[1], bd[2],
             bo[0] * 0 + 1, bo[1] * 0 + 1, bo[2] * 0 + 1,  # weight
             bo[0] * 0, bo[1] * 0, bo[2] * 0,              # color
             live.astype(jnp.uint32),                       # seed stand-in
             live.astype(jnp.int32), live.astype(jnp.int32),
             bo[0] * 0, jnp.arange(m, dtype=jnp.int32))

    @jax.jit
    def sort17(*arrs):
        k = sortkey(arrs[0:3], arrs[3:6], arrs[13] > 0)
        out = jax.lax.sort((k,) + arrs, num_keys=1)
        return out[1:]

    @jax.jit
    def sort2_gather(*arrs):
        k = sortkey(arrs[0:3], arrs[3:6], arrs[13] > 0)
        idx = jnp.arange(m, dtype=jnp.int32)
        _, perm = jax.lax.sort((k, idx), num_keys=1)
        return tuple(x[perm] for x in arrs)

    @jax.jit
    def argsort_gather(*arrs):
        k = sortkey(arrs[0:3], arrs[3:6], arrs[13] > 0)
        perm = jnp.argsort(k)
        return tuple(x[perm] for x in arrs)

    r1 = sort17(*carry)
    r2 = sort2_gather(*carry)
    same = all(bool(jnp.all(x == y)) for x, y in zip(r1, r2))
    print(json.dumps({
        "sort17_ms": round(timeit(sort17, *carry) * 1e3, 2),
        "sort2_gather_ms": round(timeit(sort2_gather, *carry) * 1e3, 2),
        "argsort_gather_ms": round(timeit(argsort_gather, *carry) * 1e3, 2),
        "same_result": same,
    }), flush=True)

    # ---- block_rows scan ---------------------------------------------------
    srt = sort2_gather(*carry)
    so, sd, slive = srt[0:3], srt[3:6], srt[13] > 0
    for rows in [int(x) for x in a.rows.split(",")]:
        tr = make_packet_trace(wide, t_min=cfg.t_min, block_rows=rows)
        f = jax.jit(lambda o, d, act, tr=tr: tr(o, d, cfg.t_max, active=act).t)
        rec = {
            "block_rows": rows,
            "primary_mrays": round(m / timeit(f, o, d, ones) / 1e6, 1),
            "bounce_sorted_mrays": round(m / timeit(f, so, sd, slive) / 1e6, 1),
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

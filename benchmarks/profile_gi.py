"""Phase-level profile of the big-scene GI step: where does the time go?

Times, on the real chip, for a 100k-tri scene at 1024x1024/4spp:
  - packet trace on coherent primary rays
  - packet trace on incoherent bounce-1 rays, unsorted vs sorted
  - the per-bounce 17-array lax.sort the wavefront loop pays today
  - the cheaper (key, idx) sort + gather permute alternative

One JSON line per phase. Usage: python -u benchmarks/profile_gi.py
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
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--spp", type=int, default=4)
    p.add_argument("--block-rows", type=int, default=8)
    p.add_argument("--dump", default=None,
                   help="save sorted bounce wave + wide BVH to this .npz (for host traversal simulation)")
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
    cam = CameraConfig.look_at(origin=(0, 0, 4), target=(0, 0, 0), fov_y_deg=50)
    cfg = RenderConfig(width=a.size, height=a.size, spp_per_step=a.spp,
                       max_depth=4, camera=cam, sampling="cosine")
    trace = make_packet_trace(wide, t_min=cfg.t_min,
                              block_rows=a.block_rows)

    m = a.size * a.size * a.spp

    @jax.jit
    def make_waves(key):
        # primary rays (tile-swizzled like the integrator) and a realistic
        # bounce-1 wave: cosine directions from the primary hit points
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
        pay = trace(o, d, cfg.t_max)
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

    key = jax.random.PRNGKey(0)
    o, d, bo, bd, live = make_waves(key)
    jax.block_until_ready(live)
    frac_live = float(jnp.mean(live.astype(jnp.float32)))

    results = {"tris": int(scene.num_triangles), "rays_m": m,
               "block_rows": a.block_rows, "live_frac": round(frac_live, 3)}

    trace_t = jax.jit(lambda o, d, act: trace(o, d, cfg.t_max, active=act).t)
    ones = jnp.ones((m,), bool)
    results["trace_primary_mrays"] = round(
        m / timeit(trace_t, o, d, ones) / 1e6, 1)
    results["trace_bounce_unsorted_mrays"] = round(
        m / timeit(trace_t, bo, bd, live) / 1e6, 1)

    # sort the bounce wave by the integrator's (octant, morton) key
    lo = np.asarray([-2.0, -2.0, -2.0], np.float32)
    inv_extent = np.asarray([0.25, 0.25, 0.25], np.float32)

    @jax.jit
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
        key = (octant << 21) | morton
        return jnp.where(live, key, jnp.int32(2**30))

    k = sortkey(bo, bd, live)

    @jax.jit
    def sort17(k, bo, bd, live):
        arrs = (k, bo[0], bo[1], bo[2], bd[0], bd[1], bd[2],
                live.astype(jnp.int32)) + tuple(
                    bo[0] + float(i) for i in range(9))
        return jax.lax.sort(arrs, num_keys=1)

    @jax.jit
    def sort2_gather(k, bo, bd, live):
        idx = jnp.arange(m, dtype=jnp.int32)
        _, perm = jax.lax.sort((k, idx), num_keys=1)
        out = tuple(x[perm] for x in
                    (bo[0], bo[1], bo[2], bd[0], bd[1], bd[2]))
        return out + (live[perm],)

    results["sort17_ms"] = round(timeit(sort17, k, bo, bd, live) * 1e3, 1)
    results["sort2_gather7_ms"] = round(
        timeit(sort2_gather, k, bo, bd, live) * 1e3, 1)

    srt = jax.jit(sort2_gather)(k, bo, bd, live)
    so = srt[0:3]
    sd = srt[3:6]
    slive = srt[6]
    jax.block_until_ready(slive)
    results["trace_bounce_sorted_mrays"] = round(
        m / timeit(trace_t, so, sd, slive) / 1e6, 1)

    if a.dump:
        np.savez_compressed(
            a.dump,
            nodes=wide.nodes, tris_rows=wide.tris, max_stack=wide.max_stack,
            ox=np.asarray(so[0]), oy=np.asarray(so[1]), oz=np.asarray(so[2]),
            dx=np.asarray(sd[0]), dy=np.asarray(sd[1]), dz=np.asarray(sd[2]),
            live=np.asarray(slive),
            pox=np.asarray(o[0]), poy=np.asarray(o[1]), poz=np.asarray(o[2]),
            pdx=np.asarray(d[0]), pdy=np.asarray(d[1]), pdz=np.asarray(d[2]),
        )

    print(json.dumps(results))


if __name__ == "__main__":
    main()

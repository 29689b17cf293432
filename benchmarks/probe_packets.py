"""Probe: packet-kernel variants on a realistic incoherent bounce wave.

Compares, on the 100k-tri sphere at --size^2 x --spp rays:
  - v1 (kernels/bvh_packet.py) block_rows=8
  - v2 (kernels/bvh_packet2.py) n_packets in {1,2,4}, VMEM-resident
  - v2 streamed (HBM tris + DMA ring), n_packets in {1,2}

on three waves: coherent primaries, sorted bounce-1, unsorted bounce-1.
One JSON line per variant as results arrive (partial output survives a
timeout). Usage: python -u benchmarks/probe_packets.py
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
    p.add_argument("--spp", type=int, default=4)
    p.add_argument("--variants", default="v1,v2p1,v2p2,v2p4,v2p1s,v2p2s")
    a = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from sfvp_tpu import RenderConfig, upload
    from sfvp_tpu.accel.wide import build_wide_from_buffers
    from sfvp_tpu.camera import generate_rays_soa
    from sfvp_tpu.config import CameraConfig
    from sfvp_tpu.kernels.bvh_packet import make_packet_trace
    from sfvp_tpu.kernels.bvh_packet2 import make_packet_trace2
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

    @jax.jit
    def sort_wave(o, d, live):
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
        key = jnp.where(live, (octant << 21) | morton, jnp.int32(2**30))
        idx = jnp.arange(m, dtype=jnp.int32)
        _, perm = jax.lax.sort((key, idx), num_keys=1)
        out = tuple(x[perm] for x in (o[0], o[1], o[2], d[0], d[1], d[2]))
        return out[:3], out[3:], live[perm]

    key = jax.random.PRNGKey(0)
    o, d, bo, bd, live = make_waves(key)
    jax.block_until_ready(live)
    so, sd, slive = sort_wave(bo, bd, live)
    jax.block_until_ready(slive)
    ones = jnp.ones((m,), bool)

    def build(name):
        if name == "v1":
            return base_trace
        P = int(name[3])
        stream = name.endswith("s")
        return make_packet_trace2(wide, t_min=cfg.t_min, n_packets=P,
                                  stream_tris=stream)

    for name in a.variants.split(","):
        tr = build(name)
        f = jax.jit(lambda o, d, act, tr=tr: tr(o, d, cfg.t_max, active=act).t)
        try:
            t0 = time.perf_counter()
            rec = {
                "variant": name,
                "primary_mrays": round(m / timeit(f, o, d, ones) / 1e6, 1),
            }
            rec["compile_s"] = round(time.perf_counter() - t0, 1)
            rec["bounce_sorted_mrays"] = round(
                m / timeit(f, so, sd, slive) / 1e6, 1)
            rec["bounce_unsorted_mrays"] = round(
                m / timeit(f, bo, bd, live) / 1e6, 1)
            # cross-check against v1 results on the sorted wave
            if name != "v1":
                ref = jax.jit(lambda o, d, act: base_trace(
                    o, d, cfg.t_max, active=act).t)(so, sd, slive)
                got = f(so, sd, slive)
                rec["matches_v1"] = bool(
                    jnp.all((ref == got) | (jnp.isinf(ref) & jnp.isinf(got))))
        except Exception as e:  # keep probing other variants
            rec = {"variant": name, "error": repr(e)[:200]}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

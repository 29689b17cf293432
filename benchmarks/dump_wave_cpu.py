"""CPU-only bounce-wave dumper for the host pop simulator (sim_packets.py).

Produces the same .npz schema as profile_gi.py --dump but WITHOUT the TPU:
primary hits come from the threaded-BVH jnp trace, bounce directions from
cosine sampling at the hit. Unlike profile_gi's dump (which saves the
globally SORTED bounce wave the wavefront loop traces), this saves the
bounce wave in PIXEL-LANE order — exactly what the FUSED regen
megakernel's blocks contain — so --ser experiments measure what an
in-kernel lane re-sort could actually change.

Usage: python benchmarks/dump_wave_cpu.py --tris 100000 --size 256 \
           --out /tmp/gi_wave_cpu.npz
"""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tris", type=int, default=100_000)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--spp", type=int, default=1)
    p.add_argument("--out", required=True)
    a = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from sfvp_tpu import RenderConfig, upload
    from sfvp_tpu.accel import build_bvh
    from sfvp_tpu.accel.wide import LEAF_TRIS, build_wide_from_buffers
    from sfvp_tpu.camera import generate_rays_soa
    from sfvp_tpu.config import CameraConfig
    from sfvp_tpu.kernels.bvh_traverse import make_trace_bvh_jnp
    from sfvp_tpu.sampling import sample_direction_cosine_soa
    from sfvp_tpu.scene.procedural import sphere_mesh
    from sfvp_tpu.utils import vec

    n = max(32, int(np.sqrt(a.tris / 2)))
    scene = sphere_mesh(n_lat=n, n_lon=n, bump=0.3)
    buffers = upload(scene)
    wide = build_wide_from_buffers(buffers)
    bvh = build_bvh(buffers, leaf_size=LEAF_TRIS)
    trace = make_trace_bvh_jnp(bvh)

    cam = CameraConfig.look_at(origin=(0, 0, 4), target=(0, 0, 0),
                               fov_y_deg=50)
    cfg = RenderConfig(width=a.size, height=a.size, spp_per_step=a.spp,
                       max_depth=4, camera=cam, sampling="cosine")
    m = a.size * a.size * a.spp

    @jax.jit
    def make_waves(key):
        # tile-swizzled primaries (the fused kernel's lane order), then a
        # bounce-1 cosine wave from the primary hit points, SAME lanes
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
        hit = trace(o, d, buffers, cfg.t_min, cfg.t_max)
        miss = hit.prim < 0
        prim = jnp.maximum(hit.prim, 0)
        p0 = (buffers.v0x[prim], buffers.v0y[prim], buffers.v0z[prim])
        p1 = (buffers.v1x[prim], buffers.v1y[prim], buffers.v1z[prim])
        p2 = (buffers.v2x[prim], buffers.v2y[prim], buffers.v2z[prim])
        w = 1.0 - hit.u - hit.v
        position = vec.add(
            vec.add(vec.scale(p0, w), vec.scale(p1, hit.u)),
            vec.scale(p2, hit.v))
        normal = vec.scale(
            vec.normalize(vec.cross(vec.sub(p1, p0), vec.sub(p2, p0))),
            np.float32(-1.0))
        r3 = jax.random.uniform(jax.random.fold_in(key, 2), (m,))
        r4 = jax.random.uniform(jax.random.fold_in(key, 3), (m,))
        nd = sample_direction_cosine_soa(r3, r4, normal)
        return o, d, position, nd, jnp.logical_not(miss)

    o, d, bo, bd, live = make_waves(jax.random.PRNGKey(0))
    jax.block_until_ready(live)

    np.savez_compressed(
        a.out,
        nodes=wide.nodes, tris_rows=wide.tris, max_stack=wide.max_stack,
        ox=np.asarray(bo[0]), oy=np.asarray(bo[1]), oz=np.asarray(bo[2]),
        dx=np.asarray(bd[0]), dy=np.asarray(bd[1]), dz=np.asarray(bd[2]),
        live=np.asarray(live),
        pox=np.asarray(o[0]), poy=np.asarray(o[1]), poz=np.asarray(o[2]),
        pdx=np.asarray(d[0]), pdy=np.asarray(d[1]), pdz=np.asarray(d[2]),
    )
    print(json.dumps({
        "tris": int(scene.num_triangles), "rays": m,
        "live_frac": round(float(np.asarray(live).mean()), 3),
        "out": a.out,
    }))


if __name__ == "__main__":
    main()

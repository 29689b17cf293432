"""Host probe for the HIERARCHICAL SMEM node table: on the big-tree bench
scenes (city 2048, streamed 500k sphere — the ones past the ~3.6k-node
full-table cap), measure what fraction of packet NODE POPS land in the
first K nodes under BFS ordering (accel.wide.reorder_bfs). That fraction
bounds the share of pops that get the SMEM fast path (1.19-1.67x per pop
measured for the full table, benchmarks/probe_smem_boxes.py); the rest pay
the VMEM row load plus one extra scalar branch.

Waves: primary rays from the bench camera, plus an INCOHERENT wave
(origins at primary hit points, cosine directions around the geometric
normal via a cheap numpy shade) — the regen megakernel's mixed-bounce
packets sit between the two.

Usage: python benchmarks/probe_smem_top.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def traverse_count(nodes, tris_rows, ox, oy, oz, dx, dy, dz, tmax, t_min,
                   width=8):
    """Packet traversal (mirror of kernels/bvh_packet.py) recording the
    BFS index of every NODE pop; returns (node_pop_indices, leaf_pops,
    bt, best_leaf_slot) — enough to derive hit normals for bounce waves."""
    inv = lambda c: np.where(np.abs(c) > 1e-30, 1.0 / c,  # noqa: E731
                             np.where(c >= 0, 1e30, -1e30)).astype(np.float32)
    ivx, ivy, ivz = inv(dx), inv(dy), inv(dz)
    bt = np.full(ox.shape, np.inf, np.float32)
    bn = np.zeros((3,) + ox.shape, np.float32)  # geometric normal at best t
    stack = [1]
    pops = []
    l_pops = 0
    W = width
    with np.errstate(all="ignore"):
        while stack:
            code = stack.pop()
            if code < 0:
                l_pops += 1
                trow = tris_rows[-code - 1]
                for k in range(8):
                    b = 16 * k
                    a0 = trow[b:b + 3]
                    e1 = trow[b + 3:b + 6] - a0
                    e2 = trow[b + 6:b + 9] - a0
                    px = dy * e2[2] - dz * e2[1]
                    py = dz * e2[0] - dx * e2[2]
                    pz = dx * e2[1] - dy * e2[0]
                    det = e1[0] * px + e1[1] * py + e1[2] * pz
                    iv = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
                    tx, ty, tz = ox - a0[0], oy - a0[1], oz - a0[2]
                    u = (tx * px + ty * py + tz * pz) * iv
                    qx = ty * e1[2] - tz * e1[1]
                    qy = tz * e1[0] - tx * e1[2]
                    qz = tx * e1[1] - ty * e1[0]
                    v = (dx * qx + dy * qy + dz * qz) * iv
                    t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * iv
                    ok = ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0)
                          & (u + v <= 1) & (t > t_min) & (t < tmax)
                          & (t < bt))
                    bt = np.where(ok, t, bt)
                    cr = np.cross(e1, e2)
                    n = -cr / max(np.linalg.norm(cr), 1e-30)
                    for a in range(3):
                        bn[a] = np.where(ok, n[a], bn[a])
                continue
            pops.append(code - 1)
            nrow = nodes[code - 1]
            limit = np.minimum(bt, tmax)
            cand = []
            for ci in range(W):
                tag = nrow[7 * W + ci]
                if tag < 0.5:
                    continue
                t0x = (nrow[0 * W + ci] - ox) * ivx
                t1x = (nrow[3 * W + ci] - ox) * ivx
                t0y = (nrow[1 * W + ci] - oy) * ivy
                t1y = (nrow[4 * W + ci] - oy) * ivy
                t0z = (nrow[2 * W + ci] - oz) * ivz
                t1z = (nrow[5 * W + ci] - oz) * ivz
                tn = np.maximum(np.maximum(np.minimum(t0x, t1x),
                                           np.minimum(t0y, t1y)),
                                np.maximum(np.minimum(t0z, t1z), t_min))
                tf = np.minimum(np.minimum(np.maximum(t0x, t1x),
                                           np.maximum(t0y, t1y)),
                                np.minimum(np.maximum(t0z, t1z), limit))
                hit = tn <= tf
                if hit.any():
                    ref = int(nrow[6 * W + ci])
                    code_c = -(ref + 1) if tag > 1.5 else ref + 1
                    cand.append((code_c, float(tn[hit].min())))
            cand.sort(key=lambda x: -x[1])
            stack.extend(c for c, _ in cand)
    return np.asarray(pops, np.int64), l_pops, bt, bn


def probe_scene(name, buffers, cam_origin, cam_target, fov, groups=16):
    from sfvp_tpu.accel.wide import build_wide_from_buffers, reorder_bfs
    from sfvp_tpu.camera import CameraConfig  # re-exported

    wide = reorder_bfs(build_wide_from_buffers(buffers))
    n_nodes = wide.nodes.shape[0]
    cam = CameraConfig.look_at(origin=cam_origin, target=cam_target,
                               fov_y_deg=fov)
    # primary rays on a coarse grid (groups x 1024 rays)
    side = 128
    ys, xs = np.mgrid[0:side, 0:side]
    ndx = ((xs + 0.5) * (2.0 / side) - 1.0).astype(np.float32).ravel()
    ndy = ((ys + 0.5) * (2.0 / side) - 1.0).astype(np.float32).ravel()
    c = np.asarray(cam.center, np.float32)
    rgt = np.asarray(cam.right, np.float32)
    up = np.asarray(cam.up, np.float32)
    o0 = np.asarray(cam.origin, np.float32)
    d = (c[None, :] + ndx[:, None] * rgt[None, :]
         + ndy[:, None] * up[None, :] - o0[None, :])
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(o0, d.shape).copy()

    rng = np.random.default_rng(7)
    out = {"scene": name, "nodes": int(n_nodes)}
    for wave in ("primary", "bounce"):
        all_pops = []
        leaf_tot = 0
        node_tot = 0
        for g in range(groups):
            sl = slice(g * 1024, (g + 1) * 1024)
            ox, oy, oz = o[sl, 0], o[sl, 1], o[sl, 2]
            dx, dy, dz = d[sl, 0], d[sl, 1], d[sl, 2]
            if wave == "bounce":
                pops0, _, bt, bn = traverse_count(
                    wide.nodes, wide.tris, ox, oy, oz, dx, dy, dz,
                    np.float32(1e4), np.float32(1e-3))
                hit = np.isfinite(bt)
                if hit.sum() < 32:
                    continue
                t = np.where(hit, bt, 1.0)
                ox, oy, oz = ox + t * dx, oy + t * dy, oz + t * dz
                # cosine sample around the (view-flipped) geometric normal
                flip = (bn[0] * dx + bn[1] * dy + bn[2] * dz) > 0
                n3 = np.where(flip[None], -bn, bn)
                r1 = rng.random(ox.shape[0]).astype(np.float32)
                r2 = rng.random(ox.shape[0]).astype(np.float32)
                sq = np.sqrt(r1)
                lz = np.sqrt(np.maximum(0.0, 1.0 - r1))
                phi = 2 * np.pi * r2
                use_x = np.abs(n3[0]) > np.abs(n3[1])
                ia = 1.0 / np.sqrt(np.maximum(n3[0]**2 + n3[2]**2, 1e-30))
                ib = 1.0 / np.sqrt(np.maximum(n3[1]**2 + n3[2]**2, 1e-30))
                tg = np.where(use_x[None],
                              np.stack([n3[2] * ia, 0 * ia, -n3[0] * ia]),
                              np.stack([0 * ib, -n3[2] * ib, n3[1] * ib]))
                bt3 = np.cross(n3.T, tg.T).T
                dx = (np.cos(phi) * sq * tg[0] + np.sin(phi) * sq * bt3[0]
                      + lz * n3[0])
                dy = (np.cos(phi) * sq * tg[1] + np.sin(phi) * sq * bt3[1]
                      + lz * n3[1])
                dz = (np.cos(phi) * sq * tg[2] + np.sin(phi) * sq * bt3[2]
                      + lz * n3[2])
                tmx = np.where(hit, np.float32(1e4), np.float32(-np.inf))
            else:
                tmx = np.full(ox.shape, 1e4, np.float32)
            pops, l_p, _, _ = traverse_count(
                wide.nodes, wide.tris, ox, oy, oz, dx, dy, dz, tmx,
                np.float32(1e-3))
            all_pops.append(pops)
            leaf_tot += l_p
            node_tot += len(pops)
        pops = np.concatenate(all_pops)
        rec = {"node_pops": int(node_tot), "leaf_pops": int(leaf_tot),
               "node_frac_of_pops": round(
                   node_tot / max(node_tot + leaf_tot, 1), 3)}
        for k in (1024, 2048, 3584, 8192):
            rec[f"pops_in_top{k}"] = round(
                float((pops < k).mean()) if len(pops) else 0.0, 3)
        out[wave] = rec
    print(json.dumps(out), flush=True)
    return out


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from sfvp_tpu import upload
    from sfvp_tpu.scene.procedural import city_mesh, sphere_mesh

    probe_scene(
        "city96_subdiv9",
        upload(city_mesh(n_buildings=96, subdiv=9, glossy_ground=True)),
        (13.0, 9.0, 13.0), (0.0, 0.8, 0.0), 55.0)
    probe_scene(
        "sphere500k",
        upload(sphere_mesh(n_lat=500, n_lon=500, bump=0.3)),
        (0.0, 2.2, 5.0), (0.0, 0.0, 0.0), 50.0)


if __name__ == "__main__":
    main()

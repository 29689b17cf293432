"""Host pop simulator for the TWO-LEVEL packet traversal (the instanced
bench is the suite's worst per-ray number): counts node/leaf/instance pops
per 1024-ray packet on primary and bounce waves, plus the rate at which the
instance CONTEXT changes between consecutive pops — every pop re-derives
the packet's rays through the popped entry's instance transform (18 vector
FMAs), so a low change rate would make a carried transform cache pay, while
a high pop count with most instances entered per packet means the cost is
structural (incoherent packets enter almost every instance).

Also traverses the FLATTENED single-level tree on the same rays for a
direct pops-per-ray comparison (what a flatten-and-stream dispatch would
trade the transforms for).

Usage: python benchmarks/probe_tlas_pops.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_IB = 1 << 27


def traverse_two_level(tl, ox, oy, oz, dx, dy, dz, tmax, t_min=1e-3):
    nodes = tl.nodes
    tris_rows = tl.tris
    inst = tl.inst
    inv = lambda c: np.where(np.abs(c) > 1e-30, 1.0 / c,  # noqa: E731
                             np.where(c >= 0, 1e30, -1e30)).astype(np.float32)
    bt = np.full(ox.shape, np.inf, np.float32)
    stack = [(1, -1)]  # (code, ictx)
    n_pops = l_pops = i_pops = ictx_changes = tot_pops = 0
    prev_ictx = -2
    with np.errstate(all="ignore"):
        while stack:
            code, ictx = stack.pop()
            tot_pops += 1
            if ictx != prev_ictx:
                ictx_changes += 1
            prev_ictx = ictx
            # ray in context space
            if ictx < 0:
                cox, coy, coz, cdx, cdy, cdz = ox, oy, oz, dx, dy, dz
            else:
                tf = inst[ictx]
                cox = tf[0] * ox + tf[1] * oy + tf[2] * oz + tf[9]
                coy = tf[3] * ox + tf[4] * oy + tf[5] * oz + tf[10]
                coz = tf[6] * ox + tf[7] * oy + tf[8] * oz + tf[11]
                cdx = tf[0] * dx + tf[1] * dy + tf[2] * dz
                cdy = tf[3] * dx + tf[4] * dy + tf[5] * dz
                cdz = tf[6] * dx + tf[7] * dy + tf[8] * dz
            ivx, ivy, ivz = inv(cdx), inv(cdy), inv(cdz)
            neg = -code - 1
            if code < 0 and neg >= _IB:       # instance leaf
                i_pops += 1
                iid = neg - _IB
                stack.append((int(inst[iid, 24]) + 1, iid))
                continue
            if code < 0:                       # triangle leaf
                l_pops += 1
                trow = tris_rows[neg]
                for k in range(8):
                    b = 16 * k
                    a0 = trow[b:b + 3]
                    e1 = trow[b + 3:b + 6] - a0
                    e2 = trow[b + 6:b + 9] - a0
                    px = cdy * e2[2] - cdz * e2[1]
                    py = cdz * e2[0] - cdx * e2[2]
                    pz = cdx * e2[1] - cdy * e2[0]
                    det = e1[0] * px + e1[1] * py + e1[2] * pz
                    iv = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
                    tx, ty, tz = cox - a0[0], coy - a0[1], coz - a0[2]
                    u = (tx * px + ty * py + tz * pz) * iv
                    qx = ty * e1[2] - tz * e1[1]
                    qy = tz * e1[0] - tx * e1[2]
                    qz = tx * e1[1] - ty * e1[0]
                    v = (cdx * qx + cdy * qy + cdz * qz) * iv
                    t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * iv
                    ok = ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0)
                          & (u + v <= 1) & (t > t_min) & (t < tmax)
                          & (t < bt))
                    bt = np.where(ok, t, bt)
                continue
            n_pops += 1                        # internal node
            nrow = nodes[code - 1]
            limit = np.minimum(bt, tmax)
            cand = []
            for ci in range(8):
                tag = nrow[56 + ci]
                if tag < 0.5:
                    continue
                t0x = (nrow[0 + ci] - cox) * ivx
                t1x = (nrow[24 + ci] - cox) * ivx
                t0y = (nrow[8 + ci] - coy) * ivy
                t1y = (nrow[32 + ci] - coy) * ivy
                t0z = (nrow[16 + ci] - coz) * ivz
                t1z = (nrow[40 + ci] - coz) * ivz
                tn = np.maximum(np.maximum(np.minimum(t0x, t1x),
                                           np.minimum(t0y, t1y)),
                                np.maximum(np.minimum(t0z, t1z), t_min))
                tf_ = np.minimum(np.minimum(np.maximum(t0x, t1x),
                                            np.maximum(t0y, t1y)),
                                 np.minimum(np.maximum(t0z, t1z), limit))
                hit = tn <= tf_
                if hit.any():
                    ref = int(nrow[48 + ci])
                    if tag > 2.5:
                        code_c = -(_IB + ref + 1)
                    elif tag > 1.5:
                        code_c = -(ref + 1)
                    else:
                        code_c = ref + 1
                    cand.append((code_c, float(tn[hit].min())))
            cand.sort(key=lambda x: -x[1])
            stack.extend((c, ictx) for c, _ in cand)
    return dict(node=n_pops, leaf=l_pops, inst=i_pops, total=tot_pops,
                ictx_changes=ictx_changes), bt


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from sfvp_tpu.accel.instances import flatten_instances
    from sfvp_tpu.accel.tlas import build_two_level
    from sfvp_tpu.accel.wide import build_wide_from_buffers
    from sfvp_tpu.camera import CameraConfig
    from sfvp_tpu.scene import upload
    from sfvp_tpu.scene.procedural import instanced_field

    from probe_smem_top import traverse_count

    insts = instanced_field(n_tris=220_000, n_inst=49)
    tl = build_two_level(insts)
    flat = upload(flatten_instances(insts))
    flat_wide = build_wide_from_buffers(flat)
    print(json.dumps({
        "tl_nodes": int(tl.nodes.shape[0]),
        "tl_tri_rows": int(tl.tris.shape[0]),
        "flat_nodes": int(flat_wide.nodes.shape[0]),
        "flat_tri_rows": int(flat_wide.tris.shape[0]),
        "instances": int(tl.num_instances)}), flush=True)

    cam = CameraConfig.look_at(origin=(10.5, 7.5, 10.5), target=(0, 0.6, 0),
                               fov_y_deg=50)
    side = 96
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

    rng = np.random.default_rng(3)
    for wave in ("primary", "bounce"):
        agg = dict(node=0, leaf=0, inst=0, total=0, ictx_changes=0)
        flat_pops = flat_leaf = 0
        groups = 8
        for g in range(groups):
            sl = slice(g * 1024, (g + 1) * 1024)
            gox, goy, goz = o[sl, 0], o[sl, 1], o[sl, 2]
            gdx, gdy, gdz = d[sl, 0], d[sl, 1], d[sl, 2]
            if wave == "bounce":
                _, bt = traverse_two_level(
                    tl, gox, goy, goz, gdx, gdy, gdz, np.float32(1e4))
                hit = np.isfinite(bt)
                t = np.where(hit, bt, 1.0)
                gox = gox + t * gdx
                goy = goy + t * gdy
                goz = goz + t * gdz
                v = rng.normal(size=(1024, 3)).astype(np.float32)
                v /= np.linalg.norm(v, axis=1, keepdims=True)
                gdx, gdy, gdz = v[:, 0], v[:, 1], v[:, 2]
            stats, _ = traverse_two_level(
                tl, gox, goy, goz, gdx, gdy, gdz, np.float32(1e4))
            for k in agg:
                agg[k] += stats[k]
            fp, fl, _, _ = traverse_count(
                flat_wide.nodes, flat_wide.tris, gox, goy, goz,
                gdx, gdy, gdz, np.full(1024, 1e4, np.float32),
                np.float32(1e-3))
            flat_pops += len(fp)
            flat_leaf += fl
        rays = groups * 1024
        out = {"wave": wave,
               "tl_pops_per_ray": round(agg["total"] / rays, 3),
               "tl_node": agg["node"], "tl_leaf": agg["leaf"],
               "tl_inst": agg["inst"],
               "tl_ictx_change_rate": round(
                   agg["ictx_changes"] / max(agg["total"], 1), 3),
               "tl_inst_entries_per_packet": round(
                   agg["inst"] / groups, 1),
               "flat_pops_per_ray": round(
                   (flat_pops + flat_leaf) / rays, 3),
               "flat_node": flat_pops, "flat_leaf": flat_leaf}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

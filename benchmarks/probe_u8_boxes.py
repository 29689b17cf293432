"""Host probe for PACKED u8-QUANTIZED child boxes (round-4 VERDICT item
2): quantize each wide node's 8 child AABBs to u8 steps of the node's own
bounds (min floored, max ceiled — conservative dilation), which would let
the SMEM table hold 12 packed words per node instead of 48 floats (4x more
tree in budget, fewer scalar loads per pop at the price of unpack
shifts). This probe measures the DILATION side of the trade: extra node
and leaf pops from the fattened boxes, on the headline GI scene (100k
sphere), the city, and the 500k streamed sphere, primary + bounce waves.

The scalar-cost side (12 loads + ~2 unpack ops/value vs 48 loads) can
only be settled by a kernel microbench; this probe gates whether one is
worth writing: if dilation already costs more than a few percent in pops,
the idea is dead regardless.

Usage: python benchmarks/probe_u8_boxes.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from probe_smem_top import traverse_count  # noqa: E402


def quantize_u8(nodes: np.ndarray) -> np.ndarray:
    """Return a node table whose child boxes went through the u8
    round-trip: child_min = floor((min - pmin)/scale) steps down,
    child_max = ceil up, against the node's own union-of-children AABB.
    Lane layout mirrors accel/wide.py: [mn x*8 y*8 z*8 | mx x*8 y*8 z*8 |
    ref*8 | tag*8]."""
    q = nodes.copy()
    tags = nodes[:, 56:64]
    live = tags > 0.5
    for axis in range(3):
        mn = nodes[:, 0 + 8 * axis:8 + 8 * axis]
        mx = nodes[:, 24 + 8 * axis:32 + 8 * axis]
        pmin = np.where(live, mn, np.inf).min(axis=1, keepdims=True)
        pmax = np.where(live, mx, -np.inf).max(axis=1, keepdims=True)
        scale = (pmax - pmin) / 255.0
        # degenerate axes (flat nodes): scale 0 -> boxes reproduce exactly
        safe = np.where(scale > 0, scale, 1.0)
        qmn = np.floor((mn - pmin) / safe).clip(0, 255)
        qmx = np.ceil((mx - pmin) / safe).clip(0, 255)
        q[:, 0 + 8 * axis:8 + 8 * axis] = np.where(
            live, (pmin + qmn * scale).astype(np.float32), mn)
        q[:, 24 + 8 * axis:32 + 8 * axis] = np.where(
            live, (pmin + qmx * scale).astype(np.float32), mx)
    return q


def probe(name, buffers, cam_origin, cam_target, fov, groups=8):
    from sfvp_tpu.accel.wide import build_wide_from_buffers
    from sfvp_tpu.camera import CameraConfig

    wide = build_wide_from_buffers(buffers)
    nodes_q = quantize_u8(np.asarray(wide.nodes))
    cam = CameraConfig.look_at(origin=cam_origin, target=cam_target,
                               fov_y_deg=fov)
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

    rng = np.random.default_rng(11)
    out = {"scene": name, "nodes": int(wide.nodes.shape[0])}
    for wave in ("primary", "bounce"):
        tot = {"exact": [0, 0], "u8": [0, 0]}
        for g in range(groups):
            sl = slice(g * 1024, (g + 1) * 1024)
            ox, oy, oz = o[sl, 0], o[sl, 1], o[sl, 2]
            dx, dy, dz = d[sl, 0], d[sl, 1], d[sl, 2]
            if wave == "bounce":
                _, _, bt, bn = traverse_count(
                    wide.nodes, wide.tris, ox, oy, oz, dx, dy, dz,
                    np.full(ox.shape, 1e4, np.float32), np.float32(1e-3))
                hit = np.isfinite(bt)
                if hit.sum() < 32:
                    continue
                t = np.where(hit, bt, 1.0)
                ox, oy, oz = ox + t * dx, oy + t * dy, oz + t * dz
                flip = (bn[0] * dx + bn[1] * dy + bn[2] * dz) > 0
                n3 = np.where(flip[None], -bn, bn)
                v = rng.normal(size=(3, ox.shape[0])).astype(np.float32)
                v /= np.maximum(np.linalg.norm(v, axis=0), 1e-30)
                v = np.where((v * n3).sum(0) < 0, -v, v)
                dx, dy, dz = v[0], v[1], v[2]
                tmx = np.where(hit, np.float32(1e4), np.float32(-np.inf))
            else:
                tmx = np.full(ox.shape, 1e4, np.float32)
            for key, tab in (("exact", wide.nodes), ("u8", nodes_q)):
                pops, l_p, _, _ = traverse_count(
                    tab, wide.tris, ox, oy, oz, dx, dy, dz, tmx,
                    np.float32(1e-3))
                tot[key][0] += len(pops)
                tot[key][1] += l_p
        rec = {}
        for key in ("exact", "u8"):
            rec[f"{key}_node"] = tot[key][0]
            rec[f"{key}_leaf"] = tot[key][1]
        e = tot["exact"][0] + tot["exact"][1]
        u = tot["u8"][0] + tot["u8"][1]
        rec["pop_inflation"] = round(u / max(e, 1), 4)
        out[wave] = rec
    print(json.dumps(out), flush=True)
    return out


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from sfvp_tpu import upload
    from sfvp_tpu.scene.procedural import city_mesh, sphere_mesh

    probe("sphere100k", upload(sphere_mesh(224, 224, bump=0.3)),
          (0.0, 2.2, 5.0), (0.0, 0.0, 0.0), 50.0)
    probe("city96", upload(city_mesh(n_buildings=96, subdiv=9,
                                     glossy_ground=True)),
          (13.0, 9.0, 13.0), (0.0, 0.8, 0.0), 55.0)
    probe("sphere500k", upload(sphere_mesh(500, 500, bump=0.3)),
          (0.0, 2.2, 5.0), (0.0, 0.0, 0.0), 50.0)


if __name__ == "__main__":
    main()

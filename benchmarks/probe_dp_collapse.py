"""Prototype: Ylitie-style DP wide-BVH collapse, evaluated in simulation.

Computes, for every binary node v, c(v, j) = the minimal SAH-style cost of
representing v's subtree as a forest of j wide-node slots:

    c(v, 1) = min( C_LEAF * a(v)            [leaf, count <= 8]
                 , C_NODE * a(v) + c(l, i) + c(r, 8 - i)  over i in 1..7 )
    c(v, j) = min( c(v, 1)
                 , c(l, i) + c(r, j - i)    over i in 1..j-1 )   j >= 2

then emits the wide tree from the argmins and runs the packet-pop
simulator against the shipping absorb-small-first collapse on the dumped
GI wave. Host-only; prints one JSON line per variant.

    python benchmarks/probe_dp_collapse.py --wave /tmp/gi_wave.npz
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def dp_collapse(bvh, width=8, c_node=1.0, c_leaf=1.0):
    """Returns kids_of: dict root -> list of binary-node children for each
    wide node (DP-optimal grouping)."""
    m = bvh.num_nodes
    is_leaf = bvh.count > 0
    area = (
        (bvh.bmax_x - bvh.bmin_x) * (bvh.bmax_y - bvh.bmin_y)
        + (bvh.bmax_y - bvh.bmin_y) * (bvh.bmax_z - bvh.bmin_z)
        + (bvh.bmax_z - bvh.bmin_z) * (bvh.bmax_x - bvh.bmin_x)
    ).astype(np.float64)

    INF = np.inf
    c = np.full((m, width + 1), INF)
    split = np.full((m, width + 1), -1, np.int8)  # left-share for argmin

    # reverse DFS order: children before parents
    for v in range(m - 1, -1, -1):
        if is_leaf[v]:
            c[v, 1:] = c_leaf * area[v]
            continue
        l = v + 1
        r = int(bvh.skip[l])
        # c(v,1): open a wide node here with i + (width - i) slots below
        best = INF
        bi = -1
        for i in range(1, width):
            s = c[l, i] + c[r, width - i]
            if s < best:
                best = s
                bi = i
        c[v, 1] = c_node * area[v] + best
        split[v, 1] = bi
        # c(v,j): distribute j slots across the two children (or collapse)
        for j in range(2, width + 1):
            best = c[v, 1]
            bj = 0  # 0 = "use the j=1 wide node"
            for i in range(1, j):
                s = c[l, i] + c[r, j - i]
                if s < best:
                    best = s
                    bj = i
            c[v, j] = best
            split[v, j] = bj

    # emission: collect the slots of each wide node
    def slots(v, j, out):
        """Append the binary roots of the j slots representing v."""
        if is_leaf[v]:
            out.append(v)
            return
        if j == 1:
            out.append(v)  # becomes a wide node itself
            return
        i = int(split[v, j])
        if i == 0:
            out.append(v)
            return
        l = v + 1
        r = int(bvh.skip[l])
        slots(l, i, out)
        slots(r, j - i, out)

    kids_of = {}
    stack = [0]
    while stack:
        v = stack.pop()
        if is_leaf[v]:
            continue
        i = int(split[v, 1])
        l = v + 1
        r = int(bvh.skip[l])
        kids = []
        slots(l, i, kids)
        slots(r, 8 - i, kids)
        kids_of[v] = kids
        for k in kids:
            if not is_leaf[k]:
                stack.append(k)
    return kids_of


def build_wide_rows(bvh, kids_of, width=8):
    """Emit (nodes, tris_rows) in the shipping row layout from a grouping."""
    from sfvp_tpu.accel.wide import LEAF_TRIS, TAG_INTERNAL, TAG_INVALID, TAG_LEAF

    node_rows = []
    leaf_ranges = []
    index_of = {}

    def emit(v):
        my = len(node_rows)
        index_of[v] = my
        row = np.zeros(128, np.float32)
        node_rows.append(row)
        kids = kids_of[v]
        for cth, b in enumerate(kids):
            row[0 + cth] = bvh.bmin_x[b]
            row[8 + cth] = bvh.bmin_y[b]
            row[16 + cth] = bvh.bmin_z[b]
            row[24 + cth] = bvh.bmax_x[b]
            row[32 + cth] = bvh.bmax_y[b]
            row[40 + cth] = bvh.bmax_z[b]
            if bvh.count[b] > 0:
                leaf_ranges.append((int(bvh.first[b]), int(bvh.count[b])))
                row[48 + cth] = float(len(leaf_ranges) - 1)
                row[56 + cth] = TAG_LEAF
            else:
                row[48 + cth] = float(emit(b))
                row[56 + cth] = TAG_INTERNAL
        for cth in range(len(kids), width):
            row[0 + cth] = 1.0
            row[24 + cth] = -1.0
            row[56 + cth] = TAG_INVALID
        return my

    sys.setrecursionlimit(200000)
    emit(0)
    nodes = np.stack(node_rows).astype(np.float32)
    tv = bvh.tv
    ts = tv[0].shape[0]
    firsts = np.asarray([r[0] for r in leaf_ranges], np.int64)
    counts = np.asarray([r[1] for r in leaf_ranges], np.int64)
    k = np.arange(LEAF_TRIS)
    idx = np.clip(firsts[:, None] + k[None, :], 0, ts - 1)
    valid = (k[None, :] < counts[:, None]).astype(np.float32)
    tris = np.zeros((len(leaf_ranges), 128), np.float32)
    for kk in range(LEAF_TRIS):
        base = 16 * kk
        for cc in range(9):
            tris[:, base + cc] = tv[cc][idx[:, kk]] * valid[:, kk]
    return nodes, tris


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wave", default="/tmp/gi_wave.npz")
    p.add_argument("--tris", type=int, default=100_000)
    a = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from sfvp_tpu import upload
    from sfvp_tpu.accel.sah import build_sah_bvh
    from sfvp_tpu.accel.wide import build_wide, materials_array
    from sfvp_tpu.scene.procedural import sphere_mesh

    n = max(32, int(np.sqrt(a.tris / 2)))
    buf = upload(sphere_mesh(n_lat=n, n_lon=n, bump=0.3))
    bvh = build_sah_bvh(buf)

    kids_of = dp_collapse(bvh)
    nodes, tris = build_wide_rows(bvh, kids_of)
    fill = (nodes[:, 56:64] > 0.5).sum() / nodes.shape[0]

    ship = build_wide(bvh, materials_array(buf))
    ship_fill = (ship.nodes[:, 56:64] > 0.5).sum() / ship.nodes.shape[0]
    print(json.dumps({
        "dp_nodes": int(nodes.shape[0]), "dp_fill": round(float(fill), 2),
        "ship_nodes": int(ship.nodes.shape[0]),
        "ship_fill": round(float(ship_fill), 2),
    }), flush=True)

    # pop simulation on the dumped wave
    from sim_packets import traverse_packet

    z = np.load(a.wave)
    live = z["live"]
    gids = np.linspace(0, int(live.reshape(-1, 1024).any(1).sum()) - 1,
                       12).astype(int)
    for name, nd, tr in (("ship", ship.nodes, ship.tris),
                         ("dp", nodes, tris)):
        tot = 0
        for g in gids:
            base = min(g * 1024, z["ox"].shape[0] - 1024)
            sl = slice(base, base + 1024)
            tmx = np.where(live[sl], np.float32(1e4), np.float32(-np.inf))
            n_p, l_p, _ = traverse_packet(
                nd, tr, z["ox"][sl], z["oy"][sl], z["oz"][sl],
                z["dx"][sl], z["dy"][sl], z["dz"][sl], tmx)
            tot += n_p + l_p
        print(json.dumps({"variant": name,
                          "pops_per_ray": round(tot / (12 * 1024), 4)}),
              flush=True)


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()

"""Host simulation of wide-BVH packet traversal on a REAL sorted bounce wave
(dumped by profile_gi.py --dump): counts node/leaf pops as a function of
packet width, to size the win of sub-packet traversal (8 independent 128-ray
packets per (8,128) block) before building the kernel.

Reported per variant:
  pops_per_ray        — visited rows / rays (the culling quality)
  lockstep_iters      — for grouped sub-packets: sum over groups of
                        max_i(pops_i) — what an (8,128) lockstep block pays
                        including the idle-row tail

Usage: python benchmarks/sim_packets.py --wave /tmp/gi_wave.npz
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def traverse_packet(nodes, tris_rows, ox, oy, oz, dx, dy, dz, tmax,
                    order="min", width=8):
    """Ordered wide-BVH packet traversal (mirror of kernels/bvh_packet.py);
    returns (node_pops, leaf_pops). order: "min" = packet-min tnear (the
    shipping kernel), "center" = representative middle-lane tnear (cheaper
    on TPU: no cross-lane reduction), "none" = push hit children in child
    order with NO sort at all (kernel saves 8 cross-lane min reductions +
    the 19-comparator sort network per pop; this measures the pop-count
    price of that)."""
    inv = lambda c: np.where(np.abs(c) > 1e-30, 1.0 / c,  # noqa: E731
                             np.where(c >= 0, 1e30, -1e30)).astype(np.float32)
    ivx, ivy, ivz = inv(dx), inv(dy), inv(dz)
    bt = np.full(ox.shape, np.inf, np.float32)
    stack = [(1, 0.0)]  # (code, key); +ref+1 internal, -(ref+1) leaf
    n_pops = l_pops = ll_adj = 0
    prev_leaf = False
    t_min = np.float32(1e-3)
    with np.errstate(all="ignore"):
        while stack:
            code, _ = stack.pop()
            if code < 0:
                l_pops += 1
                # leaf pop whose PREDECESSOR pop was also a leaf: a 2-slot
                # ring prefetch issued before the predecessor's 8
                # intersection tests has real work to hide the DMA behind
                # (round-4 streamed-DMA overlap probe)
                ll_adj += prev_leaf
                prev_leaf = True
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
                          & (u + v <= 1) & (t > t_min) & (t < tmax) & (t < bt))
                    bt = np.where(ok, t, bt)
                continue
            n_pops += 1
            prev_leaf = False
            nrow = nodes[code - 1]
            limit = np.minimum(bt, tmax)
            cand = []
            W = width
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
                    if order == "min":
                        key = float(tn[hit].min())
                    elif order == "none":
                        key = 0.0
                    else:
                        mid = tn.shape[0] // 2
                        key = float(tn[mid]) if np.isfinite(tn[mid]) else 1e30
                    cand.append((code_c, key))
            if order != "none":
                cand.sort(key=lambda x: -x[1])  # far first; near popped 1st
            stack.extend(cand)
    return n_pops, l_pops, ll_adj


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wave", required=True)
    p.add_argument("--groups", type=int, default=24,
                   help="number of (8x128=1024-ray) groups to sample")
    p.add_argument("--wave-kind", choices=["bounce", "primary"],
                   default="bounce")
    p.add_argument("--order", choices=["min", "center", "none"],
                   default="min")
    p.add_argument("--ser", action="store_true",
                   help="SER analog: before splitting a 1024-ray block "
                        "into sub-packets, re-sort its lanes by "
                        "(direction octant, position morton) — what an "
                        "IN-KERNEL lane re-sort between bounces could "
                        "buy. Note a full-block (w1024) sort is a no-op "
                        "by construction: the packet is the whole block, "
                        "so the visited-subtree union is permutation-"
                        "invariant. Only sub-packet widths can benefit.")
    a = p.parse_args()

    z = np.load(a.wave)
    nodes, tris_rows = z["nodes"], z["tris_rows"]
    node_width = int(z["node_width"]) if "node_width" in z else 8
    pre = "" if a.wave_kind == "bounce" else "p"
    ox, oy, oz = z[pre + "ox"], z[pre + "oy"], z[pre + "oz"]
    dx, dy, dz = z[pre + "dx"], z[pre + "dy"], z[pre + "dz"]
    live = z["live"] if a.wave_kind == "bounce" else np.ones(ox.shape, bool)
    tmax = np.float32(1e4)

    # sample live 1024-ray groups, evenly spread over the live prefix
    n_live_groups = int(live.reshape(-1, 1024).any(axis=1).sum())
    gids = np.linspace(0, n_live_groups - 1, a.groups).astype(int)

    def ser_perm(sl):
        """Within-block lane permutation: (octant << 21) | morton-7, dead
        rays last (mirror of the wavefront _sort_key)."""
        o3 = np.stack([ox[sl], oy[sl], oz[sl]], 1)
        lo, hi = o3.min(0), o3.max(0)
        q = np.clip((o3 - lo) / np.maximum(hi - lo, 1e-6), 0, 1)
        q = (q * 127).astype(np.int64)

        def expand7(v):
            v = (v | (v << 8)) & 0x100F00F
            v = (v | (v << 4)) & 0x10C30C3
            v = (v | (v << 2)) & 0x1249249
            return v

        morton = ((expand7(q[:, 0]) << 2) | (expand7(q[:, 1]) << 1)
                  | expand7(q[:, 2]))
        octant = ((dx[sl] >= 0).astype(np.int64) * 4
                  + (dy[sl] >= 0).astype(np.int64) * 2
                  + (dz[sl] >= 0).astype(np.int64))
        key = (octant << 21) | morton
        key = np.where(live[sl], key, np.int64(2 ** 30))
        return np.argsort(key, kind="stable")

    out = {"wave": a.wave_kind, "sampled_groups": a.groups,
           "live_groups": n_live_groups, "ser_sorted": bool(a.ser)}
    for width in (1024, 256, 128):
        tot_n = tot_l = tot_adj = 0
        lockstep = 0
        gw = max(width, 1024)
        for g in gids:
            base = min(g * 1024, ox.shape[0] - gw)
            base -= base % gw
            sl = slice(base, base + gw)
            gl = live[sl]
            tmx = np.where(gl, tmax, np.float32(-np.inf))
            perm = ser_perm(sl) if a.ser else np.arange(gw)
            gox, goy, goz = ox[sl][perm], oy[sl][perm], oz[sl][perm]
            gdx, gdy, gdz = dx[sl][perm], dy[sl][perm], dz[sl][perm]
            tmx = tmx[perm]
            sub = []
            for s in range(0, gw, width):
                ss = slice(s, s + width)
                n_p, l_p, adj = traverse_packet(
                    nodes, tris_rows,
                    gox[ss], goy[ss], goz[ss],
                    gdx[ss], gdy[ss], gdz[ss], tmx[ss],
                    order=a.order, width=node_width)
                sub.append(n_p + l_p)
                tot_n += n_p
                tot_l += l_p
                tot_adj += adj
            # an (8,128) lockstep block interleaving its sub-packets in one
            # while loop pays max over the sub-packets
            lockstep += max(sub)
        rays = a.groups * gw
        out[f"w{width}_pops_per_ray"] = round((tot_n + tot_l) / rays, 4)
        out[f"w{width}_leaf_frac"] = round(tot_l / max(tot_n + tot_l, 1), 3)
        out[f"w{width}_leaf_leaf_adj_frac"] = round(
            tot_adj / max(tot_l, 1), 3)
        if width < 1024:
            out[f"w{width}_lockstep_iters_per_block"] = round(
                lockstep / a.groups, 1)
            out[f"w{width}_sum_iters_per_block"] = round(
                (tot_n + tot_l) / a.groups, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

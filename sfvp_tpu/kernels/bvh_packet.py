"""Pallas packet traversal of the 8-wide BVH — the TPU large-scene trace
path (replaces the reference's hardware traversal, ref raygen.rgen:63, for
scenes beyond the brute-force megakernel's reach).

Per grid program, one *packet* of rays (block_rows x 128 lanes) traverses
the tree through a shared SMEM stack:

    pop a code (positive = internal node row, negative = leaf row)
    internal: load its 128-lane row (dynamic SUBLANE index — the one
              dynamic-addressing mode Mosaic allows), slab-test all 8
              children against every lane, push children any lane hit
    leaf:     load the triangle row (8 tris x 16 fields) and run masked
              Moller-Trumbore on all lanes, accumulating closest hit plus
              the full shade payload (vertices + material) so no XLA
              gathers are needed downstream

A subtree is skipped iff NO lane in the packet wants it, which is where
the speedup over brute force comes from; coherent packets (primary and
shadow rays) skip most of the tree. Node boxes are pruned against each
lane's current best t. Scene data (node rows + tri rows) stays resident in
VMEM across the grid (fits up to roughly 150k triangles).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.wide import WideBVH

INF = np.float32(np.inf)
_BIG = np.float32(1e30)


class Payload(NamedTuple):
    """Closest-hit record + shade data, SoA over rays (miss: t == +inf)."""

    t: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    p0: tuple
    p1: tuple
    p2: tuple
    albedo: tuple    # Kd for diffuse, Ks for mirrors (see accel/wide.py)
    emission: tuple
    mtype: jnp.ndarray  # f32: 0 diffuse, 1 mirror
    # map_Kd extension (None on untextured scenes): interpolated vt at the
    # hit + texture id, so the shade phase's bilinear fetch is the ONLY
    # gather left downstream (the per-lane fetch itself cannot run inside
    # a Mosaic kernel — no per-lane dynamic addressing)
    texu: "jnp.ndarray | None" = None
    texv: "jnp.ndarray | None" = None
    texid: "jnp.ndarray | None" = None  # i32, -1 = untextured


SMEM_CODES_MAX_BYTES = 192 * 1024  # scalar memory is scarce; gate by size
# combined budget for the full-node-table-in-SMEM mode (megakernel_bvh
# smem_boxes): codes (32B/node) + box scalars (192B/node). 787KB
# measured lowering fine on v5e (benchmarks/probe_smem_boxes.py, 1.19x
# on the 100k GI step); kept just above that with headroom for the
# traversal stack.
SMEM_BOXES_MAX_BYTES = 800 * 1024


def make_packet_trace(
    wide: WideBVH,
    t_min: float,
    block_rows: int = 8,
    interpret: Optional[bool] = None,
    smem_codes: Optional[bool] = None,
    smem_boxes: Optional[bool] = None,
):
    """Build trace(o, d, t_max, active) -> Payload over (N,) SoA rays.

    t_max: scalar or per-ray (N,) array. active: optional (N,) bool; inactive
    lanes report miss and never influence traversal.

    smem_codes: read the per-child stack codes from a pre-decoded SMEM
    table (one scalar load per child, off the VMEM row-load chain)
    instead of two lane extracts + a select; None = auto (on when the
    table fits the SMEM budget).

    smem_boxes: the ENTIRE node table in SMEM (flat box scalars,
    boxes[n*48+c] == nodes[n, c]) — a node pop does zero VMEM traffic.
    Requires smem_codes; None = auto (codes+boxes fit the budget).
    Bitwise-identical results (same scalars, same order).
    """
    nodes = jnp.asarray(wide.nodes)
    tris = jnp.asarray(wide.tris)
    with_tex = wide.tris_aux is not None
    aux = jnp.asarray(wide.tris_aux) if with_tex else None
    n_pay = 19 if with_tex else 16
    stack_n = int(wide.max_stack)
    t_min = np.float32(t_min)
    lanes = 128
    r = block_rows
    if smem_codes is None:
        smem_codes = wide.codes_nbytes <= SMEM_CODES_MAX_BYTES
    boxes_nbytes = int(wide.nodes.shape[0]) * 48 * 4
    if smem_boxes is None:
        smem_boxes = bool(smem_codes) and (
            wide.codes_nbytes + boxes_nbytes <= SMEM_BOXES_MAX_BYTES)
    smem_boxes = bool(smem_boxes) and bool(smem_codes)
    codes = (jnp.asarray(wide.codes.reshape(-1))
             if smem_codes else None)  # 1-D: SMEM pads 2-D rows to 128 lanes
    if smem_boxes:
        nodes = jnp.asarray(
            np.ascontiguousarray(np.asarray(wide.nodes)[:, :48]).reshape(-1))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def kernel(nodes_ref, tris_ref, *refs):
        if smem_codes:
            codes_ref = refs[0]
            refs = refs[1:]
        if with_tex:
            aux_ref = refs[0]
            refs = refs[1:]
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         tmax_ref) = refs[:7]
        out_refs = refs[7:]
        stack_ref = out_refs[-1]
        outs = out_refs[:-1]
        ox = ox_ref[:]
        oy = oy_ref[:]
        oz = oz_ref[:]
        dx = dx_ref[:]
        dy = dy_ref[:]
        dz = dz_ref[:]
        tmax = tmax_ref[:]

        def safe_inv(c):
            return jnp.where(
                jnp.abs(c) > 1e-30, 1.0 / c, jnp.where(c >= 0, _BIG, -_BIG)
            )

        ivx = safe_inv(dx)
        ivy = safe_inv(dy)
        ivz = safe_inv(dz)

        zero = jnp.zeros((r, lanes), jnp.float32)
        stack_ref[0] = jnp.int32(1)  # root: internal node 0 -> code +1

        init = (
            jnp.int32(1),                    # sp
            jnp.full((r, lanes), INF),       # bt
            zero, zero,                      # bu, bv
        ) + (zero,) * n_pay   # 9 verts + 3 albedo + 3 ke + mtype [+ uv/tex]

        def cond(c):
            return c[0] > 0

        def body(c):
            sp = c[0]
            bt = c[1]
            bu, bv = c[2], c[3]
            pay = tuple(c[4:])

            code = stack_ref[sp - 1]
            sp = sp - 1
            is_leaf = code < 0

            def node_fn(args):
                """Internal node: slab-test 8 children, push any-hit
                subtrees ordered far-to-near (nearest pops first so best-t
                tightens early and prunes the rest)."""
                bt, bu, bv, pay = args
                node_i = jnp.maximum(code - 1, 0)
                limit = jnp.minimum(bt, tmax)
                keys = []
                codes_c = []
                # hoist ALL scalar lane extractions before any vector math:
                # bunched scalar loads schedule ~1.8x better than extracts
                # interleaved with the slab tests (benchmarks/probe_carry.py)
                if smem_boxes:
                    # nodes_ref IS the flat SMEM box table: node pops do
                    # no VMEM traffic at all
                    sc = [nodes_ref[node_i * 48 + c] for c in range(48)]
                    ccodes = [codes_ref[node_i * 8 + ci] for ci in range(8)]
                elif smem_codes:
                    # child codes via scalar SMEM loads (depend only on the
                    # popped code, not the VMEM row) — 48 extracts instead
                    # of 64, no per-child tag decode
                    nrow = nodes_ref[pl.ds(node_i, 1), :]
                    sc = [nrow[0, c] for c in range(48)]
                    ccodes = [codes_ref[node_i * 8 + ci] for ci in range(8)]
                else:
                    nrow = nodes_ref[pl.ds(node_i, 1), :]
                    sc = [nrow[0, c] for c in range(64)]
                for ci in range(8):
                    bmnx = sc[0 + ci]
                    bmny = sc[8 + ci]
                    bmnz = sc[16 + ci]
                    bmxx = sc[24 + ci]
                    bmxy = sc[32 + ci]
                    bmxz = sc[40 + ci]
                    tx0 = (bmnx - ox) * ivx
                    tx1 = (bmxx - ox) * ivx
                    ty0 = (bmny - oy) * ivy
                    ty1 = (bmxy - oy) * ivy
                    tz0 = (bmnz - oz) * ivz
                    tz1 = (bmxz - oz) * ivz
                    tnear = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.maximum(jnp.minimum(tz0, tz1), t_min),
                    )
                    tfar = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.minimum(jnp.maximum(tz0, tz1), limit),
                    )
                    hit = tnear <= tfar
                    # packet entry distance: min tnear over lanes that hit;
                    # any-lane-hit is derived from it, saving a second full
                    # cross-lane reduction per child. Identical to
                    # jnp.any(hit) whenever hit lanes give finite tnear —
                    # true for finite t_max and coordinates below ~3e8
                    # (safe_inv caps slopes at 1e30; past that, slab
                    # products can overflow to +inf and a hit=True lane
                    # with tnear=+inf would be skipped here)
                    key = jnp.min(jnp.where(hit, tnear, jnp.float32(np.inf)))
                    any_hit = key < INF
                    if smem_codes:
                        code_c0 = ccodes[ci]  # 0 = invalid slot
                        push = (code_c0 != 0) & any_hit
                    else:
                        tag = sc[56 + ci]
                        ref = sc[48 + ci].astype(jnp.int32)
                        code_c0 = jnp.where(
                            tag > 1.5, -(ref + 1), ref + 1
                        )
                        push = (tag > 0.5) & any_hit
                    keys.append(jnp.where(push, key, jnp.float32(-np.inf)))
                    codes_c.append(
                        jnp.where(push, code_c0, jnp.int32(0))
                    )

                # descending-key sorting network (8 scalars, 19 comparators):
                # far children are pushed first, near ones last (popped first)
                net = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3),
                       (4, 6), (5, 7), (1, 2), (5, 6), (0, 4), (3, 7),
                       (1, 5), (2, 6), (1, 4), (3, 6), (2, 4), (3, 5),
                       (3, 4)]
                for a, b in net:
                    swap = keys[a] < keys[b]
                    ka = jnp.where(swap, keys[b], keys[a])
                    kb = jnp.where(swap, keys[a], keys[b])
                    ca = jnp.where(swap, codes_c[b], codes_c[a])
                    cb = jnp.where(swap, codes_c[a], codes_c[b])
                    keys[a], keys[b] = ka, kb
                    codes_c[a], codes_c[b] = ca, cb

                spn = sp
                for ci in range(8):
                    code_c = codes_c[ci]
                    do_push = code_c != 0

                    @pl.when(do_push)
                    def _(spn=spn, code_c=code_c):
                        stack_ref[spn] = code_c

                    spn = spn + do_push.astype(jnp.int32)
                return (spn, bt, bu, bv) + pay

            def leaf_fn(args):
                """Leaf: masked Moller-Trumbore on 8 packed triangles."""
                bt, bu, bv, pay = args
                pay = list(pay)
                trow = tris_ref[pl.ds(jnp.maximum(-code - 1, 0), 1), :]
                tsc = [trow[0, c] for c in range(128)]
                if with_tex:
                    arow = aux_ref[pl.ds(jnp.maximum(-code - 1, 0), 1), :]
                    asc = [arow[0, c] for c in range(128)]
                for k in range(8):
                    base = 16 * k
                    t0x = tsc[base + 0]
                    t0y = tsc[base + 1]
                    t0z = tsc[base + 2]
                    t1x = tsc[base + 3]
                    t1y = tsc[base + 4]
                    t1z = tsc[base + 5]
                    t2x = tsc[base + 6]
                    t2y = tsc[base + 7]
                    t2z = tsc[base + 8]
                    e1x, e1y, e1z = t1x - t0x, t1y - t0y, t1z - t0z
                    e2x, e2y, e2z = t2x - t0x, t2y - t0y, t2z - t0z
                    pvx = dy * e2z - dz * e2y
                    pvy = dz * e2x - dx * e2z
                    pvz = dx * e2y - dy * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                    tvx, tvy, tvz = ox - t0x, oy - t0y, oz - t0z
                    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                    ok = (
                        (jnp.abs(det) > 1e-12)
                        & (u >= 0.0)
                        & (v >= 0.0)
                        & (u + v <= 1.0)
                        & (t > t_min)
                        & (t < tmax)
                        & (t < bt)
                    )
                    bt = jnp.where(ok, t, bt)
                    bu = jnp.where(ok, u, bu)
                    bv = jnp.where(ok, v, bv)
                    vals = (
                        t0x, t0y, t0z, t1x, t1y, t1z, t2x, t2y, t2z,
                        tsc[base + 9], tsc[base + 10],
                        tsc[base + 11], tsc[base + 12],
                        tsc[base + 13], tsc[base + 14],
                        tsc[base + 15],
                    )
                    if with_tex:
                        # interpolate the per-corner vt with the SAME
                        # barycentrics as the hit position (matches
                        # integrate.wavefront.shade_inputs)
                        wb = 1.0 - u - v
                        tu = (asc[base + 0] * wb + asc[base + 2] * u
                              + asc[base + 4] * v)
                        tw = (asc[base + 1] * wb + asc[base + 3] * u
                              + asc[base + 5] * v)
                        vals = vals + (tu, tw, asc[base + 6])
                    pay = [
                        jnp.where(ok, sv + zero, pv)
                        for sv, pv in zip(vals, pay)
                    ]
                return (sp, bt, bu, bv) + tuple(pay)

            return jax.lax.cond(is_leaf, leaf_fn, node_fn, (bt, bu, bv, pay))

        final = jax.lax.while_loop(cond, body, init)
        bt, bu, bv = final[1], final[2], final[3]
        pay = final[4:]
        outs[0][:] = bt
        outs[1][:] = bu
        outs[2][:] = bv
        for i in range(n_pay):
            outs[3 + i][:] = pay[i]

    n_out = 3 + n_pay

    def trace(o, d, t_max, active=None) -> Payload:
        from .intersect import _as_v3

        o = _as_v3(o)
        d = _as_v3(d)
        n = o[0].shape[0]
        rows_total = -(-n // lanes)
        rows_padded = -(-rows_total // r) * r
        grid = rows_padded // r
        pad = rows_padded * lanes - n

        tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
        if active is not None:
            tmax = jnp.where(active, tmax, np.float32(-np.inf))

        def plane(a, fill=0.0):
            a = jnp.pad(a, (0, pad), constant_values=fill)
            return a.reshape(rows_padded, lanes)

        # padded lanes get tmax=-inf so they never assert box hits
        args = [
            plane(o[0]), plane(o[1]), plane(o[2]),
            plane(d[0]), plane(d[1]), plane(d[2]),
            plane(tmax, fill=-np.inf),
        ]

        blk = pl.BlockSpec((r, lanes), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        scene_args = [nodes, tris]
        scene_specs = [
            pl.BlockSpec(
                memory_space=pltpu.SMEM if smem_boxes else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        if smem_codes:
            scene_args.append(codes)
            scene_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        if with_tex:
            scene_args.append(aux)
            scene_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=scene_specs + [blk] * 7,
            out_specs=[blk] * n_out,
            out_shape=[
                jax.ShapeDtypeStruct((rows_padded, lanes), jnp.float32)
            ] * n_out,
            scratch_shapes=[pltpu.SMEM((stack_n,), jnp.int32)],
            interpret=interpret,
        )(*scene_args, *args)

        flat = lambda a: a.reshape(-1)[:n]  # noqa: E731
        o19 = [flat(a) for a in outs]
        bt = o19[0]
        if active is not None:
            bt = jnp.where(active, bt, INF)
        tex_kw = {}
        if with_tex:
            tex_kw = dict(
                texu=o19[19], texv=o19[20],
                texid=o19[21].astype(jnp.int32) - 1,
            )
        return Payload(
            t=bt,
            u=o19[1],
            v=o19[2],
            p0=(o19[3], o19[4], o19[5]),
            p1=(o19[6], o19[7], o19[8]),
            p2=(o19[9], o19[10], o19[11]),
            albedo=(o19[12], o19[13], o19[14]),
            emission=(o19[15], o19[16], o19[17]),
            mtype=o19[18],
            **tex_kw,
        )

    return trace


def make_packet_occlusion(
    wide: WideBVH,
    t_min: float,
    block_rows: int = 8,
    interpret: Optional[bool] = None,
    smem_codes: Optional[bool] = None,
    smem_boxes: Optional[bool] = None,
):
    """Occlusion-only (any-hit) packet traversal for shadow rays: no
    payload carries, and a lane retires on its FIRST hit (its per-lane
    window collapses so it stops pulling subtrees into the packet).

    Returns occluded(o, d, t_max, active) -> (N,) bool.
    """
    nodes = jnp.asarray(wide.nodes)
    tris = jnp.asarray(wide.tris)
    stack_n = int(wide.max_stack)
    t_min = np.float32(t_min)
    lanes = 128
    r = block_rows
    if smem_codes is None:
        smem_codes = wide.codes_nbytes <= SMEM_CODES_MAX_BYTES
    boxes_nbytes = int(wide.nodes.shape[0]) * 48 * 4
    if smem_boxes is None:
        smem_boxes = bool(smem_codes) and (
            wide.codes_nbytes + boxes_nbytes <= SMEM_BOXES_MAX_BYTES)
    smem_boxes = bool(smem_boxes) and bool(smem_codes)
    codes = (jnp.asarray(wide.codes.reshape(-1))
             if smem_codes else None)  # 1-D: SMEM pads 2-D rows to 128 lanes
    if smem_boxes:
        nodes = jnp.asarray(
            np.ascontiguousarray(np.asarray(wide.nodes)[:, :48]).reshape(-1))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def kernel(nodes_ref, tris_ref, *refs):
        if smem_codes:
            codes_ref = refs[0]
            refs = refs[1:]
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
         occ_ref, stack_ref) = refs
        ox = ox_ref[:]
        oy = oy_ref[:]
        oz = oz_ref[:]
        dx = dx_ref[:]
        dy = dy_ref[:]
        dz = dz_ref[:]
        tmax0 = tmax_ref[:]

        def safe_inv(c):
            return jnp.where(
                jnp.abs(c) > 1e-30, 1.0 / c, jnp.where(c >= 0, _BIG, -_BIG)
            )

        ivx = safe_inv(dx)
        ivy = safe_inv(dy)
        ivz = safe_inv(dz)

        stack_ref[0] = jnp.int32(1)
        # occlusion mask carried as f32 (bool vectors don't legalize
        # through Mosaic's scf.if results)
        init = (jnp.int32(1), jnp.zeros((r, lanes), jnp.float32))

        def cond(c):
            return c[0] > 0

        def body(c):
            sp, occ = c
            code = stack_ref[sp - 1]
            sp = sp - 1
            is_leaf = code < 0
            # occluded lanes retire: empty window
            limit = jnp.where(occ > 0.5, jnp.float32(-np.inf), tmax0)

            def node_fn(occ):
                node_i = jnp.maximum(code - 1, 0)
                spn = sp
                if smem_boxes:
                    sc = [nodes_ref[node_i * 48 + c] for c in range(48)]
                    ccodes = [codes_ref[node_i * 8 + ci] for ci in range(8)]
                elif smem_codes:
                    nrow = nodes_ref[pl.ds(node_i, 1), :]
                    sc = [nrow[0, c] for c in range(48)]
                    ccodes = [codes_ref[node_i * 8 + ci] for ci in range(8)]
                else:
                    nrow = nodes_ref[pl.ds(node_i, 1), :]
                    sc = [nrow[0, c] for c in range(64)]
                for ci in range(8):
                    bmnx = sc[0 + ci]
                    bmny = sc[8 + ci]
                    bmnz = sc[16 + ci]
                    bmxx = sc[24 + ci]
                    bmxy = sc[32 + ci]
                    bmxz = sc[40 + ci]
                    tx0 = (bmnx - ox) * ivx
                    tx1 = (bmxx - ox) * ivx
                    ty0 = (bmny - oy) * ivy
                    ty1 = (bmxy - oy) * ivy
                    tz0 = (bmnz - oz) * ivz
                    tz1 = (bmxz - oz) * ivz
                    tnear = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.maximum(jnp.minimum(tz0, tz1), t_min),
                    )
                    tfar = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.minimum(jnp.maximum(tz0, tz1), limit),
                    )
                    if smem_codes:
                        code_c = ccodes[ci]
                        push = (code_c != 0) & jnp.any(tnear <= tfar)
                    else:
                        tag = sc[56 + ci]
                        ref = sc[48 + ci].astype(jnp.int32)
                        push = (tag > 0.5) & jnp.any(tnear <= tfar)
                        code_c = jnp.where(tag > 1.5, -(ref + 1), ref + 1)

                    @pl.when(push)
                    def _(spn=spn, code_c=code_c):
                        stack_ref[spn] = code_c

                    spn = spn + push.astype(jnp.int32)
                return (spn, occ)

            def leaf_fn(occ):
                trow = tris_ref[pl.ds(jnp.maximum(-code - 1, 0), 1), :]
                tsc = [trow[0, c] for c in range(128)]
                for k in range(8):
                    base = 16 * k
                    t0x = tsc[base + 0]
                    t0y = tsc[base + 1]
                    t0z = tsc[base + 2]
                    t1x = tsc[base + 3]
                    t1y = tsc[base + 4]
                    t1z = tsc[base + 5]
                    t2x = tsc[base + 6]
                    t2y = tsc[base + 7]
                    t2z = tsc[base + 8]
                    e1x, e1y, e1z = t1x - t0x, t1y - t0y, t1z - t0z
                    e2x, e2y, e2z = t2x - t0x, t2y - t0y, t2z - t0z
                    pvx = dy * e2z - dz * e2y
                    pvy = dz * e2x - dx * e2z
                    pvz = dx * e2y - dy * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                    tvx, tvy, tvz = ox - t0x, oy - t0y, oz - t0z
                    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                    hit_k = (
                        (jnp.abs(det) > 1e-12)
                        & (u >= 0.0)
                        & (v >= 0.0)
                        & (u + v <= 1.0)
                        & (t > t_min)
                        & (t < limit)
                    )
                    occ = jnp.maximum(occ, hit_k.astype(jnp.float32))
                return (sp, occ)

            return jax.lax.cond(is_leaf, leaf_fn, node_fn, occ)

        _, occ = jax.lax.while_loop(cond, body, init)
        occ_ref[:] = occ

    def occluded(o, d, t_max, active=None):
        from .intersect import _as_v3

        o = _as_v3(o)
        d = _as_v3(d)
        n = o[0].shape[0]
        rows_total = -(-n // lanes)
        rows_padded = -(-rows_total // r) * r
        grid = rows_padded // r
        pad = rows_padded * lanes - n

        tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
        if active is not None:
            tmax = jnp.where(active, tmax, np.float32(-np.inf))

        def plane(a, fill=0.0):
            return jnp.pad(a, (0, pad), constant_values=fill).reshape(
                rows_padded, lanes
            )

        blk = pl.BlockSpec((r, lanes), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        scene_args = [nodes, tris]
        scene_specs = [
            pl.BlockSpec(
                memory_space=pltpu.SMEM if smem_boxes else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        if smem_codes:
            scene_args.append(codes)
            scene_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        occ = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=scene_specs + [blk] * 7,
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((rows_padded, lanes), jnp.float32),
            scratch_shapes=[pltpu.SMEM((stack_n,), jnp.int32)],
            interpret=interpret,
        )(
            *scene_args,
            plane(o[0]), plane(o[1]), plane(o[2]),
            plane(d[0]), plane(d[1]), plane(d[2]),
            plane(tmax, fill=-np.inf),
        )
        out = occ.reshape(-1)[:n] > 0.5
        if active is not None:
            out = out & active
        return out

    return occluded

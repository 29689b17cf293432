"""Packet traversal of a two-level (TLAS over instanced BLAS) structure —
the in-kernel analog of the reference's instance-aware traceRayEXT
(ref main.cpp:514-538 TLAS; shaders/raygen.rgen:63).

Extends the single-level packet kernel (kernels/bvh_packet.py) with:
  - a parallel SMEM INSTANCE-CONTEXT stack: every pushed entry records
    which instance's object space it lives in (-1 = TLAS/world);
  - per-iteration ray re-derivation: the packet's rays are transformed by
    the popped entry's instance inverse transform (direction NOT
    renormalized, so hit t stays world-measure and best-t pruning works
    across instances);
  - TAG_INSTANCE TLAS leaves: popping one pushes the instance's BLAS root
    under that instance's context;
  - leaf payloads transform the winning triangle's vertices to WORLD space
    with the instance's forward transform (scalar-side), so shading math
    downstream (normals, barycentric position) is space-agnostic.

Scales to many instances: trace cost no longer multiplies by instance
count (the round-1 host-unrolled path did; accel/instances.py keeps it for
few-instance scenes and as the correctness oracle).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.tlas import TwoLevelBVH
from .bvh_packet import Payload, SMEM_BOXES_MAX_BYTES

INF = np.float32(np.inf)
_BIG = np.float32(1e30)
_IB = 1 << 27  # instance-code base: code = -(IB + inst_id + 1)


def _smem_tables(tl: TwoLevelBVH):
    """Flat SMEM tables for the merged two-level structure: box scalars
    (boxes[n*48+c] == nodes[n, c]), pre-decoded child stack codes (the
    in-kernel tag decode incl. TAG_INSTANCE -> -(IB+ref+1)), and the
    flattened instance rows (inst[i*128+c] == tl.inst[i, c]). With all
    three in scalar memory a two-level node pop does ZERO VMEM traffic
    (same recipe as bvh_packet.py smem_boxes; identical scalars, so
    results stay bitwise equal)."""
    nd = np.asarray(tl.nodes)
    ref = nd[:, 48:56].astype(np.int64)
    tag = nd[:, 56:64]
    codes = np.where(
        tag > 2.5, -(_IB + ref + 1),
        np.where(tag > 1.5, -(ref + 1),
                 np.where(tag > 0.5, ref + 1, 0)),
    ).astype(np.int32)
    boxes = np.ascontiguousarray(nd[:, :48]).reshape(-1)
    inst_flat = np.ascontiguousarray(np.asarray(tl.inst)).reshape(-1)
    return boxes, codes.reshape(-1), inst_flat


def _smem_fits(tl: TwoLevelBVH, n_extra_inst: int = 0) -> bool:
    """n_extra_inst: instance rows a caller will append BEFORE building
    (the fused kernel adds one identity world row) — dispatch gates must
    budget them or the kernel lands the tables in VMEM unbudgeted."""
    n_nodes = int(np.asarray(tl.nodes).shape[0])
    n_inst = int(np.asarray(tl.inst).shape[0]) + int(n_extra_inst)
    return (n_nodes * (48 + 8) * 4 + n_inst * 128 * 4
            <= SMEM_BOXES_MAX_BYTES)


def make_two_level_trace(
    tl: TwoLevelBVH,
    t_min: float,
    block_rows: int = 8,
    interpret: Optional[bool] = None,
    smem_nodes: Optional[bool] = None,
):
    """Build trace(o, d, t_max, active) -> Payload over (N,) SoA rays.

    smem_nodes: node boxes + pre-decoded child codes + instance rows in
    SMEM (see _smem_tables); None = auto (on when they fit the budget).
    """
    if smem_nodes is None:
        smem_nodes = _smem_fits(tl)
    if smem_nodes:
        boxes_np, codes_np, inst_np = _smem_tables(tl)
        nodes = jnp.asarray(boxes_np)
        codes = jnp.asarray(codes_np)
        inst = jnp.asarray(inst_np)
    else:
        nodes = jnp.asarray(tl.nodes)
        codes = None
        inst = jnp.asarray(tl.inst)
    tris = jnp.asarray(tl.tris)
    with_tex = tl.tris_aux is not None
    aux = jnp.asarray(tl.tris_aux) if with_tex else None
    n_pay = 19 if with_tex else 16
    stack_n = int(tl.max_stack)
    t_min = np.float32(t_min)
    lanes = 128
    r = block_rows

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def kernel(nodes_ref, tris_ref, inst_ref, *rest):
        if smem_nodes:
            codes_ref = rest[0]
            rest = rest[1:]
        if with_tex:
            aux_ref = rest[0]
            rest = rest[1:]
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         tmax_ref) = rest[:7]
        out_refs = rest[7:]
        stack_ref = out_refs[-2]
        istack_ref = out_refs[-1]
        outs = out_refs[:-2]
        wox, woy, woz = ox_ref[:], oy_ref[:], oz_ref[:]
        wdx, wdy, wdz = dx_ref[:], dy_ref[:], dz_ref[:]
        tmax = tmax_ref[:]

        def safe_inv(c):
            return jnp.where(
                jnp.abs(c) > 1e-30, 1.0 / c, jnp.where(c >= 0, _BIG, -_BIG)
            )

        zero = jnp.zeros((r, lanes), jnp.float32)
        stack_ref[0] = jnp.int32(1)   # TLAS root
        istack_ref[0] = jnp.int32(-1)  # world context

        init = (
            jnp.int32(1),
            jnp.full((r, lanes), INF),
            zero, zero,
        ) + (zero,) * n_pay

        def cond(c):
            return c[0] > 0

        def body(c):
            sp = c[0]
            bt = c[1]
            bu, bv = c[2], c[3]
            pay = tuple(c[4:])

            code = stack_ref[sp - 1]
            ictx = istack_ref[sp - 1]
            sp = sp - 1

            neg = -code - 1
            is_inst = (code < 0) & (neg >= _IB)
            is_leaf = (code < 0) & jnp.logical_not(is_inst)

            # ---- per-iteration ray context (world or instance space) ----
            if smem_nodes:
                ib = jnp.maximum(ictx, 0) * 128
                tf = [inst_ref[ib + cc] for cc in range(24)]
            else:
                irow = inst_ref[pl.ds(jnp.maximum(ictx, 0), 1), :]
                tf = [irow[0, cc] for cc in range(24)]
            in_world = ictx < 0
            ox = jnp.where(in_world, wox,
                           tf[0] * wox + tf[1] * woy + tf[2] * woz + tf[9])
            oy = jnp.where(in_world, woy,
                           tf[3] * wox + tf[4] * woy + tf[5] * woz + tf[10])
            oz = jnp.where(in_world, woz,
                           tf[6] * wox + tf[7] * woy + tf[8] * woz + tf[11])
            dx = jnp.where(in_world, wdx,
                           tf[0] * wdx + tf[1] * wdy + tf[2] * wdz)
            dy = jnp.where(in_world, wdy,
                           tf[3] * wdx + tf[4] * wdy + tf[5] * wdz)
            dz = jnp.where(in_world, wdz,
                           tf[6] * wdx + tf[7] * wdy + tf[8] * wdz)
            ivx, ivy, ivz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

            # popped-instance row (only meaningful when is_inst)
            iid = jnp.where(is_inst, neg - _IB, 0)
            if smem_nodes:
                blas_root = inst_ref[iid * 128 + 24].astype(jnp.int32)
            else:
                prow = inst_ref[pl.ds(iid, 1), :]
                blas_root = prow[0, 24].astype(jnp.int32)

            def inst_fn(args):
                """Instance leaf: push its BLAS root under its context."""
                bt, bu, bv, pay = args
                stack_ref[sp] = blas_root + 1
                istack_ref[sp] = iid
                return (sp + 1, bt, bu, bv) + pay

            def node_fn(args):
                bt, bu, bv, pay = args
                node_i = jnp.maximum(code - 1, 0)
                limit = jnp.minimum(bt, tmax)
                if smem_nodes:
                    sc = [nodes_ref[node_i * 48 + cc] for cc in range(48)]
                    ccodes = [codes_ref[node_i * 8 + ci] for ci in range(8)]
                else:
                    nrow = nodes_ref[pl.ds(node_i, 1), :]
                    sc = [nrow[0, cc] for cc in range(64)]
                keys = []
                codes = []
                for ci in range(8):
                    tx0 = (sc[0 + ci] - ox) * ivx
                    tx1 = (sc[24 + ci] - ox) * ivx
                    ty0 = (sc[8 + ci] - oy) * ivy
                    ty1 = (sc[32 + ci] - oy) * ivy
                    tz0 = (sc[16 + ci] - oz) * ivz
                    tz1 = (sc[40 + ci] - oz) * ivz
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
                    # any-lane-hit derived from the min key (hit lanes
                    # give finite tnear) — one cross-lane reduction per
                    # child instead of two, bitwise-identical
                    key = jnp.min(jnp.where(hit, tnear, jnp.float32(np.inf)))
                    any_hit = key < INF
                    if smem_nodes:
                        child0 = ccodes[ci]
                        push = (child0 != 0) & any_hit
                        child = child0
                    else:
                        tag = sc[56 + ci]
                        ref = sc[48 + ci].astype(jnp.int32)
                        push = (tag > 0.5) & any_hit
                        child = jnp.where(
                            tag > 2.5, -(_IB + ref + 1),
                            jnp.where(tag > 1.5, -(ref + 1), ref + 1),
                        )
                    keys.append(jnp.where(push, key, jnp.float32(-np.inf)))
                    codes.append(jnp.where(push, child, jnp.int32(0)))

                net = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3),
                       (4, 6), (5, 7), (1, 2), (5, 6), (0, 4), (3, 7),
                       (1, 5), (2, 6), (1, 4), (3, 6), (2, 4), (3, 5),
                       (3, 4)]
                for a, b in net:
                    swap = keys[a] < keys[b]
                    ka = jnp.where(swap, keys[b], keys[a])
                    kb = jnp.where(swap, keys[a], keys[b])
                    ca = jnp.where(swap, codes[b], codes[a])
                    cb = jnp.where(swap, codes[a], codes[b])
                    keys[a], keys[b] = ka, kb
                    codes[a], codes[b] = ca, cb

                spn = sp
                for ci in range(8):
                    code_c = codes[ci]
                    do_push = code_c != 0

                    @pl.when(do_push)
                    def _(spn=spn, code_c=code_c):
                        stack_ref[spn] = code_c
                        istack_ref[spn] = ictx

                    spn = spn + do_push.astype(jnp.int32)
                return (spn, bt, bu, bv) + pay

            def leaf_fn(args):
                bt, bu, bv, pay = args
                pay = list(pay)
                trow = tris_ref[pl.ds(jnp.maximum(neg, 0), 1), :]
                tsc = [trow[0, cc] for cc in range(128)]
                if with_tex:
                    arow = aux_ref[pl.ds(jnp.maximum(neg, 0), 1), :]
                    asc = [arow[0, cc] for cc in range(128)]
                    # instance base into the flattened merged texture pool
                    # (tri leaves only pop under a BLAS context, so the
                    # world-context select is belt-and-braces)
                    texb_raw = (inst_ref[ib + 25] if smem_nodes
                                else irow[0, 25])
                    texb = jnp.where(in_world, jnp.float32(0.0), texb_raw)
                # forward transform of the CURRENT instance (identity-like
                # select for world context)
                fw = [jnp.where(in_world,
                                jnp.float32(1.0 if cc in (0, 4, 8) else 0.0),
                                tf[12 + cc]) for cc in range(12)]
                for k in range(8):
                    base = 16 * k
                    t0x, t0y, t0z = tsc[base], tsc[base + 1], tsc[base + 2]
                    t1x, t1y, t1z = tsc[base + 3], tsc[base + 4], tsc[base + 5]
                    t2x, t2y, t2z = tsc[base + 6], tsc[base + 7], tsc[base + 8]
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
                        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                        & (t > t_min) & (t < tmax) & (t < bt)
                    )
                    bt = jnp.where(ok, t, bt)
                    bu = jnp.where(ok, u, bu)
                    bv = jnp.where(ok, v, bv)
                    # world-space vertices via the forward transform
                    wv = []
                    for vx, vy, vz in ((t0x, t0y, t0z), (t1x, t1y, t1z),
                                       (t2x, t2y, t2z)):
                        wv.extend((
                            fw[0] * vx + fw[1] * vy + fw[2] * vz + fw[9],
                            fw[3] * vx + fw[4] * vy + fw[5] * vz + fw[10],
                            fw[6] * vx + fw[7] * vy + fw[8] * vz + fw[11],
                        ))
                    vals = tuple(wv) + (
                        tsc[base + 9], tsc[base + 10], tsc[base + 11],
                        tsc[base + 12], tsc[base + 13], tsc[base + 14],
                        tsc[base + 15],
                    )
                    if with_tex:
                        # interpolate the per-corner vt with the SAME
                        # barycentrics as the hit (bvh_packet.py leaf_fn);
                        # texid+1 shifts by the instance's texture base
                        # (0 stays 0 = untextured)
                        wb = 1.0 - u - v
                        tu = (asc[base + 0] * wb + asc[base + 2] * u
                              + asc[base + 4] * v)
                        tw = (asc[base + 1] * wb + asc[base + 3] * u
                              + asc[base + 5] * v)
                        a6 = asc[base + 6]
                        a6w = jnp.where(a6 > 0, a6 + texb, jnp.float32(0.0))
                        vals = vals + (tu, tw, a6w)
                    pay = [
                        jnp.where(ok, sv + zero, pv)
                        for sv, pv in zip(vals, pay)
                    ]
                return (sp, bt, bu, bv) + tuple(pay)

            def not_inst(args):
                return jax.lax.cond(is_leaf, leaf_fn, node_fn, args)

            return jax.lax.cond(is_inst, inst_fn, not_inst,
                                (bt, bu, bv, pay))

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

        args = [
            plane(o[0]), plane(o[1]), plane(o[2]),
            plane(d[0]), plane(d[1]), plane(d[2]),
            plane(tmax, fill=-np.inf),
        ]

        blk = pl.BlockSpec((r, lanes), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        if smem_nodes:
            scene_args = [nodes, tris, inst, codes]
            scene_specs = [smem, vmem, smem, smem]
        else:
            scene_args = [nodes, tris, inst]
            scene_specs = [vmem, vmem, vmem]
        if with_tex:
            scene_args.append(aux)
            scene_specs.append(vmem)
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=scene_specs + [blk] * 7,
            out_specs=[blk] * n_out,
            out_shape=[
                jax.ShapeDtypeStruct((rows_padded, lanes), jnp.float32)
            ] * n_out,
            scratch_shapes=[
                pltpu.SMEM((stack_n,), jnp.int32),
                pltpu.SMEM((stack_n,), jnp.int32),
            ],
            interpret=interpret,
        )(*scene_args, *args)

        flat = lambda a: a.reshape(-1)[:n]  # noqa: E731
        o19 = [flat(a) for a in outs]
        bt = o19[0]
        if active is not None:
            bt = jnp.where(active, bt, INF)
        return Payload(
            t=bt, u=o19[1], v=o19[2],
            p0=(o19[3], o19[4], o19[5]),
            p1=(o19[6], o19[7], o19[8]),
            p2=(o19[9], o19[10], o19[11]),
            albedo=(o19[12], o19[13], o19[14]),
            emission=(o19[15], o19[16], o19[17]),
            mtype=o19[18],
            **(
                {
                    "texu": o19[19], "texv": o19[20],
                    "texid": o19[21].astype(jnp.int32) - 1,
                }
                if with_tex else {}
            ),
        )

    return trace


def make_two_level_occlusion(
    tl: TwoLevelBVH,
    t_min: float,
    block_rows: int = 8,
    interpret: Optional[bool] = None,
    smem_nodes: Optional[bool] = None,
):
    """Occlusion-only (any-hit) two-level traversal for instanced NEE
    shadow rays: no payload carries, a lane retires on its FIRST hit
    (empty per-lane window), same instance-context machinery as the full
    trace (bvh_packet.py make_packet_occlusion, instanced).

    Returns occluded(o, d, t_max, active) -> (N,) bool.
    """
    if smem_nodes is None:
        smem_nodes = _smem_fits(tl)
    if smem_nodes:
        boxes_np, codes_np, inst_np = _smem_tables(tl)
        nodes = jnp.asarray(boxes_np)
        codes = jnp.asarray(codes_np)
        inst = jnp.asarray(inst_np)
    else:
        nodes = jnp.asarray(tl.nodes)
        codes = None
        inst = jnp.asarray(tl.inst)
    tris = jnp.asarray(tl.tris)
    stack_n = int(tl.max_stack)
    t_min = np.float32(t_min)
    lanes = 128
    r = block_rows

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def kernel(nodes_ref, tris_ref, inst_ref, *rest):
        if smem_nodes:
            codes_ref = rest[0]
            rest = rest[1:]
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
         occ_ref, stack_ref, istack_ref) = rest
        wox, woy, woz = ox_ref[:], oy_ref[:], oz_ref[:]
        wdx, wdy, wdz = dx_ref[:], dy_ref[:], dz_ref[:]
        tmax0 = tmax_ref[:]

        def safe_inv(c):
            return jnp.where(
                jnp.abs(c) > 1e-30, 1.0 / c, jnp.where(c >= 0, _BIG, -_BIG)
            )

        stack_ref[0] = jnp.int32(1)   # TLAS root
        istack_ref[0] = jnp.int32(-1)  # world context
        init = (jnp.int32(1), jnp.zeros((r, lanes), jnp.float32))

        def cond(c):
            return c[0] > 0

        def body(c):
            sp, occ = c
            code = stack_ref[sp - 1]
            ictx = istack_ref[sp - 1]
            sp = sp - 1

            neg = -code - 1
            is_inst = (code < 0) & (neg >= _IB)
            is_leaf = (code < 0) & jnp.logical_not(is_inst)

            # occluded lanes retire: empty window
            limit0 = jnp.where(occ > 0.5, jnp.float32(-np.inf), tmax0)

            if smem_nodes:
                ib = jnp.maximum(ictx, 0) * 128
                tf = [inst_ref[ib + cc] for cc in range(12)]
            else:
                irow = inst_ref[pl.ds(jnp.maximum(ictx, 0), 1), :]
                tf = [irow[0, cc] for cc in range(12)]
            in_world = ictx < 0
            ox = jnp.where(in_world, wox,
                           tf[0] * wox + tf[1] * woy + tf[2] * woz + tf[9])
            oy = jnp.where(in_world, woy,
                           tf[3] * wox + tf[4] * woy + tf[5] * woz + tf[10])
            oz = jnp.where(in_world, woz,
                           tf[6] * wox + tf[7] * woy + tf[8] * woz + tf[11])
            dx = jnp.where(in_world, wdx,
                           tf[0] * wdx + tf[1] * wdy + tf[2] * wdz)
            dy = jnp.where(in_world, wdy,
                           tf[3] * wdx + tf[4] * wdy + tf[5] * wdz)
            dz = jnp.where(in_world, wdz,
                           tf[6] * wdx + tf[7] * wdy + tf[8] * wdz)
            ivx, ivy, ivz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

            iid = jnp.where(is_inst, neg - _IB, 0)
            if smem_nodes:
                blas_root = inst_ref[iid * 128 + 24].astype(jnp.int32)
            else:
                prow = inst_ref[pl.ds(iid, 1), :]
                blas_root = prow[0, 24].astype(jnp.int32)

            def inst_fn(occ):
                stack_ref[sp] = blas_root + 1
                istack_ref[sp] = iid
                return (sp + 1, occ)

            def node_fn(occ):
                node_i = jnp.maximum(code - 1, 0)
                if smem_nodes:
                    sc = [nodes_ref[node_i * 48 + cc] for cc in range(48)]
                    ccodes = [codes_ref[node_i * 8 + ci] for ci in range(8)]
                else:
                    nrow = nodes_ref[pl.ds(node_i, 1), :]
                    sc = [nrow[0, cc] for cc in range(64)]
                spn = sp
                for ci in range(8):
                    tx0 = (sc[0 + ci] - ox) * ivx
                    tx1 = (sc[24 + ci] - ox) * ivx
                    ty0 = (sc[8 + ci] - oy) * ivy
                    ty1 = (sc[32 + ci] - oy) * ivy
                    tz0 = (sc[16 + ci] - oz) * ivz
                    tz1 = (sc[40 + ci] - oz) * ivz
                    tnear = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.maximum(jnp.minimum(tz0, tz1), t_min),
                    )
                    tfar = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.minimum(jnp.maximum(tz0, tz1), limit0),
                    )
                    if smem_nodes:
                        code_c = ccodes[ci]
                        push = (code_c != 0) & jnp.any(tnear <= tfar)
                    else:
                        tag = sc[56 + ci]
                        ref = sc[48 + ci].astype(jnp.int32)
                        push = (tag > 0.5) & jnp.any(tnear <= tfar)
                        code_c = jnp.where(
                            tag > 2.5, -(_IB + ref + 1),
                            jnp.where(tag > 1.5, -(ref + 1), ref + 1),
                        )

                    @pl.when(push)
                    def _(spn=spn, code_c=code_c):
                        stack_ref[spn] = code_c
                        istack_ref[spn] = ictx

                    spn = spn + push.astype(jnp.int32)
                return (spn, occ)

            def leaf_fn(occ):
                trow = tris_ref[pl.ds(jnp.maximum(neg, 0), 1), :]
                tsc = [trow[0, cc] for cc in range(128)]
                for k in range(8):
                    base = 16 * k
                    t0x, t0y, t0z = tsc[base], tsc[base + 1], tsc[base + 2]
                    t1x, t1y, t1z = (tsc[base + 3], tsc[base + 4],
                                     tsc[base + 5])
                    t2x, t2y, t2z = (tsc[base + 6], tsc[base + 7],
                                     tsc[base + 8])
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
                        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                        & (t > t_min) & (t < limit0)
                    )
                    occ = jnp.maximum(occ, hit_k.astype(jnp.float32))
                return (sp, occ)

            def not_inst(occ):
                return jax.lax.cond(is_leaf, leaf_fn, node_fn, occ)

            return jax.lax.cond(is_inst, inst_fn, not_inst, occ)

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

        args = [
            plane(o[0]), plane(o[1]), plane(o[2]),
            plane(d[0]), plane(d[1]), plane(d[2]),
            plane(tmax, fill=-np.inf),
        ]
        blk = pl.BlockSpec((r, lanes), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        if smem_nodes:
            scene_args = [nodes, tris, inst, codes]
            scene_specs = [smem, vmem, smem, smem]
        else:
            scene_args = [nodes, tris, inst]
            scene_specs = [vmem, vmem, vmem]
        occ = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=scene_specs + [blk] * 7,
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((rows_padded, lanes), jnp.float32),
            scratch_shapes=[
                pltpu.SMEM((stack_n,), jnp.int32),
                pltpu.SMEM((stack_n,), jnp.int32),
            ],
            interpret=interpret,
        )(*scene_args, *args)
        return occ.reshape(-1)[:n] > 0.5

    return occluded

"""Pallas packet traversal v2 — latency-pipelined multi-packet kernel.

Replaces the v1 single-packet loop (kernels/bvh_packet.py) for the hot trace
path after profiling showed v1 is LATENCY-bound, not VPU-bound: one while
iteration costs ~750ns regardless of vector width (vs ~100-300ns of vector
work), because each pop is a serial chain of scalar pop -> dynamic row load
-> 16 vector->scalar reductions -> conditional pushes, and the next pop
depends on it (benchmarks/probe_carry.py, probe_iter_cost.py).

v2 breaks the chain three ways:
  1. P independent 1024-ray packets traverse in ONE while loop (interleaved
     straight-line bodies, no lax.cond) so their serial chains pipeline and
     the VPU works in the latency shadow of the scalar unit.
  2. Separate LEAF QUEUE per packet: node pops (slab tests) and leaf pops
     (Moller-Trumbore) are distinct phases of every iteration, both
     branch-free; iterations ~ max(node_pops, leaf_pops) instead of the sum,
     and leaf codes queue at push time (which is also where an HBM DMA
     prefetch can be issued — the streamed variant, stream_tris=True, keeps
     triangle rows in HBM/ANY and double-buffers them into a VMEM ring,
     lifting the VMEM residency cap from ~150k to HBM-sized scenes).
  3. Push masks from 4 packed-sum reductions (2 children's hit counts per
     int32) instead of 8 any() + 8 min(); traversal order from a CENTER-RAY
     scalar slab test (pure scalar ALU, no reduction; validated equal to
     packet-min ordering by benchmarks/sim_packets.py: 0.206 vs 0.211
     pops/ray on a real GI wave).

Semantics identical to v1 (same Payload, same closest-hit rules, ref
shaders/raygen.rgen:63-75); equivalence pinned by tests/test_bvh_packet2.py
against the jnp brute oracle.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.wide import WideBVH
from .bvh_packet import Payload

INF = np.float32(np.inf)
_BIG = np.float32(1e30)
ROWS = 8          # rows per packet (8 x 128 = 1024 rays), the min f32 tile
N_PAY = 16        # payload planes beyond (t, u, v)


def make_packet_trace2(
    wide: WideBVH,
    t_min: float,
    n_packets: int = 1,
    leaf_q: int = 64,
    payload_in_carry: bool = True,
    interpret: Optional[bool] = None,
    stream_tris: bool = False,
    smem_codes: Optional[bool] = None,
):
    """Build trace(o, d, t_max, active) -> Payload over (N,) SoA rays.

    n_packets: independent 1024-ray packets interleaved per grid program.
    leaf_q: per-packet leaf-queue capacity (power of two). On a full queue
        the leaf code is spilled back to the node stack (handled there).
    stream_tris: keep triangle rows in HBM(ANY) and DMA each popped leaf row
        into a VMEM ring slot at PUSH time (prefetch), waiting on the
        semaphore only at consumption — hides HBM latency behind the queue.
    """
    nodes = jnp.asarray(wide.nodes)
    tris = jnp.asarray(wide.tris)
    from .bvh_packet import SMEM_CODES_MAX_BYTES

    if smem_codes is None:
        smem_codes = wide.codes_nbytes <= SMEM_CODES_MAX_BYTES
    codes_tbl = (jnp.asarray(wide.codes.reshape(-1))
                 if smem_codes else None)  # 1-D: SMEM pads 2-D rows
    with_tex = wide.tris_aux is not None
    aux = jnp.asarray(wide.tris_aux) if with_tex else None
    n_pay = 19 if with_tex else N_PAY
    stack_n = int(wide.max_stack) + leaf_q  # slack for leaf spill
    t_min = np.float32(t_min)
    lanes = 128
    P = n_packets
    R = ROWS
    assert leaf_q & (leaf_q - 1) == 0, "leaf_q must be a power of two"
    qmask = leaf_q - 1

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n_out = 3 + n_pay

    def kernel(nodes_ref, tris_ref, *refs):
        if smem_codes:
            codes_ref = refs[0]
            refs = refs[1:]
        if with_tex:
            aux_ref = refs[0]
            refs = refs[1:]
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         tmax_ref) = refs[:7]
        refs = refs[7:]
        out_refs = refs[:n_out]
        stacks_ref = refs[n_out]       # SMEM (P, stack_n)
        lq_ref = refs[n_out + 1]       # SMEM (P, leaf_q) leaf row codes
        if stream_tris:
            ring_ref = refs[n_out + 2]   # VMEM (P, leaf_q, 128) ring slots
            sems = refs[n_out + 3]       # DMA sems (P, leaf_q)
            if with_tex:
                aring_ref = refs[n_out + 4]  # aux ring (P, leaf_q, 128)
                asems = refs[n_out + 5]      # aux DMA sems (P, leaf_q)

        def start_leaf_dma(p, slot, lrow):
            """HBM->VMEM prefetch of one leaf's tri row (+ aux row)."""
            pltpu.make_async_copy(
                tris_ref.at[pl.ds(lrow, 1), :],
                ring_ref.at[p, pl.ds(slot, 1), :],
                sems.at[p, slot],
            ).start()
            if with_tex:
                pltpu.make_async_copy(
                    aux_ref.at[pl.ds(lrow, 1), :],
                    aring_ref.at[p, pl.ds(slot, 1), :],
                    asems.at[p, slot],
                ).start()

        if not payload_in_carry:
            # zero payload outputs (only leaf hits overwrite them)
            for i in range(3, n_out):
                out_refs[i][:] = jnp.zeros((P * R, lanes), jnp.float32)

        def safe_inv(c):
            return jnp.where(jnp.abs(c) > 1e-30, 1.0 / c,
                             jnp.where(c >= 0, _BIG, -_BIG))

        # per-packet ray registers and center-ray scalars (hoisted)
        pk = []
        for p in range(P):
            sl = slice(p * R, (p + 1) * R)
            ox, oy, oz = ox_ref[sl, :], oy_ref[sl, :], oz_ref[sl, :]
            dx, dy, dz = dx_ref[sl, :], dy_ref[sl, :], dz_ref[sl, :]
            tmax = tmax_ref[sl, :]
            ivx, ivy, ivz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
            # center-ray scalars for ordered pushes (row 4, lane 64)
            cox = ox_ref[p * R + 4, 64]
            coy = oy_ref[p * R + 4, 64]
            coz = oz_ref[p * R + 4, 64]
            civx = safe_inv(dx_ref[p * R + 4, 64])
            civy = safe_inv(dy_ref[p * R + 4, 64])
            civz = safe_inv(dz_ref[p * R + 4, 64])
            pk.append((ox, oy, oz, dx, dy, dz, ivx, ivy, ivz, tmax,
                       cox, coy, coz, civx, civy, civz))
            stacks_ref[p, 0] = jnp.int32(1)  # root

        zero = jnp.zeros((R, lanes), jnp.float32)
        i32 = jnp.int32

        # carry: per-packet (sp, lhead, ltail, bt, bu, bv [, 16 payload])
        S = 6 + (n_pay if payload_in_carry else 0)
        init = ()
        for p in range(P):
            init += (i32(1), i32(0), i32(0),
                     jnp.full((R, lanes), INF), zero, zero)
            if payload_in_carry:
                init += (zero,) * n_pay

        def cond(c):
            work = i32(0)
            for p in range(P):
                sp, lh, lt = c[S * p], c[S * p + 1], c[S * p + 2]
                work = work + sp + (lt - lh)
            return work > 0

        def body(c):
            new = list(c)
            for p in range(P):
                (ox, oy, oz, dx, dy, dz, ivx, ivy, ivz, tmax,
                 cox, coy, coz, civx, civy, civz) = pk[p]
                sp = c[S * p]
                lh = c[S * p + 1]
                lt = c[S * p + 2]
                bt = c[S * p + 3]
                bu = c[S * p + 4]
                bv = c[S * p + 5]
                pay_carry = (list(c[S * p + 6:S * p + 6 + n_pay])
                             if payload_in_carry else None)

                # ---------------- node phase (branch-free) ----------------
                do_node = sp > 0
                sp_idx = jnp.maximum(sp - 1, 0)
                raw = stacks_ref[p, sp_idx]
                code = jnp.where(do_node, raw, i32(0))
                sp = sp_idx
                # a spilled leaf code may surface here: re-enqueue it
                is_spilled_leaf = code < 0
                node_i = jnp.where(is_spilled_leaf | (code == 0),
                                   i32(0), code - 1)
                nrow = nodes_ref[pl.ds(node_i, 1), :]
                limit = jnp.minimum(bt, tmax)

                keys = []
                codes = []
                pk_counts = []
                hit_pair = None
                # bunched scalar extraction before vector math (1.8x;
                # see benchmarks/probe_carry.py)
                if smem_codes:
                    nsc = [nrow[0, c2] for c2 in range(48)]
                    nccodes = [codes_ref[node_i * 8 + ci] for ci in range(8)]
                else:
                    nsc = [nrow[0, c2] for c2 in range(64)]
                for ci in range(8):
                    bmnx = nsc[0 + ci]
                    bmny = nsc[8 + ci]
                    bmnz = nsc[16 + ci]
                    bmxx = nsc[24 + ci]
                    bmxy = nsc[32 + ci]
                    bmxz = nsc[40 + ci]
                    tx0 = (bmnx - ox) * ivx
                    tx1 = (bmxx - ox) * ivx
                    ty0 = (bmny - oy) * ivy
                    ty1 = (bmxy - oy) * ivy
                    tz0 = (bmnz - oz) * ivz
                    tz1 = (bmxz - oz) * ivz
                    tnear = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.maximum(jnp.minimum(tz0, tz1), t_min))
                    tfar = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.minimum(jnp.maximum(tz0, tz1), limit))
                    hit = (tnear <= tfar).astype(jnp.int32)
                    # pack two children's hit counts per int32 sum
                    if ci % 2 == 0:
                        hit_pair = hit
                    else:
                        pk_counts.append(jnp.sum(hit_pair + hit * 65536))
                        hit_pair = None
                    # scalar center-ray ordering key (no reduction)
                    ctx0 = (bmnx - cox) * civx
                    ctx1 = (bmxx - cox) * civx
                    cty0 = (bmny - coy) * civy
                    cty1 = (bmxy - coy) * civy
                    ctz0 = (bmnz - coz) * civz
                    ctz1 = (bmxz - coz) * civz
                    ckey = jnp.maximum(
                        jnp.maximum(jnp.minimum(ctx0, ctx1),
                                    jnp.minimum(cty0, cty1)),
                        jnp.maximum(jnp.minimum(ctz0, ctz1), t_min))
                    keys.append(ckey)
                    if smem_codes:
                        codes.append(nccodes[ci])
                    else:
                        tag = nsc[56 + ci]
                        ref = nsc[48 + ci].astype(i32)
                        codes.append(jnp.where(
                            tag > 0.5,
                            jnp.where(tag > 1.5, -(ref + 1), ref + 1),
                            i32(0),
                        ))

                # decode packed counts -> per-child push flags
                push = []
                codes_s = []
                for ci in range(8):
                    cnt = pk_counts[ci // 2]
                    c_ci = (cnt & 0xFFFF) if ci % 2 == 0 else (cnt >> 16)
                    code_c = codes[ci]
                    ok = do_node & jnp.logical_not(is_spilled_leaf) \
                        & (code_c != 0) & (c_ci > 0)
                    push.append(ok)
                    codes_s.append(jnp.where(ok, code_c, i32(0)))

                # descending-key network: far pushed first, near popped first
                keys = [jnp.where(pu, k, jnp.float32(-np.inf))
                        for k, pu in zip(keys, push)]
                net = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3),
                       (4, 6), (5, 7), (1, 2), (5, 6), (0, 4), (3, 7),
                       (1, 5), (2, 6), (1, 4), (3, 6), (2, 4), (3, 5),
                       (3, 4)]
                for a, b in net:
                    swap = keys[a] < keys[b]
                    ka = jnp.where(swap, keys[b], keys[a])
                    kb = jnp.where(swap, keys[a], keys[b])
                    ca = jnp.where(swap, codes_s[b], codes_s[a])
                    cb = jnp.where(swap, codes_s[a], codes_s[b])
                    keys[a], keys[b] = ka, kb
                    codes_s[a], codes_s[b] = ca, cb

                # re-enqueue a spilled leaf surfaced by the node pop
                lq_has_room = (lt - lh) < leaf_q

                @pl.when(is_spilled_leaf & lq_has_room)
                def _(p=p, lt=lt, code=code):
                    lq_ref[p, lt & qmask] = -code - 1
                    if stream_tris:
                        start_leaf_dma(p, lt & qmask, -code - 1)

                @pl.when(is_spilled_leaf & jnp.logical_not(lq_has_room))
                def _(p=p, sp=sp, code=code):
                    stacks_ref[p, sp] = code  # put it back; retry later

                lt = lt + (is_spilled_leaf & lq_has_room).astype(i32)
                sp = sp + (is_spilled_leaf
                           & jnp.logical_not(lq_has_room)).astype(i32)

                # pushes: internal codes -> stack; leaf codes -> leaf queue
                # (spill to stack when the queue is full)
                for ci in range(8):
                    code_c = codes_s[ci]
                    is_push = code_c != 0
                    is_leaf_c = code_c < 0
                    room = (lt - lh) < leaf_q
                    to_q = is_push & is_leaf_c & room
                    to_stack = is_push & (jnp.logical_not(is_leaf_c)
                                          | jnp.logical_not(room))

                    @pl.when(to_q)
                    def _(p=p, lt=lt, code_c=code_c):
                        lq_ref[p, lt & qmask] = -code_c - 1

                    @pl.when(to_stack)
                    def _(p=p, sp=sp, code_c=code_c):
                        stacks_ref[p, sp] = code_c

                    if stream_tris:
                        @pl.when(to_q)
                        def _(p=p, lt=lt, code_c=code_c):
                            start_leaf_dma(p, lt & qmask, -code_c - 1)

                    lt = lt + to_q.astype(i32)
                    sp = sp + to_stack.astype(i32)

                # ---------------- leaf phase (branch-free) ----------------
                do_leaf = lt > lh
                lslot = lh & qmask
                lrow_raw = lq_ref[p, lslot]
                lrow = jnp.where(do_leaf, lrow_raw, i32(0))
                lh = lh + do_leaf.astype(i32)
                if stream_tris:
                    @pl.when(do_leaf)
                    def _(p=p, lslot=lslot, lrow=lrow):
                        pltpu.make_async_copy(
                            tris_ref.at[pl.ds(lrow, 1), :],
                            ring_ref.at[p, pl.ds(lslot, 1), :],
                            sems.at[p, lslot],
                        ).wait()
                        if with_tex:
                            pltpu.make_async_copy(
                                aux_ref.at[pl.ds(lrow, 1), :],
                                aring_ref.at[p, pl.ds(lslot, 1), :],
                                asems.at[p, lslot],
                            ).wait()
                    trow = ring_ref[p, pl.ds(lslot, 1), :]
                    if with_tex:
                        arow = aring_ref[p, pl.ds(lslot, 1), :]
                else:
                    trow = tris_ref[pl.ds(lrow, 1), :]
                    if with_tex:
                        arow = aux_ref[pl.ds(lrow, 1), :]

                gate = do_leaf  # scalar; False lanes produce no updates
                pay_new = None
                tsc = [trow[0, c2] for c2 in range(128)]
                if with_tex:
                    asc = [arow[0, c2] for c2 in range(128)]
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
                        gate
                        & (jnp.abs(det) > 1e-12)
                        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                        & (t > t_min) & (t < tmax) & (t < bt)
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
                        # interpolated vt + texid (same barycentrics as
                        # the hit position; see bvh_packet.py)
                        wbar = 1.0 - u - v
                        tu = (asc[base + 0] * wbar + asc[base + 2] * u
                              + asc[base + 4] * v)
                        tw = (asc[base + 1] * wbar + asc[base + 3] * u
                              + asc[base + 5] * v)
                        vals = vals + (tu, tw, asc[base + 6])
                    if pay_new is None:
                        pay_new = [(ok, jnp.where(ok, sv + zero, 0.0))
                                   for sv in vals]
                    else:
                        pay_new = [
                            (okp | ok, jnp.where(ok, sv + zero, pv))
                            for (okp, pv), sv in zip(pay_new, vals)
                        ]

                sl = slice(p * R, (p + 1) * R)
                if payload_in_carry:
                    for i in range(n_pay):
                        okp, pv = pay_new[i]
                        pay_carry[i] = jnp.where(okp, pv, pay_carry[i])
                else:
                    # single read-modify-write of the payload refs per pop
                    for i in range(n_pay):
                        okp, pv = pay_new[i]
                        cur = out_refs[3 + i][sl, :]
                        out_refs[3 + i][sl, :] = jnp.where(okp, pv, cur)

                new[S * p] = sp
                new[S * p + 1] = lh
                new[S * p + 2] = lt
                new[S * p + 3] = bt
                new[S * p + 4] = bu
                new[S * p + 5] = bv
                if payload_in_carry:
                    new[S * p + 6:S * p + 6 + n_pay] = pay_carry
            return tuple(new)

        final = jax.lax.while_loop(cond, body, init)
        for p in range(P):
            sl = slice(p * R, (p + 1) * R)
            out_refs[0][sl, :] = final[S * p + 3]
            out_refs[1][sl, :] = final[S * p + 4]
            out_refs[2][sl, :] = final[S * p + 5]
            if payload_in_carry:
                for i in range(n_pay):
                    out_refs[3 + i][sl, :] = final[S * p + 6 + i]

    def trace(o, d, t_max, active=None) -> Payload:
        from .intersect import _as_v3

        o = _as_v3(o)
        d = _as_v3(d)
        n = o[0].shape[0]
        block = P * R
        rows_total = -(-n // lanes)
        rows_padded = -(-rows_total // block) * block
        grid = rows_padded // block
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

        blk = pl.BlockSpec((block, lanes), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        scratch = [
            pltpu.SMEM((P, stack_n), jnp.int32),
            pltpu.SMEM((P, leaf_q), jnp.int32),
        ]
        tris_space = pl.ANY if stream_tris else pltpu.VMEM
        if stream_tris:
            scratch += [
                pltpu.VMEM((P, leaf_q, lanes), jnp.float32),
                pltpu.SemaphoreType.DMA((P, leaf_q)),
            ]
            if with_tex:
                scratch += [
                    pltpu.VMEM((P, leaf_q, lanes), jnp.float32),
                    pltpu.SemaphoreType.DMA((P, leaf_q)),
                ]
        scene_args = [nodes, tris]
        scene_specs = [pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=tris_space)]
        if smem_codes:
            scene_args.append(codes_tbl)
            scene_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        if with_tex:
            scene_args.append(aux)
            scene_specs.append(pl.BlockSpec(memory_space=tris_space))
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=scene_specs + [blk] * 7,
            out_specs=[blk] * n_out,
            out_shape=[
                jax.ShapeDtypeStruct((rows_padded, lanes), jnp.float32)
            ] * n_out,
            scratch_shapes=scratch,
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
            t=bt, u=o19[1], v=o19[2],
            p0=(o19[3], o19[4], o19[5]),
            p1=(o19[6], o19[7], o19[8]),
            p2=(o19[9], o19[10], o19[11]),
            albedo=(o19[12], o19[13], o19[14]),
            emission=(o19[15], o19[16], o19[17]),
            mtype=o19[18],
            **tex_kw,
        )

    return trace

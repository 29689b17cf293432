"""Packet-kernel cost anatomy on a REAL dumped wave (profile_gi.py --dump).

Measures the shipping payload kernel, then a stripped (t,u,v)-only kernel
with an exact ITERATION COUNTER and ablations, so per-iteration cost and the
expensive sub-parts are known, not guessed:

  payload    — shipping 19-output packet trace
  stripped   — same traversal, (t,u,v,cnt) outputs only
  no_sortnet — stripped minus the 19-comparator ordered-push network
  no_leaf    — stripped with leaf triangle tests removed (traversal changes:
               no best-t pruning — iteration count rises; still informative
               as 'node iterations are this expensive')

Usage: python -u benchmarks/probe_carry.py --wave /tmp/gi_wave.npz
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def timeit(fn, *args, reps=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def make_stripped_trace(wide, t_min, block_rows=8,
                        no_sortnet=False, no_leaf=False,
                        packed_push=False, push_all=False,
                        center_key=False):
    """Packet trace with NO payload: outputs (t, u, v, iter_count)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nodes = jnp.asarray(wide.nodes)
    tris = jnp.asarray(wide.tris)
    stack_n = int(wide.max_stack)
    t_min = np.float32(t_min)
    lanes, r = 128, block_rows
    _BIG = np.float32(1e30)
    INF = np.float32(np.inf)

    def kernel(nodes_ref, tris_ref, ox_ref, oy_ref, oz_ref,
               dx_ref, dy_ref, dz_ref, tmax_ref, t_out, u_out, v_out,
               cnt_out, stack_ref):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        tmax = tmax_ref[:]

        def safe_inv(c):
            return jnp.where(jnp.abs(c) > 1e-30, 1.0 / c,
                             jnp.where(c >= 0, _BIG, -_BIG))

        ivx, ivy, ivz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
        cox, coy, coz = ox_ref[4, 64], oy_ref[4, 64], oz_ref[4, 64]
        civx = safe_inv(dx_ref[4, 64])
        civy = safe_inv(dy_ref[4, 64])
        civz = safe_inv(dz_ref[4, 64])
        zero = jnp.zeros((r, lanes), jnp.float32)
        stack_ref[0] = jnp.int32(1)
        init = (jnp.int32(1), jnp.int32(0), jnp.full((r, lanes), INF),
                zero, zero)

        def cond(c):
            return c[0] > 0

        def body(c):
            sp, cnt, bt, bu, bv = c
            cnt = cnt + 1
            code = stack_ref[sp - 1]
            sp = sp - 1
            is_leaf = code < 0

            def node_fn(args):
                bt, bu, bv = args
                nrow = nodes_ref[pl.ds(jnp.maximum(code - 1, 0), 1), :]
                limit = jnp.minimum(bt, tmax)
                keys, codes = [], []
                packed = []
                pushes0 = []
                hit_prev = None
                bmnxs = [nrow[0, 0 + c2] for c2 in range(8)]
                bmnys = [nrow[0, 8 + c2] for c2 in range(8)]
                bmnzs = [nrow[0, 16 + c2] for c2 in range(8)]
                bmxxs = [nrow[0, 24 + c2] for c2 in range(8)]
                bmxys = [nrow[0, 32 + c2] for c2 in range(8)]
                bmxzs = [nrow[0, 40 + c2] for c2 in range(8)]
                for ci in range(8):
                    tx0 = (bmnxs[ci] - ox) * ivx
                    tx1 = (bmxxs[ci] - ox) * ivx
                    ty0 = (bmnys[ci] - oy) * ivy
                    ty1 = (bmxys[ci] - oy) * ivy
                    tz0 = (bmnzs[ci] - oz) * ivz
                    tz1 = (bmxzs[ci] - oz) * ivz
                    tnear = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                        jnp.maximum(jnp.minimum(tz0, tz1), t_min))
                    tfar = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                        jnp.minimum(jnp.maximum(tz0, tz1), limit))
                    tag = nrow[0, 56 + ci]
                    ref = nrow[0, 48 + ci].astype(jnp.int32)
                    hit = tnear <= tfar
                    if push_all:
                        push = tag > 0.5
                    elif packed_push:
                        h = hit.astype(jnp.int32)
                        if ci % 2 == 0:
                            hit_prev = h
                            packed.append(None)
                        else:
                            packed[-1] = jnp.sum(hit_prev + h * 65536)
                        push = tag > 0.5  # refined below after packing
                    else:
                        push = (tag > 0.5) & jnp.any(hit)
                    if center_key:
                        ct0 = (bmnxs[ci] - cox) * civx
                        ct1 = (bmxxs[ci] - cox) * civx
                        cu0 = (bmnys[ci] - coy) * civy
                        cu1 = (bmxys[ci] - coy) * civy
                        cv0 = (bmnzs[ci] - coz) * civz
                        cv1 = (bmxzs[ci] - coz) * civz
                        key = jnp.maximum(
                            jnp.maximum(jnp.minimum(ct0, ct1),
                                        jnp.minimum(cu0, cu1)),
                            jnp.maximum(jnp.minimum(cv0, cv1), t_min))
                    else:
                        key = jnp.min(jnp.where(hit, tnear,
                                                jnp.float32(np.inf)))
                    keys.append(key)
                    codes.append(jnp.where(tag > 1.5, -(ref + 1), ref + 1))
                    pushes0.append(push)
                if packed_push and not push_all:
                    for ci in range(8):
                        pcv = packed[ci // 2]
                        c_ci = (pcv & 0xFFFF) if ci % 2 == 0 else (pcv >> 16)
                        pushes0[ci] = pushes0[ci] & (c_ci > 0)
                for ci in range(8):
                    keys[ci] = jnp.where(pushes0[ci], keys[ci],
                                         jnp.float32(-np.inf))
                    codes[ci] = jnp.where(pushes0[ci], codes[ci], jnp.int32(0))
                net = [] if no_sortnet else [
                       (0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3),
                       (4, 6), (5, 7), (1, 2), (5, 6), (0, 4), (3, 7),
                       (1, 5), (2, 6), (1, 4), (3, 6), (2, 4), (3, 5),
                       (3, 4)]
                for a, b in net:
                    swap = keys[a] < keys[b]
                    keys[a], keys[b] = (jnp.where(swap, keys[b], keys[a]),
                                        jnp.where(swap, keys[a], keys[b]))
                    codes[a], codes[b] = (jnp.where(swap, codes[b], codes[a]),
                                          jnp.where(swap, codes[a], codes[b]))
                spn = sp
                for ci in range(8):
                    code_c = codes[ci]
                    do_push = code_c != 0

                    @pl.when(do_push)
                    def _(spn=spn, code_c=code_c):
                        stack_ref[spn] = code_c

                    spn = spn + do_push.astype(jnp.int32)
                return (spn, bt, bu, bv)

            def leaf_fn(args):
                bt, bu, bv = args
                trow = tris_ref[pl.ds(jnp.maximum(-code - 1, 0), 1), :]
                if no_leaf:
                    return (sp, bt + 0.0 * trow[0, 0], bu, bv)
                for k in range(8):
                    base = 16 * k
                    t0x, t0y, t0z = trow[0, base], trow[0, base + 1], trow[0, base + 2]
                    t1x, t1y, t1z = trow[0, base + 3], trow[0, base + 4], trow[0, base + 5]
                    t2x, t2y, t2z = trow[0, base + 6], trow[0, base + 7], trow[0, base + 8]
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
                    ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
                          & (u + v <= 1.0) & (t > t_min) & (t < tmax) & (t < bt))
                    bt = jnp.where(ok, t, bt)
                    bu = jnp.where(ok, u, bu)
                    bv = jnp.where(ok, v, bv)
                return (sp, bt, bu, bv)

            spn, bt, bu, bv = jax.lax.cond(is_leaf, leaf_fn, node_fn,
                                           (bt, bu, bv))
            return (spn, cnt, bt, bu, bv)

        final = jax.lax.while_loop(cond, body, init)
        t_out[:] = final[2]
        u_out[:] = final[3]
        v_out[:] = final[4]
        cnt_out[:] = jnp.full((r, lanes), 1.0) * final[1].astype(jnp.float32)

    def trace(o, d, t_max, active=None):
        import jax

        n = o[0].shape[0]
        rows_total = -(-n // lanes)
        rows_padded = -(-rows_total // r) * r
        grid = rows_padded // r
        pad = rows_padded * lanes - n

        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
        if active is not None:
            tmax = jnp.where(active, tmax, np.float32(-np.inf))

        def plane(a, fill=0.0):
            return jnp.pad(a, (0, pad), constant_values=fill).reshape(
                rows_padded, lanes)

        blk = pl.BlockSpec((r, lanes), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 + [blk] * 7,
            out_specs=[blk] * 4,
            out_shape=[jax.ShapeDtypeStruct((rows_padded, lanes),
                                            jnp.float32)] * 4,
            scratch_shapes=[pltpu.SMEM((stack_n,), jnp.int32)],
        )(nodes, tris, plane(o[0]), plane(o[1]), plane(o[2]),
          plane(d[0]), plane(d[1]), plane(d[2]), plane(tmax, fill=-np.inf))
        # per-block iteration counts: one representative element per block
        cnts = outs[3].reshape(grid, r * lanes)[:, 0]
        return outs[0].reshape(-1)[:n], cnts

    return trace


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wave", default="/tmp/gi_wave.npz")
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    from sfvp_tpu.accel.wide import WideBVH
    from sfvp_tpu.kernels.bvh_packet import make_packet_trace
    from sfvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    z = np.load(a.wave)
    wide = WideBVH(nodes=z["nodes"], tris=z["tris_rows"], prim_rows=None,
                   max_stack=int(z["max_stack"]))
    res = {}
    for kind, pre in (("bounce", ""), ("primary", "p")):
        o = (jnp.asarray(z[pre + "ox"]), jnp.asarray(z[pre + "oy"]),
             jnp.asarray(z[pre + "oz"]))
        d = (jnp.asarray(z[pre + "dx"]), jnp.asarray(z[pre + "dy"]),
             jnp.asarray(z[pre + "dz"]))
        live = (jnp.asarray(z["live"]) if kind == "bounce"
                else jnp.ones_like(jnp.asarray(z["live"])))
        m = int(o[0].shape[0])
        tmax = 1e4

        full = make_packet_trace(wide, t_min=1e-3)
        f_full = jax.jit(lambda o, d, act, full=full:
                         full(o, d, tmax, active=act).t)
        res[f"{kind}_payload_ms"] = round(timeit(f_full, o, d, live) * 1e3, 1)

        for name, kw in (("stripped", {}),
                         ("packed", {"packed_push": True}),
                         ("packed_center", {"packed_push": True,
                                            "center_key": True}),
                         ("pushall_center", {"push_all": True,
                                             "center_key": True})):
            tr = make_stripped_trace(wide, t_min=1e-3, **kw)
            f = jax.jit(lambda o, d, act, tr=tr: tr(o, d, tmax, active=act))
            t_ms = timeit(f, o, d, live) * 1e3
            _, cnts = f(o, d, live)
            iters = float(jnp.sum(cnts))
            res[f"{kind}_{name}_ms"] = round(t_ms, 1)
            res[f"{kind}_{name}_iters"] = int(iters)
            res[f"{kind}_{name}_ns_per_iter"] = round(t_ms * 1e6 / iters)
        print(json.dumps({kind: {k: v for k, v in res.items()
                                 if k.startswith(kind)}}), flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

"""Micro-probe of Pallas while-iteration costs on the real chip.

Each variant is a while loop of N iterations; reported as ns/iteration.
Findings drive the bvh_packet kernel redesign (reshape (1,128)->(8,16) is
NOT supported by Mosaic — 'unsupported shape cast' — so the candidates are):

  v0_loop        pop + dynamic (1,128) row load + 1 vector op (floor)
  v1_scalars48   + 48 scalar lane extractions row[0, c]   (current node iter)
  v2_scalars128  + 128 scalar lane extractions            (current leaf iter)
  v3_slice_bcast + 48 (1,1)-slice * (8,128) broadcast-multiplies
  v4_rowslice8   dynamic (8,128) slice load from (8M,128) + slab-like math
                 on (8,1) lane slices (the 8-rows-per-node layout)
  v5_cond        + lax.cond choosing between two ~equal vector bodies

Usage: python -u benchmarks/probe_iter_cost.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sfvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    M = 2048
    ITERS = 20000
    nodes = jnp.asarray(np.random.default_rng(0).normal(
        size=(8 * M, 128)).astype(np.float32))

    def build(variant):
        def kernel(nodes_ref, out_ref, sp_ref):
            sp_ref[0] = jnp.int32(ITERS)
            rays = out_ref[:]  # (8,128) resident vector state

            def cond(c):
                return c[0] > 0

            def body(c):
                it, acc = c
                i = sp_ref[0]
                sp_ref[0] = i - 1
                idx = jnp.maximum(i % M, 0)
                if variant in (0, 1, 2, 3, 5):
                    row = nodes_ref[pl.ds(idx, 1), :]    # (1,128)
                if variant == 0:
                    acc = acc + row
                elif variant in (1, 2):
                    s = jnp.float32(0.0)
                    for c2 in range(48 if variant == 1 else 128):
                        s = s + row[0, c2]
                    acc = acc + s
                elif variant == 3:
                    t = jnp.zeros((8, 128), jnp.float32)
                    for c2 in range(48):
                        t = t + row[0:1, c2:c2 + 1] * acc
                    acc = t
                elif variant == 4:
                    nb = nodes_ref[pl.ds(idx * 8, 8), :]  # (8,128)
                    lim = jnp.max(acc)
                    tn = jnp.full((8, 128), -np.inf, jnp.float32)
                    tf = jnp.full((8, 128), np.inf, jnp.float32)
                    for f in range(0, 6, 2):
                        lo = nb[:, f:f + 1]
                        hi = nb[:, f + 1:f + 2]
                        t0 = (lo - rays) * rays
                        t1 = (hi - rays) * rays
                        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                        tf = jnp.minimum(tf, jnp.maximum(
                            jnp.maximum(t0, t1), lim))
                    hit = tn <= tf
                    key = jnp.min(jnp.where(hit, tn, np.inf), axis=1,
                                  keepdims=True)
                    anyh = jnp.sum(hit.astype(jnp.float32), axis=1,
                                   keepdims=True)
                    acc = acc + key + anyh
                elif variant == 5:
                    def fa(x):
                        return x + row * 2.0

                    def fb(x):
                        return x - row * 3.0

                    acc = jax.lax.cond(i % 2 == 0, fa, fb, acc)
                elif variant == 6:
                    s = jnp.float32(0.0)
                    for c2 in range(8):
                        hit = (row * acc) > 0.0
                        s = s + jnp.min(jnp.where(hit, acc, np.inf))
                        s = s + jnp.any(hit).astype(jnp.float32)
                    acc = acc + s
                elif variant == 7:
                    spn = i % 100
                    for c2 in range(8):
                        do = row[0, c2] > 0.0

                        @pl.when(do)
                        def _(spn=spn, c2=c2):
                            sp_ref[1] = c2

                        spn = spn + do.astype(jnp.int32)
                    acc = acc + spn.astype(jnp.float32)
                elif variant == 8:
                    keys = [row[0, c2] for c2 in range(8)]
                    codes = [row[0, 8 + c2] for c2 in range(8)]
                    net = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3),
                           (4, 6), (5, 7), (1, 2), (5, 6), (0, 4), (3, 7),
                           (1, 5), (2, 6), (1, 4), (3, 6), (2, 4), (3, 5),
                           (3, 4)]
                    for a2, b2 in net:
                        swap = keys[a2] < keys[b2]
                        keys[a2], keys[b2] = (jnp.where(swap, keys[b2], keys[a2]),
                                              jnp.where(swap, keys[a2], keys[b2]))
                        codes[a2], codes[b2] = (jnp.where(swap, codes[b2], codes[a2]),
                                                jnp.where(swap, codes[a2], codes[b2]))
                    acc = acc + sum(keys) + sum(codes)
                elif variant == 9:
                    # vector-side child keys: axis-1 keepdims reductions only
                    hit = (row * acc) > 0.0
                    key = jnp.min(jnp.where(hit, acc, np.inf), axis=1,
                                  keepdims=True)
                    anyh = jnp.max(hit.astype(jnp.float32), axis=1,
                                   keepdims=True)
                    acc = acc + key + anyh
                return (it - 1, acc)

            _, acc = jax.lax.while_loop(
                cond, body, (jnp.int32(ITERS),
                             jnp.zeros((8, 128), jnp.float32)))
            out_ref[:] = acc

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((4,), jnp.int32)],
        )

    names = ["v0_loop", "v1_scalars48", "v2_scalars128", "v3_slice_bcast",
             "v4_rowslice8", "v5_cond", "v6_reduce16", "v7_when8",
             "v8_sortnet"]
    res = {}
    for v, name in enumerate(names):
        try:
            f = jax.jit(lambda nodes, v=v: build(v)(nodes))
            out = f(nodes)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = f(nodes)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            res[name + "_ns_per_iter"] = round(dt / ITERS * 1e9)
        except Exception as e:  # noqa: BLE001
            res[name + "_ns_per_iter"] = f"FAIL: {str(e)[:80]}"
        print(json.dumps({name: res[name + "_ns_per_iter"]}), flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

"""Micro-bench: per-leaf-pop scalar access — 128 VMEM lane extracts vs
DMA-to-SMEM + 128 scalar loads.

The fused kernels' leaf pops read 128 triangle floats as SCALARS out of
a dynamically-indexed VMEM row (16 floats x 8 tris feed the
Moller-Trumbore scalar math). Node pops replaced exactly this pattern
with SMEM scalar loads (smem_boxes) for 1.19x end-to-end; leaves can't
be SMEM-resident (6.4MB at 100k tris) but CAN be DMA'd per pop into a
tiny SMEM ring — if (DMA start+wait+latency + 128 SMEM loads) beats
(dynamic row load + 128 lane extracts).

Three kernels, same K-iteration while_loop over an LCG row index with a
127-add scalar reduction chain per iteration (mirrors the real consumer:
every scalar feeds serial scalar math):
  base     — loop + LCG + chain over constants (no loads)
  extract  — dynamic VMEM row load + 128 lane extracts    (shipping)
  smemdma  — blocking VMEM->SMEM row DMA + 128 SMEM loads (candidate)

Per-pop deltas (extract-base, smemdma-base) decide whether to build the
smem_leaf path in megakernel_bvh. One JSON line.

Usage: python -u benchmarks/micro_leaf_cost.py [--rows 8192 --iters 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=8192)
    p.add_argument("--iters", type=int, default=200000)
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sfvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    NR, K = a.rows, a.iters
    rows = jnp.asarray(
        np.random.default_rng(7).random((NR, 128), np.float32))

    def make(mode):
        def kernel(x_ref, o_ref, lbuf, sem):
            def body(c):
                i, rnd, acc = c
                lrow = jax.lax.rem(rnd, jnp.int32(NR))
                if mode == "extract":
                    trow = x_ref[pl.ds(lrow, 1), :]
                    sc = [trow[0, cc] for cc in range(128)]
                elif mode == "smemdma":
                    cp = pltpu.make_async_copy(
                        x_ref.at[pl.ds(lrow, 1), :],
                        lbuf.at[pl.ds(0, 1), :], sem)
                    cp.start()
                    cp.wait()
                    sc = [lbuf[0, cc] for cc in range(128)]
                elif mode == "smemload":
                    # pure SMEM scalar loads, no DMA on the chain (the
                    # ring-hidden ideal); index by rnd parity so the
                    # loads can't hoist out of the loop
                    rr_ = jax.lax.rem(rnd, jnp.int32(2))
                    sc = [lbuf[rr_, cc] for cc in range(128)]
                elif mode == "dmaonly":
                    cp = pltpu.make_async_copy(
                        x_ref.at[pl.ds(lrow, 1), :],
                        lbuf.at[pl.ds(0, 1), :], sem)
                    cp.start()
                    cp.wait()
                    sc = [acc + jnp.float32(cc) for cc in range(128)]
                else:
                    sc = [acc + jnp.float32(cc) for cc in range(128)]
                s = sc[0]
                for v in sc[1:]:
                    s = s + v
                rnd = rnd * jnp.int32(1103515245) + jnp.int32(12345)
                rnd = jax.lax.rem(jnp.abs(rnd), jnp.int32(2 ** 30))
                return (i + 1, rnd, acc + s)

            c = jax.lax.while_loop(
                lambda c: c[0] < K, body,
                (jnp.int32(0), jnp.int32(1), jnp.float32(0.0)))
            o_ref[:] = jnp.full((8, 128), c[2], jnp.float32)

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((2, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        )

    out = {"rows": NR, "iters": K}
    for mode in ("base", "extract", "smemdma", "smemload", "dmaonly"):
        fn = jax.jit(lambda x, m=mode: make(m)(x))
        r = fn(rows)
        jax.block_until_ready(r)
        # time each call separately (tiny queued calls mis-measure over
        # the axon tunnel) and keep the median of 5
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(rows))  # device->host fetch = hard barrier
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[2]
        out[f"{mode}_s"] = round(dt, 5)
        out[f"{mode}_ns_per_iter"] = round(dt / K * 1e9, 1)
    for m in ("extract", "smemdma", "smemload", "dmaonly"):
        out[f"{m}_minus_base_ns"] = round(
            (out[f"{m}_s"] - out["base_s"]) / K * 1e9, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Feasibility micro-test: is SMEM a legal DMA destination on TPU?

The leaf-side SMEM idea (scalar-load the popped leaf row instead of 128
lane extracts — the mechanism that bought 1.19x on node pops) needs a
per-pop VMEM->SMEM (or HBM->SMEM) row copy. Mosaic documents SMEM
scratch + make_async_copy separately; whether the pair composes is
undocumented — this answers it empirically in one tiny kernel.

Usage: python -u benchmarks/micro_smem_dma.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, o_ref, smem, sem):
    cp = pltpu.make_async_copy(x_ref.at[pl.ds(1, 1), :], smem, sem)
    cp.start()
    cp.wait()
    acc = jnp.float32(0.0)
    for i in range(8):
        acc = acc + smem[0, i * 16]
    o_ref[:] = jnp.full((8, 128), acc, jnp.float32)


def main():
    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(x)
    row1 = np.arange(128, dtype=np.float32) + 128.0
    want = row1[np.arange(8) * 16].sum()
    got = float(np.asarray(out)[0, 0])
    print("smem dma ok:", got == want, got, want)


if __name__ == "__main__":
    main()

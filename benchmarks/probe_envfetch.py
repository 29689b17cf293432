"""Probe: in-kernel separable one-hot env fetch (kernels/imgfetch.py).

Questions:
1. Does the full equirect fetch (atan2 + arccos + one-hot matmul +
   masked sublane reduce) LOWER through Mosaic at all?
2. Is it numerically equivalent to the XLA path
   (scene/textures.py sample_environment)?
3. What does it cost per (r,128) wave block on the real chip, vs the
   per-bounce trace cost it would ride along with?

Usage:
    python -u benchmarks/probe_envfetch.py cpu   # interpret equivalence
    python -u benchmarks/probe_envfetch.py tpu   # real lowering + timing
"""

import sys
import time

import numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else "cpu"
if MODE == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from sfvp_tpu.kernels.imgfetch import env_fetch_rows, pack_env_transposed  # noqa: E402
from sfvp_tpu.scene.textures import TextureTable, sample_environment  # noqa: E402


def make_env(H, W, seed=0):
    g = np.random.default_rng(seed)
    img = g.uniform(0.0, 9.0, (H, W, 3)).astype(np.float32)
    flat = img.reshape(-1, 3)
    return TextureTable(
        tr=jnp.asarray(flat[:, 0]), tg=jnp.asarray(flat[:, 1]),
        tb=jnp.asarray(flat[:, 2]),
        off=jnp.zeros((1,), jnp.int32),
        width=jnp.full((1,), W, jnp.int32),
        height=jnp.full((1,), H, jnp.int32),
    )


def fetch_kernel(et_ref, dx_ref, dy_ref, dz_ref, r_ref, g_ref, b_ref, *, H, W):
    d = (dx_ref[...], dy_ref[...], dz_ref[...])
    cr, cg, cb = env_fetch_rows(et_ref[...], d, H, W)
    r_ref[...] = cr
    g_ref[...] = cg
    b_ref[...] = cb


def run(H, W, r=8, interpret=False, iters=1):
    table = make_env(H, W)
    et, _, _ = pack_env_transposed(table)
    g = np.random.default_rng(1)
    d = g.normal(size=(3, r, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)

    import functools
    f = pl.pallas_call(
        functools.partial(fetch_kernel, H=H, W=W),
        out_shape=[jax.ShapeDtypeStruct((r, 128), jnp.float32)] * 3,
        interpret=interpret,
    )
    f = jax.jit(f)
    dev_args = [jnp.asarray(et)] + [jnp.asarray(x) for x in d]
    t0 = time.perf_counter()
    out = f(*dev_args)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0

    ref = sample_environment(
        table, tuple(jnp.asarray(x).reshape(-1) for x in d))
    ref = [np.asarray(c).reshape(r, 128) for c in ref]
    err = max(
        float(np.max(np.abs(np.asarray(o) - rr))) for o, rr in zip(out, ref)
    )
    scale = max(float(np.max(np.abs(rr))) for rr in ref)

    best = None
    if iters > 1:
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(*dev_args)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters
            best = dt if best is None else min(best, dt)
    print(f"H={H:4d} W={W:4d} r={r:3d} interpret={interpret} "
          f"max_abs_err={err:.3e} (scale {scale:.1f}) "
          f"first_call={t_compile:.1f}s"
          + (f" steady={best*1e6:.0f}us/block" if best else ""))
    return err


if __name__ == "__main__":
    if MODE == "cpu":
        for H, W in ((16, 32), (32, 64), (128, 256)):
            e = run(H, W, r=8, interpret=True)
            assert e < 3e-5 * 9.0, "mismatch vs sample_environment"
        print("interpret equivalence OK")
    else:
        for H, W in ((32, 64), (128, 256), (256, 512)):
            run(H, W, r=32, interpret=False, iters=50)

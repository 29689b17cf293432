"""Ablate the in-kernel env fetch cost: which part of
kernels/imgfetch.py::bilinear_fetch_rows costs 150us/row on chip?

v_full   : the real thing (DEFAULT precision)
v_high   : precision=HIGHEST on the dot
v_bf16   : bf16 operands into the dot
v_nodot  : dot replaced by a broadcast (keeps one-hot + hmask + sums)
v_noconc : concat replaced by masked-broadcast accumulation
v_trig   : only equirect_uv (trig + index math), no gather at all

python -u benchmarks/probe_envfetch_ablate.py
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, ".")
from sfvp_tpu.kernels import imgfetch as IF  # noqa: E402

H, W, r = 32, 64, 32


def fetch_body(et, u, v, variant):
    wf = np.float32(W)
    hf = np.float32(H)
    uu = u - jnp.floor(u)
    vv = v - jnp.floor(v)
    x = uu * wf - np.float32(0.5)
    y = (1.0 - vv) * hf - np.float32(0.5)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0w = x0 - jnp.floor(x0 / wf) * wf
    x1w = (x0 + 1.0) - jnp.floor((x0 + 1.0) / wf) * wf
    y0w = y0 - jnp.floor(y0 / hf) * hf
    y1w = (y0 + 1.0) - jnp.floor((y0 + 1.0) / hf) * hf
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (H, 128), 0).astype(
        jnp.float32)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 0).astype(
        jnp.float32)
    rows = ([], [], [])
    acc = [jnp.zeros_like(u) for _ in range(3)]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (r, 128), 0)
    for j in range(r):
        y0r = y0w[j:j + 1, :]
        y1r = y1w[j:j + 1, :]
        fyr = fy[j:j + 1, :]
        o = (jnp.where(iota_h == y0r, 1.0 - fyr, 0.0)
             + jnp.where(iota_h == y1r, fyr, 0.0))
        if variant == "nodot":
            scan = jnp.broadcast_to(o[0:1, :] + 1.0, (3 * W, 128))
        elif variant == "bf16":
            scan = jax.lax.dot_general(
                et.astype(jnp.bfloat16), o.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif variant == "high":
            scan = jax.lax.dot_general(
                et, o, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
        else:
            scan = jax.lax.dot_general(
                et, o, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        x0r = x0w[j:j + 1, :]
        x1r = x1w[j:j + 1, :]
        fxr = fx[j:j + 1, :]
        hmask = (jnp.where(iota_w == x0r, 1.0 - fxr, 0.0)
                 + jnp.where(iota_w == x1r, fxr, 0.0))
        for c in range(3):
            slab = scan[c * W:(c + 1) * W, :]
            s = jnp.sum(slab * hmask, axis=0, keepdims=True)
            if variant == "noconc":
                acc[c] = acc[c] + jnp.where(row_iota == j, s, 0.0)
            else:
                rows[c].append(s)
    if variant == "noconc":
        return tuple(acc)
    return tuple(jnp.concatenate(rows[c], axis=0) for c in range(3))


def kern(et_ref, dx_ref, dy_ref, dz_ref, r_ref, g_ref, b_ref, *, variant):
    d = (dx_ref[...], dy_ref[...], dz_ref[...])
    u, v = IF.equirect_uv(d, H)
    if variant == "trig":
        r_ref[...] = u
        g_ref[...] = v
        b_ref[...] = u + v
        return
    cr, cg, cb = fetch_body(et_ref[...], u, v, variant)
    r_ref[...] = cr
    g_ref[...] = cg
    b_ref[...] = cb


def main():
    g = np.random.default_rng(0)
    et = g.uniform(0, 9, (3 * W, H)).astype(np.float32)
    d = g.normal(size=(3, r, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    args = [jnp.asarray(et)] + [jnp.asarray(x) for x in d]
    for variant in ("trig", "nodot", "noconc", "bf16", "high", "full"):
        f = jax.jit(pl.pallas_call(
            functools.partial(kern, variant=variant),
            out_shape=[jax.ShapeDtypeStruct((r, 128), jnp.float32)] * 3,
        ))
        out = f(*args)
        jax.block_until_ready(out)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(30):
                out = f(*args)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 30
            best = dt if best is None else min(best, dt)
        print(f"{variant:8s} {best*1e6:8.0f} us/block")


if __name__ == "__main__":
    main()

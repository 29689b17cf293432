"""Headline benchmark: Cornell Box 1024x1024 / 32spp / depth 8 (the
reference's exact workload). Same as repo-root bench.py but with a
--config sweep for the perf table. One JSON line per config."""

from __future__ import annotations

import argparse
import json
import time


def run(width, height, spp, depth, backend, steps=5):
    import jax

    from sfvp_tpu import RenderConfig, init_state, load_obj, upload
    from sfvp_tpu.dispatch import select_render_step

    cfg = RenderConfig(
        width=width, height=height, spp_per_step=spp, max_depth=depth,
        backend=backend,
    )
    buffers = upload(load_obj())
    step = jax.jit(select_render_step(cfg, buffers), donate_argnums=(0,))
    state = init_state(cfg.height, cfg.width)
    state = step(state)
    jax.block_until_ready(state.accum)
    state = step(state)
    jax.block_until_ready(state.accum)
    m0 = float(state.mrays)
    t0 = time.perf_counter()
    for _ in range(steps):
        state = step(state)
    jax.block_until_ready(state.accum)
    dt = time.perf_counter() - t0
    return (float(state.mrays) - m0) / dt, dt / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--spp", type=int, default=32)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--backend", default="auto")
    p.add_argument("--steps", type=int, default=5)
    a = p.parse_args()
    mrays, step_s = run(a.width, a.height, a.spp, a.depth, a.backend, a.steps)
    print(json.dumps({
        "metric": f"cornell_{a.width}x{a.height}_{a.spp}spp_d{a.depth}_{a.backend}",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "step_seconds": round(step_s, 4),
        "vs_baseline": round(mrays / 100.0, 3),
    }))


if __name__ == "__main__":
    main()

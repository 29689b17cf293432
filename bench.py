"""Headline benchmark: Cornell Box 1024x1024, 32 spp/step, depth 8 —
the reference's exact workload (ref main.cpp:16-17, raygen.rgen:43,62) —
reported as Mrays/sec (traced ray segments per second) on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is relative to the BASELINE.json north-star target of
100 Mrays/sec/chip (the reference publishes no numbers of its own).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    import jax

    from sfvp_tpu import RenderConfig, init_state, load_obj, upload
    from sfvp_tpu.dispatch import select_render_step
    from sfvp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = RenderConfig(width=1024, height=1024, spp_per_step=32, max_depth=8)
    buffers = upload(load_obj())
    step = jax.jit(select_render_step(cfg, buffers), donate_argnums=(0,))

    state = init_state(cfg.height, cfg.width)
    # warmup: compile + one steady-state step
    state = step(state)
    jax.block_until_ready(state.accum)
    state = step(state)
    jax.block_until_ready(state.accum)

    steps = 5
    m0 = float(state.mrays)
    t0 = time.perf_counter()
    for _ in range(steps):
        state = step(state)
    jax.block_until_ready(state.accum)
    dt = time.perf_counter() - t0
    mrays = float(state.mrays) - m0

    value = mrays / dt
    print(
        json.dumps(
            {
                "metric": "cornell_1024_mrays_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(value / 100.0, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

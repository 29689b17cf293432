"""Device-side scene buffers, the TPU analog of the reference's AccelInput
Buffers (ref main.cpp:492-494) — structure-of-arrays jnp columns laid out
for dense VPU lanes (see utils/vec.py for why SoA)."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class SceneBuffers(NamedTuple):
    """Triangle soup + materials on device, fully SoA.

    Padded to ``pad_to`` triangles so kernels tile cleanly; padded entries
    are degenerate (all-zero) triangles that can never be hit
    (Moller-Trumbore det == 0) with zero material.
    """

    # vertex components, each (Tp,)
    v0x: jnp.ndarray
    v0y: jnp.ndarray
    v0z: jnp.ndarray
    v1x: jnp.ndarray
    v1y: jnp.ndarray
    v1z: jnp.ndarray
    v2x: jnp.ndarray
    v2y: jnp.ndarray
    v2z: jnp.ndarray
    # material columns, each (Tp,)
    dr: jnp.ndarray
    dg: jnp.ndarray
    db: jnp.ndarray
    er: jnp.ndarray
    eg: jnp.ndarray
    eb: jnp.ndarray
    # material extensions (BASELINE config 3; zero/diffuse in parity mode)
    sr: jnp.ndarray      # Ks columns (mirror tint / glossy F0)
    sg: jnp.ndarray
    sb: jnp.ndarray
    mtype: jnp.ndarray   # (Tp,) i32: 0=diffuse, 1=mirror, 2=glossy GGX
    rough: jnp.ndarray   # (Tp,) f32 GGX roughness (mtype 2 only)
    num_tris: int  # static: real (unpadded) triangle count

    # --- convenience AoS views (tests, BVH build, host-side tools) ---
    @property
    def v0(self):
        return jnp.stack([self.v0x, self.v0y, self.v0z], axis=-1)

    @property
    def v1(self):
        return jnp.stack([self.v1x, self.v1y, self.v1z], axis=-1)

    @property
    def v2(self):
        return jnp.stack([self.v2x, self.v2y, self.v2z], axis=-1)

    @property
    def diffuse(self):
        return jnp.stack([self.dr, self.dg, self.db], axis=-1)

    @property
    def emission(self):
        return jnp.stack([self.er, self.eg, self.eb], axis=-1)

    @property
    def specular(self):
        return jnp.stack([self.sr, self.sg, self.sb], axis=-1)

    @property
    def padded_tris(self) -> int:
        return self.v0x.shape[0]


def from_arrays(tris: np.ndarray, diffuse: np.ndarray, emission: np.ndarray,
                specular: Optional[np.ndarray] = None,
                mat_type: Optional[np.ndarray] = None,
                rough: Optional[np.ndarray] = None,
                pad_to: Optional[int] = None) -> SceneBuffers:
    """tris: (T, 3, 3); diffuse/emission/specular: (T, 3); mat_type/rough:
    (T,)."""
    tris = np.asarray(tris, np.float32)
    diffuse = np.asarray(diffuse, np.float32)
    emission = np.asarray(emission, np.float32)
    t = tris.shape[0]
    if specular is None:
        specular = np.zeros((t, 3), np.float32)
    if mat_type is None:
        mat_type = np.zeros((t,), np.int32)
    if rough is None:
        rough = np.zeros((t,), np.float32)
    specular = np.asarray(specular, np.float32)
    mat_type = np.asarray(mat_type, np.int32)
    rough = np.asarray(rough, np.float32)
    tp = t if pad_to is None else max(pad_to, t)

    def pad(a):
        if a.shape[0] == tp:
            return a
        out = np.zeros((tp,) + a.shape[1:], a.dtype)
        out[: a.shape[0]] = a
        return out

    tris_p = pad(tris)
    dif_p = pad(diffuse)
    emi_p = pad(emission)
    spe_p = pad(specular)
    mt_p = pad(mat_type)
    rg_p = pad(rough)
    cols = []
    for corner in range(3):
        for axis in range(3):
            cols.append(jnp.asarray(np.ascontiguousarray(tris_p[:, corner, axis])))
    for arr in (dif_p, emi_p, spe_p):
        for axis in range(3):
            cols.append(jnp.asarray(np.ascontiguousarray(arr[:, axis])))
    cols.append(jnp.asarray(mt_p))
    cols.append(jnp.asarray(rg_p))
    return SceneBuffers(*cols, num_tris=t)


def upload(scene, pad_to: Optional[int] = None) -> SceneBuffers:
    return from_arrays(
        scene.triangles(),
        scene.face_diffuse,
        scene.face_emission,
        getattr(scene, "face_specular", None),
        getattr(scene, "face_mat_type", None),
        getattr(scene, "face_rough", None),
        pad_to=pad_to,
    )

"""Instancing — the TPU analog of the reference's TLAS over BLAS instances
(ref main.cpp:514-538: one instance, 3x4 transform, cull disable).

The reference only ever uses a single identity-transform instance, so the
fast path here is *flattening*: each instance's mesh is transformed into
world space and the results are merged into one triangle soup over which a
single LBVH is built (equivalent to a one-level TLAS with refit-on-edit).
A true two-level traversal (per-instance BVH + top-level over instance
AABBs) is a planned extension for scenes with many large instances.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np

from ..scene.objload import Scene


@dataclasses.dataclass(frozen=True)
class Instance:
    """A mesh reference with a 3x4 row-major world transform
    (rotation/scale in [:, :3], translation in [:, 3]) — the same shape as
    VkTransformMatrixKHR (ref main.cpp:516-520)."""

    scene: Scene
    transform: np.ndarray = dataclasses.field(
        default_factory=lambda: np.hstack(
            [np.eye(3, dtype=np.float32), np.zeros((3, 1), np.float32)]
        )
    )

    def __post_init__(self):
        t = np.asarray(self.transform, np.float32)
        if t.shape != (3, 4):
            raise ValueError(f"transform must be (3, 4), got {t.shape}")
        object.__setattr__(self, "transform", t)


def identity_instance(scene: Scene) -> Instance:
    """The reference's exact setup: one instance, identity transform."""
    return Instance(scene=scene)


def flatten_instances(instances: Sequence[Instance]) -> Scene:
    """Merge instances into one world-space Scene (single-level fast path)."""
    verts: List[np.ndarray] = []
    diff: List[np.ndarray] = []
    emis: List[np.ndarray] = []
    spec: List[np.ndarray] = []
    mtype: List[np.ndarray] = []
    names: List[str] = []
    mat_ids: List[np.ndarray] = []
    name_offset = 0
    for inst in instances:
        s = inst.scene
        rot = inst.transform[:, :3]
        trans = inst.transform[:, 3]
        verts.append(s.vertices @ rot.T + trans)
        diff.append(s.face_diffuse)
        emis.append(s.face_emission)
        spec.append(
            s.face_specular
            if s.face_specular is not None
            else np.zeros_like(s.face_diffuse)
        )
        mtype.append(
            s.face_mat_type
            if s.face_mat_type is not None
            else np.zeros(s.num_triangles, np.int32)
        )
        names.extend(s.material_names)
        ids = (
            s.face_material_id
            if s.face_material_id is not None
            else np.full(s.num_triangles, -1, np.int32)
        )
        mat_ids.append(
            np.where(ids >= 0, ids + name_offset, -1).astype(np.int32)
        )
        name_offset += len(s.material_names)

    nv = np.concatenate(verts).astype(np.float32)
    return Scene(
        vertices=nv,
        indices=np.arange(len(nv), dtype=np.uint32),
        face_diffuse=np.concatenate(diff).astype(np.float32),
        face_emission=np.concatenate(emis).astype(np.float32),
        face_specular=np.concatenate(spec).astype(np.float32),
        face_mat_type=np.concatenate(mtype).astype(np.int32),
        material_names=names,
        face_material_id=np.concatenate(mat_ids),
    )

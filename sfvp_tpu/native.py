"""ctypes bindings for the native C++ runtime components (csrc/).

The reference keeps scene ingest and accel builds in C++ (tinyobjloader,
ref main.cpp:28-58; buildAccelerationStructuresKHR, main.cpp:440-447);
csrc/sfvp_native.cpp provides their counterparts here. Everything degrades
gracefully to the pure-Python implementations when the shared library
hasn't been built — call ``build()`` (runs ``make -C csrc``) or build it
manually. Outputs are tested identical to the Python implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc"
)
_LIB_PATH = os.path.join(_CSRC, "libsfvp_native.so")
_lib = None
_load_failed = False


def build(quiet: bool = True) -> bool:
    """Compile csrc/libsfvp_native.so; returns True on success."""
    try:
        subprocess.run(
            ["make", "-C", _CSRC],
            check=True,
            capture_output=quiet,
        )
        return True
    except Exception:
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.sfvp_load_obj.restype = ctypes.c_void_p
    lib.sfvp_load_obj.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.sfvp_scene_error.restype = ctypes.c_char_p
    lib.sfvp_scene_error.argtypes = [ctypes.c_void_p]
    lib.sfvp_scene_num_tris.restype = ctypes.c_int
    lib.sfvp_scene_num_tris.argtypes = [ctypes.c_void_p]
    lib.sfvp_scene_material_names.restype = ctypes.c_char_p
    lib.sfvp_scene_material_names.argtypes = [ctypes.c_void_p]
    lib.sfvp_scene_fill.restype = None
    lib.sfvp_scene_fill.argtypes = [ctypes.c_void_p] + [f32p] * 4 + [i32p] * 2
    if hasattr(lib, "sfvp_scene_fill_rough"):
        # added after v1 of the .so; older builds fall back to zeros
        lib.sfvp_scene_fill_rough.restype = None
        lib.sfvp_scene_fill_rough.argtypes = [ctypes.c_void_p, f32p]
    if hasattr(lib, "sfvp_scene_fill_uv"):
        lib.sfvp_scene_fill_uv.restype = None
        lib.sfvp_scene_fill_uv.argtypes = [ctypes.c_void_p, f32p, i32p]
        lib.sfvp_scene_texture_paths.restype = ctypes.c_char_p
        lib.sfvp_scene_texture_paths.argtypes = [ctypes.c_void_p]
    lib.sfvp_scene_free.restype = None
    lib.sfvp_scene_free.argtypes = [ctypes.c_void_p]
    lib.sfvp_build_lbvh.restype = ctypes.c_void_p
    lib.sfvp_build_lbvh.argtypes = [f32p, ctypes.c_int, ctypes.c_int]
    if hasattr(lib, "sfvp_build_sah"):
        lib.sfvp_build_sah.restype = ctypes.c_void_p
        lib.sfvp_build_sah.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int
        ]
    lib.sfvp_bvh_num_nodes.restype = ctypes.c_int
    lib.sfvp_bvh_num_nodes.argtypes = [ctypes.c_void_p]
    lib.sfvp_bvh_fill.restype = None
    lib.sfvp_bvh_fill.argtypes = (
        [ctypes.c_void_p] + [f32p] * 2 + [i32p] * 3 + [f32p, i32p]
    )
    lib.sfvp_bvh_free.restype = None
    lib.sfvp_bvh_free.argtypes = [ctypes.c_void_p]
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.sfvp_emit_topology.restype = ctypes.c_int
    lib.sfvp_emit_topology.argtypes = [u32p, ctypes.c_int, ctypes.c_int,
                                       i32p, i32p, i32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _get_lib() is not None


def sah_available() -> bool:
    """True when the .so is built AND new enough to have the SAH symbol."""
    lib = _get_lib()
    return lib is not None and hasattr(lib, "sfvp_build_sah")


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def load_obj_native(path: str, flip_y: bool = True):
    """Native OBJ/MTL ingest; returns a Scene identical to objload.load_obj
    or None when the library is unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    from .scene.objload import Scene

    h = lib.sfvp_load_obj(path.encode(), 1 if flip_y else 0)
    try:
        err = lib.sfvp_scene_error(h).decode()
        if err:
            if "cannot open" in err:
                raise FileNotFoundError(err)
            raise ValueError(err)
        t = lib.sfvp_scene_num_tris(h)
        vertices = np.empty((3 * t, 3), np.float32)
        diffuse = np.empty((t, 3), np.float32)
        emission = np.empty((t, 3), np.float32)
        specular = np.empty((t, 3), np.float32)
        mat_type = np.empty((t,), np.int32)
        mat_id = np.empty((t,), np.int32)
        lib.sfvp_scene_fill(
            h, _fptr(vertices), _fptr(diffuse), _fptr(emission),
            _fptr(specular), _iptr(mat_type), _iptr(mat_id),
        )
        rough = np.zeros((t,), np.float32)
        if hasattr(lib, "sfvp_scene_fill_rough"):
            lib.sfvp_scene_fill_rough(h, _fptr(rough))
        face_uv = np.zeros((t, 3, 2), np.float32)
        face_tex = np.full((t,), -1, np.int32)
        tex_paths = []
        if hasattr(lib, "sfvp_scene_fill_uv"):
            lib.sfvp_scene_fill_uv(h, _fptr(face_uv), _iptr(face_tex))
            blob = lib.sfvp_scene_texture_paths(h).decode()
            tex_paths = blob.split("\n") if blob else []
        names_blob = lib.sfvp_scene_material_names(h).decode()
        names = names_blob.split("\n") if names_blob else []
        return Scene(
            vertices=vertices,
            indices=np.arange(3 * t, dtype=np.uint32),
            face_diffuse=diffuse,
            face_emission=emission,
            face_specular=specular,
            face_mat_type=mat_type,
            face_rough=rough,
            face_uv=face_uv,
            face_tex=face_tex,
            texture_paths=tex_paths,
            material_names=names,
            face_material_id=mat_id,
        )
    finally:
        lib.sfvp_scene_free(h)


def emit_topology_native(codes_sorted: np.ndarray, leaf_size: int):
    """Native hierarchy emission from sorted morton codes; returns
    (skip, first, count) or None when the library is unavailable.
    Identical output to accel.lbvh.emit_topology/topology_to_links."""
    lib = _get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(np.asarray(codes_sorted, np.uint32))
    t = codes.shape[0]
    cap = max(1, 2 * t)
    skip = np.empty(cap, np.int32)
    first = np.empty(cap, np.int32)
    count = np.empty(cap, np.int32)
    m = lib.sfvp_emit_topology(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), t, leaf_size,
        _iptr(skip), _iptr(first), _iptr(count),
    )
    return skip[:m].copy(), first[:m].copy(), count[:m].copy()


def build_lbvh_native(tris: np.ndarray, leaf_size: int = 4):
    """Native LBVH build; returns a BVH identical to lbvh.bvh_from_arrays
    or None when the library is unavailable. tris: (T, 3, 3) float32."""
    lib = _get_lib()
    if lib is None:
        return None
    from .accel.lbvh import BVH

    tris = np.ascontiguousarray(np.asarray(tris, np.float32))
    t = tris.shape[0]
    h = lib.sfvp_build_lbvh(_fptr(tris), t, leaf_size)
    try:
        m = lib.sfvp_bvh_num_nodes(h)
        bmin = np.empty((m, 3), np.float32)
        bmax = np.empty((m, 3), np.float32)
        skip = np.empty((m,), np.int32)
        first = np.empty((m,), np.int32)
        count = np.empty((m,), np.int32)
        tv = np.empty((9, t), np.float32)
        prim_id = np.empty((t,), np.int32)
        lib.sfvp_bvh_fill(
            h, _fptr(bmin), _fptr(bmax), _iptr(skip), _iptr(first),
            _iptr(count), _fptr(tv), _iptr(prim_id),
        )
        return BVH(
            bmin_x=bmin[:, 0].copy(), bmin_y=bmin[:, 1].copy(),
            bmin_z=bmin[:, 2].copy(),
            bmax_x=bmax[:, 0].copy(), bmax_y=bmax[:, 1].copy(),
            bmax_z=bmax[:, 2].copy(),
            skip=skip, first=first, count=count,
            tv=tuple(tv[i].copy() for i in range(9)),
            prim_id=prim_id,
        )
    finally:
        lib.sfvp_bvh_free(h)


def build_sah_native(tris: np.ndarray, leaf_size: int = 8,
                     max_leaf: int = 8):
    """Native binned-SAH build; returns a BVH identical to
    sah.sah_bvh_from_arrays or None when the library (or the symbol, on
    old .so builds) is unavailable. tris: (T, 3, 3) float32."""
    lib = _get_lib()
    if lib is None or not hasattr(lib, "sfvp_build_sah"):
        return None
    from .accel.lbvh import BVH

    tris = np.ascontiguousarray(np.asarray(tris, np.float32))
    t = tris.shape[0]
    h = lib.sfvp_build_sah(_fptr(tris), t, leaf_size, max_leaf)
    try:
        m = lib.sfvp_bvh_num_nodes(h)
        bmin = np.empty((m, 3), np.float32)
        bmax = np.empty((m, 3), np.float32)
        skip = np.empty((m,), np.int32)
        first = np.empty((m,), np.int32)
        count = np.empty((m,), np.int32)
        tv = np.empty((9, t), np.float32)
        prim_id = np.empty((t,), np.int32)
        lib.sfvp_bvh_fill(
            h, _fptr(bmin), _fptr(bmax), _iptr(skip), _iptr(first),
            _iptr(count), _fptr(tv), _iptr(prim_id),
        )
        return BVH(
            bmin_x=bmin[:, 0].copy(), bmin_y=bmin[:, 1].copy(),
            bmin_z=bmin[:, 2].copy(),
            bmax_x=bmax[:, 0].copy(), bmax_y=bmax[:, 1].copy(),
            bmax_z=bmax[:, 2].copy(),
            skip=skip, first=first, count=count,
            tv=tuple(tv[i].copy() for i in range(9)),
            prim_id=prim_id,
        )
    finally:
        lib.sfvp_bvh_free(h)

"""Native (C++) loader and LBVH builder must produce byte-identical outputs
to the pure-Python implementations. The library is auto-built from csrc/ if
the toolchain is present; tests skip if neither works."""

import numpy as np
import pytest

from sfvp_tpu import native
from sfvp_tpu.accel.lbvh import bvh_from_arrays, check_invariants
from sfvp_tpu.scene.objload import cornell_box_path, load_obj


@pytest.fixture(scope="module", autouse=True)
def ensure_lib():
    if not native.available():
        native.build()
        # reset the failed-load latch after a fresh build
        native._load_failed = False
        native._lib = None
    if not native.available():
        pytest.skip("native library unavailable and could not be built")


def test_obj_loader_parity_cornell():
    a = load_obj(cornell_box_path(), native="never")
    b = native.load_obj_native(cornell_box_path())
    np.testing.assert_array_equal(a.vertices, b.vertices)
    np.testing.assert_array_equal(a.face_diffuse, b.face_diffuse)
    np.testing.assert_array_equal(a.face_emission, b.face_emission)
    np.testing.assert_array_equal(a.face_specular, b.face_specular)
    np.testing.assert_array_equal(a.face_mat_type, b.face_mat_type)
    np.testing.assert_array_equal(a.face_material_id, b.face_material_id)
    assert a.material_names == b.material_names


def test_obj_loader_parity_quirks(tmp_path):
    """Relative indices, n-gons, usemtl before/after groups, illum 3,
    dielectric (illum 7 + Ni) incl. the white-tint default."""
    (tmp_path / "m.mtl").write_text(
        "newmtl a\nKd 0.1 0.2 0.3\nKe 1 2 3\nillum 2\n"
        "newmtl b\nKd 0 0 0\nKs 0.5 0.5 0.5\nillum 3\n"
        "newmtl g\nKd 0 0 0\nKs 0 0 0\nNi 1.5\nillum 7\n"
    )
    (tmp_path / "q.obj").write_text(
        "mtllib m.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nv 0 0 1\n"
        "usemtl a\nf 1 2 3 4\n"
        "usemtl b\nf -5 -4 -1\n"
        "g grp\nusemtl g\nf 1 2 5\n"
    )
    p = str(tmp_path / "q.obj")
    a = load_obj(p, native="never")
    b = native.load_obj_native(p)
    np.testing.assert_array_equal(a.vertices, b.vertices)
    np.testing.assert_array_equal(a.face_mat_type, b.face_mat_type)
    np.testing.assert_array_equal(a.face_specular, b.face_specular)
    np.testing.assert_array_equal(a.face_rough, b.face_rough)
    assert a.face_mat_type[-1] == 3
    assert a.material_names == b.material_names


def test_obj_loader_missing_file():
    with pytest.raises(FileNotFoundError):
        native.load_obj_native("/nonexistent/x.obj")


@pytest.mark.parametrize("n,leaf", [(36, 4), (500, 4), (5000, 8), (3, 1)])
def test_lbvh_parity(n, leaf):
    g = np.random.default_rng(n)
    tris = (
        g.uniform(-10, 10, (n, 1, 3)) + g.normal(0, 0.5, (n, 3, 3))
    ).astype(np.float32)
    a = bvh_from_arrays(tris, leaf_size=leaf)
    b = native.build_lbvh_native(tris, leaf_size=leaf)
    assert a.num_nodes == b.num_nodes
    np.testing.assert_array_equal(a.skip, b.skip)
    np.testing.assert_array_equal(a.first, b.first)
    np.testing.assert_array_equal(a.count, b.count)
    np.testing.assert_array_equal(a.prim_id, b.prim_id)
    for i in range(9):
        np.testing.assert_array_equal(a.tv[i], b.tv[i])
    for f in ("bmin_x", "bmin_y", "bmin_z", "bmax_x", "bmax_y", "bmax_z"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f))
    check_invariants(b, tris)


def test_build_bvh_auto_prefers_native(cornell_buffers):
    from sfvp_tpu.accel.lbvh import build_bvh

    a = build_bvh(cornell_buffers, native="never")
    b = build_bvh(cornell_buffers, native="require")
    np.testing.assert_array_equal(a.skip, b.skip)


@pytest.mark.parametrize("n", [36, 500, 5000, 3])
def test_sah_parity(n):
    """Native binned-SAH builder output is BIT-identical to the NumPy
    builder (same f32 aggregates, f64 cost math, stable partitions)."""
    from sfvp_tpu.accel.sah import sah_bvh_from_arrays

    g = np.random.default_rng(n + 17)
    tris = (
        g.uniform(-10, 10, (n, 1, 3)) + g.normal(0, 0.5, (n, 3, 3))
    ).astype(np.float32)
    a = sah_bvh_from_arrays(tris, native="never")
    b = native.build_sah_native(tris)
    if b is None:
        pytest.skip("native library unavailable")
    assert a.num_nodes == b.num_nodes
    np.testing.assert_array_equal(a.skip, b.skip)
    np.testing.assert_array_equal(a.first, b.first)
    np.testing.assert_array_equal(a.count, b.count)
    np.testing.assert_array_equal(a.prim_id, b.prim_id)
    for i in range(9):
        np.testing.assert_array_equal(a.tv[i], b.tv[i])
    for f in ("bmin_x", "bmin_y", "bmin_z", "bmax_x", "bmax_y", "bmax_z"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f))
    check_invariants(b, tris)


def test_sah_parity_degenerate_centroids():
    """All-identical centroids: the stable-median fallback must agree."""
    from sfvp_tpu.accel.sah import sah_bvh_from_arrays

    g = np.random.default_rng(3)
    tri = g.normal(size=(1, 3, 3)).astype(np.float32)
    tris = np.repeat(tri, 41, axis=0)
    a = sah_bvh_from_arrays(tris, native="never")
    b = native.build_sah_native(tris)
    if b is None:
        pytest.skip("native library unavailable")
    np.testing.assert_array_equal(a.skip, b.skip)
    np.testing.assert_array_equal(a.prim_id, b.prim_id)

"""Scene-ingest parity tests.

Oracle values come from the reference's flattening semantics
(ref main.cpp:28-58): Cornell Box = 18 quads -> 36 triangles, fully
non-indexed (108 vertices), 8 materials, light Ke (17,12,4), Y negated.
"""

import os

import numpy as np
import pytest

from sfvp_tpu import load_obj, upload
from sfvp_tpu.scene.objload import cornell_box_path

REF_ASSETS = "/root/reference/assets"


def test_cornell_counts(cornell):
    assert cornell.num_triangles == 36
    assert cornell.vertices.shape == (108, 3)
    assert cornell.indices.shape == (108,)
    np.testing.assert_array_equal(cornell.indices, np.arange(108, dtype=np.uint32))
    assert len(cornell.material_names) == 8


def test_light_material(cornell):
    em = cornell.face_emission
    lit = np.any(em > 0, axis=1)
    # one area-light quad -> 2 triangles with Ke (17, 12, 4)
    assert lit.sum() == 2
    np.testing.assert_allclose(em[lit], [[17, 12, 4]] * 2)


def test_y_flip(cornell):
    # ceiling is at y=1.99 in the file; flipped to -1.99
    assert cornell.vertices[:, 1].min() == pytest.approx(-1.99)
    assert cornell.vertices[:, 1].max() == pytest.approx(0.0)


def test_fan_triangulation_order(tmp_path):
    # quad (0,1,2,3) -> (0,1,2), (0,2,3); absolute and relative indices agree
    obj = tmp_path / "quad.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\nf -4 -3 -2 -1\n"
    )
    s = load_obj(str(obj), flip_y=False)
    assert s.num_triangles == 4
    tris = s.triangles()
    np.testing.assert_allclose(tris[0], [[0, 0, 0], [1, 0, 0], [1, 1, 0]])
    np.testing.assert_allclose(tris[1], [[0, 0, 0], [1, 1, 0], [0, 1, 0]])
    np.testing.assert_allclose(tris[2], tris[0])
    np.testing.assert_allclose(tris[3], tris[1])


def test_materials_kd_ke(cornell):
    names = cornell.material_names
    i_left = None
    for t in range(cornell.num_triangles):
        if cornell.face_material_id is not None:
            m = cornell.face_material_id[t]
            if names[m] == "leftWall":
                i_left = t
                break
    assert i_left is not None
    np.testing.assert_allclose(
        cornell.face_diffuse[i_left], [0.63, 0.065, 0.05], rtol=1e-6
    )


@pytest.mark.skipif(not os.path.isdir(REF_ASSETS), reason="reference assets absent")
def test_parity_with_reference_asset():
    """The canonical re-emitted asset must parse to the same arrays as the
    upstream file."""
    ours = load_obj(cornell_box_path())
    theirs = load_obj(os.path.join(REF_ASSETS, "CornellBox-Original.obj"))
    np.testing.assert_allclose(ours.vertices, theirs.vertices, atol=0)
    np.testing.assert_allclose(ours.face_diffuse, theirs.face_diffuse, atol=0)
    np.testing.assert_allclose(ours.face_emission, theirs.face_emission, atol=0)


def test_upload_padding(cornell):
    buf = upload(cornell, pad_to=64)
    assert buf.v0.shape == (64, 3)
    assert buf.num_tris == 36
    # padded triangles are degenerate
    np.testing.assert_array_equal(np.asarray(buf.v0[36:]), 0)
    np.testing.assert_array_equal(np.asarray(buf.emission[36:]), 0)


def test_city_mesh_structure():
    """Architectural generator: counts, winding convention (reference
    normals face outward/up), emissive rooftops, glossy-ground option."""
    import numpy as np

    from sfvp_tpu.scene.procedural import city_mesh

    s = city_mesh(n_buildings=10, subdiv=3, seed=1, glossy_ground=True)
    t = s.num_triangles
    # ground (2*subdiv^2) + 10 buildings * 5 faces * 2*subdiv^2
    assert t == 2 * 9 + 10 * 5 * 2 * 9
    assert (s.face_mat_type == 2).sum() == 2 * 9  # glossy ground only
    assert s.face_rough[s.face_mat_type == 2].max() > 0
    # ground triangles: reference normal -cross points +y
    tris = s.triangles()
    n = -np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    ground = np.abs(tris[:, :, 1]).max(axis=1) < 1e-6
    assert (n[ground][:, 1] > 0).all()
    # some emissive faces exist across seeds (statistically certain here)
    s2 = city_mesh(n_buildings=40, subdiv=2, seed=0)
    assert (s2.face_emission.max(axis=1) > 0).any()

"""Scene layer: OBJ loader, camera, lights, procedural meshes."""

import os

import numpy as np

from dpt_tpu import OrbitCamera, load_scene, make_area_lights
from dpt_tpu.scene.obj import load_obj, write_obj
from dpt_tpu.scene.procedural import box_mesh, bumpy_sphere

OBJ_QUADS = """\
# test
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
usemtl red
f 1/1 2/2 3/3 4/4
"""

OBJ_NEG = """\
v 0 0 0
v 1 0 0
v 0 1 0
f -3 -2 -1
"""


def test_load_quads_fan_triangulated(tmp_path):
    p = tmp_path / "q.obj"
    p.write_text(OBJ_QUADS)
    m = load_obj(str(p))
    assert m.indices.shape == (2, 3)  # quad → 2 tris
    np.testing.assert_array_equal(m.indices[0], [0, 1, 2])
    np.testing.assert_array_equal(m.indices[1], [0, 2, 3])
    np.testing.assert_allclose(m.uvs[0], [[0, 0], [1, 0], [1, 1]])
    assert m.material_names == ["red"]


def test_load_negative_indices(tmp_path):
    p = tmp_path / "n.obj"
    p.write_text(OBJ_NEG)
    m = load_obj(str(p))
    np.testing.assert_array_equal(m.indices[0], [0, 1, 2])


def test_mtl_albedo(tmp_path):
    (tmp_path / "m.mtl").write_text("newmtl red\nKd 0.9 0.1 0.2\n")
    p = tmp_path / "s.obj"
    p.write_text("mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nusemtl red\nf 1 2 3\n")
    m = load_obj(str(p))
    np.testing.assert_allclose(m.material_albedo[0], [0.9, 0.1, 0.2])


def test_write_read_roundtrip(tmp_path):
    v, idx = box_mesh()
    p = tmp_path / "box.obj"
    write_obj(str(p), v, idx)
    m = load_obj(str(p))
    np.testing.assert_allclose(m.vertices, v)
    np.testing.assert_array_equal(m.indices, idx)


def test_load_scene_defaults(tmp_path):
    v, idx = box_mesh()
    p = tmp_path / "box.obj"
    write_obj(str(p), v, idx)
    sc = load_scene(str(p))
    assert sc.n_triangles == 12
    assert sc.lights.count == 1  # reference default light
    np.testing.assert_allclose(np.asarray(sc.lights.position), [[0, 2, 0]])
    np.testing.assert_allclose(np.asarray(sc.materials.albedo), [[0.8, 0.8, 0.8]])


def test_lights_normalised_on_pack():
    lights = make_area_lights([[0, 2, 0]], [[0, -2, 0]], [[10, 10, 10]], [[2.5, 2.5]])
    np.testing.assert_allclose(np.asarray(lights.normal), [[0, -1, 0]], atol=1e-6)


def test_orbit_camera_defaults():
    cam = OrbitCamera().camera()
    np.testing.assert_allclose(np.asarray(cam.position), [0, 0, 5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam.direction), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam.up), [0, 1, 0], atol=1e-6)
    assert float(cam.fov_deg) == 60.0


def test_orbit_camera_motion():
    oc = OrbitCamera().view_update(90.0 / 0.25, 0.0)  # 90° yaw (sensitivity .25)
    cam = oc.camera()
    pos = np.asarray(cam.position)
    assert abs(np.linalg.norm(pos) - 5.0) < 1e-5  # stays on the orbit sphere
    assert abs(pos[2]) < 1e-4  # rotated to the side
    zoomed = oc.zoom_update(0.9)
    assert np.isclose(np.linalg.norm(np.asarray(zoomed.camera().position)), 4.5)


def test_camera_state_tuple_detects_change():
    a = OrbitCamera()
    b = a.view_update(1.0, 0.0)
    assert a.state_tuple() != b.state_tuple()
    assert a.state_tuple() == OrbitCamera().state_tuple()


def test_bumpy_sphere_scales():
    v, idx = bumpy_sphere(n_lat=16, n_lon=32)
    assert idx.shape[0] == 2 * 15 * 32  # 2 tris per interior quad strip cell
    assert idx.max() < len(v)

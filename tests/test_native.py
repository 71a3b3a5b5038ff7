"""Native C++ runtime (native/libdpt_native.so) ≡ numpy fallbacks.

Builds the library via the Makefile (VERDICT r1: nothing previously built or
tested it), then asserts the exact output contracts:
  - dpt_build_bvh ≡ accel.bvh.build_bvh_median (same splits, same encoding)
  - dpt_load_obj_* ≡ scene.obj.load_obj python path
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE_DIR = os.path.join(ROOT, "native")
SO = os.path.join(NATIVE_DIR, "libdpt_native.so")


@pytest.fixture(scope="module")
def native_lib():
    if shutil.which("g++") is None and shutil.which("cc") is None:
        pytest.skip("no C++ compiler available")
    subprocess.run(["make", "-C", NATIVE_DIR], check=True,
                   capture_output=True)
    assert os.path.exists(SO)
    # Reset the cached handle so this test run picks up the fresh build.
    from dpt_tpu.utils import native

    native._LIB = None
    native._TRIED = False
    assert native.available()
    return native


def test_native_bvh_matches_numpy(native_lib):
    from dpt_tpu.accel.bvh import build_bvh_median, validate_bvh
    from dpt_tpu.scene.builder import procedural_scene

    scene = procedural_scene(n_tris_target=3_000)
    v = np.asarray(scene.vertices)
    idx = np.asarray(scene.indices)

    py = build_bvh_median(v, idx, leaf_size=4, use_native=False)
    out = native_lib.native_build_bvh(v, idx, 4)
    assert out is not None
    nmin, nmax, nleft, nright, order = out

    np.testing.assert_array_equal(np.asarray(py.node_left), nleft)
    np.testing.assert_array_equal(np.asarray(py.node_right), nright)
    np.testing.assert_allclose(np.asarray(py.node_min), nmin, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(py.node_max), nmax, rtol=1e-6)
    # tri_order may differ inside equal-centroid runs (nth_element vs stable
    # argsort); both must still be valid structures over the same leaves.
    import jax.numpy as jnp

    from dpt_tpu.accel.bvh import BVH

    validate_bvh(
        BVH(jnp.asarray(nmin), jnp.asarray(nmax), jnp.asarray(nleft),
            jnp.asarray(nright), jnp.asarray(order)),
        v, idx,
    )


def test_native_sah_matches_numpy(native_lib):
    """dpt_build_bvh_sah ≡ accel.bvh.build_bvh_sah bit-for-bit: same float32
    half-area arithmetic, float64 bin scale, first-minimum tie-breaking,
    stable partitions and stable median fallback."""
    from dpt_tpu.accel.bvh import build_bvh_sah, validate_bvh
    from dpt_tpu.scene.builder import procedural_scene

    scene = procedural_scene(n_tris_target=5_000)
    v = np.asarray(scene.vertices)
    idx = np.asarray(scene.indices)

    for leaf in (1, 8):
        py = build_bvh_sah(v, idx, leaf_size=leaf, use_native=False)
        out = native_lib.native_build_bvh_sah(v, idx, leaf)
        assert out is not None
        nmin, nmax, nleft, nright, order = out
        np.testing.assert_array_equal(np.asarray(py.node_left), nleft)
        np.testing.assert_array_equal(np.asarray(py.node_right), nright)
        np.testing.assert_array_equal(np.asarray(py.tri_order), order)
        np.testing.assert_array_equal(np.asarray(py.node_min), nmin)
        np.testing.assert_array_equal(np.asarray(py.node_max), nmax)
        validate_bvh(py, v, idx)


def test_native_bvh_used_by_default(native_lib):
    """build_bvh_median(use_native=True) routes through the .so for big
    meshes and produces a structurally valid tree."""
    from dpt_tpu.accel.bvh import build_bvh_median, validate_bvh
    from dpt_tpu.scene.builder import procedural_scene

    scene = procedural_scene(n_tris_target=3_000)
    v = np.asarray(scene.vertices)
    idx = np.asarray(scene.indices)
    bvh = build_bvh_median(v, idx, leaf_size=4, use_native=True)
    validate_bvh(bvh, v, idx)


def test_native_obj_matches_python(native_lib, tmp_path):
    obj = tmp_path / "fixture.obj"
    mtl = tmp_path / "fixture.mtl"
    mtl.write_text("newmtl red\nKd 0.9 0.1 0.2\nnewmtl blue\nKd 0.1 0.2 0.9\n")
    obj.write_text(
        "mtllib fixture.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nv 0 0 1\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "usemtl red\n"
        "f 1/1 2/2 3/3 4/4\n"       # quad → fan triangulation
        "usemtl blue\n"
        "f -5/-4 -4/-3 -1/-2\n"      # negative (relative) indices
        "f 1 2 5\n"                  # no texcoords
    )
    from dpt_tpu.scene.obj import load_obj

    py = load_obj(str(obj), use_native=False)
    nat = load_obj(str(obj), use_native=True)

    np.testing.assert_allclose(py.vertices, nat.vertices)
    np.testing.assert_array_equal(py.indices, nat.indices)
    np.testing.assert_allclose(py.uvs, nat.uvs)
    np.testing.assert_array_equal(py.mat_idx, nat.mat_idx)
    assert py.material_names == nat.material_names
    np.testing.assert_allclose(py.material_albedo, nat.material_albedo)

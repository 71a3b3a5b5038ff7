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


def test_native_sah_degenerate_centroids(native_lib):
    """Exercise the SAH builder's degenerate branch (ADVICE r4 #5): when all
    centroids in a node share a bin along every axis, best_axis stays < 0
    and the builder falls back to a stable median split — the near-convex
    sphere of the main parity test never reaches that path, yet the native
    builder is the default for every mesh >= 1024 tris."""
    from dpt_tpu.accel.bvh import build_bvh_sah, validate_bvh

    rng = np.random.default_rng(7)
    tris = []
    # 48 triangles sharing ONE centroid (rotated fans), plus a few distinct
    # clusters so internal nodes mix degenerate and regular splits.
    for ci, c in enumerate([(0, 0, 0), (3, 0, 0), (0, 3, 0)]):
        c = np.asarray(c, np.float32)
        for k in range(48 if ci == 0 else 8):
            th = 2 * np.pi * rng.random()
            r = 0.25 + 0.5 * rng.random()
            pts = np.stack([
                c + r * np.array([np.cos(th + a), np.sin(th + a), 0.3 * np.sin(a)],
                                 np.float32)
                for a in (0.0, 2.0943951, 4.1887902)
            ])
            # Shift so the centroid is exactly c (shared across the fan).
            pts = pts - pts.mean(axis=0) + c
            tris.append(pts)
    v = np.concatenate(tris).astype(np.float32)
    idx = np.arange(len(v), dtype=np.int32).reshape(-1, 3)

    for leaf in (1, 4):
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


def test_native_sah_knot_scene(native_lib):
    """Parity on the second mesh family (self-shadowing torus knot) — a
    different traversal/centroid profile from the near-convex sphere."""
    from dpt_tpu.accel.bvh import build_bvh_sah, validate_bvh
    from dpt_tpu.scene.builder import knot_scene

    scene = knot_scene(n_tris_target=4_000)
    v = np.asarray(scene.vertices)
    idx = np.asarray(scene.indices)
    py = build_bvh_sah(v, idx, leaf_size=8, use_native=False)
    out = native_lib.native_build_bvh_sah(v, idx, 8)
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

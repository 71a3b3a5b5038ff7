"""On-device LBVH: structural validity + nearest hits ≡ brute force."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpt_tpu import RenderConfig, procedural_scene
from dpt_tpu.accel.bvh import validate_bvh
from dpt_tpu.accel.lbvh import build_lbvh, morton3d
from dpt_tpu.accel.packet import packet_nearest
from dpt_tpu.accel.traverse import bvh_nearest
from dpt_tpu.render.intersect import brute_force_nearest


@pytest.fixture(scope="module")
def sphere_scene():
    return procedural_scene(n_tris_target=1500)


def test_morton_ordering():
    # points along the diagonal must get increasing codes
    q = jnp.asarray([[0, 0, 0], [1, 1, 1], [512, 512, 512], [1023, 1023, 1023]],
                    jnp.uint32)
    m = np.asarray(morton3d(q))
    assert (np.diff(m.astype(np.int64)) > 0).all()
    # single-axis bit placement: x gets the high bit of each 3-bit group
    assert int(morton3d(jnp.asarray([[1, 0, 0]], jnp.uint32))[0]) == 4
    assert int(morton3d(jnp.asarray([[0, 1, 0]], jnp.uint32))[0]) == 2
    assert int(morton3d(jnp.asarray([[0, 0, 1]], jnp.uint32))[0]) == 1


def test_lbvh_structural(sphere_scene):
    bvh = jax.jit(build_lbvh)(sphere_scene.vertices, sphere_scene.indices)
    validate_bvh(bvh, sphere_scene.vertices, sphere_scene.indices)


def test_lbvh_single_triangle():
    v = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], jnp.float32)
    idx = jnp.asarray([[0, 1, 2]], jnp.int32)
    bvh = build_lbvh(v, idx)
    assert bvh.n_nodes == 1
    assert int(bvh.node_left[0]) == -1


@pytest.mark.parametrize("mode", ["bvh", "packet"])
def test_lbvh_traversal_equals_brute(mode, sphere_scene):
    cfg = RenderConfig(traversal=mode, packet_tile=64, bvh_leaf_size=1)
    bvh = jax.jit(build_lbvh)(sphere_scene.vertices, sphere_scene.indices)
    v0, v1, v2 = sphere_scene.tri_vertices()
    rng = np.random.default_rng(11)
    # aim rays at the object so most of them hit
    o = jnp.asarray(rng.normal(size=(256, 3)) * 3 + 4, jnp.float32)
    d = -np.asarray(o) + rng.normal(size=(256, 3)) * 0.3
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    bf_hit, bf_t, bf_tri, _, _ = brute_force_nearest(o, d, v0, v1, v2)
    fn = bvh_nearest if mode == "bvh" else packet_nearest
    hit, t, tri = fn(o, d, bvh, v0, v1, v2, cfg)
    m = np.asarray(bf_hit)
    assert m.sum() > 100  # the test actually exercises hits
    np.testing.assert_array_equal(np.asarray(hit), m)
    np.testing.assert_allclose(
        np.asarray(t)[m], np.asarray(bf_t)[m], rtol=2e-6, atol=1e-7
    )
    assert (np.asarray(tri)[m] == np.asarray(bf_tri)[m]).mean() > 0.99

"""BVH build + traversal: structural invariants and exact nearest-hit
equality against brute force (SURVEY §4.3)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dpt_tpu import RenderConfig, cornell_box_scene, procedural_scene
from dpt_tpu.accel.bvh import build_accel, build_bvh_median, validate_bvh
from dpt_tpu.accel.packet import packet_nearest
from dpt_tpu.accel.traverse import bvh_nearest
from dpt_tpu.render.intersect import brute_force_nearest


def _random_rays(n, seed=0, spread=4.0):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)) * spread
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


@pytest.fixture(scope="module")
def sphere_scene():
    return procedural_scene(n_tris_target=2000)


@pytest.mark.parametrize("leaf_size", [1, 4])
def test_build_invariants(leaf_size, sphere_scene):
    bvh = build_bvh_median(
        np.asarray(sphere_scene.vertices),
        np.asarray(sphere_scene.indices),
        leaf_size=leaf_size,
        use_native=False,
    )
    validate_bvh(bvh, sphere_scene.vertices, sphere_scene.indices)


@pytest.mark.parametrize("mode", ["bvh", "packet"])
@pytest.mark.parametrize("scene_name", ["box", "sphere"])
def test_traversal_equals_brute_force(mode, scene_name, box_scene, sphere_scene):
    scene = box_scene if scene_name == "box" else sphere_scene
    cfg = RenderConfig(traversal=mode, packet_tile=64)
    bvh = build_bvh_median(
        np.asarray(scene.vertices),
        np.asarray(scene.indices),
        leaf_size=cfg.bvh_leaf_size,
        use_native=False,
    )
    v0, v1, v2 = scene.tri_vertices()
    o, d = _random_rays(256, seed=3)
    bf_hit, bf_t, bf_tri, _, _ = brute_force_nearest(o, d, v0, v1, v2)
    fn = bvh_nearest if mode == "bvh" else packet_nearest
    hit, t, tri = fn(o, d, bvh, v0, v1, v2, cfg)

    # Identical hit decisions; t agrees to float32 ULP (XLA fuses the
    # broadcast [R,T] and gathered [R] Möller–Trumbore math differently, so
    # bitwise equality is not attainable across code paths).
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(bf_hit))
    m = np.asarray(bf_hit)
    np.testing.assert_allclose(
        np.asarray(t)[m], np.asarray(bf_t)[m], rtol=2e-6, atol=1e-7
    )
    tri_agree = np.asarray(tri)[m] == np.asarray(bf_tri)[m]
    assert tri_agree.mean() > 0.99  # rare ULP ties may pick a different tri


def test_rays_from_inside(box_scene):
    """Rays starting inside the cube must hit it (interior traversal)."""
    cfg = RenderConfig(traversal="bvh")
    bvh = build_accel(box_scene, cfg.replace(bvh_builder="median"))
    v0, v1, v2 = box_scene.tri_vertices()
    o = jnp.zeros((8, 3), jnp.float32)
    d = jnp.asarray(
        np.concatenate([np.eye(3), -np.eye(3), [[1, 1, 1], [-1, -1, 1]]]),
        jnp.float32,
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    hit, t, tri = bvh_nearest(o, d, bvh, v0, v1, v2, cfg)
    assert bool(np.asarray(hit).all())
    np.testing.assert_allclose(np.asarray(t)[:6], 1.0, rtol=1e-5)

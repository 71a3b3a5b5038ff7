"""Threaded skip-pointer traversal ≡ brute force (accel/threaded.py).

Exact-equality test strategy per SURVEY §4.3: the threaded walk must return
identical nearest hits to the brute-force oracle, and the any-hit query must
match the nearest-hit-derived predicate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpt_tpu import RenderConfig, cornell_box_scene
from dpt_tpu.accel.bvh import build_bvh_median, build_bvh_sah
from dpt_tpu.accel.lbvh import build_lbvh
from dpt_tpu.accel.threaded import (
    build_threaded,
    threaded_nearest,
    threaded_occluded,
)
from dpt_tpu.render.intersect import brute_force_nearest, brute_force_occluded
from dpt_tpu.scene.builder import procedural_scene


def _rays(n=256, seed=0, spread=3.0):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)) * spread
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def _build(scene, builder, leaf_size):
    v = np.asarray(scene.vertices)
    idx = np.asarray(scene.indices)
    if builder == "median":
        bvh = build_bvh_median(v, idx, leaf_size=leaf_size, use_native=False)
    elif builder == "sah":
        bvh = build_bvh_sah(v, idx, leaf_size=leaf_size)
    else:
        bvh = jax.jit(build_lbvh)(scene.vertices, scene.indices)
    v0, v1, v2 = scene.tri_vertices()
    return build_threaded(bvh, v0, v1, v2)


@pytest.mark.parametrize("builder", ["median", "sah", "lbvh"])
def test_threaded_nearest_matches_brute(box_scene, builder):
    acc = _build(box_scene, builder, leaf_size=2)
    v0, v1, v2 = box_scene.tri_vertices()
    o, d = _rays(256)
    bh, bt, bi, _, _ = brute_force_nearest(o, d, v0, v1, v2)
    th, tt, ti = jax.jit(
        lambda o, d, a: threaded_nearest(o, d, a)
    )(o, d, acc)
    np.testing.assert_array_equal(np.asarray(bh), np.asarray(th))
    # t agrees everywhere a hit exists (ties may pick a different triangle
    # with the same t, so compare t, not ids).
    np.testing.assert_allclose(
        np.asarray(jnp.where(bh, bt, 0.0)),
        np.asarray(jnp.where(bh, tt, 0.0)),
        rtol=1e-5, atol=1e-6,
    )


def test_threaded_on_procedural_mesh():
    scene = procedural_scene(n_tris_target=2_000)
    acc = _build(scene, "median", leaf_size=4)
    v0, v1, v2 = scene.tri_vertices()
    o, d = _rays(512, seed=3, spread=1.5)
    bh, bt, bi, _, _ = brute_force_nearest(o, d, v0, v1, v2)
    th, tt, ti = jax.jit(
        lambda o, d, a: threaded_nearest(o, d, a)
    )(o, d, acc)
    np.testing.assert_array_equal(np.asarray(bh), np.asarray(th))
    np.testing.assert_allclose(
        np.asarray(jnp.where(bh, bt, 0.0)),
        np.asarray(jnp.where(bh, tt, 0.0)),
        rtol=1e-5, atol=1e-6,
    )
    # Chunked execution must be identical to single-shot.
    ch, ct, ci = jax.jit(
        lambda o, d, a: threaded_nearest(o, d, a, chunk=128)
    )(o, d, acc)
    np.testing.assert_array_equal(np.asarray(th), np.asarray(ch))
    np.testing.assert_array_equal(np.asarray(tt), np.asarray(ct))


def test_threaded_occluded_matches_brute(box_scene):
    acc = _build(box_scene, "median", leaf_size=2)
    v0, v1, v2 = box_scene.tri_vertices()
    o, d = _rays(256, seed=1)
    md = jnp.full((o.shape[0],), 2.5, jnp.float32)
    bo = brute_force_occluded(o, d, md, v0, v1, v2)
    to = jax.jit(
        lambda o, d, m, a: threaded_occluded(o, d, m, a)
    )(o, d, md, acc)
    np.testing.assert_array_equal(np.asarray(bo), np.asarray(to))
    # Masked rays (max_dist <= 0) are never occluded.
    to0 = jax.jit(
        lambda o, d, m, a: threaded_occluded(o, d, m, a)
    )(o, d, jnp.full_like(md, -1.0), acc)
    assert not bool(jnp.any(to0))


def test_threaded_masked_far_origin(box_scene):
    """Integrator dead-lane convention: origin 1e9 ⇒ miss in one step."""
    acc = _build(box_scene, "median", leaf_size=2)
    o = jnp.full((64, 3), 1e9, jnp.float32)
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (64, 1))
    h, t, i = threaded_nearest(o, d, acc)
    assert not bool(jnp.any(h))


def test_threaded_end_to_end_render(box_scene, default_camera):
    """Full render_sample with traversal='threaded' ≡ brute-force render."""
    from dpt_tpu.accel.bvh import build_accel
    from dpt_tpu.render.renderer import render_sample

    cfg_b = RenderConfig(width=32, height=32, max_depth=2, spp=1,
                         traversal="brute", enable_sss=True)
    cfg_t = cfg_b.replace(traversal="threaded", bvh_builder="median",
                          bvh_leaf_size=2)
    accel = build_accel(box_scene, cfg_t)
    img_b = render_sample(box_scene, default_camera, cfg_b, jnp.uint32(0))
    img_t = render_sample(box_scene, default_camera, cfg_t, jnp.uint32(0),
                          accel)
    np.testing.assert_allclose(
        np.asarray(img_b), np.asarray(img_t), rtol=1e-4, atol=1e-5
    )

"""Paged per-lane skip-walk kernel ≡ brute force (interpreted on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dpt_tpu import RenderConfig
from dpt_tpu.accel.bvh import build_bvh_median, build_bvh_sah
from dpt_tpu.kernels.pallas_lane import pack_lane, lane_nearest, lane_occluded
from dpt_tpu.render.intersect import brute_force_nearest, brute_force_occluded
from dpt_tpu.scene.builder import procedural_scene


def _rays(n=256, seed=0, spread=3.0):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)) * spread
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def _pack(scene, builder="median", leaf_size=4):
    v = np.asarray(scene.vertices)
    idx = np.asarray(scene.indices)
    if builder == "median":
        bvh = build_bvh_median(v, idx, leaf_size=leaf_size, use_native=False)
    else:
        bvh = build_bvh_sah(v, idx, leaf_size=leaf_size)
    return pack_lane(bvh, v[idx[:, 0]], v[idx[:, 1]], v[idx[:, 2]])


@pytest.mark.parametrize("builder", ["median", "sah"])
def test_lane_nearest_matches_brute(box_scene, builder):
    acc = _pack(box_scene, builder)
    v0, v1, v2 = box_scene.tri_vertices()
    o, d = _rays(256)
    bh, bt, bi, _, _ = brute_force_nearest(o, d, v0, v1, v2)
    lh, lt, li = lane_nearest(o, d, acc)
    np.testing.assert_array_equal(np.asarray(bh), np.asarray(lh))
    np.testing.assert_allclose(
        np.asarray(jnp.where(bh, bt, 0.0)),
        np.asarray(jnp.where(bh, lt, 0.0)),
        rtol=1e-5, atol=1e-6,
    )


def test_lane_nearest_procedural_multipage():
    # >1024 records forces multiple pages.
    scene = procedural_scene(n_tris_target=2_000)
    acc = _pack(scene, "sah", leaf_size=8)
    assert acc.n_records > 1024
    v0, v1, v2 = scene.tri_vertices()
    o, d = _rays(512, seed=5, spread=1.5)
    bh, bt, bi, _, _ = brute_force_nearest(o, d, v0, v1, v2)
    lh, lt, li = lane_nearest(o, d, acc)
    np.testing.assert_array_equal(np.asarray(bh), np.asarray(lh))
    np.testing.assert_allclose(
        np.asarray(jnp.where(bh, bt, 0.0)),
        np.asarray(jnp.where(bh, lt, 0.0)),
        rtol=1e-5, atol=1e-6,
    )


def test_lane_occluded_matches_brute(box_scene):
    acc = _pack(box_scene)
    v0, v1, v2 = box_scene.tri_vertices()
    o, d = _rays(256, seed=1)
    md = jnp.full((o.shape[0],), 2.5, jnp.float32)
    bo = brute_force_occluded(o, d, md, v0, v1, v2)
    lo = lane_occluded(o, d, md, acc)
    np.testing.assert_array_equal(np.asarray(bo), np.asarray(lo))
    lo0 = lane_occluded(o, d, jnp.full_like(md, -1.0), acc)
    assert not bool(jnp.any(lo0))


def test_lane_end_to_end_render(box_scene, default_camera):
    from dpt_tpu.accel.bvh import build_accel
    from dpt_tpu.render.renderer import render_sample

    cfg_b = RenderConfig(width=32, height=32, max_depth=2, spp=1,
                         traversal="brute", enable_sss=True)
    cfg_l = cfg_b.replace(traversal="lane", bvh_builder="median",
                          bvh_leaf_size=4, ray_sort=True)
    accel = build_accel(box_scene, cfg_l)
    img_b = render_sample(box_scene, default_camera, cfg_b, jnp.uint32(0))
    img_l = render_sample(box_scene, default_camera, cfg_l, jnp.uint32(0),
                          accel)
    np.testing.assert_allclose(
        np.asarray(img_b), np.asarray(img_l), rtol=1e-4, atol=1e-5
    )

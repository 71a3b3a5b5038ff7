"""Paired-children Mosaic kernel ≡ brute force (interpreted on CPU).

Mirrors tests/test_pallas.py for kernels/pallas_wide.py: exact nearest-hit
equality (SURVEY §4.3), any-hit parity, leaf-row layout invariants, and the
stack-depth hard guarantee.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpt_tpu import RenderConfig, cornell_box_scene
from dpt_tpu.accel.bvh import build_bvh_median, build_bvh_sah
from dpt_tpu.kernels.pallas_wide import pack_wide, wide_nearest, wide_occluded
from dpt_tpu.render.intersect import brute_force_nearest, brute_force_occluded
from dpt_tpu.scene.builder import procedural_scene

CFG = RenderConfig(packet_tile=1024, bvh_leaf_size=4)


def _rays(n=64, seed=0, spread=3.0):
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
    v0 = v[idx[:, 0]]
    v1 = v[idx[:, 1]]
    v2 = v[idx[:, 2]]
    return pack_wide(bvh, v0, v1, v2)


def test_layout_invariants(box_scene):
    acc = _pack(box_scene)
    assert acc.nodes.shape[1] == 128
    assert acc.tris.shape[1] == 128
    # Valid flags mark exactly n_triangles slots across all leaf rows.
    trows = np.asarray(acc.tris).reshape(-1, 8, 16)
    assert int((trows[:, :, 10] > 0.5).sum()) == box_scene.n_triangles
    # Triangle ids are a permutation of [0, T).
    ids = trows[:, :, 9][trows[:, :, 10] > 0.5].astype(np.int64)
    assert sorted(ids.tolist()) == list(range(box_scene.n_triangles))
    assert acc.max_depth >= 1


@pytest.mark.parametrize("builder", ["median", "sah"])
def test_nearest_matches_brute(box_scene, builder):
    acc = _pack(box_scene, builder)
    v0, v1, v2 = box_scene.tri_vertices()
    o, d = _rays(256)
    bh, bt, bi, _, _ = brute_force_nearest(o, d, v0, v1, v2)
    wh, wt, wi = wide_nearest(o, d, acc, CFG)
    np.testing.assert_array_equal(np.asarray(bh), np.asarray(wh))
    np.testing.assert_allclose(
        np.asarray(jnp.where(bh, bt, 0.0)),
        np.asarray(jnp.where(bh, wt, 0.0)),
        rtol=1e-5, atol=1e-6,
    )


def test_nearest_procedural():
    scene = procedural_scene(n_tris_target=2_000)
    acc = _pack(scene, "sah", leaf_size=8)
    v0, v1, v2 = scene.tri_vertices()
    o, d = _rays(512, seed=5, spread=1.5)
    bh, bt, bi, _, _ = brute_force_nearest(o, d, v0, v1, v2)
    wh, wt, wi = wide_nearest(o, d, acc, CFG)
    np.testing.assert_array_equal(np.asarray(bh), np.asarray(wh))
    np.testing.assert_allclose(
        np.asarray(jnp.where(bh, bt, 0.0)),
        np.asarray(jnp.where(bh, wt, 0.0)),
        rtol=1e-5, atol=1e-6,
    )


def test_occluded_matches_brute(box_scene):
    acc = _pack(box_scene)
    v0, v1, v2 = box_scene.tri_vertices()
    o, d = _rays(256, seed=1)
    md = jnp.full((o.shape[0],), 2.5, jnp.float32)
    bo = brute_force_occluded(o, d, md, v0, v1, v2)
    wo = wide_occluded(o, d, md, acc, CFG)
    np.testing.assert_array_equal(np.asarray(bo), np.asarray(wo))
    # Masked lanes (max_dist <= 0) resolve to not-occluded.
    wo0 = wide_occluded(o, d, jnp.full_like(md, -1.0), acc, CFG)
    assert not bool(jnp.any(wo0))


def test_stack_guard(box_scene):
    acc = _pack(box_scene)
    bad = CFG.replace(bvh_stack_depth=1)
    o, d = _rays(8)
    with pytest.raises(ValueError, match="stack_depth"):
        wide_nearest(o, d, acc, bad)


def test_end_to_end_render(box_scene, default_camera):
    from dpt_tpu.accel.bvh import build_accel
    from dpt_tpu.render.renderer import render_sample

    cfg_b = RenderConfig(width=32, height=32, max_depth=2, spp=1,
                         traversal="brute", enable_sss=True)
    cfg_w = cfg_b.replace(traversal="pallas", bvh_builder="median",
                          bvh_leaf_size=4, ray_sort=True)
    accel = build_accel(box_scene, cfg_w)
    img_b = render_sample(box_scene, default_camera, cfg_b, jnp.uint32(0))
    img_w = render_sample(box_scene, default_camera, cfg_w, jnp.uint32(0),
                          accel)
    np.testing.assert_allclose(
        np.asarray(img_b), np.asarray(img_w), rtol=1e-4, atol=1e-5
    )

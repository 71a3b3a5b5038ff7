"""Inverse-rendering driver (diff/optimize + the `optimize` CLI).

The north-star user story as product surface (VERDICT r4 missing #1):
recover scene params from a target image, with gradient-accumulation
micro-steps, params+optimizer-state checkpoint/resume (SURVEY §5.4), and
on-device accel refit when vertices move (VERDICT r4 missing #2).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from dpt_tpu import OrbitCamera, RenderConfig, cornell_box_scene
from dpt_tpu.diff.grads import split_params
from dpt_tpu.diff.optimize import (
    load_state,
    make_optimizer,
    optimize,
    save_state,
)
from dpt_tpu.render.renderer import render_sample
from dpt_tpu.utils.checkpoint import Checkpointer

CFG = RenderConfig(
    width=8, height=8, max_depth=2, spp=1, traversal="brute",
    enable_sss=False, remat_bounces=False,
)


def _perturbed_scene(scene, albedo):
    import dataclasses

    mats = dataclasses.replace(
        scene.materials,
        albedo=jnp.broadcast_to(jnp.asarray(albedo, jnp.float32),
                                scene.materials.albedo.shape),
    )
    return dataclasses.replace(scene, materials=mats)


def test_albedo_recovery_tape():
    """Loss collapses and albedo moves most of the way to the truth under
    the tape backward (fixed seeds: the target is one rendered batch, so
    the loss is a deterministic function of the params — any other seed
    would compare different DoF/AA jitters of the 10-intensity direct-view
    pixels and bury the albedo signal under an irreducible floor)."""
    cfg = CFG.replace(width=16, height=16, spp=2)
    scene = cornell_box_scene()
    camera = OrbitCamera().camera()
    target = render_sample(scene, camera, cfg, jnp.uint32(0))
    start = _perturbed_scene(scene, (0.32, 0.32, 0.32))
    params, _, losses = optimize(
        start, camera, cfg, target, steps=10, lr=0.05,
        opt_params=("albedo",), micro_steps=1, backward="tape",
        advance_seeds=False,
    )
    assert losses[-1] < losses[0] * 0.1, losses
    true_albedo = np.asarray(scene.materials.albedo)
    rec = np.asarray(params["albedo"])
    assert np.abs(rec - true_albedo).mean() < 0.5 * np.abs(
        0.32 - true_albedo).mean()


def test_optimize_resume_bit_continues(tmp_path):
    """4 straight steps ≡ 2 steps + checkpoint + 2 resumed steps, bitwise:
    the seed schedule is a pure function of the step index and the
    optimizer state round-trips through the npz exactly."""
    scene = cornell_box_scene()
    camera = OrbitCamera(yaw=20.0).camera()
    target = render_sample(scene, camera, CFG, jnp.uint32(0))
    start = _perturbed_scene(scene, (0.4, 0.4, 0.4))

    p_full, s_full, _ = optimize(
        start, camera, CFG, target, steps=4, lr=0.05, opt_params=("albedo",),
        micro_steps=2,
    )

    ck = Checkpointer(str(tmp_path / "opt.npz"))
    p_half, s_half, _ = optimize(
        start, camera, CFG, target, steps=2, lr=0.05, opt_params=("albedo",),
        micro_steps=2,
    )
    save_state(ck, 2, p_half, s_half)
    params_t = split_params(start, camera)
    opt_t = make_optimizer("adam", 0.05).init(params_t)
    step0, p_res, s_res = load_state(ck, params_t, opt_t)
    assert step0 == 2
    p_cont, _, _ = optimize(
        start, camera, CFG, target, steps=4, lr=0.05, opt_params=("albedo",),
        micro_steps=2,
        init_params=p_res, init_opt_state=s_res, start_step=step0,
    )
    for k in p_full:
        np.testing.assert_array_equal(
            np.asarray(p_full[k]), np.asarray(p_cont[k]), err_msg=k
        )


def test_frozen_params_stay_bitwise():
    """Only the selected subset moves; every other parameter is bit-frozen
    through the optimizer."""
    scene = cornell_box_scene()
    camera = OrbitCamera(yaw=20.0).camera()
    target = render_sample(scene, camera, CFG, jnp.uint32(0))
    start = _perturbed_scene(scene, (0.4, 0.4, 0.4))
    p0 = split_params(start, camera)
    params, _, _ = optimize(
        start, camera, CFG, target, steps=3, lr=0.1, opt_params=("albedo",),
    )
    for k in p0:
        if k == "albedo":
            assert not np.array_equal(np.asarray(params[k]), np.asarray(p0[k]))
        else:
            np.testing.assert_array_equal(
                np.asarray(params[k]), np.asarray(p0[k]), err_msg=k
            )


def test_vertex_recovery_with_refit():
    """Vertex optimisation through the flagship quad kernel with on-device
    accel refit per step: hit selection tracks the moving vertices (no
    stale baked geometry — VERDICT r4 missing #2) and the loss decreases."""
    from dpt_tpu import procedural_scene
    from dpt_tpu.accel.bvh import build_accel

    cfg = RenderConfig(
        width=16, height=16, max_depth=2, spp=1, traversal="quad",
        bvh_builder="sah", bvh_leaf_size=8, packet_tile=256,
        ray_sort=True, enable_sss=False, compact_frac=0.25,
    )
    scene = procedural_scene(n_tris_target=500)
    camera = OrbitCamera().camera()
    accel_true = build_accel(scene, cfg)
    target = render_sample(scene, camera, cfg, jnp.uint32(0), accel_true)

    import dataclasses

    rng = np.random.default_rng(3)
    v = np.asarray(scene.vertices)
    start = dataclasses.replace(
        scene,
        vertices=jnp.asarray(v + 0.03 * rng.normal(size=v.shape).astype(
            np.float32)),
    )
    accel0 = build_accel(start, cfg)
    params, _, losses = optimize(
        start, camera, cfg, target, steps=6, lr=2e-3, optimizer="adam",
        opt_params=("vertices",), accel=accel0, backward="tape", refit=True,
        advance_seeds=False,
    )
    assert losses[-1] < losses[0], losses


def test_cli_optimize_end_to_end(tmp_path):
    """The real CLI surface: render a target, recover the albedo from a
    perturbed start, resume mid-run bit-continues (VERDICT r4 next #3
    'Done' criterion)."""
    from dpt_tpu.cli import main

    tgt = str(tmp_path / "target.npy")
    common = ["--width", "16", "--height", "16", "--spp", "2", "--bounces",
              "2", "--no-sss",
              "--metrics", str(tmp_path / "m.jsonl")]
    main(["render", *common, "--batches", "1", "--out", tgt])

    out_full = str(tmp_path / "full.npz")
    opt_common = ["optimize", *common, "--target", tgt, "--lr", "0.05",
                  "--opt-params", "albedo", "--fixed-seeds",
                  "--init-albedo", "0.4", "0.4", "0.4"]
    main([*opt_common, "--steps", "6", "--out", out_full])
    full = np.load(out_full)
    # Recovery direction: closer to the box's true albedo than the start.
    true_albedo = np.asarray(cornell_box_scene().materials.albedo)
    assert (np.abs(full["albedo"] - true_albedo).mean()
            < 0.6 * np.abs(0.4 - true_albedo).mean())

    # Resume: 2 steps + checkpoint, then rerun to 4 → bitwise == straight 4.
    ck = str(tmp_path / "opt_ck.npz")
    out_a = str(tmp_path / "a.npz")
    out_b = str(tmp_path / "b.npz")
    main([*opt_common, "--steps", "3", "--checkpoint", ck, "--out", out_a])
    assert os.path.exists(ck)
    main([*opt_common, "--steps", "6", "--checkpoint", ck, "--out", out_b])
    b = np.load(out_b)
    np.testing.assert_array_equal(b["albedo"], full["albedo"])

    metrics = open(tmp_path / "m.jsonl").read()
    assert '"event": "opt_step"' in metrics


def test_cli_optimize_sharded_smoke(tmp_path):
    """The sharded optimisation path through the CLI (mesh over the 8
    virtual devices, tape backward per shard)."""
    from dpt_tpu.cli import main

    tgt = str(tmp_path / "target.npy")
    common = ["--width", "8", "--height", "8", "--spp", "1", "--bounces",
              "2", "--no-sss", "--metrics", str(tmp_path / "m.jsonl")]
    main(["render", *common, "--batches", "1", "--out", tgt])
    out = str(tmp_path / "rec.npz")
    main(["optimize", *common, "--target", tgt, "--steps", "2",
          "--opt-params", "albedo", "--init-albedo", "0.4", "0.4", "0.4",
          "--sharded", "--out", out])
    rec = np.load(out)
    assert np.isfinite(rec["albedo"]).all()


def test_vertex_opt_refuses_stale_accel():
    """Accel-backed traversals without a refit implementation must refuse
    vertex optimisation instead of silently selecting hits against step-0
    baked geometry."""
    from dpt_tpu.accel.bvh import build_accel

    cfg = CFG.replace(traversal="bvh", bvh_builder="median")
    scene = cornell_box_scene()
    camera = OrbitCamera().camera()
    accel = build_accel(scene, cfg)
    target = render_sample(scene, camera, cfg, jnp.uint32(0), accel)
    with pytest.raises(ValueError, match="stale baked accel"):
        optimize(scene, camera, cfg, target, steps=1, lr=1e-3,
                 opt_params=("vertices",), accel=accel)

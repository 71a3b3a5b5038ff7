"""Differentiable rendering: gradients of pixel losses w.r.t. scene params.

The reference has no differentiability; this is the north-star extension
(BASELINE.json): pixel gradients w.r.t. vertex positions, material
albedo/roughness, light emission, and camera pose.

Three paths:
  - `differentiable_render`: plain jax.grad through the integrator (the
    per-bounce body is rematerialised via cfg.remat_bounces, so the backward
    replays bounces instead of storing full path state — the TPU analog of
    replay-based backward).
  - `render_loss_and_grads`: jitted value_and_grad of an image loss.
  - `replay_loss_and_grads`: custom_vjp wrapper whose forward stores only
    (params, seed) — no autodiff tape at all — and whose backward re-renders
    under jax.vjp.  The forward therefore runs at inference memory cost;
    the tape exists only while the backward executes.  SURVEY §7 M4.

Gradient convention: fixed-hit detach (see integrator.py docstring).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dpt_tpu.config import RenderConfig
from dpt_tpu.render.renderer import render_sample


def split_params(scene, camera):
    """Split (scene, camera) into (differentiable params, static structure).

    Params: vertices, material fields, light intensity/position/size, camera
    pose fields.  Structure: topology ints and anything we don't optimise.
    """
    params = {
        "vertices": scene.vertices,
        "albedo": scene.materials.albedo,
        "roughness": scene.materials.roughness,
        "emission": scene.materials.emission,
        "light_intensity": scene.lights.intensity,
        "light_position": scene.lights.position,
        "camera_position": camera.position,
        "camera_direction": camera.direction,
        "camera_up": camera.up,
        "camera_fov": camera.fov_deg,
    }
    return params


def merge_params(params, scene, camera):
    import dataclasses

    materials = dataclasses.replace(
        scene.materials,
        albedo=params["albedo"],
        roughness=params["roughness"],
        emission=params["emission"],
    )
    lights = dataclasses.replace(
        scene.lights,
        intensity=params["light_intensity"],
        position=params["light_position"],
    )
    scene = dataclasses.replace(
        scene, vertices=params["vertices"], materials=materials, lights=lights
    )
    camera = dataclasses.replace(
        camera,
        position=params["camera_position"],
        direction=params["camera_direction"],
        up=params["camera_up"],
        fov_deg=params["camera_fov"],
    )
    return scene, camera


def differentiable_render(scene, camera, cfg: RenderConfig, sample_batch=0,
                          accel=None):
    """Render as a function of the param pytree: returns (f, params) where
    f(params) -> image [H, W, 3] is jax-differentiable."""
    params = split_params(scene, camera)

    def f(p):
        s, c = merge_params(p, scene, camera)
        return render_sample(s, c, cfg, jnp.uint32(sample_batch), accel)

    return f, params


@partial(jax.jit, static_argnames=("cfg", "loss_fn_static"))
def _loss_and_grads_impl(params, scene, camera, target, cfg, sample_batch,
                         accel, loss_fn_static):
    def loss(p):
        s, c = merge_params(p, scene, camera)
        img = render_sample(s, c, cfg, sample_batch, accel)
        if loss_fn_static == "l2":
            return jnp.mean((img - target) ** 2)
        raise ValueError(loss_fn_static)

    return jax.value_and_grad(loss)(params)


def render_loss_and_grads(scene, camera, cfg: RenderConfig, target,
                          sample_batch=0, accel=None, loss="l2"):
    """L2 loss against `target` and gradients w.r.t. all scene params.

    Returns (loss_value, grads_pytree) with the same keys as split_params.
    """
    params = split_params(scene, camera)
    return _loss_and_grads_impl(
        params, scene, camera, target, cfg, jnp.uint32(sample_batch), accel,
        loss,
    )


def _make_replay_loss(scene, camera, cfg, accel, loss_fn_static):
    """Loss(params, target, seed) closure shared by fwd/bwd of the replay
    path.  scene/camera provide the non-optimised structure; params override
    the differentiable leaves (merge_params)."""

    def loss(p, target, seed):
        s, c = merge_params(p, scene, camera)
        img = render_sample(s, c, cfg, seed, accel)
        if loss_fn_static == "l2":
            return jnp.mean((img - target) ** 2)
        raise ValueError(loss_fn_static)

    return loss


def replay_loss_and_grads(scene, camera, cfg: RenderConfig, target,
                          sample_batch=0, accel=None, loss="l2"):
    """Replay-based backward (SURVEY §7 M4): the forward pass is a plain
    inference render — custom_vjp saves only (params, seed) as residuals —
    and the backward *re-renders* under jax.vjp to reconstruct the tape.

    Peak memory during the forward equals the inference render; the autodiff
    tape is materialised only inside the backward (and is itself bounce-remat
    via cfg.remat_bounces).  Gradients are identical to
    `render_loss_and_grads` because both differentiate the same function of
    the same (params, seed) — the RNG is counter-based, so the replay is
    bit-exact (tests/test_grads.py::test_replay_matches_value_and_grad).
    """
    loss_fn = _make_replay_loss(scene, camera, cfg, accel, loss)

    @jax.custom_vjp
    def run(p, target, seed):
        return loss_fn(p, target, seed)

    def run_fwd(p, target, seed):
        # Residuals: just the inputs.  No tape survives the forward.
        value = loss_fn(p, target, seed)
        return value, (p, target, seed)

    def run_bwd(res, g):
        p, target, seed = res
        _, vjp = jax.vjp(lambda q: loss_fn(q, target, seed), p)
        (dp,) = vjp(g)
        import numpy as np

        # target/seed are not optimised: zero / float0 cotangents.
        return dp, jnp.zeros_like(target), np.zeros(seed.shape,
                                                    jax.dtypes.float0)

    run.defvjp(run_fwd, run_bwd)

    params = split_params(scene, camera)

    @partial(jax.jit, static_argnames=())
    def value_and_grad(p, target, seed):
        return jax.value_and_grad(run)(p, target, seed)

    return value_and_grad(params, target, jnp.uint32(sample_batch))

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
        return _loss_of_img(loss_fn_static, img, target)

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


def _replay_loss(cfg, loss_fn_static, p, scene, camera, target, seed, accel):
    """Primal loss shared by fwd/bwd of the replay path.  scene/camera
    provide the non-optimised structure; params override the differentiable
    leaves (merge_params)."""
    s, c = merge_params(p, scene, camera)
    img = render_sample(s, c, cfg, seed, accel)
    return _loss_of_img(loss_fn_static, img, target)


def _zero_cotangent(tree):
    """Symbolic-zero cotangents for a pytree: float leaves get zeros_like,
    integer/bool leaves get float0 (the cotangent type JAX expects)."""
    import numpy as np

    def leaf(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(jnp.shape(x), jax.dtypes.float0)

    return jax.tree_util.tree_map(leaf, tree)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _replay_run(cfg, loss_fn_static, p, scene, camera, target, seed, accel):
    return _replay_loss(cfg, loss_fn_static, p, scene, camera, target, seed,
                        accel)


def _replay_fwd(cfg, loss_fn_static, p, scene, camera, target, seed, accel):
    # Residuals: just the inputs.  No tape survives the forward.
    value = _replay_loss(cfg, loss_fn_static, p, scene, camera, target, seed,
                         accel)
    return value, (p, scene, camera, target, seed, accel)


def _replay_bwd(cfg, loss_fn_static, res, g):
    import numpy as np

    p, scene, camera, target, seed, accel = res
    # Re-render under vjp w.r.t. (params, target): dL/dtarget is cheap here
    # (the backward re-renders anyway) and callers differentiating the
    # target leg get the true -2(img-target)/N instead of silent zeros.
    _, vjp = jax.vjp(
        lambda q, tt: _replay_loss(cfg, loss_fn_static, q, scene, camera, tt,
                                   seed, accel),
        p, target,
    )
    dp, dt = vjp(g)
    # scene/camera structure and the accel are fixed by convention (the
    # differentiable leaves live in `p`; the accel is detached geometry —
    # integrator.py's fixed-hit convention); seed is an integer.
    return (dp, _zero_cotangent(scene), _zero_cotangent(camera), dt,
            np.zeros(jnp.shape(seed), jax.dtypes.float0),
            _zero_cotangent(accel))


_replay_run.defvjp(_replay_fwd, _replay_bwd)


@partial(jax.jit, static_argnames=("cfg", "loss_fn_static"))
def _replay_vag(p, scene, camera, target, seed, accel, cfg, loss_fn_static):
    return jax.value_and_grad(_replay_run, argnums=2)(
        cfg, loss_fn_static, p, scene, camera, target, seed, accel
    )


def _loss_of_img(loss_fn_static, img, target):
    if loss_fn_static == "l2":
        return jnp.mean((img - target) ** 2)
    raise ValueError(loss_fn_static)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _tape_run(cfg, loss_fn_static, p, scene, camera, target, seed, accel):
    return _replay_loss(cfg, loss_fn_static, p, scene, camera, target, seed,
                        accel)


def _tape_fwd(cfg, loss_fn_static, p, scene, camera, target, seed, accel):
    from dpt_tpu.render.renderer import render_sample_taped

    s, c = merge_params(p, scene, camera)
    img, tape = render_sample_taped(s, c, cfg, seed, accel)
    value = _loss_of_img(loss_fn_static, img, target)
    # Residuals: the inputs plus the query tape.  The accel rides along
    # only to shape its (zero) cotangent — playback never reads it, so the
    # backward program contains no traversal; the residual itself is a
    # reference to the already-live buffers, not a copy.
    return value, (p, scene, camera, target, seed, tape, accel)


def _tape_bwd(cfg, loss_fn_static, res, g):
    import numpy as np

    from dpt_tpu.render.renderer import render_sample_playback

    p, scene, camera, target, seed, tape, accel = res

    def f(q, tt):
        s, c = merge_params(q, scene, camera)
        img = render_sample_playback(s, c, cfg, seed, tape)
        return _loss_of_img(loss_fn_static, img, tt)

    _, vjp = jax.vjp(f, p, target)
    dp, dt = vjp(g)
    return (dp, _zero_cotangent(scene), _zero_cotangent(camera), dt,
            np.zeros(jnp.shape(seed), jax.dtypes.float0),
            _zero_cotangent(accel))


_tape_run.defvjp(_tape_fwd, _tape_bwd)


@partial(jax.jit, static_argnames=("cfg", "loss_fn_static"))
def _tape_vag(p, scene, camera, target, seed, accel, cfg, loss_fn_static):
    return jax.value_and_grad(_tape_run, argnums=2)(
        cfg, loss_fn_static, p, scene, camera, target, seed, accel
    )


def tape_loss_and_grads(scene, camera, cfg: RenderConfig, target,
                        sample_batch=0, accel=None, loss="l2"):
    """Tape-based backward (VERDICT r4 next #1, the full SURVEY §7 M4
    design): the forward records every traversal outcome (compact int
    records — integrator.QueryTape) and the backward differentiates the
    *playback* render, which substitutes the recorded outcomes for every
    nearest/occluded call.  Zero traversal kernels and zero per-query
    coherence sorts run in the backward — the ~72% of the fwd+bwd step
    that was traversal replay (BASELINE r4 trace decomposition) is gone.

    The taped values equal what the replay would recompute (counter-based
    RNG, deterministic kernels) and both paths stop_gradient them, so
    gradients are semantically identical to `replay_loss_and_grads` /
    `render_loss_and_grads`; the loss value is bit-identical (the taped
    forward IS the plain forward) and gradients match to XLA fusion
    rounding — the playback is a different HLO program, so fusion/FMA
    choices differ; measured ≤ 1 ULP relative
    (tests/test_grads.py::test_tape_matches_replay).
    Memory: the forward keeps the tape as a residual — ~4-9 bytes per lane
    per query (chunk-stacked), vs the replay path's zero; the replay stays
    available for memory-bound many-spp steps."""
    params = split_params(scene, camera)
    return _tape_vag(params, scene, camera, target,
                     jnp.uint32(sample_batch), accel,
                     cfg=cfg, loss_fn_static=loss)


def replay_loss_and_grads(scene, camera, cfg: RenderConfig, target,
                          sample_batch=0, accel=None, loss="l2"):
    """Replay-based backward (SURVEY §7 M4): the forward pass is a plain
    inference render — custom_vjp saves only the inputs as residuals —
    and the backward *re-renders* under jax.vjp to reconstruct the tape.

    Peak memory during the forward equals the inference render; the autodiff
    tape is materialised only inside the backward (and is itself bounce-remat
    via cfg.remat_bounces).  Gradients are identical to
    `render_loss_and_grads` because both differentiate the same function of
    the same (params, seed) — the RNG is counter-based, so the replay is
    bit-exact (tests/test_grads.py::test_replay_matches_value_and_grad).

    All machinery is module-level and jitted with static (cfg, loss), so an
    optimisation loop calling this per step hits the jit cache after the
    first call (no per-call retrace — ADVICE r2).
    """
    params = split_params(scene, camera)
    return _replay_vag(params, scene, camera, target,
                       jnp.uint32(sample_batch), accel,
                       cfg=cfg, loss_fn_static=loss)

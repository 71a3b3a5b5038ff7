"""End-to-end inverse rendering: recover scene parameters by gradient
descent on an image loss — the north-star differentiable-rendering user
story (BASELINE.json config 4), run at toy size through the same
replay-custom_vjp optimisation step the chip benchmarks measure.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dpt_tpu import RenderConfig
from dpt_tpu.diff.grads import merge_params, replay_loss_and_grads, split_params
from dpt_tpu.render.renderer import render_sample

CFG = RenderConfig(
    width=16, height=16, max_depth=2, spp=2, traversal="brute",
    enable_sss=False, remat_bounces=True,
)


def test_albedo_recovery(box_scene, default_camera):
    """Start from wrong albedo, descend on L2 against a target rendered
    with the true albedo: loss must collapse and the albedo estimate must
    move most of the way to the truth."""
    true_albedo = jnp.asarray(box_scene.materials.albedo)
    target = render_sample(box_scene, default_camera, CFG, jnp.uint32(0))

    mats = dataclasses.replace(
        box_scene.materials, albedo=jnp.clip(true_albedo * 0.4, 0.05, 1.0)
    )
    scene = dataclasses.replace(box_scene, materials=mats)

    losses = []
    # Curvature of the albedo->loss map at this framing is ~3e-4 (measured:
    # |g|~1.6e-4 at albedo error 0.48), so lr=800 contracts ~0.74x/step.
    lr = 800.0
    for step in range(30):
        loss, grads = replay_loss_and_grads(
            scene, default_camera, CFG, target, sample_batch=0
        )
        losses.append(float(loss))
        new_albedo = jnp.clip(
            scene.materials.albedo - lr * grads["albedo"], 0.0, 1.0
        )
        scene = dataclasses.replace(
            scene,
            materials=dataclasses.replace(scene.materials, albedo=new_albedo),
        )

    assert losses[-1] < 0.1 * losses[0], losses
    err0 = float(jnp.abs(true_albedo * 0.4 - true_albedo).mean())
    err1 = float(jnp.abs(scene.materials.albedo - true_albedo).mean())
    assert err1 < 0.5 * err0, (err0, err1)
    assert all(np.isfinite(losses))

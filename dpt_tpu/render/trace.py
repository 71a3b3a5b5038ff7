"""Nearest-hit search dispatch: brute force / per-ray BVH stack / packet.

`make_nearest(scene, cfg, accel)` returns a closure
``nearest(origin, direction) -> {"hit", "t", "tri"}`` with all outputs
detached (the search decides *which* triangle; continuous quantities are
recomputed differentiably by intersect.reintersect).

This is the traceRay seam (raytrace_comp.comp:159-204): the brute-force path
is the semantic oracle, the BVH paths must return identical nearest hits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dpt_tpu.config import RenderConfig
from dpt_tpu.render.intersect import brute_force_nearest


def make_nearest(scene, cfg: RenderConfig, accel=None):
    v0, v1, v2 = scene.tri_vertices()
    v0 = jax.lax.stop_gradient(v0)
    v1 = jax.lax.stop_gradient(v1)
    v2 = jax.lax.stop_gradient(v2)

    if cfg.traversal == "brute":
        if cfg.kernels == "intersect":
            from dpt_tpu.kernels.pallas_intersect import pallas_nearest

            def nearest(o, d):
                hit, t, tri = pallas_nearest(o, d, v0, v1, v2, cfg.eps)
                return {"hit": hit, "t": t, "tri": tri}

            return nearest

        def nearest(o, d):
            hit, t, tri, _, _ = brute_force_nearest(o, d, v0, v1, v2, cfg.eps)
            return {
                "hit": jax.lax.stop_gradient(hit),
                "t": jax.lax.stop_gradient(t),
                "tri": jax.lax.stop_gradient(tri),
            }

        return nearest

    if cfg.traversal == "bvh":
        from dpt_tpu.accel.traverse import bvh_nearest

        assert accel is not None, "traversal='bvh' requires an accel structure"

        def nearest(o, d):
            hit, t, tri = bvh_nearest(o, d, accel, v0, v1, v2, cfg)
            return {"hit": hit, "t": t, "tri": tri}

        return nearest

    if cfg.traversal == "packet":
        from dpt_tpu.accel.packet import packet_nearest

        assert accel is not None, "traversal='packet' requires an accel structure"

        def nearest(o, d):
            hit, t, tri = packet_nearest(o, d, accel, v0, v1, v2, cfg)
            return {"hit": hit, "t": t, "tri": tri}

        return nearest

    raise ValueError(f"unknown traversal mode: {cfg.traversal}")

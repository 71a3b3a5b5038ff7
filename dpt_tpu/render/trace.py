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
from dpt_tpu.render.intersect import brute_force_nearest, brute_force_occluded


def _scene_bounds(scene):
    v = jax.lax.stop_gradient(scene.vertices)
    return v.min(axis=0), v.max(axis=0)


def _maybe_sorted_nearest(nearest, scene, cfg):
    # wavefront_sort permutes the whole bounce carry once per bounce
    # (integrator.trace_paths), so per-query sorting would be redundant.
    if not cfg.ray_sort or cfg.wavefront_sort:
        return nearest
    from dpt_tpu.render.compaction import sorted_nearest

    bmin, bmax = _scene_bounds(scene)
    return sorted_nearest(nearest, bmin, bmax)


def _maybe_sorted_occluded(occluded, scene, cfg):
    if not cfg.ray_sort or cfg.wavefront_sort:
        return occluded
    from dpt_tpu.render.compaction import sorted_occluded

    bmin, bmax = _scene_bounds(scene)
    return sorted_occluded(occluded, bmin, bmax)


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

        return _maybe_sorted_nearest(nearest, scene, cfg)

    if cfg.traversal == "packet":
        from dpt_tpu.accel.packet import packet_nearest

        assert accel is not None, "traversal='packet' requires an accel structure"

        def nearest(o, d):
            hit, t, tri = packet_nearest(o, d, accel, v0, v1, v2, cfg)
            return {"hit": hit, "t": t, "tri": tri}

        return _maybe_sorted_nearest(nearest, scene, cfg)

    if cfg.traversal == "pallas":
        from dpt_tpu.kernels.pallas_wide import wide_nearest

        assert accel is not None, "traversal='pallas' requires a WideAccel"

        def nearest(o, d):
            hit, t, tri = wide_nearest(o, d, accel, cfg)
            return {"hit": hit, "t": t, "tri": tri}

        return _maybe_sorted_nearest(nearest, scene, cfg)

    if cfg.traversal == "quad":
        from dpt_tpu.kernels.pallas_quad import quad_nearest

        assert accel is not None, "traversal='quad' requires a QuadAccel"

        def nearest(o, d):
            hit, t, tri = quad_nearest(o, d, accel, cfg)
            return {"hit": hit, "t": t, "tri": tri}

        return _maybe_sorted_nearest(nearest, scene, cfg)

    if cfg.traversal == "threaded":
        from dpt_tpu.accel.threaded import threaded_nearest

        assert accel is not None, "traversal='threaded' requires a ThreadedBVH"

        def nearest(o, d):
            hit, t, tri = threaded_nearest(o, d, accel, cfg.eps,
                                           cfg.traversal_chunk)
            return {"hit": hit, "t": t, "tri": tri}

        return _maybe_sorted_nearest(nearest, scene, cfg)

    raise ValueError(f"unknown traversal mode: {cfg.traversal}")


def make_occluded(scene, cfg: RenderConfig, accel=None):
    """Any-hit shadow query: occluded(origin, direction, max_dist) -> [R] bool.

    Semantically identical to `nearest(...)` + `t < max_dist` (the shadow
    predicate at raytrace_comp.comp:359) but terminates at the first hit —
    shadow rays are the majority of all traversals (SURVEY §3.3).
    """
    v0, v1, v2 = scene.tri_vertices()
    v0 = jax.lax.stop_gradient(v0)
    v1 = jax.lax.stop_gradient(v1)
    v2 = jax.lax.stop_gradient(v2)

    if cfg.traversal == "brute":

        def occluded(o, d, max_dist):
            return brute_force_occluded(o, d, max_dist, v0, v1, v2, cfg.eps)

        return occluded

    if cfg.traversal == "bvh":
        from dpt_tpu.accel.traverse import bvh_occluded

        assert accel is not None

        def occluded(o, d, max_dist):
            return bvh_occluded(o, d, max_dist, accel, v0, v1, v2, cfg)

        return _maybe_sorted_occluded(occluded, scene, cfg)

    if cfg.traversal == "packet":
        from dpt_tpu.accel.packet import packet_occluded

        assert accel is not None

        def occluded(o, d, max_dist):
            return packet_occluded(o, d, max_dist, accel, v0, v1, v2, cfg)

        return _maybe_sorted_occluded(occluded, scene, cfg)

    if cfg.traversal == "pallas":
        from dpt_tpu.kernels.pallas_wide import wide_occluded

        assert accel is not None

        def occluded(o, d, max_dist):
            return wide_occluded(o, d, max_dist, accel, cfg)

        return _maybe_sorted_occluded(occluded, scene, cfg)

    if cfg.traversal == "quad":
        from dpt_tpu.kernels.pallas_quad import quad_occluded

        assert accel is not None

        def occluded(o, d, max_dist):
            return quad_occluded(o, d, max_dist, accel, cfg)

        return _maybe_sorted_occluded(occluded, scene, cfg)

    if cfg.traversal == "threaded":
        from dpt_tpu.accel.threaded import threaded_occluded

        assert accel is not None

        def occluded(o, d, max_dist):
            return threaded_occluded(o, d, max_dist, accel, cfg.eps,
                                     cfg.traversal_chunk)

        return _maybe_sorted_occluded(occluded, scene, cfg)

    raise ValueError(f"unknown traversal mode: {cfg.traversal}")

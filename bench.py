"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): rays/sec/chip, forward, at 1024², 4 bounces on a
Sylveon-class mesh.  "Rays" follows SURVEY §3.3's accounting: every BVH
traversal launched per pixel-sample (primary + shadow + SSS walks).

Usage:
    python bench.py                # headline config on the default device
    python bench.py --quick       # 256² smoke config
    python bench.py --all         # every preset that fits on one chip
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _bench_once(scene, camera, cfg, accel, n_warmup=1, n_iters=4):
    import jax.numpy as jnp

    from dpt_tpu.render.renderer import render_sample
    from dpt_tpu.utils.metrics import traversals_per_sample

    for i in range(n_warmup):
        render_sample(scene, camera, cfg, jnp.uint32(i), accel).block_until_ready()
    t0 = time.perf_counter()
    for i in range(n_iters):
        img = render_sample(scene, camera, cfg, jnp.uint32(100 + i), accel)
    img.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters
    rays = cfg.n_pixels * cfg.spp * traversals_per_sample(cfg, scene.lights.count)
    return rays / dt, dt, img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--tris", type=int, default=66_000)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
    from dpt_tpu.accel.bvh import build_accel

    side = args.width or (256 if args.quick else 1024)
    cfg = RenderConfig(
        width=side, height=side, max_depth=4, spp=1,
        traversal="pallas", bvh_builder="median", bvh_leaf_size=8,
        packet_tile=1024, enable_sss=True, sample_batches=args.iters,
    )
    scene = procedural_scene(n_tris_target=args.tris)
    camera = OrbitCamera().camera()
    accel = build_accel(scene, cfg)

    rays_per_s, step_s, _ = _bench_once(scene, camera, cfg, accel,
                                        n_iters=args.iters)

    # No published reference numbers exist (BASELINE.md: reference prints
    # runtime FPS but records nothing) → vs_baseline anchors at 1.0.
    print(json.dumps({
        "metric": f"rays/sec/chip fwd {side}x{side} 4bounce "
                  f"{scene.n_triangles}tris",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": 1.0,
        "step_ms": round(step_s * 1e3, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())

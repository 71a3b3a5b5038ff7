"""Round-3 flagship config sweep — end-to-end render_sample step time on the
real chip at the headline workload (1024², 66k tris, 4 bounces, SSS on).

Axes: bvh_builder x ray_sort x packet_tile x interleave.  Each config is one
jit cache entry; inputs vary per call (the axon relay memoizes identical
executions — scripts/probe_kernel_honest.py).

Usage:
    python scripts/r3_sweep.py                 # default promising set
    python scripts/r3_sweep.py --side 512      # cheaper sweep
    python scripts/r3_sweep.py --configs sah:1:256:8 median:0:1024:8 ...
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
from dpt_tpu.accel.bvh import build_accel
from dpt_tpu.render.renderer import render_sample
from dpt_tpu.utils.metrics import traversals_per_sample

DEFAULT = [
    # builder:sort:tile:interleave
    "median:0:1024:8",   # BENCH_r02 config (control)
    "sah:0:1024:8",
    "sah:1:1024:8",
    "sah:1:512:8",
    "sah:1:256:8",
    "sah:1:128:8",
    "sah:1:256:16",
    "sah:1:128:16",
    "median:1:256:8",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=1024)
    ap.add_argument("--tris", type=int, default=66_000)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--configs", nargs="*", default=DEFAULT)
    args = ap.parse_args()

    scene = procedural_scene(n_tris_target=args.tris)
    camera = OrbitCamera().camera()
    print(f"backend={jax.default_backend()} side={args.side} "
          f"tris={scene.n_triangles}", flush=True)

    accel_cache = {}
    results = []
    for spec in args.configs:
        parts = spec.split(":")
        trav = "pallas"
        if len(parts) == 5:
            trav, builder, sort, tile, il = parts
        else:
            builder, sort, tile, il = parts
        # sort field: 0 = none, 1 = per-query ray_sort, w = wavefront carry
        cfg = RenderConfig(
            width=args.side, height=args.side, max_depth=4, spp=1,
            traversal=trav, bvh_builder=builder, bvh_leaf_size=8,
            packet_tile=int(tile), interleave=int(il),
            ray_sort=(sort == "1"), wavefront_sort=(sort == "w"),
            enable_sss=True,
        )
        key = (trav, builder)
        if key not in accel_cache:
            t0 = time.perf_counter()
            accel_cache[key] = build_accel(scene, cfg)
            print(f"  build[{key}] {time.perf_counter()-t0:.1f}s",
                  flush=True)
        accel = accel_cache[key]

        t0 = time.perf_counter()
        render_sample(scene, camera, cfg, jnp.uint32(0), accel
                      ).block_until_ready()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(args.iters):
            img = render_sample(scene, camera, cfg, jnp.uint32(100 + i), accel)
        img.block_until_ready()
        dt = (time.perf_counter() - t0) / args.iters
        rays = cfg.n_pixels * cfg.spp * traversals_per_sample(
            cfg, scene.lights.count)
        mrays = rays / dt / 1e6
        results.append((spec, dt * 1e3, mrays))
        print(f"  {spec:>22}  step={dt*1e3:8.1f} ms  {mrays:7.2f} Mrays/s "
              f"(compile {compile_s:.0f}s)", flush=True)

    results.sort(key=lambda r: r[1])
    print(json.dumps({"best": results[0][0], "step_ms": round(results[0][1], 1),
                      "mrays": round(results[0][2], 2)}))


if __name__ == "__main__":
    main()

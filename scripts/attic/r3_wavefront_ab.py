"""Full-step A/B: per-query octant sort vs Morton-major carry wavefront.

Headline shape (1024^2, 4 bounces, SSS, 66k tris, quad kernel).
Axon relay memoizes identical executions: every timed call varies the
sample_batch seed.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
from dpt_tpu.accel.bvh import build_accel
from dpt_tpu.render.renderer import render_sample


def bench_step(scene, cam, cfg, accel, n=3):
    render_sample(scene, cam, cfg, jnp.uint32(0), accel).block_until_ready()
    t0 = time.perf_counter()
    for i in range(n):
        img = render_sample(scene, cam, cfg, jnp.uint32(100 + i), accel)
    img.block_until_ready()
    return (time.perf_counter() - t0) / n * 1e3


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    scene = procedural_scene(n_tris_target=66_000)
    cam = OrbitCamera().camera()
    base = RenderConfig(width=side, height=side, max_depth=4, spp=1,
                        traversal="quad", bvh_builder="sah", bvh_leaf_size=8,
                        interleave=1, enable_sss=True)
    accel = build_accel(scene, base)
    print(f"backend={jax.default_backend()} side={side}", flush=True)
    for tile in (4096, 2048):
        for name, cfg in (
            ("per-query", base.replace(packet_tile=tile, ray_sort=True)),
            ("wavefront", base.replace(packet_tile=tile, ray_sort=False,
                                       wavefront_sort=True)),
        ):
            ms = bench_step(scene, cam, cfg, accel)
            print(f"tile={tile} {name}: {ms:8.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()

"""Round-3 feature decomposition: which integrator stage owns the step time.

Renders the headline workload (1024², 66k tris, quad kernel, SAH leaf 8,
per-query sort) with features toggled off one at a time.  SURVEY §3.3's cost
model says SSS is 24 of the 33 traversals — this measures whether the time
follows the traversal count.  Inputs vary per call (axon memoizes identical
executions).
"""
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


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    scene = procedural_scene(n_tris_target=66_000)
    camera = OrbitCamera().camera()
    base = RenderConfig(
        width=side, height=side, max_depth=4, spp=1,
        traversal="quad", bvh_builder="sah", bvh_leaf_size=8,
        packet_tile=tile, interleave=1, ray_sort=True, enable_sss=True,
    )
    accel = build_accel(scene, base)
    print(f"backend={jax.default_backend()} side={side} tile={tile}",
          flush=True)

    variants = [
        ("full", base),
        ("no_sss", base.replace(enable_sss=False)),
        ("no_sss_depth2", base.replace(enable_sss=False, max_depth=2)),
        ("no_sss_depth1", base.replace(enable_sss=False, max_depth=1)),
        ("depth1", base.replace(max_depth=1)),
        ("no_sort", base.replace(ray_sort=False)),
    ]
    for name, cfg in variants:
        render_sample(scene, camera, cfg, jnp.uint32(0), accel
                      ).block_until_ready()
        t0 = time.perf_counter()
        n = 2
        for i in range(n):
            img = render_sample(scene, camera, cfg, jnp.uint32(50 + i), accel)
        img.block_until_ready()
        dt = (time.perf_counter() - t0) / n
        trav = traversals_per_sample(cfg, scene.lights.count)
        print(f"  {name:>14}  step={dt*1e3:8.1f} ms  traversals={trav:3d} "
              f" ms/traversal={dt*1e3/trav:6.1f}", flush=True)


if __name__ == "__main__":
    main()

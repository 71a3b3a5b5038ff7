"""Round-4 follow-ups on the compacted flagship:

A. Is the PER-QUERY sort still worth it once the carry is compacted?
   Compaction already Morton-orders lanes by hit position, and occupancy
   inside the compact buffer is high (~96% at bounce 0), so the sort's two
   remaining jobs — dead-lane clustering and octant grouping — may no
   longer pay for its argsort+gather+scatter machinery at every query.
B. Leaf-size sweep at capacity 0.125 (r3 picked SAH leaf 8 at full width).
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
    side = 1024
    scene = procedural_scene(n_tris_target=66_000)
    camera = OrbitCamera().camera()
    base = RenderConfig(
        width=side, height=side, max_depth=4, spp=1,
        traversal="quad", bvh_builder="sah", bvh_leaf_size=8,
        packet_tile=4096, interleave=1, ray_sort=True, enable_sss=True,
        compact_frac=0.125,
    )
    print(f"backend={jax.default_backend()} side={side}", flush=True)

    variants = [
        ("leaf8_sorted", base),
        ("leaf8_nosort", base.replace(ray_sort=False)),
        ("leaf4_sorted", base.replace(bvh_leaf_size=4)),
        ("leaf16_sorted", base.replace(bvh_leaf_size=16)),
    ]
    for name, cfg in variants:
        if cfg.bvh_leaf_size > 8:
            # quad leaf rows hold up to 8 tris; leaf 16 not packable
            print(f"  {name:>14}  skipped (quad leaf rows cap at 8 tris)",
                  flush=True)
            continue
        accel = build_accel(scene, cfg)
        render_sample(scene, camera, cfg, jnp.uint32(0), accel
                      ).block_until_ready()
        t0 = time.perf_counter()
        n = 2
        for i in range(n):
            img = render_sample(scene, camera, cfg, jnp.uint32(70 + i), accel)
        img.block_until_ready()
        dt = (time.perf_counter() - t0) / n
        trav = traversals_per_sample(cfg, scene.lights.count)
        print(f"  {name:>14}  step={dt*1e3:8.1f} ms  "
              f"ms/traversal={dt*1e3/trav:6.1f}", flush=True)


if __name__ == "__main__":
    main()

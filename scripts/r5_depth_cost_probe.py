"""Round-5 probe: per-depth cost of the flagship step — is a SECOND
compaction level (re-compacting the carry entering bounce 2, where only
~11% of the compact buffer is live) worth building?

Measures the flagship 1024^2 step at max_depth 1/2/3/4; the depth-(k)
minus depth-(k-1) delta is bounce k's full cost (its nearest + NEE + SSS
queries + shading at compact width).  If bounces 2+3 together are small,
the nested-compaction lever is bounded by that number and stays retired.
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


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    scene = procedural_scene(n_tris_target=66_000)
    cam = OrbitCamera(yaw=0.21).camera()
    base = RenderConfig(
        width=1024, height=1024, max_depth=4, spp=1, traversal="quad",
        bvh_builder="sah", bvh_leaf_size=8, packet_tile=4096, interleave=1,
        ray_sort=True, compact_frac=0.125,
    )
    accel = build_accel(scene, base)
    prev = 0.0
    for depth in (1, 2, 3, 4):
        cfg = base.replace(max_depth=depth)
        render_sample(scene, cam, cfg, jnp.uint32(0), accel).block_until_ready()
        t0 = time.perf_counter()
        for i in range(1, 4):
            img = render_sample(scene, cam, cfg, jnp.uint32(300 + i), accel)
        img.block_until_ready()
        t = (time.perf_counter() - t0) / 3
        print(f"depth {depth}: {t*1e3:7.1f} ms/step"
              + (f"  (bounce {depth-1} adds {((t-prev))*1e3:+6.1f} ms)"
                 if depth > 1 else ""), flush=True)
        prev = t


if __name__ == "__main__":
    main()

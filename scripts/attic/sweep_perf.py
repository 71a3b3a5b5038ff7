"""Sweep ray_sort / leaf size / packet tile on the real chip at 256²."""
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

scene = procedural_scene(n_tris_target=66_000)
camera = OrbitCamera().camera()


def run(tag, **kw):
    cfg = RenderConfig(width=256, height=256, max_depth=4, spp=1,
                       enable_sss=True, traversal="pallas", **kw)
    accel = build_accel(scene, cfg)
    f = lambda i: render_sample(scene, camera, cfg, jnp.uint32(i), accel)
    f(0).block_until_ready()
    t0 = time.perf_counter()
    n = 3
    for i in range(n):
        img = f(100 + i)
    img.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    rays = cfg.n_pixels * cfg.spp * traversals_per_sample(cfg, scene.lights.count)
    print(f"{tag:48s} {dt*1e3:9.1f} ms  {rays/dt/1e6:8.2f} Mray/s", flush=True)


for leaf in (8, 16):
    for sort in (False, True):
        run(f"leaf={leaf} sort={sort} tile=1024",
            bvh_leaf_size=leaf, ray_sort=sort, packet_tile=1024)

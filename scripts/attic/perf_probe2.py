import time
import jax, jax.numpy as jnp
from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
from dpt_tpu.accel.bvh import build_accel
from dpt_tpu.render.renderer import render_sample
from dpt_tpu.utils.metrics import traversals_per_sample

scene = procedural_scene(n_tris_target=66_000)
camera = OrbitCamera().camera()

def run(tag, **kw):
    cfg = RenderConfig(width=256, height=256, max_depth=4, spp=1,
                       enable_sss=True, **kw)
    accel = build_accel(scene, cfg)
    f = lambda i: render_sample(scene, camera, cfg, jnp.uint32(i), accel)
    f(0).block_until_ready()
    t0 = time.perf_counter()
    n = 3
    for i in range(n):
        img = f(100+i)
    img.block_until_ready()
    dt = (time.perf_counter()-t0)/n
    rays = cfg.n_pixels * cfg.spp * traversals_per_sample(cfg, scene.lights.count)
    print(f"{tag:40s} {dt*1e3:9.1f} ms  {rays/dt/1e6:8.2f} Mray/s", flush=True)

import sys
which = sys.argv[1]
if which == "bvh":
    run("bvh (lax per-ray) leaf=8", traversal="bvh", bvh_leaf_size=8)
elif which == "packet":
    run("packet (lax) tile=1024", traversal="packet", bvh_leaf_size=8, packet_tile=1024)
elif which == "brute":
    run("brute", traversal="brute")

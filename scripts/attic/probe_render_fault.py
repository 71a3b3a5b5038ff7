import sys, time
import jax, jax.numpy as jnp
from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
from dpt_tpu.accel.bvh import build_accel
from dpt_tpu.render.renderer import render_sample

side = int(sys.argv[1]); depth = int(sys.argv[2]); sss = sys.argv[3] == "1"
scene = procedural_scene(n_tris_target=66_000)
camera = OrbitCamera().camera()
cfg = RenderConfig(width=side, height=side, max_depth=depth, spp=1,
                   enable_sss=sss, traversal="bvh", bvh_leaf_size=8)
accel = build_accel(scene, cfg)
img = render_sample(scene, camera, cfg, jnp.uint32(0), accel)
img.block_until_ready()
print("ok", side, depth, sss, float(img.mean()), flush=True)

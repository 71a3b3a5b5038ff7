import jax, jax.numpy as jnp, numpy as np
from dpt_tpu import RenderConfig, procedural_scene, cornell_box_scene
from dpt_tpu.accel.bvh import build_accel
from dpt_tpu.render.trace import make_nearest

import sys
n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 500
nrays = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
scene = procedural_scene(n_tris_target=n_tris)
cfg = RenderConfig(traversal="bvh", bvh_leaf_size=8)
accel = build_accel(scene, cfg)
rng = np.random.default_rng(0)
o = jnp.asarray(rng.normal(size=(nrays,3))*2, jnp.float32)
d = rng.normal(size=(nrays,3)); d /= np.linalg.norm(d,axis=-1,keepdims=True)
d = jnp.asarray(d, jnp.float32)
near = jax.jit(make_nearest(scene, cfg, accel))
r = near(o, d)
print("ok", r["hit"].sum(), flush=True)

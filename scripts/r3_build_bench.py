"""BVH build-time comparison: host SAH / host median(+native) / on-device LBVH.

VERDICT r2 #8: quantify what the on-device LBVH buys.  The LBVH builds
inside jit on the accelerator (dynamic-geometry path — rebuild per frame);
the host builders are one-off scene-load costs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dpt_tpu import procedural_scene
from dpt_tpu.accel.bvh import build_bvh_median, build_bvh_sah
from dpt_tpu.accel.lbvh import build_lbvh


def main():
    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 66_000
    scene = procedural_scene(n_tris_target=tris)
    import numpy as np

    v = np.asarray(scene.vertices)
    idx = np.asarray(scene.indices)
    print(f"backend={jax.default_backend()} tris={scene.n_triangles}",
          flush=True)

    t0 = time.perf_counter()
    build_bvh_median(v, idx, leaf_size=8, use_native=True)
    print(f"  host median (native if built): {time.perf_counter()-t0:7.2f} s",
          flush=True)

    t0 = time.perf_counter()
    build_bvh_sah(v, idx, leaf_size=8)
    print(f"  host SAH (numpy):              {time.perf_counter()-t0:7.2f} s",
          flush=True)

    build = jax.jit(build_lbvh, static_argnames=("leaf_size",))
    t0 = time.perf_counter()
    bvh = build(scene.vertices, scene.indices, leaf_size=8)
    jax.block_until_ready(bvh.node_min)
    compile_s = time.perf_counter() - t0
    # jitter vertices so the axon relay can't memoize
    for i in range(3):
        v2 = scene.vertices + jnp.float32(1e-6 * (i + 1))
        t0 = time.perf_counter()
        bvh = build(v2, scene.indices, leaf_size=8)
        jax.block_until_ready(bvh.node_min)
    print(f"  on-device LBVH (jit):          {time.perf_counter()-t0:7.3f} s"
          f"  (first call incl. compile {compile_s:.1f} s)", flush=True)


if __name__ == "__main__":
    main()

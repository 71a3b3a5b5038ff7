"""Capacity-overflow behavior on chip: a HOT framing (camera close, most
primary rays hit) drives the live count far past the flagship capacity
C = 0.125R, so several chunks of the compact scan execute.  Verifies the
degradation is graceful (≈ live-chunk count × per-chunk cost, not a cliff)
and that the image equals the uncompacted render at the same framing.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
from dpt_tpu.accel.bvh import build_accel
from dpt_tpu.render.renderer import render_sample, live_fraction_by_depth


def main():
    side = 1024
    scene = procedural_scene(n_tris_target=66_000)
    base = RenderConfig(
        width=side, height=side, max_depth=4, spp=1,
        traversal="quad", bvh_builder="sah", bvh_leaf_size=8,
        packet_tile=4096, interleave=1, ray_sort=True, enable_sss=True,
        compact_frac=0.125,
    )
    accel = build_accel(scene, base)
    print(f"backend={jax.default_backend()} side={side}", flush=True)

    for name, radius in (("flagship_r5", 5.0), ("hot_r2", 2.0)):
        camera = OrbitCamera(radius=radius).camera()
        # prim-hit fraction at 256² (fractions are framing statistics)
        lf = live_fraction_by_depth(
            scene, camera, base.replace(width=256, height=256), accel)
        for label, cfg in (("compact_0.125", base),
                           ("compact_off", base.replace(compact_frac=0.0))):
            render_sample(scene, camera, cfg, jnp.uint32(0), accel
                          ).block_until_ready()
            t0 = time.perf_counter()
            n = 2
            for i in range(n):
                img = render_sample(scene, camera, cfg, jnp.uint32(90 + i),
                                    accel)
            img.block_until_ready()
            dt = (time.perf_counter() - t0) / n
            print(f"  {name:>12} hit0={lf[1]:.3f}  {label:>13}: "
                  f"step={dt*1e3:8.1f} ms", flush=True)
        a = np.asarray(render_sample(scene, camera, base, jnp.uint32(90),
                                     accel))
        b = np.asarray(render_sample(
            scene, camera, base.replace(compact_frac=0.0), jnp.uint32(90),
            accel))
        print(f"  {name:>12} compact ≡ off: {np.array_equal(a, b)} "
              f"(maxdiff {np.abs(a-b).max():.2e})", flush=True)


if __name__ == "__main__":
    main()

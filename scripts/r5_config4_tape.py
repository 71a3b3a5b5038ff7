"""Round-5 config-4 measurement: the TAPE optimisation step at real spp.

Measures, on the flagship 1024² / 66k-tri config:
  - tape fwd+bwd+SGD step at spp=1 and spp=16 (the 4x16-spp micro-step
    recipe's unit — each micro-step is one dispatch, safely under the
    axon relay's ~90 s per-execution cap);
  - the jitted on-device accel refit (refit_quad) cost, which the
    optimize driver pays once per step when vertices are optimised —
    must be ≪ step cost (VERDICT r4 next #2 'Done' criterion).
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
from dpt_tpu.diff.grads import split_params, tape_loss_and_grads
from dpt_tpu.kernels.pallas_quad import refit_quad


def bench(fn, n=3):
    out = fn(0)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = fn(i)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / n


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    scene = procedural_scene(n_tris_target=66_000)
    cam = OrbitCamera(yaw=0.31).camera()
    base = RenderConfig(
        width=1024, height=1024, max_depth=4, spp=1, traversal="quad",
        bvh_builder="sah", bvh_leaf_size=8, packet_tile=4096, interleave=1,
        ray_sort=True, compact_frac=0.125,
    )
    accel = build_accel(scene, base)
    target = jnp.zeros((base.height, base.width, 3), jnp.float32)

    # Refit cost (jitted; the per-step price of vertex optimisation).
    jref = jax.jit(refit_quad)
    verts = [scene.vertices + 1e-4 * i for i in range(5)]
    tr = bench(lambda i: jref(accel, verts[i % 5], scene.indices))
    print(f"refit_quad (66k tris, jit): {tr*1e3:.1f} ms", flush=True)

    for spp in (1, 16):
        cfg = base.replace(spp=spp)

        def step(i, cfg=cfg):
            loss, grads = tape_loss_and_grads(
                scene, cam, cfg, target, sample_batch=50 + i, accel=accel)
            return loss, grads

        t = bench(lambda i: step(i), n=2)
        print(f"tape fwd+bwd step, spp={spp:2d}: {t*1e3:8.1f} ms "
              f"({t*1e3/spp:.1f} ms/spp)", flush=True)


if __name__ == "__main__":
    main()

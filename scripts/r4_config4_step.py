"""Config 4 REAL optimisation step (VERDICT r3 next #1): Sylveon-class
1024², 64 spp, fused replay fwd+bwd + SGD update, measured on chip — the
r3 BASELINE row was a "≈64x the 1-spp step" extrapolation; this replaces it
with a measurement.  The spp axis is a lax.scan inside render_sample
(re-render per sub-sample; no per-spp tape — diff/grads.replay_loss_and_grads
+ cfg.remat_bounces), so peak memory is spp-independent.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dpt_tpu import OrbitCamera, procedural_scene, preset
from dpt_tpu.accel.bvh import build_accel
from dpt_tpu.diff.grads import replay_loss_and_grads, split_params


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    scene = procedural_scene(n_tris_target=66_000)
    camera = OrbitCamera().camera()
    cfg = preset("sylveon1024").replace(spp=spp)
    accel = build_accel(scene, cfg)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    params = split_params(scene, camera)
    print(f"backend={jax.default_backend()} 1024^2 spp={spp} "
          f"depth={cfg.max_depth}", flush=True)

    def opt_step(seed):
        loss, grads = replay_loss_and_grads(
            scene, camera, cfg, target, sample_batch=seed, accel=accel
        )
        new_params = jax.tree_util.tree_map(
            lambda p, g: p - 1e-2 * g, params, grads
        )
        return loss, new_params

    loss, _ = opt_step(0)  # compile
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    loss, new_params = opt_step(7)
    jax.block_until_ready((loss, new_params))
    dt = time.perf_counter() - t0
    print(f"  {spp}-spp optimisation step: {dt*1e3:.0f} ms "
          f"(loss={float(loss):.6f})", flush=True)
    print(f"  per-spp fwd+bwd: {dt*1e3/spp:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Capture jax.profiler traces of the sharded fwd+bwd step (SURVEY §7 M5/M6).

Two captures:
  1. real-chip (axon TPU, 1-device mesh): proves the tile-sharded fwd+bwd
     program executes on hardware under shard_map;
  2. 8-device virtual CPU mesh: shows WHERE the gradient all-reduce (the
     shard_map transpose's psum over 'tiles') is scheduled relative to the
     backward bounce compute in the compiled program.

With one physical chip the ICI overlap cannot be *timed*; the honest
statement this produces (for BASELINE.md) is the psum's position in the
schedule + the single-chip step time.  Run on a v5e slice unchanged for the
real overlap measurement.

Usage:
    python scripts/r3_trace.py               # real chip, trace to artifacts/
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/r3_trace.py           # virtual mesh psum placement
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
from dpt_tpu.accel.bvh import build_accel
from dpt_tpu.diff.grads import split_params
from dpt_tpu.dist.sharding import make_tile_mesh, sharded_loss_and_grads_jit


def main():
    n_dev = len(jax.devices())
    side = int(sys.argv[1]) if len(sys.argv) > 1 else (
        512 if jax.default_backend() == "tpu" else 32
    )
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts",
        f"trace_{jax.default_backend()}_{n_dev}dev")
    os.makedirs(out, exist_ok=True)

    cfg = RenderConfig(
        width=side, height=side - side % n_dev, max_depth=2, spp=1,
        traversal="quad", bvh_builder="sah", bvh_leaf_size=8,
        packet_tile=1024, ray_sort=True, enable_sss=True,
    )
    scene = procedural_scene(n_tris_target=8000)
    camera = OrbitCamera().camera()
    accel = build_accel(scene, cfg)
    mesh = make_tile_mesh(n_dev)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    params = split_params(scene, camera)

    # warm up (compile outside the trace)
    loss, grads = sharded_loss_and_grads_jit(
        params, scene, camera, cfg, target, jnp.uint32(0), accel, mesh)
    jax.block_until_ready((loss, grads))

    with jax.profiler.trace(out):
        with jax.profiler.StepTraceAnnotation("sharded_fwd_bwd", step_num=0):
            loss, grads = sharded_loss_and_grads_jit(
                params, scene, camera, cfg, target, jnp.uint32(1), accel,
                mesh)
            jax.block_until_ready((loss, grads))

    print(f"backend={jax.default_backend()} devices={n_dev} "
          f"side={cfg.width}x{cfg.height} loss={float(loss):.6f}")
    print(f"trace written to {out}")


if __name__ == "__main__":
    main()

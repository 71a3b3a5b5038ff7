"""Trace the TAPE fwd+bwd step and decompose device time (round 5).

Like scripts/r4_trace_grad.py but for `tape_loss_and_grads`: captures one
step at 512² on the real chip into artifacts/trace_r5_tape and prints the
leaf-op family summary.  Expectation: the Mosaic `_traverse` share drops
from 72.1% (replay, r4) to only the FORWARD's traversals — the backward
contains none by construction.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
from dpt_tpu.accel.bvh import build_accel
from dpt_tpu.diff.grads import tape_loss_and_grads
from r4_trace_grad import summarize


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "trace_r5_tape")
    os.makedirs(out, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    scene = procedural_scene(n_tris_target=66_000)
    cam = OrbitCamera(yaw=0.77).camera()
    cfg = RenderConfig(
        width=side, height=side, max_depth=4, spp=1, traversal="quad",
        bvh_builder="sah", bvh_leaf_size=8, packet_tile=4096, interleave=1,
        ray_sort=True, compact_frac=0.125,
    )
    accel = build_accel(scene, cfg)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    def step(i):
        return tape_loss_and_grads(scene, cam, cfg, target,
                                   sample_batch=30 + i, accel=accel)

    jax.block_until_ready(step(0))  # compile outside the trace
    with jax.profiler.trace(out):
        jax.block_until_ready(step(1))
    summarize(out)


if __name__ == "__main__":
    main()

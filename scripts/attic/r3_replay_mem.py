"""Replay vs remat backward: peak device memory + wall time (SURVEY §7 M4).

Compares, at a given resolution on the current device:
  - render_loss_and_grads: plain value_and_grad; the bounce scan is remat'd
    (cfg.remat_bounces), so the tape holds one bounce of residuals x spp.
  - replay_loss_and_grads: custom_vjp; the forward saves only the inputs,
    the backward re-renders under vjp (then remat applies inside).

Both produce bit-identical gradients (tests/test_grads.py).  Peak memory is
read from device.memory_stats() (TPU) around each call.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
from dpt_tpu.accel.bvh import build_accel
from dpt_tpu.diff.grads import render_loss_and_grads, replay_loss_and_grads


def peak_mb():
    stats = jax.devices()[0].memory_stats() or {}
    return stats.get("peak_bytes_in_use", 0) / 1e6


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    cfg = RenderConfig(
        width=side, height=side, max_depth=4, spp=1, traversal="quad",
        bvh_builder="sah", bvh_leaf_size=8, packet_tile=4096,
        ray_sort=True, enable_sss=True,
    )
    scene = procedural_scene(n_tris_target=66_000)
    cam = OrbitCamera().camera()
    accel = build_accel(scene, cfg)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    print(f"backend={jax.default_backend()} side={side}", flush=True)

    for name, fn in (
        ("remat value_and_grad", render_loss_and_grads),
        ("replay custom_vjp", replay_loss_and_grads),
    ):
        out = fn(scene, cam, cfg, target, sample_batch=0, accel=accel)
        jax.block_until_ready(out)
        base = peak_mb()
        t0 = time.perf_counter()
        out = fn(scene, cam, cfg, target, sample_batch=1, accel=accel)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) * 1e3
        print(f"  {name:>22}: {dt:8.1f} ms  peak_mem={peak_mb():8.1f} MB "
              f"(baseline {base:.1f})", flush=True)


if __name__ == "__main__":
    main()

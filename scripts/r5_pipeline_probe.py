"""Round-5 probe (VERDICT r4 next #8): pipelined progressive loop gain.

render_progressive now keeps one batch in flight (dispatch b+1 before
blocking on b) so host accumulation/publish overlaps device compute —
SURVEY's "block only at measurement boundaries".  This measures total
wall for N progressive batches: pipelined driver vs the old
block-every-batch shape, flagship config at 512² (each batch a distinct
sample_batch, so the axon relay cannot memoize).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
from dpt_tpu.accel.bvh import build_accel
from dpt_tpu.render.renderer import (
    accumulate,
    render_progressive,
    render_sample,
)


def main():
    cfg = RenderConfig(
        width=512, height=512, max_depth=4, spp=1, traversal="quad",
        bvh_builder="sah", bvh_leaf_size=8, packet_tile=4096, interleave=1,
        ray_sort=True, compact_frac=0.125, sample_batches=8,
    )
    scene = procedural_scene(n_tris_target=66_000)
    # Unique framing so the axon relay cannot serve memoized executions
    # from earlier rounds' 512² runs.
    cam = OrbitCamera(yaw=3.7, pitch=-1.3).camera()
    accel = build_accel(scene, cfg)
    n = 8

    # Warm both programs.
    img = render_sample(scene, cam, cfg, jnp.uint32(999), accel)
    accumulate(img, img, jnp.uint32(999), cfg).block_until_ready()

    sink = []

    def on_batch(b, im, m):
        sink.append(m["batch_ms"])

    # Old shape: block on every batch before dispatching the next.
    t0 = time.perf_counter()
    img = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    for b in range(n):
        s = render_sample(scene, cam, cfg, jnp.uint32(100 + b), accel)
        img = accumulate(img, s, jnp.uint32(b), cfg)
        img.block_until_ready()
        _ = float(img[0, 0, 0])  # publish-ish host touch
    t_block = time.perf_counter() - t0

    # Pipelined driver (current render_progressive).
    t0 = time.perf_counter()
    img2, _ = render_progressive(
        scene, cam, cfg.replace(sample_batches=n), accel=accel,
        on_batch=on_batch, start_batch=0,
    )
    jax.block_until_ready(img2)
    t_pipe = time.perf_counter() - t0

    print(f"blocking  : {t_block*1e3:8.1f} ms total ({t_block/n*1e3:.1f}/batch)",
          flush=True)
    print(f"pipelined : {t_pipe*1e3:8.1f} ms total ({t_pipe/n*1e3:.1f}/batch)  "
          f"({(t_block-t_pipe)/t_block*100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()

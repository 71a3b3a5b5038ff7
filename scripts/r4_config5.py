"""Config 5 on the chip (VERDICT r3 next #6): Sylveon-class 2048², 4
bounces, spp-chunked, single v5e chip.

BASELINE.json row 5 targets 2048²/128 spp multi-host; this measures the
per-chip building block: a 1-spp step and an 8-spp chunk (spp scanned on
device inside one jit — the memory recipe from SURVEY §7: re-render per
sub-sample, never store per-spp state), plus the device HBM high-water mark
if the runtime exposes it.  128 spp = 16 such chunks (progressive batches)
on one chip, or one 8-spp chunk per chip on a 16-chip slice.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dpt_tpu import OrbitCamera, procedural_scene, preset
from dpt_tpu.accel.bvh import build_accel
from dpt_tpu.render.renderer import render_sample


def mem_stats():
    try:
        s = jax.devices()[0].memory_stats()
        if not s:
            return "n/a"
        return (f"in_use={s.get('bytes_in_use', 0)/2**30:.2f} GiB "
                f"peak={s.get('peak_bytes_in_use', 0)/2**30:.2f} GiB "
                f"limit={s.get('bytes_limit', 0)/2**30:.2f} GiB")
    except Exception as e:  # relay may not expose stats
        return f"n/a ({type(e).__name__})"


def main():
    scene = procedural_scene(n_tris_target=66_000)
    camera = OrbitCamera().camera()
    base = preset("sylveon2048")
    print(f"backend={jax.default_backend()} {base.width}x{base.height} "
          f"depth={base.max_depth}", flush=True)

    for spp in (1, 8):
        cfg = base.replace(spp=spp, sample_batches=1)
        accel = build_accel(scene, cfg)
        render_sample(scene, camera, cfg, jnp.uint32(0), accel
                      ).block_until_ready()
        t0 = time.perf_counter()
        n = 2
        for i in range(n):
            img = render_sample(scene, camera, cfg, jnp.uint32(31 + i), accel)
        img.block_until_ready()
        dt = (time.perf_counter() - t0) / n
        print(f"  spp={spp:3d}: step={dt*1e3:9.1f} ms "
              f"({dt*1e3/spp:8.1f} ms/spp)  mem: {mem_stats()}", flush=True)
    print("  128-spp recipe: 16 progressive 8-spp chunks/chip, or one "
          "8-spp chunk per chip on v5e-16", flush=True)


if __name__ == "__main__":
    main()

"""Round-4 per-stream probe: (packet_tile, interleave) sweep on the
POST-COMPACTION SSS-shaped stream (VERDICT r3 next #2 groundwork).

The r3 sweep picked (tile=4096, interleave=1) with one config for every
stream.  After pre-shade compaction the expensive streams are 256k-lane
SSS nearest/shadow queries with Morton-clustered origins and uniform-sphere
directions — their tile unions approach the whole tree, so shrinking the
per-chain tile costs little union growth while interleaved chains hide the
~160 ns pop->load->test->push latency (scripts/probe_interleave.py measured
299 -> 32.5 ns/iter/chain at P=8 on synthetic walks).  This measures the
real quad kernel on the real stream shape to decide per-stream configs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from dpt_tpu import OrbitCamera, RenderConfig, procedural_scene
from dpt_tpu.accel.bvh import build_accel
from dpt_tpu.render.raygen import generate_rays
from dpt_tpu.render.trace import make_nearest, make_occluded


def bench(fn, n=3):
    out = fn(0)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = fn(i)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / n


def main():
    side = 1024
    C = 256 * 1024  # flagship compact capacity at 1024^2, frac 0.25
    scene = procedural_scene(n_tris_target=66_000)
    cam = OrbitCamera().camera()
    base = RenderConfig(
        width=side, height=side, max_depth=4, spp=1, traversal="quad",
        bvh_builder="sah", bvh_leaf_size=8, packet_tile=4096, interleave=1,
        ray_sort=True,
    )
    accel = build_accel(scene, base)

    # Reconstruct the compacted bounce-0 carry exactly as the integrator
    # does: primary trace, live-first Morton sort of hit positions, top-C.
    o, d, _ = generate_rays(cam, base, jnp.uint32(0))
    prim = make_nearest(scene, base, accel)
    res = jax.jit(lambda o_, d_: prim.unsorted(o_, d_))(o, d)
    hit = np.asarray(res["hit"])
    t = np.asarray(res["t"])
    pos = np.asarray(o) + t[:, None] * np.asarray(d)
    from dpt_tpu.render.compaction import morton3d

    v = np.asarray(scene.vertices)
    key = np.where(
        hit,
        np.asarray(morton3d(jnp.asarray(pos), v.min(0), v.max(0))),
        np.uint32(0xFFFFFFFF),
    )
    perm = np.argsort(key)[:C]
    n_live = int(hit.sum())
    print(f"R={o.shape[0]} C={C} live={n_live} "
          f"backend={jax.default_backend()}", flush=True)

    rng = np.random.default_rng(1)
    sd = rng.normal(size=(C, 3)).astype(np.float32)
    sd /= np.linalg.norm(sd, axis=-1, keepdims=True)
    live = hit[perm]
    # SSS sub-step origins: just inside the surface, masked lanes at 1e9
    # with +z direction (integrator._masked_query convention).
    so = np.where(live[:, None], pos[perm] - 1e-3 * sd, 1e9).astype(np.float32)
    sdm = np.where(live[:, None], sd, np.array([0.0, 0.0, 1.0], np.float32))
    so_j = jnp.asarray(so)
    sd_j = jnp.asarray(sdm)
    md = jnp.where(jnp.asarray(live), 3.0, -1.0).astype(jnp.float32)
    eps = [jnp.asarray(rng.normal(0, 1e-5, (C, 3)), jnp.float32)
           for _ in range(8)]

    sweeps = [(4096, 1), (4096, 2), (4096, 4), (4096, 8),
              (2048, 4), (1024, 4), (1024, 8), (512, 8)]
    for tile, il in sweeps:
        cfg = base.replace(packet_tile=tile, interleave=il)
        near = make_nearest(scene, cfg, accel)
        occ = make_occluded(scene, cfg, accel)
        jn = jax.jit(lambda a, b: near(a, b))
        jo = jax.jit(lambda a, b, m: occ(a, b, m))
        tn = bench(lambda i: jn(so_j + eps[i % 8], sd_j))
        to = bench(lambda i: jo(so_j + eps[i % 8], sd_j, md))
        print(f"  tile={tile:5d} il={il}  sss_near={tn*1e3:7.2f} ms "
              f" sss_occ={to*1e3:7.2f} ms  (per 256k-lane query)", flush=True)


if __name__ == "__main__":
    main()

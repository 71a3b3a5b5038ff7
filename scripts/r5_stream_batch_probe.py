"""Round-5 probe (VERDICT r4 next #4): batch independent query streams?

Hypothesis: within a bounce, the NEE shadow query and the first SSS
sub-step nearest (and each sss_occ_k / sss_near_{k+1} pair) are mutually
independent; concatenating each pair into ONE 2C-wide sorted nearest
launch amortises the per-query sort wrapper + kernel launch.  The cost is
running the shadow half as a nearest walk (no any-hit early exit,
~+6% per BASELINE r4 stream table) and doubling the launch width.

This measures, on the real quad kernel and the real compacted stream
shape (C = 131k at 1024^2 / frac 0.125):
  A. separate: sorted occ(shadow) + sorted nearest(SSS)   [today's shape]
  B. merged:   one sorted nearest at 2C, occ = hit & t < maxdist
  C. overhead floor: sorted nearest at C vs at 2C (same stream twice)
If B >= ~15% faster than A, restructure the integrator; else commit the
negative result (VERDICT allows either with numbers).
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
    C = 128 * 1024  # capacity at 1024^2, frac 0.125 (flagship default)
    scene = procedural_scene(n_tris_target=66_000)
    cam = OrbitCamera().camera()
    base = RenderConfig(
        width=side, height=side, max_depth=4, spp=1, traversal="quad",
        bvh_builder="sah", bvh_leaf_size=8, packet_tile=4096, interleave=1,
        ray_sort=True,
    )
    accel = build_accel(scene, base)

    # The compacted bounce-0 carry, exactly as the integrator builds it.
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
    live = hit[perm]
    print(f"R={o.shape[0]} C={C} live={int(hit.sum())} "
          f"backend={jax.default_backend()}", flush=True)

    rng = np.random.default_rng(1)
    # SSS sub-step stream: interior origins, uniform-sphere directions.
    sd = rng.normal(size=(C, 3)).astype(np.float32)
    sd /= np.linalg.norm(sd, axis=-1, keepdims=True)
    so = np.where(live[:, None], pos[perm] - 1e-3 * sd, 1e9).astype(np.float32)
    sdm = np.where(live[:, None], sd, np.array([0, 0, 1], np.float32))
    # NEE shadow stream: same origins (hit positions), directions to a
    # jittered point on the area light at (0, 2, 0), size 2.5.
    lp = np.array([0.0, 2.0, 0.0], np.float32) + np.concatenate(
        [rng.uniform(-1.25, 1.25, (C, 1)), np.zeros((C, 1)),
         rng.uniform(-1.25, 1.25, (C, 1))], axis=1).astype(np.float32)
    tl = lp - pos[perm]
    ldist = np.linalg.norm(tl, axis=-1).astype(np.float32)
    ld = tl / np.maximum(ldist, 1e-20)[:, None]
    ho = np.where(live[:, None], pos[perm] + 1e-3 * ld, 1e9).astype(np.float32)
    hd = np.where(live[:, None], ld, np.array([0, 0, 1], np.float32))
    md = np.where(live, ldist - 1e-3, -1.0).astype(np.float32)

    so_j, sd_j = jnp.asarray(so), jnp.asarray(sdm)
    ho_j, hd_j = jnp.asarray(ho), jnp.asarray(hd)
    md_j = jnp.asarray(md)
    eps = [jnp.asarray(rng.normal(0, 1e-5, (C, 3)), jnp.float32)
           for _ in range(8)]

    near = make_nearest(scene, base, accel)
    occ = make_occluded(scene, base, accel)

    # A: today's shape — two sorted launches.
    @jax.jit
    def separate(e):
        o1 = occ(ho_j + e, hd_j, md_j)
        r = near(so_j + e, sd_j)
        return o1, r["t"]

    # B: one merged 2C sorted nearest launch.
    @jax.jit
    def merged(e):
        oo = jnp.concatenate([ho_j + e, so_j + e])
        dd = jnp.concatenate([hd_j, sd_j])
        r = near(oo, dd)
        o1 = r["hit"][:C] & (r["t"][:C] < md_j)
        return o1, r["t"][C:]

    # C: width scaling floor.
    @jax.jit
    def single_c(e):
        return near(so_j + e, sd_j)["t"]

    @jax.jit
    def double_c(e):
        oo = jnp.concatenate([so_j + e, so_j + e])
        dd = jnp.concatenate([sd_j, sd_j])
        return near(oo, dd)["t"]

    ta = bench(lambda i: separate(eps[i % 8]))
    tb = bench(lambda i: merged(eps[i % 8]))
    t1 = bench(lambda i: single_c(eps[i % 8]))
    t2 = bench(lambda i: double_c(eps[i % 8]))
    print(f"A separate occ+near : {ta*1e3:8.2f} ms", flush=True)
    print(f"B merged 2C nearest : {tb*1e3:8.2f} ms  "
          f"({(ta-tb)/ta*100:+.1f}% vs A)", flush=True)
    print(f"C nearest @C        : {t1*1e3:8.2f} ms", flush=True)
    print(f"C nearest @2C (dup) : {t2*1e3:8.2f} ms  "
          f"(width scaling {t2/t1:.2f}x)", flush=True)


if __name__ == "__main__":
    main()

"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): rays/sec/chip at 1024², 4 bounces on a
Sylveon-class mesh — forward by default, forward+backward with --grad.
"Rays" follows SURVEY §3.3's accounting: every BVH traversal launched per
pixel-sample (primary + shadow + SSS walks).  The JSON line also carries
rays_per_s_net (only live lanes charged, via a measured per-depth live
fraction) and kernel_mode (proof the Mosaic kernel COMPILED rather than
interpreted — VERDICT r2 weak #3).

Usage:
    python bench.py                # headline fwd config on the default device
    python bench.py --grad         # fused forward+backward (replay vjp)
    python bench.py --quick        # 256² smoke config
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _flagship_cfg(side, iters):
    """The recipe the r3 on-chip sweep picked (scripts/r3_sweep.py,
    BASELINE.md matrix): 4-wide Mosaic kernel, SAH leaf 8, PER-QUERY
    coherence sort (carry-level wavefront sort measured 1.5x slower —
    octant purity of each query stream beats sort-machinery savings),
    one maximal packet tile per kernel step, primary stream unsorted."""
    from dpt_tpu import RenderConfig

    return RenderConfig(
        width=side, height=side, max_depth=4, spp=1,
        traversal="quad", bvh_builder="sah", bvh_leaf_size=8,
        packet_tile=4096, interleave=1, ray_sort=True,
        enable_sss=True, sample_batches=iters,
        # r4 capacity sweep (scripts/r4_decompose.py): 0.125 -> 796 ms vs
        # 0.25 -> 1067 ms at the flagship framing (12% prim hits); chunked
        # overflow makes a tight capacity safe for other framings.
        compact_frac=0.125,
    )


def _bench_fwd(scene, camera, cfg, accel, n_iters):
    import jax.numpy as jnp

    from dpt_tpu.render.renderer import render_sample

    render_sample(scene, camera, cfg, jnp.uint32(0), accel).block_until_ready()
    t0 = time.perf_counter()
    for i in range(n_iters):
        img = render_sample(scene, camera, cfg, jnp.uint32(100 + i), accel)
    img.block_until_ready()
    return (time.perf_counter() - t0) / n_iters


def _bench_grad(scene, camera, cfg, accel, n_iters, replay=False):
    """Fused forward+backward step time.  Default: the TAPE custom_vjp —
    forward records every traversal outcome, backward differentiates the
    playback (no traversal kernels or per-query sorts in the backward).
    --grad-replay measures the r3/r4 replay program (backward re-renders)
    for comparison; both are module-level jits (repeated calls hit the
    cache)."""
    import jax
    import jax.numpy as jnp

    from dpt_tpu.diff.grads import replay_loss_and_grads, tape_loss_and_grads

    impl = replay_loss_and_grads if replay else tape_loss_and_grads
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    def step(i):
        return impl(scene, camera, cfg, target,
                    sample_batch=100 + i, accel=accel)

    jax.block_until_ready(step(0))
    t0 = time.perf_counter()
    for i in range(1, n_iters + 1):
        out = step(i)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--grad", action="store_true",
                    help="benchmark fused forward+backward instead of forward"
                         " (tape backward: the forward records traversal "
                         "outcomes, the backward replays without kernels)")
    ap.add_argument("--grad-replay", action="store_true",
                    help="with --grad: use the r4 replay backward "
                         "(re-renders in the backward) instead of the tape")
    ap.add_argument("--no-playback-remat", action="store_true",
                    help="with --grad: store playback bounce-body residuals "
                         "instead of rematerialising (measured slower on "
                         "chip: 1662 vs 1592 ms — BASELINE.md)")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--tris", type=int, default=66_000)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--rr", action="store_true",
                    help="enable Russian roulette (BASELINE.md RR row)")
    ap.add_argument("--compact-frac", type=float, default=None,
                    help="override carry-compaction capacity fraction "
                         "(default: AUTO — derived from the scene's "
                         "measured primary-hit fraction, VERDICT r4 "
                         "weak #5)")
    ap.add_argument("--scene-family", choices=["sphere", "knot"],
                    default="sphere",
                    help="Sylveon-class stand-in mesh family (knot = "
                         "self-shadowing torus knot, BASELINE second-scene "
                         "row)")
    args = ap.parse_args()

    from dpt_tpu import OrbitCamera, procedural_scene
    from dpt_tpu.accel.bvh import build_accel
    from dpt_tpu.kernels.pallas_quad import kernel_mode, table_modes
    from dpt_tpu.render.renderer import live_fraction_by_depth
    from dpt_tpu.utils.metrics import (
        effective_traversals_per_sample,
        traversals_per_sample,
    )

    import jax

    # Persistent compile cache: the flagship program takes minutes to
    # compile; repeated bench invocations (driver capture, sweeps) should
    # pay it once.  The axon relay memoizes executions, not compiles.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    side = args.width or (256 if args.quick else 1024)
    cfg = _flagship_cfg(side, args.iters)
    if args.rr:
        cfg = cfg.replace(russian_roulette=True)
    if args.no_playback_remat:
        cfg = cfg.replace(playback_remat_bounces=False)
    if args.scene_family == "knot":
        from dpt_tpu.scene.builder import knot_scene

        scene = knot_scene(n_tris_target=args.tris)
    else:
        scene = procedural_scene(n_tris_target=args.tris)
    camera = OrbitCamera().camera()
    accel = build_accel(scene, cfg)
    if args.compact_frac is not None:
        cfg = cfg.replace(compact_frac=args.compact_frac)
    else:
        # Auto-capacity: one cheap 256² primary-trace probe sizes the
        # compaction buffer to the scene's live fraction (sphere lands at
        # the hand-tuned 0.125 headline, the knot at its matched ~0.36 —
        # no per-scene flag needed; chunked overflow stays the safety net).
        from dpt_tpu.render.renderer import auto_compact_frac

        cfg = cfg.replace(
            compact_frac=auto_compact_frac(scene, camera, cfg, accel)
        )

    with jax.profiler.TraceAnnotation("bench"):
        if args.grad:
            step_s = _bench_grad(scene, camera, cfg, accel, args.iters,
                                 replay=args.grad_replay)
        else:
            step_s = _bench_fwd(scene, camera, cfg, accel, args.iters)

    # Live fractions are statistics of the framing, not the resolution:
    # measure them at 256² (same scene/camera/features) so the diagnostic
    # does not compile a second full-width bounce-chain program.
    lf_cfg = cfg.replace(width=256, height=256)
    live_in = live_fraction_by_depth(scene, camera, lf_cfg, accel)
    gross = cfg.n_pixels * cfg.spp * traversals_per_sample(
        cfg, scene.lights.count)
    net = cfg.n_pixels * cfg.spp * effective_traversals_per_sample(
        cfg, scene.lights.count, live_in)

    # No published reference numbers exist (BASELINE.md: the reference
    # prints runtime FPS but records nothing), so vs_baseline anchors to
    # THIS repo's round-2 driver artifact (BENCH_r02.json: 4.81 Mrays/s
    # gross fwd at the identical 1024²/4-bounce/66k-tri accounting); the
    # first measured fwd+bwd (r3, 4.83 M gross) anchors --grad.
    R2_FWD_GROSS = 4_808_853.0
    R3_GRAD_GROSS = 4_830_000.0
    anchor = R3_GRAD_GROSS if args.grad else R2_FWD_GROSS
    mode = "fwd+bwd" if args.grad else "fwd"
    value = gross / step_s
    print(json.dumps({
        "metric": f"rays/sec/chip {mode} (gross) {side}x{side} 4bounce "
                  f"{scene.n_triangles}tris",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(value / anchor, 3),
        "step_ms": round(step_s * 1e3, 2),
        "rays_per_s_net": round(net / step_s, 1),
        "live_in_by_depth": [round(f, 4) for f in live_in],
        # The live-fraction diagnostic runs at this (fixed) resolution —
        # a statistic of the framing, not of the benchmarked resolution
        # (ADVICE r4 #3: label it so net numbers are comparable).
        "live_in_res": 256,
        "kernel_mode": kernel_mode(),
        "table_modes": "/".join(table_modes(accel)),
        "config": "quad+sah8+ray_sort tile=4096 "
                  f"preshade-compact={cfg.compact_frac}"
                  + (" +rr" if args.rr else "")
                  + ((" bwd=replay" if args.grad_replay else " bwd=tape")
                     if args.grad else ""),
    }))


if __name__ == "__main__":
    sys.exit(main())

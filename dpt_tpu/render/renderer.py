"""Render drivers: single sample batch, progressive accumulation loop.

The reference's mainLoop (VulkanRayTracer.cpp:717-860) dispatches one 1-spp
kernel per iteration and accumulates a running average in the storage image
(raytrace_comp.comp:467-469), resetting when the camera moves
(VulkanRayTracer.cpp:739-754).  Here `render_sample` is the jitted analog of
one dispatch (spp sub-samples scanned on device) and `render_progressive` is
the host loop with accumulation, camera-reset, metrics and checkpointing.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dpt_tpu.config import RenderConfig
from dpt_tpu.render.integrator import trace_paths
from dpt_tpu.render.raygen import generate_rays
from dpt_tpu.render.trace import make_nearest, make_occluded


def render_rays(scene, camera, cfg: RenderConfig, sample_batch, accel=None,
                px=None, py=None):
    """Trace one sub-sample for a set of pixels; returns radiance [R, 3]."""
    nearest = make_nearest(scene, cfg, accel)
    occluded = make_occluded(scene, cfg, accel)
    origin, direction, state = generate_rays(camera, cfg, sample_batch, px, py)
    return trace_paths(origin, direction, state, scene, nearest, cfg, occluded)


@partial(jax.jit, static_argnames=("cfg",))
def render_sample(scene, camera, cfg: RenderConfig, sample_batch, accel=None):
    """One sample batch: cfg.spp sub-samples averaged → image [H, W, 3].

    Sub-sample s of batch b seeds pixels with batch index b*spp + s, mirroring
    the reference's per-dispatch seeding (raytrace_comp.comp:435).
    """
    nearest = make_nearest(scene, cfg, accel)
    occluded = make_occluded(scene, cfg, accel)

    def one_spp(acc, s):
        sb = sample_batch * cfg.spp + s
        origin, direction, state = generate_rays(camera, cfg, sb)
        radiance = trace_paths(
            origin, direction, state, scene, nearest, cfg, occluded
        )
        return acc + radiance, None

    # Remat the spp axis as well as the bounce axis: without it the scan's
    # backward stores per-sub-sample residuals — 64 spp OOM'd a v5e chip at
    # 48.9 GiB (SURVEY §7 "Memory": re-render per sub-sample, never store).
    if cfg.remat_bounces:
        one_spp = jax.checkpoint(one_spp)
    acc = jnp.zeros((cfg.n_pixels, 3), jnp.float32)
    acc, _ = jax.lax.scan(one_spp, acc, jnp.arange(cfg.spp, dtype=jnp.uint32))
    img = acc / jnp.float32(cfg.spp)
    return img.reshape(cfg.height, cfg.width, 3)


@partial(jax.jit, static_argnames=("cfg",))
def render_sample_taped(scene, camera, cfg: RenderConfig, sample_batch,
                        accel=None):
    """Like `render_sample`, but additionally returns the query tape —
    every traversal outcome, stacked over the spp scan (integrator
    docstring).  Runs only inside the tape custom_vjp's forward (never
    differentiated), so the spp body skips remat: there is no autodiff
    tape to bound, and the query tape is the point."""
    nearest = make_nearest(scene, cfg, accel)
    occluded = make_occluded(scene, cfg, accel)

    def one_spp(acc, s):
        sb = sample_batch * cfg.spp + s
        origin, direction, state = generate_rays(camera, cfg, sb)
        radiance, tape = trace_paths(
            origin, direction, state, scene, nearest, cfg, occluded,
            tape="record",
        )
        return acc + radiance, tape

    acc = jnp.zeros((cfg.n_pixels, 3), jnp.float32)
    acc, tapes = jax.lax.scan(
        one_spp, acc, jnp.arange(cfg.spp, dtype=jnp.uint32)
    )
    img = acc / jnp.float32(cfg.spp)
    return img.reshape(cfg.height, cfg.width, 3), tapes


@partial(jax.jit, static_argnames=("cfg",))
def render_sample_playback(scene, camera, cfg: RenderConfig, sample_batch,
                           tape):
    """Replay a recorded render: substitutes every traversal outcome from
    `tape` — no accel needed, no traversal kernel or per-query sort in the
    program.  Bit-identical image to `render_sample`; differentiable (the
    taped outcomes are detached in both paths, so gradients are identical
    too)."""
    # Bounce-level remat is its own knob inside playback: the bodies are
    # traversal-free arithmetic (see config.playback_remat_bounces).
    cfg_b = cfg.replace(
        remat_bounces=cfg.remat_bounces and cfg.playback_remat_bounces
    )

    def one_spp(acc, x):
        s, tp = x
        sb = sample_batch * cfg.spp + s
        origin, direction, state = generate_rays(camera, cfg, sb)
        radiance = trace_paths(
            origin, direction, state, scene, None, cfg_b, None, tape=tp
        )
        return acc + radiance, None

    if cfg.remat_bounces:
        one_spp = jax.checkpoint(one_spp)
    acc = jnp.zeros((cfg.n_pixels, 3), jnp.float32)
    acc, _ = jax.lax.scan(
        one_spp, acc, (jnp.arange(cfg.spp, dtype=jnp.uint32), tape)
    )
    img = acc / jnp.float32(cfg.spp)
    return img.reshape(cfg.height, cfg.width, 3)


@partial(jax.jit, static_argnames=("cfg",))
def _live_fractions(scene, camera, cfg: RenderConfig, sample_batch, accel):
    from dpt_tpu.render.integrator import make_bounce_body

    nearest = make_nearest(scene, cfg, accel)
    occluded = make_occluded(scene, cfg, accel)
    o, d, st = generate_rays(camera, cfg, sample_batch)
    R = o.shape[0]
    body = make_bounce_body(scene, nearest, occluded, cfg)
    carry = (o, d, jnp.ones((R, 3), jnp.float32),
             jnp.zeros((R, 3), jnp.float32), jnp.ones((R,), bool), st)

    def step(c, depth):
        c, _ = body(c, depth)
        return c, jnp.mean(c[4].astype(jnp.float32))

    _, fr = jax.lax.scan(step, carry,
                         jnp.arange(cfg.max_depth - 1, dtype=jnp.int32))
    return fr


def live_fraction_by_depth(scene, camera, cfg: RenderConfig, accel=None,
                           sample_batch=0):
    """Fraction of lanes alive entering each bounce (live_in[0] == 1.0).

    One jitted diagnostic scan of the full bounce chain (VERDICT r3 weak
    #8: previously per-bounce host re-renders); feeds
    metrics.effective_traversals_per_sample so rays/s can be stated net of
    dead lanes (SURVEY §5.5; VERDICT r2 weak #4)."""
    if cfg.max_depth <= 1:
        return [1.0]
    fr = _live_fractions(scene, camera, cfg, jnp.uint32(sample_batch), accel)
    return [1.0] + [float(x) for x in np.asarray(fr)]


@partial(jax.jit, static_argnames=("cfg",))
def _prim_hit_fraction(scene, camera, cfg: RenderConfig, sample_batch, accel):
    nearest = make_nearest(scene, cfg, accel)
    o, d, _ = generate_rays(camera, cfg, sample_batch)
    prim = getattr(nearest, "unsorted", nearest)(
        jax.lax.stop_gradient(o), jax.lax.stop_gradient(d)
    )
    return jnp.mean(prim["hit"].astype(jnp.float32))


def auto_compact_frac(scene, camera, cfg: RenderConfig, accel=None,
                      margin: float = 1.05, probe_side: int = 256) -> float:
    """Derive the carry-compaction capacity from the scene's measured
    primary-hit fraction (VERDICT r4 weak #5: no more per-scene hand
    tuning).  One cheap probe primary trace at reduced resolution (hit
    fraction is a statistic of the framing, not the resolution — so the
    probe PRESERVES cfg's aspect ratio: a square probe of a non-square
    render would measure a different field of view) sizes the capacity to
    cover the live lanes with `margin` headroom, rounded up to the 128-lane
    grain at the real width; chunked overflow keeps a hot framing graceful
    anyway.  Returns 0.0 (compaction off) when the capacity would not be
    smaller than the full width."""
    f = min(probe_side / max(cfg.width, cfg.height), 1.0)
    probe = cfg.replace(
        width=max(1, round(cfg.width * f)),
        height=max(1, round(cfg.height * f)),
    )
    h = float(_prim_hit_fraction(scene, camera, probe, jnp.uint32(0), accel))
    R = cfg.n_pixels
    C = max(128, int(-(-(h * margin * R) // 128) * 128))
    if C >= R:
        return 0.0
    return C / R


@partial(jax.jit, static_argnames=("cfg",))
def accumulate(prev_img, new_img, batch, cfg: RenderConfig):
    """Progressive running average (raytrace_comp.comp:467-469):
    new = (prev * batch + sample) / (batch + 1)."""
    b = batch.astype(jnp.float32)
    return (prev_img * b + new_img) / (b + 1.0)


def render(scene, camera, cfg: RenderConfig, n_batches: Optional[int] = None,
           accel=None):
    """Blocking render of `n_batches` progressive batches → image [H, W, 3]."""
    n = cfg.sample_batches if n_batches is None else n_batches
    img = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    for b in range(n):
        sample = render_sample(scene, camera, cfg, jnp.uint32(b), accel)
        img = accumulate(img, sample, jnp.uint32(b), cfg)
    return img


def render_progressive(
    scene,
    camera_source,
    cfg: RenderConfig,
    accel=None,
    n_batches: Optional[int] = None,
    on_batch: Optional[Callable] = None,
    checkpointer=None,
    checkpoint_every: int = 0,
    checkpoint_meta: Optional[dict] = None,
    start_batch: int = 0,
    start_image=None,
    render_fn: Optional[Callable] = None,
):
    """Progressive accumulation loop with camera-change reset.

    camera_source: either a Camera pytree or a zero-arg callable returning the
    current (OrbitCamera state_tuple, Camera) — the analog of mainLoop polling
    the cross-thread Camera (VulkanRayTracer.cpp:730-754), minus the data race
    (functional snapshot per batch).

    on_batch(batch_idx, image, metrics_dict) is invoked after each batch.
    render_fn(scene, camera, cfg, batch, accel) -> image overrides the
    single-device `render_sample` (e.g. the tile-sharded renderer).
    Returns (image, batches_accumulated).

    Dispatch is PIPELINED (SURVEY §2 L1 mapping "async dispatch +
    block_until_ready only at measurement boundaries"; the reference
    overlaps compute with present via a detached thread + fences,
    VulkanRenderer.cpp:643-647,868-976): batch b+1 is dispatched before the
    host blocks on batch b's image, so host-side accumulation/publish
    (on_batch, checkpointing) overlaps device compute.  JAX's async
    dispatch makes this a one-deep queue — results are identical to the
    serial loop (the accumulate chain is ordered on device); only the
    blocking point moves.  batch_ms therefore measures pipelined
    steady-state throughput (completion-to-completion), not isolated
    dispatch latency.
    """
    if render_fn is None:
        render_fn = render_sample
    n = cfg.sample_batches if n_batches is None else n_batches
    if start_image is not None:
        img = start_image
    else:
        img = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    batch = start_batch
    prev_cam_state = None
    pending = None  # (batch_idx, image_after_batch, dispatch_t0)

    def publish(entry):
        """Block on a finished batch and run its host-side effects."""
        b, pimg, t0 = entry
        pimg.block_until_ready()
        dt = time.perf_counter() - t0
        if on_batch is not None:
            # rays/sec estimate mirrors SURVEY §3.3's cost model.
            from dpt_tpu.utils.metrics import traversals_per_sample

            rays = cfg.n_pixels * cfg.spp * traversals_per_sample(
                cfg, scene.lights.count)
            on_batch(b, pimg, {
                "batch_ms": dt * 1e3,
                "rays_per_s": rays / dt,
                "batches_done": b + 1,
            })
        if checkpointer is not None and checkpoint_every and (
            (b + 1) % checkpoint_every == 0
        ):
            # Multi-host safe: assemble the global image (process_allgather
            # under the hood — collective, so every process participates)
            # and let only process 0 touch the filesystem, mirroring the
            # final-save path in cli.cmd_render (ADVICE r4 #1: np.asarray
            # on a non-addressable global array raises, and all processes
            # racing on one npz path corrupts it).
            from dpt_tpu.dist.sharding import gather_image

            full = gather_image(pimg)
            if jax.process_index() == 0:
                checkpointer.save(full, b + 1, meta=checkpoint_meta)

    while batch < n:
        if callable(camera_source):
            cam_state, camera = camera_source()
            if prev_cam_state is not None and cam_state != prev_cam_state:
                # Camera moved → reset accumulation (VulkanRayTracer.cpp:
                # 744-747).  Flush the in-flight batch first: it completed
                # under the old framing and its publish belongs to it.
                if pending is not None:
                    publish(pending)
                    pending = None
                img = jnp.zeros_like(img)
                batch = 0
            prev_cam_state = cam_state
        else:
            camera = camera_source

        t0 = time.perf_counter()
        # StepTraceAnnotation labels each dispatch in `jax.profiler` traces
        # (SURVEY §5.1; the reference's only analog is a wall-clock qDebug,
        # VulkanRayTracer.cpp:849-852).
        with jax.profiler.StepTraceAnnotation("render_batch", step_num=batch):
            sample = render_fn(scene, camera, cfg, jnp.uint32(batch), accel)
            img = accumulate(img, sample, jnp.uint32(batch), cfg)
        if pending is not None:
            publish(pending)
        pending = (batch, img, t0)
        batch += 1
    if pending is not None:
        publish(pending)
    return img, batch

"""Multi-chip / multi-host tile sharding.

The reference is strictly single-GPU/single-process (SURVEY §2: no
collectives of any kind); this module provides the framework's scale-out
axis: **image-tile data parallelism** over a 1-D device mesh.

Design (BASELINE north star):
  - mesh ('tiles',) over all chips; `jax.distributed.initialize` for
    multi-host process groups;
  - pixel rows sharded across devices, scene/BVH/camera replicated;
  - per-tile fused forward(+backward) via shard_map;
  - parameter gradients all-reduced automatically: shard_map's transpose of
    a replicated input IS a psum, so `jax.grad` through the sharded render
    emits the gradient all-reduce inside the backward program where XLA's
    latency-hiding scheduler can overlap it with remaining bounce compute.

Tested on the 8-device virtual CPU mesh (tests/conftest.py); the same code
runs unchanged on a v5e slice (ICI) or multi-host (DCN) via
`jax.distributed.initialize`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from dpt_tpu.config import RenderConfig
from dpt_tpu.render.integrator import trace_paths
from dpt_tpu.render.raygen import generate_rays, pixel_grid
from dpt_tpu.render.trace import make_nearest, make_occluded

TILE_AXIS = "tiles"


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None):
    """Multi-host process-group init (no-op single-process, idempotent when
    the embedding process initialised jax.distributed itself — e.g. before
    importing dpt_tpu, which touches the backend at import via module-level
    jnp constants)."""
    if num_processes and num_processes > 1:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return  # process group already up
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_tile_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (TILE_AXIS,))


def _tile_render(px, py, scene, camera, accel, sample_batch, cfg: RenderConfig):
    """Per-device shard body: render this device's pixel rows."""
    nearest = make_nearest(scene, cfg, accel)
    occluded = make_occluded(scene, cfg, accel)

    def one_spp(acc, s):
        sb = sample_batch * cfg.spp + s
        o, d, st = generate_rays(camera, cfg, sb, px, py)
        return acc + trace_paths(o, d, st, scene, nearest, cfg, occluded), None

    # Remat per sub-sample (see renderer.render_sample): the spp scan's
    # backward must re-render, not store 64 iterations of residuals.
    if cfg.remat_bounces:
        one_spp = jax.checkpoint(one_spp)
    # Derived from the tile-sharded px so the scan carry is varying over
    # 'tiles' from the start — keeps shard_map's vma check green.
    acc = jnp.zeros((px.shape[0], 3), jnp.float32) + 0.0 * px[:, None].astype(
        jnp.float32
    )
    acc, _ = jax.lax.scan(one_spp, acc, jnp.arange(cfg.spp, dtype=jnp.uint32))
    return acc / jnp.float32(cfg.spp)


def render_sample_sharded(scene, camera, cfg: RenderConfig, sample_batch,
                          accel=None, mesh: Mesh | None = None,
                          check_vma: bool | None = None):
    """Tile-sharded render of one sample batch → image [H, W, 3].

    Pixel rows are sharded over the mesh's 'tiles' axis; scene/camera/accel
    replicated.  Must be called under jit (or wrapped) for best performance;
    `render_sample_sharded_jit` below is the cached entry.
    """
    mesh = mesh if mesh is not None else make_tile_mesh()
    n_dev = mesh.devices.size
    assert cfg.height % n_dev == 0, (
        f"height {cfg.height} must divide over {n_dev} devices"
    )
    px, py = pixel_grid(cfg)

    # vma checking is ON for forward renders of every lax traversal: the
    # integrator and the while_loop walks derive their carry inits from the
    # (tile-varying) ray state, so the program is provably
    # replication-correct to shard_map, not just by test.  Two exceptions
    # pass check_vma=False:
    #   - the Mosaic kernels: a pallas_call's out_shape and its
    #     kernel-internal constants carry no varying-manual-axes type, and
    #     JAX's own error for this case says "Please open an issue ... as a
    #     temporary workaround pass check_vma=False";
    #   - any region that will be DIFFERENTIATED (callers pass
    #     check_vma=False): vma inserts `pbroadcast`s where replicated
    #     scene params are consumed inside the chunked-overflow lax.cond —
    #     primal no-ops whose TRANSPOSE is a psum INSIDE the cond branch.
    #     Shards diverging on the branch (per-shard n_live straddling the
    #     capacity) then deadlock that psum: only branch-taking shards
    #     reach it, and XLA:CPU's 40 s collective rendezvous kills the
    #     program (observed in the round-5 8-device dryrun — exactly the
    #     spilling shards arrived).  With vma off, gradient psums sit at
    #     the region boundary, which every shard reaches.
    # Sharded ≡ single-device stays bit-checked either way in
    # tests/test_sharding.py, incl. a divergent-branch regression test.
    if check_vma is None:
        check_vma = cfg.traversal not in ("pallas", "quad")
    fn = shard_map(
        partial(_tile_render, cfg=cfg),
        mesh=mesh,
        in_specs=(P(TILE_AXIS), P(TILE_AXIS), P(), P(), P(), P()),
        out_specs=P(TILE_AXIS),
        check_vma=check_vma,
    )
    radiance = fn(px, py, scene, camera, accel, jnp.uint32(sample_batch))
    return radiance.reshape(cfg.height, cfg.width, 3)


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def render_sample_sharded_jit(scene, camera, cfg: RenderConfig, sample_batch,
                              accel=None, mesh: Mesh | None = None):
    return render_sample_sharded(scene, camera, cfg, sample_batch, accel, mesh)


def sharded_loss_and_grads(params, scene, camera, cfg: RenderConfig, target,
                           sample_batch, accel=None, mesh: Mesh | None = None):
    """L2 loss + grads w.r.t. scene params with the render tile-sharded.

    The gradient all-reduce over tiles is implicit: replicated inputs to
    shard_map transpose to psum over the 'tiles' axis.
    """
    from dpt_tpu.diff.grads import merge_params

    def loss(p):
        s, c = merge_params(p, scene, camera)
        # check_vma=False: this region is differentiated — see
        # render_sample_sharded's vma note (transposed psum inside a
        # divergent cond deadlocks).
        img = render_sample_sharded(s, c, cfg, sample_batch, accel, mesh,
                                    check_vma=False)
        return jnp.mean((img - target) ** 2)

    return jax.value_and_grad(loss)(params)


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def sharded_loss_and_grads_jit(params, scene, camera, cfg, target,
                               sample_batch, accel=None, mesh=None):
    return sharded_loss_and_grads(
        params, scene, camera, cfg, target, sample_batch, accel, mesh
    )


def _sharded_loss(cfg, mesh, p, scene, camera, target, seed, accel):
    from dpt_tpu.diff.grads import merge_params

    s, c = merge_params(p, scene, camera)
    # check_vma=False: differentiated region (see render_sample_sharded).
    img = render_sample_sharded(s, c, cfg, seed, accel, mesh,
                                check_vma=False)
    return jnp.mean((img - target) ** 2)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _sharded_replay_run(cfg, mesh, p, scene, camera, target, seed, accel):
    return _sharded_loss(cfg, mesh, p, scene, camera, target, seed, accel)


def _sharded_replay_fwd(cfg, mesh, p, scene, camera, target, seed, accel):
    value = _sharded_loss(cfg, mesh, p, scene, camera, target, seed, accel)
    return value, (p, scene, camera, target, seed, accel)


def _sharded_replay_bwd(cfg, mesh, res, g):
    import numpy as np_

    from dpt_tpu.diff.grads import _zero_cotangent

    p, scene, camera, target, seed, accel = res
    _, vjp = jax.vjp(
        lambda q, tt: _sharded_loss(cfg, mesh, q, scene, camera, tt, seed,
                                    accel),
        p, target,
    )
    dp, dt = vjp(g)
    return (dp, _zero_cotangent(scene), _zero_cotangent(camera), dt,
            np_.zeros(jnp.shape(seed), jax.dtypes.float0),
            _zero_cotangent(accel))


_sharded_replay_run.defvjp(_sharded_replay_fwd, _sharded_replay_bwd)


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def _sharded_replay_vag(p, scene, camera, target, seed, accel, cfg, mesh):
    return jax.value_and_grad(_sharded_replay_run, argnums=2)(
        cfg, mesh, p, scene, camera, target, seed, accel
    )


def sharded_replay_loss_and_grads(params, scene, camera, cfg: RenderConfig,
                                  target, sample_batch, accel=None,
                                  mesh: Mesh | None = None):
    """Tile-sharded replay backward (diff/grads.replay_loss_and_grads with
    the render sharded over the mesh): the forward is a plain sharded
    inference render — custom_vjp keeps only the inputs as residuals — and
    the backward re-renders under jax.vjp, with the implicit psum over the
    'tiles' axis emitted inside the replayed backward.  Gradients are
    identical to `sharded_loss_and_grads` (same function of the same
    counter-based RNG streams); this is the config-4/5 optimisation-step
    program at inference-forward memory cost."""
    mesh = mesh if mesh is not None else make_tile_mesh()
    return _sharded_replay_vag(params, scene, camera, target,
                               jnp.uint32(sample_batch), accel,
                               cfg=cfg, mesh=mesh)


def _lane_first(tape):
    """Move every tape leaf's lane axis (last) to the front so one
    P(TILE_AXIS) pytree-prefix spec shards the whole tape: the spp/chunk/
    depth stacking axes come first out of the scans, but the lane axis is
    the sharded one."""
    return jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, -1, 0), tape)


def _lane_last(tape):
    return jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, 0, -1), tape)


def _tile_render_taped(px, py, scene, camera, accel, sample_batch,
                       cfg: RenderConfig):
    """Per-device shard body recording the query tape (integrator
    docstring).  Runs only inside the sharded tape custom_vjp's forward —
    never differentiated, so no remat."""
    nearest = make_nearest(scene, cfg, accel)
    occluded = make_occluded(scene, cfg, accel)

    def one_spp(acc, s):
        sb = sample_batch * cfg.spp + s
        o, d, st = generate_rays(camera, cfg, sb, px, py)
        rad, tape = trace_paths(o, d, st, scene, nearest, cfg, occluded,
                                tape="record")
        return acc + rad, tape

    acc = jnp.zeros((px.shape[0], 3), jnp.float32) + 0.0 * px[:, None].astype(
        jnp.float32
    )
    acc, tapes = jax.lax.scan(one_spp, acc,
                              jnp.arange(cfg.spp, dtype=jnp.uint32))
    return acc / jnp.float32(cfg.spp), _lane_first(tapes)


def _tile_render_playback(px, py, scene, camera, tape, sample_batch,
                          cfg: RenderConfig):
    """Per-device shard body replaying a recorded tape: no traversal kernel,
    no per-query sort — the program the tape backward differentiates."""
    tape = _lane_last(tape)
    cfg_b = cfg.replace(
        remat_bounces=cfg.remat_bounces and cfg.playback_remat_bounces
    )

    def one_spp(acc, x):
        s, tp = x
        sb = sample_batch * cfg.spp + s
        o, d, st = generate_rays(camera, cfg, sb, px, py)
        rad = trace_paths(o, d, st, scene, None, cfg_b, None, tape=tp)
        return acc + rad, None

    if cfg.remat_bounces:
        one_spp = jax.checkpoint(one_spp)
    acc = jnp.zeros((px.shape[0], 3), jnp.float32) + 0.0 * px[:, None].astype(
        jnp.float32
    )
    acc, _ = jax.lax.scan(one_spp, acc,
                          (jnp.arange(cfg.spp, dtype=jnp.uint32), tape))
    return acc / jnp.float32(cfg.spp)


def render_sample_sharded_taped(scene, camera, cfg: RenderConfig,
                                sample_batch, accel=None,
                                mesh: Mesh | None = None):
    """Tile-sharded taped render → (image [H, W, 3], tape).  The tape's
    leaves are sharded over 'tiles' on their (leading, lane) axis."""
    mesh = mesh if mesh is not None else make_tile_mesh()
    n_dev = mesh.devices.size
    assert cfg.height % n_dev == 0
    px, py = pixel_grid(cfg)
    fn = shard_map(
        partial(_tile_render_taped, cfg=cfg),
        mesh=mesh,
        in_specs=(P(TILE_AXIS), P(TILE_AXIS), P(), P(), P(), P()),
        out_specs=(P(TILE_AXIS), P(TILE_AXIS)),
        check_vma=cfg.traversal not in ("pallas", "quad"),
    )
    radiance, tape = fn(px, py, scene, camera, accel, jnp.uint32(sample_batch))
    return radiance.reshape(cfg.height, cfg.width, 3), tape


def render_sample_sharded_playback(scene, camera, cfg: RenderConfig,
                                   sample_batch, tape,
                                   mesh: Mesh | None = None):
    """Tile-sharded playback of a tape recorded by
    `render_sample_sharded_taped` (same mesh, same cfg).

    check_vma is OFF here even though the playback is pure lax: with vma
    checking on, shard_map inserts `pbroadcast`s where replicated inputs
    (scene params) are consumed INSIDE the chunked-overflow `lax.cond` —
    a primal no-op whose TRANSPOSE is a `psum` inside the cond branch.
    When shards diverge on the branch (per-shard n_live straddles the
    capacity — e.g. sphere-center shards spill into chunk 1, edge shards
    skip it), only the branch-taking shards reach that psum and XLA:CPU's
    collective rendezvous kills the program after 40 s (measured: the
    8-virtual-device dryrun aborted with exactly the 4 spilling shards
    arriving).  With check_vma=False all inputs are treated as varying and
    the gradient psums sit at the region boundary, which every shard
    reaches — the same placement the replay/quad paths have always used."""
    mesh = mesh if mesh is not None else make_tile_mesh()
    px, py = pixel_grid(cfg)
    fn = shard_map(
        partial(_tile_render_playback, cfg=cfg),
        mesh=mesh,
        in_specs=(P(TILE_AXIS), P(TILE_AXIS), P(), P(), P(TILE_AXIS), P()),
        out_specs=P(TILE_AXIS),
        check_vma=False,
    )
    radiance = fn(px, py, scene, camera, tape, jnp.uint32(sample_batch))
    return radiance.reshape(cfg.height, cfg.width, 3)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _sharded_tape_run(cfg, mesh, p, scene, camera, target, seed, accel):
    return _sharded_loss(cfg, mesh, p, scene, camera, target, seed, accel)


def _sharded_tape_fwd(cfg, mesh, p, scene, camera, target, seed, accel):
    from dpt_tpu.diff.grads import merge_params

    s, c = merge_params(p, scene, camera)
    img, tape = render_sample_sharded_taped(s, c, cfg, seed, accel, mesh)
    value = jnp.mean((img - target) ** 2)
    return value, (p, scene, camera, target, seed, tape, accel)


def _sharded_tape_bwd(cfg, mesh, res, g):
    import numpy as np_

    from dpt_tpu.diff.grads import _zero_cotangent, merge_params

    p, scene, camera, target, seed, tape, accel = res

    def f(q, tt):
        s, c = merge_params(q, scene, camera)
        img = render_sample_sharded_playback(s, c, cfg, seed, tape, mesh)
        return jnp.mean((img - tt) ** 2)

    _, vjp = jax.vjp(f, p, target)
    dp, dt = vjp(g)
    return (dp, _zero_cotangent(scene), _zero_cotangent(camera), dt,
            np_.zeros(jnp.shape(seed), jax.dtypes.float0),
            _zero_cotangent(accel))


_sharded_tape_run.defvjp(_sharded_tape_fwd, _sharded_tape_bwd)


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def _sharded_tape_vag(p, scene, camera, target, seed, accel, cfg, mesh):
    return jax.value_and_grad(_sharded_tape_run, argnums=2)(
        cfg, mesh, p, scene, camera, target, seed, accel
    )


def sharded_tape_loss_and_grads(params, scene, camera, cfg: RenderConfig,
                                target, sample_batch, accel=None,
                                mesh: Mesh | None = None):
    """Tile-sharded tape backward (diff/grads.tape_loss_and_grads over the
    mesh): the forward records every traversal outcome per shard; the
    backward differentiates the sharded playback — zero traversal kernels,
    zero per-query sorts, with the implicit psum over 'tiles' emitted
    inside the played-back backward.  This is the config-4/5
    optimisation-step program (bench.py --grad measures the single-chip
    shape).  Gradients match `sharded_loss_and_grads` to XLA fusion
    rounding (measured ≤ 1 ULP relative;
    tests/test_sharding.py::test_sharded_tape_matches_sharded_plain)."""
    mesh = mesh if mesh is not None else make_tile_mesh()
    return _sharded_tape_vag(params, scene, camera, target,
                             jnp.uint32(sample_batch), accel,
                             cfg=cfg, mesh=mesh)


def gather_image(img):
    """Host-side full image from a possibly sharded device array
    (the analog of the compute→present blit, VulkanRenderer.cpp:868-976).

    Multi-host: each process only holds its addressable shards, so the full
    image is assembled with `process_allgather` over DCN (SURVEY §5.8);
    single-process falls back to a plain device→host copy."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(img, tiled=True))
    return np.asarray(jax.device_get(img))

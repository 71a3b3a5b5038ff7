"""The path-tracing integrator — vectorised, masked, differentiable.

Re-architecture of the GLSL megakernel's pathTrace (raytrace_comp.comp:
300-418) for a vector machine: instead of per-thread divergent control flow,
every lane advances in lockstep through a `lax.scan` over bounces with an
`active` mask, and every lane consumes an identical RNG draw schedule.

Stages per bounce (reference cites):
  - nearest-hit search                (traceRay, :159-204)  — detached ints
  - differentiable re-intersection    (intersect.reintersect)
  - NEE against every area light      (:341-367)
  - subsurface random walk            (:370-408)
  - cosine-weighted indirect bounce   (:411-414)
  - Russian roulette                  (north-star addition; absent in ref)
plus the direct-view light pass before the loop (:309-328).

Gradient convention (the "fixed-hit detach"): discrete quantities — which
triangle is nearest, hit/miss masks, shadow visibility — are detached;
continuous quantities (t, barycentrics, positions, normals, shading) are
recomputed differentiably for the selected triangle.  The oracle renderer
uses the same convention, so allclose holds for both values and gradients.

Query tape (SURVEY §7 M4, VERDICT r4 next #1): because every traversal
outcome is detached, the whole bounce program is a deterministic function of
(params, seed) AND of those detached outcomes.  `trace_paths(..., tape=
"record")` additionally returns every nearest/occluded outcome (nearest
compressed to one int32/lane: tri id where hit else -1 — downstream code
only ever consumes hit-masked tri/hit; occluded as bool); passing that tape
back via `tape=<pytree>` replays the identical render *without invoking a
single traversal or per-query sort* — the backward of the tape custom_vjp
(diff/grads.tape_loss_and_grads) differentiates the playback, deleting the
~72% of the fwd+bwd step that was traversal replay (BASELINE r4 trace
decomposition).  The taped values equal the recomputed ones and both are
stop_gradient'd, so gradients are semantically identical; numerically they
match to XLA fusion rounding (the playback is a different HLO program, so
fusion/FMA choices differ — measured ≤ 1 ULP on images and gradients,
tests/test_grads.py::test_tape_matches_replay).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dpt_tpu.config import RenderConfig
from dpt_tpu.render.intersect import reintersect
from dpt_tpu.render.rng import rng_next
from dpt_tpu.render.sampling import (
    intersect_area_light,
    sample_area_light,
    sample_hemisphere,
    sample_sphere,
)

# numpy constants: importing the library must not initialise the backend.
_UP_Z = np.array([0.0, 0.0, 1.0], np.float32)
_FAR = np.float32(1e9)


class QueryTape:
    """Record or substitute the detached outcome of every nearest/occluded
    call, in call order (see module docstring).

    mode='off'    — transparent passthrough (the default everywhere).
    mode='record' — call the real query, append its outcome to `entries`.
    mode='play'   — never call the query; pop the next recorded outcome.

    Nearest outcomes are stored as one int32/lane (`tri` where hit, else
    -1); play decodes miss lanes to tri=0, which is safe because every
    consumer of `tri` is hit-masked (values AND gradient contributions of
    miss lanes are exactly zero either way).  `t` is stored only when the
    call site asks (with_t=True: the primary trace and the wavefront-sort
    coherence key read it); elsewhere it is re-derived differentiably by
    reintersect and the played record carries zeros.
    """

    def __init__(self, mode: str, entries=None):
        self.mode = mode
        self.entries = list(entries) if entries is not None else []
        self._i = 0

    def _next(self):
        e = self.entries[self._i]
        self._i += 1
        return e

    def nearest(self, fn, o, d, with_t: bool = False):
        if self.mode == "play":
            e = self._next()
            packed = isinstance(e, dict)
            tri1 = jax.lax.stop_gradient(e["tri1"] if packed else e)
            t = (jax.lax.stop_gradient(e["t"]) if packed
                 else tri1.astype(jnp.float32) * 0.0)
            return {"hit": tri1 >= 0, "tri": jnp.maximum(tri1, 0), "t": t}
        rec = fn(o, d)
        if self.mode == "record":
            tri1 = jnp.where(rec["hit"], rec["tri"], -1).astype(jnp.int32)
            self.entries.append(
                {"tri1": tri1, "t": rec["t"]} if with_t else tri1
            )
        return rec

    def occluded(self, fn, o, d, max_dist):
        if self.mode == "play":
            return jax.lax.stop_gradient(self._next())
        occ = fn(o, d, max_dist)
        if self.mode == "record":
            self.entries.append(occ)
        return occ

    def out(self):
        return tuple(self.entries)


_TAPE_OFF = QueryTape("off")


def _masked_query(o, d, active):
    """Move inactive lanes' origins far outside every AABB so their box
    tests fail immediately and fully-dead tiles early-exit.  The direction
    is pinned to +z as well: with o = 1e9 and d = (0,0,1) the x/y slab
    distances are ~-1e29, so t_far < 0 and every AABB test is a guaranteed
    miss (a stale direction roughly parallel to (1,1,1) could otherwise
    produce overlapping slab intervals and a spurious root hit)."""
    m = active[:, None]
    o = jnp.where(m, o, _FAR)
    d = jnp.where(m, d, _UP_Z)
    return jax.lax.stop_gradient(o), jax.lax.stop_gradient(d)


def _safe_hit(rec, hit_mask):
    """Sanitise hit record fields on masked lanes so downstream math (and its
    gradients) never sees NaN/Inf."""
    m = hit_mask[:, None]
    return {
        "t": jnp.where(hit_mask, rec["t"], 1.0),
        "position": jnp.where(m, rec["position"], 0.0),
        "normal": jnp.where(m, rec["normal"], _UP_Z),
        "u": rec["u"],
        "v": rec["v"],
    }


def _nee_one_light(state, pos, normal, albedo, light_i, occluded, offset, mask,
                   view=None, rough=None, tio=_TAPE_OFF):
    """Direct lighting from one area light (raytrace_comp.comp:345-366).

    Returns (state, contribution [R,3]).  Visibility is detached (any-hit
    query, equivalent to the reference's nearest-hit + `t >= dist - OFFSET`
    test at :359); the contribution is differentiable w.r.t. light params,
    geometry, albedo and roughness.  When `view`/`rough` are given the
    Lambert term is scaled by the Oren–Nayar factor (render/shading.py);
    rough == 0 reproduces the reference exactly.
    """
    lpos, lnormal, lint, lsize = light_i
    state, lpoint = sample_area_light(lpos, lnormal, lsize, state)
    to_light = lpoint - pos
    ldist = jnp.linalg.norm(to_light, axis=-1)
    ldir = to_light / jnp.maximum(ldist, 1e-20)[:, None]
    diffuse = jnp.maximum(jnp.sum(normal * ldir, axis=-1), 0.0)
    if view is not None and rough is not None:
        from dpt_tpu.render.shading import oren_nayar_factor

        diffuse = diffuse * oren_nayar_factor(normal, ldir, view, rough)

    shadow_o = pos + normal * offset
    # Masked lanes get max_dist = -1: the any-hit walk resolves them in one
    # iteration, so tiles whose rays are all dead cost ~nothing.
    occ = tio.occluded(
        occluded,
        jax.lax.stop_gradient(shadow_o),
        jax.lax.stop_gradient(ldir),
        jnp.where(mask, jax.lax.stop_gradient(ldist) - offset, -1.0),
    )

    dist_sq = jnp.maximum(ldist * ldist, 0.01)  # falloff floor, :363
    contrib = albedo * lint * (diffuse / dist_sq)[:, None]
    return state, jnp.where(((~occ) & mask)[:, None], contrib, 0.0)


def _direct_view_pass(origin, direction, scene, prim, cfg):
    """Show a light directly when the primary ray reaches it unoccluded
    (raytrace_comp.comp:309-328).  First qualifying light wins (the shader
    returns inside the loop).  The primary-hit record `prim` is shared with
    bounce 0 — the shader re-traces the identical ray once per light plus
    once in the bounce loop; here it is traced exactly once.
    """
    done = jnp.zeros(origin.shape[0], bool)
    value = jnp.zeros((origin.shape[0], 3), jnp.float32)
    L = scene.lights.count
    for i in range(L):
        lhit, lt = intersect_area_light(
            origin,
            direction,
            scene.lights.position[i],
            scene.lights.normal[i],
            scene.lights.size[i],
        )
        visible = lhit & ((~prim["hit"]) | (prim["t"] > lt))
        newly = visible & (~done)
        value = jnp.where(newly[:, None], scene.lights.intensity[i], value)
        done = done | newly
    return done, value


def _sss_walk(state, hit_pos, hit_normal, sss_albedo, sss_radius, throughput,
              hit_mask, scene, nearest, occluded, cfg: RenderConfig,
              tio=_TAPE_OFF):
    """Subsurface random walk (raytrace_comp.comp:370-408).

    Fires cfg.sss_bounces sub-steps below the surface; per step, NEE to every
    light from the interior exit point.  Returns (state, radiance_add).
    SSS parameters come from the entry hit's material (the reference hardcodes
    (1, .2, .1) / radius 1.0 at :371-373 — our defaults).
    """
    R = hit_pos.shape[0]
    radiance_add = jnp.zeros((R, 3), jnp.float32)
    sss_throughput = jnp.ones((R, 3), jnp.float32)
    sss_active = hit_mask
    state, d0 = sample_sphere(state)
    o = hit_pos - hit_normal * cfg.offset
    d = d0
    inv_atten = (1.0 / jnp.maximum(sss_radius * 1.5, 1e-6))[:, None]
    weight = (1.0 + sss_radius * 0.5)[:, None]  # :404

    for _ in range(cfg.sss_bounces):
        found = tio.nearest(nearest, *_masked_query(o, d, sss_active))
        sh = found["hit"] & sss_active
        rec = _safe_hit(
            reintersect(o, d, found["tri"], scene.vertices, scene.indices,
                        cfg.eps),
            sh,
        )
        cur = o + d * rec["t"][:, None]
        sn = rec["normal"]

        sss_light = jnp.zeros((R, 3), jnp.float32)
        for i in range(scene.lights.count):
            light_i = (
                scene.lights.position[i],
                scene.lights.normal[i],
                scene.lights.intensity[i],
                scene.lights.size[i],
            )
            state, c = _nee_one_light(
                state, cur, sn, sss_albedo, light_i, occluded, cfg.offset, sh,
                tio=tio,
            )
            sss_light = sss_light + c
        radiance_add = radiance_add + throughput * sss_throughput * sss_light * weight

        atten = jnp.exp(-rec["t"][:, None] * inv_atten)
        sss_throughput = jnp.where(
            sh[:, None], sss_throughput * sss_albedo * atten, sss_throughput
        )
        sss_active = sh
        state, nd = sample_sphere(state)
        o = jnp.where(sh[:, None], cur - sn * cfg.offset, o)
        d = nd
    return state, radiance_add


def make_bounce_body(scene, nearest, occluded, cfg: RenderConfig):
    """One bounce of the path loop as a scan body over carry
    (origin, direction, throughput, radiance, active, rng_state).

    `body(carry, depth, found=..., tio=...)` accepts a precomputed
    nearest-hit record so bounce 0 can reuse the direct-view pass's primary
    trace, and a QueryTape that records or substitutes every query."""

    def body(carry, depth, found=None, tio=_TAPE_OFF):
        o, d, throughput, radiance, active, state = carry

        if found is None:
            found = tio.nearest(nearest, *_masked_query(o, d, active))
        hit = found["hit"] & active
        rec = reintersect(o, d, found["tri"], scene.vertices, scene.indices,
                          cfg.eps,
                          uvs=scene.uvs if cfg.uv_texture != "none" else None)
        uv = rec.get("uv")
        rec = _safe_hit(rec, hit)
        pos, normal = rec["position"], rec["normal"]
        mat = scene.mat_idx[found["tri"]]
        albedo = scene.materials.albedo[mat]
        emission = scene.materials.emission[mat]
        rough = scene.materials.roughness[mat]
        view = -d  # toward the camera along the incoming ray
        if cfg.uv_texture == "checker":
            from dpt_tpu.render.shading import checker_albedo

            albedo = checker_albedo(
                albedo, jnp.where(hit[:, None], uv, 0.0),
                cfg.uv_texture_scale,
            )

        # Emissive surfaces (north-star parameter; zero by default).
        radiance = radiance + jnp.where(
            hit[:, None], throughput * emission, 0.0
        )

        # --- next-event estimation over all lights (:341-367) ---
        direct = jnp.zeros_like(radiance)
        for i in range(scene.lights.count):
            light_i = (
                scene.lights.position[i],
                scene.lights.normal[i],
                scene.lights.intensity[i],
                scene.lights.size[i],
            )
            state, c = _nee_one_light(
                state, pos, normal, albedo, light_i, occluded, cfg.offset, hit,
                view=view, rough=rough, tio=tio,
            )
            direct = direct + c
        radiance = radiance + throughput * direct

        # --- subsurface walk (:370-408) ---
        if cfg.enable_sss:
            state, sss_add = _sss_walk(
                state,
                pos,
                normal,
                scene.materials.sss_albedo[mat],
                scene.materials.sss_radius[mat],
                throughput,
                hit,
                scene,
                nearest,
                occluded,
                cfg,
                tio=tio,
            )
            radiance = radiance + sss_add

        # --- cosine-weighted indirect bounce (:411-414) ---
        state, bdir = sample_hemisphere(normal, state)
        cos_b = jnp.maximum(jnp.sum(normal * bdir, axis=-1), 0.0)
        throughput = jnp.where(
            hit[:, None], throughput * albedo * cos_b[:, None], throughput
        )
        o = jnp.where(hit[:, None], pos + normal * cfg.offset, o)
        d = jnp.where(hit[:, None], bdir, d)
        active = hit

        # --- Russian roulette (north-star addition) ---
        if cfg.russian_roulette:
            state, u = rng_next(state)
            p = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 1.0)
            roll = depth >= cfg.rr_start_depth
            survive = (~roll) | (u < p)
            throughput = jnp.where(
                (roll & survive)[:, None], throughput / p[:, None], throughput
            )
            active = active & survive

        return (o, d, throughput, radiance, active, state), None

    return body


def _varying_zero_tape(struct, ref):
    """Zeros shaped like the eval_shape `struct`, derived from the lane
    array `ref` ([C] uint32) so each leaf carries ref's varying-manual-axes
    type under shard_map (the skip branch of the chunked-overflow cond must
    match the work branch's vma).  Every tape leaf's last axis is the lane
    axis, so broadcasting [..., C] (+|) [C] types the whole leaf."""
    z = 0 * ref
    zb = z > 0

    def leaf(s):
        if s.dtype == jnp.bool_:
            return jnp.zeros(s.shape, s.dtype) | zb
        return jnp.zeros(s.shape, s.dtype) + z.astype(s.dtype)

    return jax.tree_util.tree_map(leaf, struct)


def trace_paths(origin, direction, state, scene, nearest, cfg: RenderConfig,
                occluded=None, tape=None):
    """Full per-sample radiance estimate (pathTrace, :300-418).

    origin/direction: [R, 3]; state: [R] uint32 RNG.
    tape: None (plain render), "record" (returns (radiance, tape_pytree)),
    or a previously recorded tape pytree (playback — `nearest`/`occluded`
    may be None; no traversal or per-query sort executes).
    Returns radiance [R, 3] (and the tape when recording).
    """
    record = isinstance(tape, str) and tape == "record"
    play = (tape is not None) and not record
    R = origin.shape[0]
    if occluded is None and not play:
        def occluded(o, d, max_dist):  # fallback via nearest-hit search
            s = nearest(o, d)
            return s["hit"] & (s["t"] < max_dist)
    # Scan-carry inits are derived from `origin` (0*x folds away in XLA) so
    # that under shard_map they carry the same varying-manual-axes type as
    # the ray state — the vma check then passes without check_vma=False
    # (VERDICT r2 weak #5).  Raygen origins are always finite, so 0*x == 0
    # is identically True.
    zero3 = origin * 0.0
    radiance = zero3
    throughput = zero3 + 1.0
    active = zero3[:, 0] == 0.0

    # One primary trace shared by the direct-view pass and bounce 0 (the
    # shader traces the identical ray twice, :310-328 then :333).  The
    # primary stream keeps raster order: pinhole origins give a constant
    # Morton key, so the coherence sort would only destroy raster-tile
    # locality (9x slower on-chip; BASELINE.md traversal matrix).
    if play:
        tri1 = jax.lax.stop_gradient(tape["prim"]["tri1"])
        prim = {
            "hit": tri1 >= 0,
            "tri": jnp.maximum(tri1, 0),
            "t": jax.lax.stop_gradient(tape["prim"]["t"]),
        }
    else:
        prim_nearest = getattr(nearest, "unsorted", nearest)
        prim = prim_nearest(
            jax.lax.stop_gradient(origin), jax.lax.stop_gradient(direction)
        )
    if record:
        tape_prim = {
            "tri1": jnp.where(prim["hit"], prim["tri"], -1).astype(jnp.int32),
            "t": prim["t"],
        }
    if cfg.direct_light_view:
        dv_done, dv_value = _direct_view_pass(
            jax.lax.stop_gradient(origin),
            jax.lax.stop_gradient(direction),
            scene,
            prim,
            cfg,
        )
    else:
        dv_done = jnp.zeros((R,), bool)
        dv_value = radiance

    body = make_bounce_body(scene, nearest, occluded, cfg)

    use_wf = cfg.wavefront_sort
    if use_wf:
        # Carry-level POST-HIT wavefront sort: run the bounce's nearest
        # trace in carry order, then permute the whole carry ONCE by the
        # Morton code of the HIT POSITION (misses last) before the NEE /
        # SSS / bounce-direction phase.  One permutation serves all seven
        # remaining query streams of the bounce (NEE shadow + 3 SSS nearest
        # + 3 SSS shadow), whose directions are mutually unrelated — origin
        # locality is the only coherence they share, and the hit position
        # IS their common origin (scripts/r3_mortononly_probe.py:
        # Morton-only costs +23 ms/query on an SSS nearest stream but
        # shadow queries on Morton-sorted origins need no sort at all,
        # and each per-query sort wrapper costs ~30-40 ms of key + argsort
        # + gather/scatter machinery).  The post-body scatter restores the
        # fixed carry order, so only the queries INSIDE each bounce see the
        # sorted stream — the next bounce's nearest re-sorts from carry
        # order (bounce 1 alone inherits Morton order from the compaction
        # gather).  Bounce 0's primary keeps raster order, which beats any
        # Morton key for pinhole rays.
        from dpt_tpu.render.compaction import morton3d

        wf_bmin = jax.lax.stop_gradient(scene.vertices).min(axis=0)
        wf_bmax = jax.lax.stop_gradient(scene.vertices).max(axis=0)

        def stage(carry, depth, found=None, tio=_TAPE_OFF):
            o, d, thr, rad, act, st = carry
            if found is None:
                found = tio.nearest(nearest, *_masked_query(o, d, act),
                                    with_t=True)
            hit = found["hit"] & act
            pos_key = jax.lax.stop_gradient(o) + jax.lax.stop_gradient(
                found["t"])[:, None] * jax.lax.stop_gradient(d)
            key = jnp.where(hit, morton3d(pos_key, wf_bmin, wf_bmax),
                            jnp.uint32(0xFFFFFFFF))
            q = jnp.argsort(key)
            inner = (o[q], d[q], thr[q], rad[q], act[q], st[q])
            found_s = {
                "hit": found["hit"][q],
                "t": found["t"][q],
                "tri": found["tri"][q],
            }
            inner, _ = body(inner, depth, found=found_s, tio=tio)
            # Pure permutation scatter — restores the fixed carry order
            # exactly (so bounces >= 2 trace in carry order, not in the
            # previous bounce's Morton order), no float reassociation,
            # gradients flow through gather/scatter.
            out = tuple(jnp.zeros_like(x).at[q].set(x) for x in inner)
            return out, None

    else:
        stage = body

    # Mode-specific step wrappers around `stage`.  Record runs only inside
    # a custom_vjp forward (never differentiated), so it skips remat; the
    # off and play paths honour cfg.remat_bounces.
    def step_off(c, depth, found=None):
        c2, _ = stage(c, depth, found=found)
        return c2

    def step_rec(c, depth, found=None):
        tio = QueryTape("record")
        c2, _ = stage(c, depth, found=found, tio=tio)
        return c2, tio.out()

    def step_play(c, depth, entries, found=None):
        tio = QueryTape("play", entries)
        c2, _ = stage(c, depth, found=found, tio=tio)
        return c2

    depths = jnp.arange(1, cfg.max_depth)

    def bounce0_off(c, found):
        b = partial(step_off, found=found)
        if cfg.remat_bounces:
            b = jax.checkpoint(b)
        return b(c, jnp.int32(0))

    def run_scan_off(c):
        if cfg.max_depth <= 1:
            return c[3]
        sbody = lambda cc, depth: (step_off(cc, depth), None)  # noqa: E731
        if cfg.remat_bounces:
            sbody = jax.checkpoint(sbody)
        c, _ = jax.lax.scan(sbody, c, depths)
        return c[3]

    def bounce_program_rec(c, found):
        """bounce 0 + depth scan, recording; returns (radiance, tape)."""
        c, tape0 = step_rec(c, jnp.int32(0), found=found)
        if cfg.max_depth <= 1:
            return c[3], (tape0, ())
        c, tape_s = jax.lax.scan(
            lambda cc, depth: step_rec(cc, depth), c, depths
        )
        return c[3], (tape0, tape_s)

    def bounce_program_play(c, found, tape_b):
        tape0, tape_s = tape_b
        b0 = partial(step_play, found=found)
        if cfg.remat_bounces:
            b0 = jax.checkpoint(b0)
        c = b0(c, jnp.int32(0), tape0)
        if cfg.max_depth <= 1:
            return c[3]
        sbody = lambda cc, x: (step_play(cc, x[0], x[1]), None)  # noqa: E731
        if cfg.remat_bounces:
            sbody = jax.checkpoint(sbody)
        c, _ = jax.lax.scan(sbody, c, (depths, tape_s))
        return c[3]

    carry = (origin, direction, throughput, radiance, active, state)

    # Static-capacity carry compaction (see config.compact_frac), applied
    # BEFORE bounce 0's shade phase: at the flagship framing only ~12% of
    # primary rays hit anything, yet bounce 0's NEE + SSS phase — 8 of the
    # 33 traversals per sample plus the widest shading fusions — would run
    # at full width, and bounces 1-3 (~1% live) wider still.  Every lane
    # that misses at bounce 0 contributes exactly zero radiance from the
    # entire loop (emission/NEE/SSS are all hit-gated), so gathering the
    # prim-hit lanes (Morton-ordered by HIT POSITION — the common origin of
    # every subsequent query stream) into a C = ceil(compact_frac*R) buffer
    # and running bounce 0's shade phase plus the whole bounce scan at that
    # width, then scattering radiance back over zeros, is exact.
    #
    # Capacity overflow (a framing where more than C rays hit) is handled by
    # CHUNKING, not by a full-width fallback: the live-first permutation is
    # processed in ceil(R/C) chunks of C lanes under one lax.scan — the
    # bounce program is compiled ONCE at width C (the r3 lax.cond fallback
    # compiled it twice, at C and at R — ADVICE r3 #3), chunks that contain
    # only dead lanes skip via a trivial cond, and an overflow costs one
    # extra C-wide chunk instead of a full-width re-render.  Bit-exact per
    # lane at any capacity: RNG streams are per-lane counters that ride the
    # gather, every real lane appears in exactly one chunk, dead chunks'
    # scattered zeros are those lanes' true radiance, and out-of-range pad
    # indices are dropped by the scatter.  Only the primary trace (coherent,
    # raster-order, the cheapest stream by 4-9x — BASELINE.md traversal
    # matrix) stays at full width.
    #
    # Tape interplay: the chunk scan's ys (record) / xs (play) carry each
    # chunk's tape; a skipped chunk emits vma-typed zeros of the same
    # structure (never consumed — playback recomputes the identical n_live
    # from the taped primary, so skip decisions match exactly).
    C = int(-(-(R * cfg.compact_frac) // 128) * 128) if cfg.compact_frac else 0
    if 0 < C < R:
        from dpt_tpu.render.compaction import morton3d as _morton3d

        bmin = jax.lax.stop_gradient(scene.vertices).min(axis=0)
        bmax = jax.lax.stop_gradient(scene.vertices).max(axis=0)
        hit0 = prim["hit"] & active
        n_live = jnp.sum(hit0.astype(jnp.int32))
        pos_key = jax.lax.stop_gradient(origin) + jax.lax.stop_gradient(
            prim["t"])[:, None] * jax.lax.stop_gradient(direction)
        key = jnp.where(hit0, _morton3d(pos_key, bmin, bmax),
                        jnp.uint32(0xFFFFFFFF))
        perm = jnp.argsort(key)
        k = -(-R // C)
        pad = k * C - R
        if pad:
            # Sentinel index R: gathers clamp it (a dead duplicate lane
            # whose result is dropped by the mode="drop" scatter).  Derived
            # from perm so the pad carries perm's manual-axes type under
            # shard_map.
            perm = jnp.concatenate([perm, perm[:pad] * 0 + R])

        def gather_chunk(c):
            idx = jax.lax.dynamic_slice(perm, (c * C,), (C,))
            carry_c = tuple(x[idx] for x in carry)
            prim_c = {kk: v[idx] for kk, v in prim.items()}
            return idx, carry_c, prim_c

        if record:
            def chunk_body(_, c):
                idx, carry_c, prim_c = gather_chunk(c)

                def work(_):
                    return bounce_program_rec(carry_c, prim_c)

                tape_struct = jax.eval_shape(work, 0)[1]

                def skip(_):
                    # carry radiance is identically zero before bounce 0 —
                    # the exact radiance of an all-dead chunk, with the
                    # gathered array's sharding type.
                    return carry_c[3], _varying_zero_tape(
                        tape_struct, carry_c[5]
                    )

                rad_c, tape_c = jax.lax.cond(n_live > c * C, work, skip, None)
                return 0, (idx, rad_c, tape_c)

            _, (idx_all, rad_all, tape_chunks) = jax.lax.scan(
                chunk_body, 0, jnp.arange(k, dtype=jnp.int32)
            )
        elif play:
            def chunk_body(_, x):
                c, tape_c = x
                idx, carry_c, prim_c = gather_chunk(c)

                def work(_):
                    return bounce_program_play(carry_c, prim_c, tape_c)

                def skip(_):
                    return carry_c[3]

                rad_c = jax.lax.cond(n_live > c * C, work, skip, None)
                return 0, (idx, rad_c)

            _, (idx_all, rad_all) = jax.lax.scan(
                chunk_body, 0,
                (jnp.arange(k, dtype=jnp.int32), tape["chunks"]),
            )
        else:
            def chunk_body(_, c):
                idx, carry_c, prim_c = gather_chunk(c)

                def work(_):
                    return run_scan_off(bounce0_off(carry_c, prim_c))

                def skip(_):
                    return carry_c[3]

                rad_c = jax.lax.cond(n_live > c * C, work, skip, None)
                return 0, (idx, rad_c)

            _, (idx_all, rad_all) = jax.lax.scan(
                chunk_body, 0, jnp.arange(k, dtype=jnp.int32)
            )
        radiance = jnp.zeros_like(radiance).at[idx_all.reshape(-1)].set(
            rad_all.reshape(-1, 3), mode="drop"
        )
        if record:
            tape_out = {"prim": tape_prim, "chunks": tape_chunks}
    else:
        if record:
            radiance, tape_body = bounce_program_rec(carry, prim)
            tape_out = {"prim": tape_prim, "body": tape_body}
        elif play:
            radiance = bounce_program_play(carry, prim, tape["body"])
        else:
            radiance = run_scan_off(bounce0_off(carry, prim))

    radiance = jnp.where(dv_done[:, None], dv_value, radiance)
    if record:
        return radiance, tape_out
    return radiance

"""Render configuration and named presets.

The reference hardcodes every knob at compile time (resolution/workgroup
`VulkanRayTracer.cpp:21-24`, NUM_SAMPLE_BATCHES `VulkanRayTracer.cpp:719`,
MAX_DEPTH/OFFSET `raytrace_comp.comp:304-305`, aperture/focal
`raytrace_comp.comp:441-442`, SSS params `raytrace_comp.comp:371-373`).
Here every knob is a field of a frozen dataclass, usable as a jit-static
argument; the five BASELINE.json configs are named presets.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (trace-time) render configuration. Hashable → jit-static."""

    width: int = 1024
    height: int = 1024
    # Bounce loop depth; reference MAX_DEPTH=4 (raytrace_comp.comp:304).
    max_depth: int = 4
    # Samples per pixel per render_sample call (reference: 1 spp per dispatch,
    # accumulated over NUM_SAMPLE_BATCHES, VulkanRayTracer.cpp:719,811-813).
    spp: int = 1
    # Progressive accumulation batches (reference NUM_SAMPLE_BATCHES=1024).
    sample_batches: int = 1024

    # --- feature toggles -------------------------------------------------
    # Direct-view area-light pass (raytrace_comp.comp:309-328).
    direct_light_view: bool = True
    # Subsurface random walk (raytrace_comp.comp:370-408).
    enable_sss: bool = True
    sss_bounces: int = 3
    # Russian-roulette termination — north-star addition, absent from the
    # reference (its depth loop is fixed, raytrace_comp.comp:331).
    russian_roulette: bool = False
    rr_start_depth: int = 2
    # Thin-lens depth of field + Gaussian AA jitter (raytrace_comp.comp:440-460).
    enable_dof: bool = True
    aperture: float = 0.02
    focal_distance: float = 3.0
    aa_jitter: float = 0.5  # px; raytrace_comp.comp:452

    # --- shading ----------------------------------------------------------
    # UV-driven albedo texture: 'none' (reference parity — the shader
    # interpolates UVs at raytrace_comp.comp:151-157 but never uses them)
    # or 'checker' (procedural checker, makes UVs live).
    uv_texture: str = "none"
    uv_texture_scale: float = 8.0

    # --- numerics --------------------------------------------------------
    # Self-intersection offset (raytrace_comp.comp:305).
    offset: float = 1e-3
    # Triangle-intersection epsilon (raytrace_comp.comp:116).
    eps: float = 1e-6
    t_max: float = 1e30

    # --- acceleration / execution ---------------------------------------
    # 'brute'        : test all triangles per ray (oracle, small scenes)
    # 'bvh'          : per-ray masked stack traversal of a BVH (lax)
    # 'packet'       : tile-shared-stack packet traversal (lax; portable)
    # 'quad'         : Mosaic 4-wide kernel (FLAGSHIP TPU path — same
    #                  per-stream speed as 'pallas', 47x faster packing;
    #                  BASELINE.md traversal matrix)
    # 'pallas'       : Mosaic paired-children (2-wide) kernel, kept as the
    #                  justified alternate (see kernels/pallas_wide.py)
    # 'threaded'     : per-ray stackless skip-pointer walk in pure XLA
    #                  (portable; XLA gathers are slow on TPU — use 'quad')
    traversal: str = "brute"
    # Rays per traversal chunk for 'threaded' (each chunk gets its own
    # while_loop, so trip count is per-chunk max, not global max).
    traversal_chunk: int = 128 * 1024
    # BVH builder: 'median' (host, parity with BoundingVolumeHierarchy.cpp)
    # or 'lbvh' (on-device Morton/Karras build).
    bvh_builder: str = "median"
    bvh_stack_depth: int = 64  # reference uses 32 (raytrace_comp.comp:162)
    bvh_leaf_size: int = 4  # triangles per leaf (reference: 1)
    packet_tile: int = 256  # rays per packet for 'packet' traversal
    # Independent packet walks interleaved per Mosaic kernel step ('pallas'
    # traversal).  The walk is a dependent-load chain; 8 chains hide its
    # latency behind each other's work (scripts/probe_interleave.py: 299 →
    # 32.5 ns/iter/chain on v5e).
    interleave: int = 8
    # Pallas kernel path for the hot intersect/trace ops ('none'|'intersect').
    kernels: str = "none"
    # Wavefront-style ray compaction: sort every traversal query stream by
    # (active, direction octant, origin Morton) so packet tiles stay coherent
    # and dead lanes cluster into early-exiting tiles (render/compaction.py).
    ray_sort: bool = False
    # Carry-level wavefront sorting: instead of sorting each of the ~32 query
    # streams per step independently (ray_sort), permute the whole bounce
    # carry ONCE at the top of every bounce >= 1 by the same coherence key,
    # so every query inside the bounce (NEE shadow, SSS walk, next nearest)
    # runs on an already-sorted stream.  The primary bounce keeps raster
    # order, which is *more* coherent than any Morton sort of a pinhole
    # origin (scripts/r3_breakdown.py: sorting the primary costs 9x).
    # Mutually exclusive with ray_sort (wavefront_sort disables the
    # per-query wrappers).
    wavefront_sort: bool = False
    # Static-capacity carry compaction: after the PRIMARY trace (before
    # bounce 0's NEE/SSS shade phase), gather the bounce carry live-first
    # (Morton-ordered by hit position) into a buffer of
    # C = ceil(compact_frac * R) lanes and run the whole shade + bounce
    # loop at that width — every elementwise fusion, sort, and traversal
    # of 32 of the 33 per-sample queries shrinks by 1/compact_frac.
    # Overflow (> C live lanes) is handled by chunking the permutation
    # into ceil(R/C) C-wide chunks under one lax.scan (dead chunks skip
    # via a trivial cond), so the result is bit-exact for every scene and
    # the bounce program compiles ONCE at width C (integrator.py).
    # Profiled motivation: bounces past the primary carry ~12% -> ~1% live
    # lanes yet dominated the step as full-width fusions
    # (scripts/r3_fwd_profile.py).  0 disables.
    compact_frac: float = 0.25

    # Remat the per-bounce body in backward passes.
    remat_bounces: bool = True
    # Remat the per-bounce body inside the TAPE PLAYBACK as well.  The
    # playback contains no traversal, so its bounce bodies are cheap
    # arithmetic; False stores their residuals instead of re-running them
    # in the backward.  Measured on chip in round 5: storing residuals is
    # SLOWER (1,662 vs 1,592 ms fwd+bwd at the flagship config — the
    # residual HBM traffic costs more than recomputing the arithmetic), so
    # remat stays the default; the knob remains for memory-vs-time tuning.
    playback_remat_bounces: bool = True

    @property
    def n_pixels(self) -> int:
        return self.width * self.height

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


# The five BASELINE.json config presets (see BASELINE.md).
PRESETS: dict[str, RenderConfig] = {
    # 1: box.obj Cornell-style, 256², 1 bounce, 4 spp (CPU JAX reference)
    "box256": RenderConfig(
        width=256, height=256, max_depth=1, spp=4, traversal="brute",
        enable_sss=False, russian_roulette=False,
    ),
    # 2: box.obj 512², 4 bounces, 16 spp, NEE + Russian roulette
    "box512": RenderConfig(
        width=512, height=512, max_depth=4, spp=16, traversal="brute",
        russian_roulette=True,
    ),
    # 3: Sylveon-class 512² with SAH build + 4-wide Mosaic kernel
    "sylveon512": RenderConfig(
        width=512, height=512, max_depth=4, spp=1, traversal="quad",
        bvh_builder="sah", bvh_leaf_size=8, packet_tile=4096, interleave=1,
        ray_sort=True, compact_frac=0.125,
    ),
    # 4: Sylveon-class 1024², 64 spp, differentiable, tile-sharded 1 host
    "sylveon1024": RenderConfig(
        width=1024, height=1024, max_depth=4, spp=64, traversal="quad",
        bvh_builder="sah", bvh_leaf_size=8, packet_tile=4096, interleave=1,
        ray_sort=True, compact_frac=0.125,
    ),
    # 5: Sylveon-class 2048², 4 bounces, 128 spp, multi-host tile sharding
    "sylveon2048": RenderConfig(
        width=2048, height=2048, max_depth=4, spp=128, traversal="quad",
        bvh_builder="sah", bvh_leaf_size=8, packet_tile=4096, interleave=1,
        ray_sort=True, compact_frac=0.125,
    ),
}


def preset(name: str, **overrides) -> RenderConfig:
    cfg = PRESETS[name]
    return cfg.replace(**overrides) if overrides else cfg

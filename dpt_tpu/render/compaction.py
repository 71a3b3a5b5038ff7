"""Ray-stream sorting / compaction — the TPU analog of wavefront compaction.

A GPU wavefront tracer compacts its ray queues so warps stay full
(SURVEY §7 M3).  On TPU, shapes are static under jit, so instead of shrinking
the queue we *permute* it: rays are sorted by a coherence key

    [ active(1) | direction octant(3) | 30-bit Morton code of origin ]

so that (a) rays in the same 8x128 packet tile traverse similar BVH subtrees
— the tile's union-traversal (kernels/pallas_wide.py) shrinks toward a
single ray's traversal — and (b) inactive/masked lanes cluster into tiles
that early-exit after testing the root.  The permutation and its scatter
inverse are XLA-native (one `sort` + gathers) and run at HBM bandwidth.

The reference has no analog: its megakernel tolerates divergence per thread
(raytrace_comp.comp:159-204).  On a vector machine the sort is what restores
the lost coherence of bounce/SSS/shadow rays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _part1by2(x):
    """Spread the low 10 bits of x so there are two zero bits between each
    (standard Morton bit-interleave helper), vectorized uint32."""
    x = x & 0x3FF
    x = (x | (x << 16)) & jnp.uint32(0x30000FF)
    x = (x | (x << 8)) & jnp.uint32(0x300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x30C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x9249249)
    return x


def morton3d(p, bounds_min, bounds_max, bits: int = 10):
    """30-bit Morton code of points p [R, 3] within the given bounds."""
    scale = jnp.float32((1 << bits) - 1)
    ext = jnp.maximum(bounds_max - bounds_min, 1e-20)
    q = jnp.clip((p - bounds_min) / ext, 0.0, 1.0)
    cell = (q * scale).astype(jnp.uint32)
    return (
        (_part1by2(cell[:, 0]) << 2)
        | (_part1by2(cell[:, 1]) << 1)
        | _part1by2(cell[:, 2])
    )


def ray_sort_key(origin, direction, active, bounds_min, bounds_max,
                 octant_major: bool = True):
    """Coherence key: inactive rays sort last; active rays group by direction
    octant then origin locality.

    octant_major=False drops the direction octant and orders by origin Morton
    code alone.  Per-query sorting wants the octant (the ordered-descent
    kernels feed on octant-pure tiles: 88 vs 111 ms on a 12%-live SSS stream,
    scripts/r3_mortononly_probe.py); carry-level wavefront sorting wants
    Morton-major, because ONE permutation serves all eight query streams of a
    bounce (nearest + NEE shadows + SSS walk) whose directions are mutually
    unrelated — origin locality is the only coherence they share."""
    code = morton3d(origin, bounds_min, bounds_max)
    if octant_major:
        octant = (
            (direction[:, 0] >= 0).astype(jnp.uint32) * 4
            + (direction[:, 1] >= 0).astype(jnp.uint32) * 2
            + (direction[:, 2] >= 0).astype(jnp.uint32)
        )
        key = (octant << 30) | (code & jnp.uint32((1 << 30) - 1))
    else:
        key = code
    # Active bit dominates: inactive rays get the max key.
    return jnp.where(active, key, jnp.uint32(0xFFFFFFFF))


def sort_permutation(origin, direction, active, bounds_min, bounds_max,
                     octant_major: bool = True):
    """Permutation that orders rays by coherence key (stable)."""
    key = ray_sort_key(
        jax.lax.stop_gradient(origin),
        jax.lax.stop_gradient(direction),
        active,
        bounds_min,
        bounds_max,
        octant_major=octant_major,
    )
    return jnp.argsort(key)


def scatter_back(perm, *arrays):
    """Inverse the gather `a[perm]` for each array: out[perm[i]] = a[i]."""
    out = []
    for a in arrays:
        out.append(jnp.zeros_like(a).at[perm].set(a))
    return tuple(out)


def sorted_nearest(nearest, bounds_min, bounds_max):
    """Wrap a nearest-hit closure with coherence sorting.

    The 'active' proxy for nearest queries: integrator masking moves dead
    rays' origins to ±1e9 (integrator._masked_query), far outside scene
    bounds — detect and sink them to the tail.
    """

    def wrapped(o, d):
        active = jnp.all(jnp.abs(jax.lax.stop_gradient(o)) < 1e8, axis=-1)
        perm = sort_permutation(o, d, active, bounds_min, bounds_max)
        res = nearest(o[perm], d[perm])
        hit, t, tri = scatter_back(perm, res["hit"], res["t"], res["tri"])
        return {"hit": hit, "t": t, "tri": tri}

    # The raw closure, for streams that are already coherent: sorting a
    # pinhole primary stream replaces raster order with a constant-origin
    # Morton key and costs 9x (scripts/r3_breakdown.py; BASELINE.md).
    wrapped.unsorted = nearest
    return wrapped


def sorted_occluded(occluded, bounds_min, bounds_max):
    """Wrap an any-hit closure with coherence sorting.

    max_dist <= 0 marks masked lanes (integrator._nee_one_light) — they sort
    last and their tiles resolve immediately.
    """

    def wrapped(o, d, max_dist):
        active = max_dist > 0.0
        perm = sort_permutation(o, d, active, bounds_min, bounds_max)
        occ = occluded(o[perm], d[perm], max_dist[perm])
        (occ,) = scatter_back(perm, occ)
        return occ

    return wrapped

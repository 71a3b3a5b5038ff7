"""Brute-force Möller–Trumbore Mosaic kernel (cfg.kernels='intersect').

For box-scale scenes (tens to thousands of triangles) a hierarchy is pure
overhead: this kernel streams every triangle past a VMEM-resident ray tile,
the Pallas analog of the oracle path render/intersect.brute_force_nearest
(reference semantics: traceRay without the BVH, raytrace_comp.comp:159-204).

Triangle layout matches kernels/pallas_wide.py leaf rows: 8 triangles per
128-lane row, 16 lanes each — (v0, e1, e2, oid, valid, pad).  One fori
iteration per row, 8 statically-unrolled tests per iteration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_MAX = 1e30


def pack_tris(v0, v1, v2) -> jax.Array:
    """[T,3] triangle soup → [ceil(T/8), 128] kernel rows.

    jnp-based so it traces under jit (trace.py packs per call with the
    scene arrays as traced jit arguments)."""
    T = v0.shape[0]
    rows = -(-T // 8)
    flat = jnp.zeros((rows * 8, 16), jnp.float32)
    flat = flat.at[:T, 0:3].set(v0)
    flat = flat.at[:T, 3:6].set(v1 - v0)
    flat = flat.at[:T, 6:9].set(v2 - v0)
    flat = flat.at[:T, 9].set(jnp.arange(T, dtype=jnp.float32))
    flat = flat.at[:T, 10].set(1.0)
    return flat.reshape(rows, 128)


def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tris_ref,
            t_ref, tri_ref, *, eps: float):
    ox = ox_ref[:, :]
    oy = oy_ref[:, :]
    oz = oz_ref[:, :]
    dx = dx_ref[:, :]
    dy = dy_ref[:, :]
    dz = dz_ref[:, :]

    n_rows = tris_ref.shape[0]
    best_t = jnp.full(ox.shape, T_MAX, jnp.float32)
    best_i = jnp.zeros(ox.shape, jnp.int32)

    def body(row, carry):
        best_t, best_i = carry
        trow = tris_ref[row, :].reshape(1, 128)
        for s in range(8):
            b = s * 16
            v0x = trow[0, b + 0]
            v0y = trow[0, b + 1]
            v0z = trow[0, b + 2]
            e1x = trow[0, b + 3]
            e1y = trow[0, b + 4]
            e1z = trow[0, b + 5]
            e2x = trow[0, b + 6]
            e2y = trow[0, b + 7]
            e2z = trow[0, b + 8]
            oid = trow[0, b + 9].astype(jnp.int32)
            valid = trow[0, b + 10] > 0.5

            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            parallel = jnp.abs(det) < eps
            inv_det = 1.0 / jnp.where(parallel, 1.0, det)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            u = inv_det * (tx * px + ty * py + tz * pz)
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = inv_det * (dx * qx + dy * qy + dz * qz)
            t = inv_det * (e2x * qx + e2y * qy + e2z * qz)
            hit = (
                (~parallel)
                & (u >= 0.0)
                & (u <= 1.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > eps)
                & valid
            )
            # Tie-break on lowest triangle id (brute_force_nearest argmin
            # semantics): strictly-closer wins; equal-t keeps the earlier id.
            upd = hit & (t < best_t)
            best_t = jnp.where(upd, t, best_t)
            best_i = jnp.where(upd, oid, best_i)
        return best_t, best_i

    best_t, best_i = jax.lax.fori_loop(0, n_rows, body, (best_t, best_i))
    t_ref[:, :] = best_t
    tri_ref[:, :] = best_i


@functools.partial(jax.jit, static_argnames=("eps",))
def _run(origin, direction, tris, eps: float):
    R = origin.shape[0]
    K = 1024
    KS = K // 128

    def prep(a, fill):
        pad = (-R) % K
        if pad:
            a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
        return a.reshape(-1, 128)

    ox = prep(origin[:, 0], 1e9)
    oy = prep(origin[:, 1], 1e9)
    oz = prep(origin[:, 2], 1e9)
    dx = prep(direction[:, 0], 0.0)
    dy = prep(direction[:, 1], 0.0)
    dz = prep(direction[:, 2], 1.0)

    n_rows = ox.shape[0]
    P = n_rows // KS
    ray_spec = pl.BlockSpec((KS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out_t, out_tri = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(P,),
        in_specs=[ray_spec] * 6 + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((KS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, 128), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.devices()[0].platform != "tpu",
    )(ox, oy, oz, dx, dy, dz, tris)
    return out_t.reshape(-1)[:R], out_tri.reshape(-1)[:R]


def pallas_nearest(origin, direction, v0, v1, v2, eps=1e-6):
    """Nearest hit over all triangles: (hit, t, tri).  v0/v1/v2 are the
    triangle corners (device or host); packed per call — intended for
    small scenes where packing is negligible."""
    tris = pack_tris(v0, v1, v2)
    t, tri = _run(origin, direction, tris, float(eps))
    hit = t < T_MAX
    return hit, t, jnp.where(hit, tri, 0)

"""Geometric kernels: Möller–Trumbore, AABB slab, brute-force nearest."""

import jax.numpy as jnp
import numpy as np

from dpt_tpu.oracle import scalar as oracle
from dpt_tpu.render.intersect import (
    brute_force_nearest,
    intersect_aabb,
    moller_trumbore,
    reintersect,
)


def _tri():
    return (
        jnp.array([[0.0, 0.0, 0.0]]),
        jnp.array([[1.0, 0.0, 0.0]]),
        jnp.array([[0.0, 1.0, 0.0]]),
    )


def test_moller_trumbore_hit():
    v0, v1, v2 = _tri()
    o = jnp.array([[0.25, 0.25, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit, t, u, v = moller_trumbore(o, d, v0, v1, v2)
    assert bool(hit[0])
    assert np.isclose(float(t[0]), 1.0)
    assert np.isclose(float(u[0]), 0.25) and np.isclose(float(v[0]), 0.25)


def test_moller_trumbore_miss_outside():
    v0, v1, v2 = _tri()
    o = jnp.array([[0.9, 0.9, 1.0]])  # u+v > 1
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit, *_ = moller_trumbore(o, d, v0, v1, v2)
    assert not bool(hit[0])


def test_moller_trumbore_parallel_and_behind():
    v0, v1, v2 = _tri()
    o = jnp.array([[0.25, 0.25, 1.0]])
    d_par = jnp.array([[1.0, 0.0, 0.0]])
    hit, *_ = moller_trumbore(o, d_par, v0, v1, v2)
    assert not bool(hit[0])
    d_away = jnp.array([[0.0, 0.0, 1.0]])  # triangle is behind
    hit, *_ = moller_trumbore(o, d_away, v0, v1, v2)
    assert not bool(hit[0])


def test_moller_trumbore_matches_oracle_random():
    rng = np.random.default_rng(0)
    for _ in range(200):
        v = rng.normal(size=(3, 3))
        o = rng.normal(size=3) * 2
        d = rng.normal(size=3)
        d = d / np.linalg.norm(d)
        hit, t, u, vv = moller_trumbore(
            jnp.asarray(o, jnp.float32)[None],
            jnp.asarray(d, jnp.float32)[None],
            *(jnp.asarray(x, jnp.float32)[None] for x in v),
        )
        oh, ot, ou, ov = oracle.moller_trumbore(
            tuple(o), tuple(d), tuple(v[0]), tuple(v[1]), tuple(v[2])
        )
        assert bool(hit[0]) == oh
        if oh:
            assert np.isclose(float(t[0]), ot, rtol=1e-3, atol=1e-4)


def test_aabb_basic():
    o = jnp.array([[0.0, 0.0, -5.0]])
    inv_d = 1.0 / jnp.array([[1e-9, 1e-9, 1.0]])
    hit, tmin, tmax = intersect_aabb(
        o, inv_d, jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0])
    )
    assert bool(hit[0]) and np.isclose(float(tmin[0]), 4.0)
    # ray starting inside
    o2 = jnp.array([[0.0, 0.0, 0.0]])
    hit2, tmin2, _ = intersect_aabb(
        o2, inv_d, jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0])
    )
    assert bool(hit2[0]) and float(tmin2[0]) <= 0.0


def test_brute_force_nearest_picks_closest(box_scene):
    v0, v1, v2 = box_scene.tri_vertices()
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit, t, tri, u, v = brute_force_nearest(o, d, v0, v1, v2)
    assert bool(hit[0])
    assert np.isclose(float(t[0]), 4.0)  # cube face at z=+1


def test_reintersect_matches_search(box_scene):
    v0, v1, v2 = box_scene.tri_vertices()
    rng = np.random.default_rng(1)
    o = jnp.asarray(rng.normal(size=(64, 3)) * 3, jnp.float32)
    d = rng.normal(size=(64, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    hit, t, tri, u, v = brute_force_nearest(o, d, v0, v1, v2)
    rec = reintersect(o, d, tri, box_scene.vertices, box_scene.indices)
    m = np.asarray(hit)
    assert np.allclose(np.asarray(t)[m], np.asarray(rec["t"])[m], rtol=1e-5)
    assert np.allclose(np.asarray(u)[m], np.asarray(rec["u"])[m], atol=1e-5)

"""Sampling routines: geometric invariants + oracle agreement."""

import jax.numpy as jnp
import numpy as np

from dpt_tpu.oracle import scalar as oracle
from dpt_tpu.render.sampling import (
    intersect_area_light,
    random_gaussian,
    sample_area_light,
    sample_hemisphere,
    sample_sphere,
)


def _states(n=4096, seed=7):
    return jnp.asarray(
        np.random.default_rng(seed).integers(0, 2**32, n, dtype=np.uint32)
    )


def test_gaussian_moments():
    s = _states(1 << 14)
    _, g = random_gaussian(s)
    g = np.asarray(g)
    assert abs(g.mean()) < 0.05
    assert abs(g.std() - 1.0) < 0.05


def test_hemisphere_in_hemisphere_and_unit():
    s = _states()
    n = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (s.shape[0], 1))
    _, d = sample_hemisphere(n, s)
    d = np.asarray(d)
    assert np.all(np.abs(np.linalg.norm(d, axis=-1) - 1.0) < 1e-4)
    assert np.all(d[:, 1] >= -1e-6)
    # cosine-weighted: E[cos] = 2/3
    assert abs(d[:, 1].mean() - 2.0 / 3.0) < 0.02


def test_hemisphere_matches_oracle():
    states = [3, 999, 123456]
    for st in states:
        s, dj = sample_hemisphere(
            jnp.asarray([[0.3, 0.8, -0.52]], jnp.float32)
            / np.linalg.norm([0.3, 0.8, -0.52]),
            jnp.asarray([st], jnp.uint32),
        )
        n = tuple(np.asarray([0.3, 0.8, -0.52]) / np.linalg.norm([0.3, 0.8, -0.52]))
        _, do = oracle.sample_hemisphere(n, st)
        assert np.allclose(np.asarray(dj)[0], do, atol=1e-5)


def test_sphere_uniform_unit():
    s = _states(1 << 14)
    _, d = sample_sphere(s)
    d = np.asarray(d)
    assert np.all(np.abs(np.linalg.norm(d, axis=-1) - 1.0) < 1e-4)
    assert np.all(np.abs(d.mean(0)) < 0.05)


def test_area_light_sample_on_rect():
    s = _states(1024)
    lpos = jnp.asarray([0.0, 2.0, 0.0], jnp.float32)
    lnormal = jnp.asarray([0.0, -1.0, 0.0], jnp.float32)
    lsize = jnp.asarray([2.5, 2.5], jnp.float32)
    _, p = sample_area_light(lpos, lnormal, lsize, s)
    p = np.asarray(p)
    assert np.allclose(p[:, 1], 2.0, atol=1e-5)  # on the light plane
    assert np.all(np.abs(p[:, 0]) <= 1.25 + 1e-5)
    assert np.all(np.abs(p[:, 2]) <= 1.25 + 1e-5)


def test_intersect_area_light_inside_outside():
    lpos = jnp.asarray([0.0, 2.0, 0.0], jnp.float32)
    lnormal = jnp.asarray([0.0, -1.0, 0.0], jnp.float32)
    lsize = jnp.asarray([2.5, 2.5], jnp.float32)
    o = jnp.asarray([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0], [0.0, 3.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    hit, t = intersect_area_light(o, d, lpos, lnormal, lsize)
    hit = np.asarray(hit)
    assert hit[0]  # straight up through the light
    assert not hit[1]  # outside the rectangle
    assert not hit[2]  # light is behind (t < 0)
    assert np.isclose(float(t[0]), 2.0)


def test_area_light_matches_oracle():
    for st in [11, 222, 3333]:
        s, pj = sample_area_light(
            jnp.asarray([0.0, 2.0, 0.0], jnp.float32),
            jnp.asarray([0.0, -1.0, 0.0], jnp.float32),
            jnp.asarray([2.5, 2.5], jnp.float32),
            jnp.asarray([st], jnp.uint32),
        )
        _, po = oracle.sample_area_light(
            (0.0, 2.0, 0.0), (0.0, -1.0, 0.0), (2.5, 2.5), st
        )
        assert np.allclose(np.asarray(pj)[0], po, atol=1e-5)

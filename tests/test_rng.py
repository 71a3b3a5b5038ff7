"""RNG: jnp implementation ≡ scalar oracle, bit-exact."""

import jax.numpy as jnp
import numpy as np

from dpt_tpu.oracle import scalar as oracle
from dpt_tpu.render.rng import rng_next, seed_pixels


def test_rng_matches_oracle_bit_exact():
    seeds = np.array([0, 1, 2, 12345, 2**31, 2**32 - 1, 987654321], np.uint32)
    state = jnp.asarray(seeds)
    for step in range(16):
        state, u = rng_next(state)
        for i, s in enumerate(seeds):
            st = int(s)
            for _ in range(step + 1):
                st, uo = oracle.rng_next(st)
            assert int(np.asarray(state)[i]) == st
            assert abs(float(np.asarray(u)[i]) - uo) < 1e-7


def test_uniform_range_and_spread():
    state = jnp.arange(10000, dtype=jnp.uint32)
    _, u = rng_next(state)
    u = np.asarray(u)
    assert u.min() >= 0.0 and u.max() <= 1.0
    assert abs(u.mean() - 0.5) < 0.02
    assert abs(u.var() - 1.0 / 12.0) < 0.01


def test_seed_pixels_formula():
    # seed = (batch * H + y) * W + x  (raytrace_comp.comp:435)
    px = jnp.array([3], jnp.uint32)
    py = jnp.array([5], jnp.uint32)
    s = seed_pixels(7, px, py, 64, 32)
    assert int(np.asarray(s)[0]) == (7 * 32 + 5) * 64 + 3


def test_streams_decorrelated_across_batches():
    px, py = jnp.uint32([0]), jnp.uint32([0])
    s0 = seed_pixels(0, px, py, 8, 8)
    s1 = seed_pixels(1, px, py, 8, 8)
    _, u0 = rng_next(s0)
    _, u1 = rng_next(s1)
    assert float(u0[0]) != float(u1[0])

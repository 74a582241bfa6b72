"""Pair-RNG contract tests (SURVEY.md §4 implication 1, row 21 parity).

The physics depends on three properties: exact i<->j symmetry (momentum
conservation), zero mean / unit variance (FDT), and decorrelation across
steps and pairs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.core import rng as rngmod


def _tags(n, seed=0):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.randint(1, 2**31 - 1, size=n, dtype=np.int32))


@pytest.mark.parametrize("mode", ["tea", "fast"])
def test_pair_symmetry_bitwise(mode):
    ti, tj = _tags(4096, 1), _tags(4096, 2)
    step, seed = jnp.int32(123), jnp.uint32(928459)
    if mode == "tea":
        a = rngmod.pair_uniform_tea(ti, tj, step, seed)
        b = rngmod.pair_uniform_tea(tj, ti, step, seed)
    else:
        hi = rngmod.particle_hash(ti, step, seed)
        hj = rngmod.particle_hash(tj, step, seed)
        a = rngmod.pair_uniform_fast(hi, hj)
        b = rngmod.pair_uniform_fast(hj, hi)
    assert (np.asarray(a) == np.asarray(b)).all()


@pytest.mark.parametrize("mode", ["tea", "fast"])
def test_moments(mode):
    n = 1 << 16
    ti = jnp.arange(1, n + 1, dtype=jnp.int32)
    tj = jnp.arange(n + 1, 2 * n + 1, dtype=jnp.int32)
    step, seed = jnp.int32(7), jnp.uint32(42)
    if mode == "tea":
        th = rngmod.pair_uniform_tea(ti, tj, step, seed)
    else:
        hi = rngmod.particle_hash(ti, step, seed)
        hj = rngmod.particle_hash(tj, step, seed)
        th = rngmod.pair_uniform_fast(hi, hj)
    th = np.asarray(th, np.float64)
    # uniform(-sqrt3, sqrt3): mean 0, var 1; n=65536 -> se(mean)~0.004
    assert abs(th.mean()) < 0.02
    assert abs(th.var() - 1.0) < 0.03
    assert np.abs(th).max() <= np.sqrt(3) + 1e-6


@pytest.mark.parametrize("mode", ["tea", "fast"])
def test_step_decorrelation(mode):
    """Same pairs, consecutive steps -> uncorrelated noise."""
    n = 1 << 15
    ti = jnp.arange(1, n + 1, dtype=jnp.int32)
    tj = ti + 1
    seed = jnp.uint32(11)

    def draw(step):
        if mode == "tea":
            return np.asarray(
                rngmod.pair_uniform_tea(ti, tj, jnp.int32(step), seed), np.float64)
        hi = rngmod.particle_hash(ti, jnp.int32(step), seed)
        hj = rngmod.particle_hash(tj, jnp.int32(step), seed)
        return np.asarray(rngmod.pair_uniform_fast(hi, hj), np.float64)

    a, b = draw(1000), draw(1001)
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) < 5.0 / np.sqrt(n)


def test_fast_mode_shared_particle_decorrelation():
    """theta_ij vs theta_ik share h_i — the short mixer must still decorrelate."""
    n = 1 << 15
    ti = _tags(n, 3)
    tj, tk = _tags(n, 4), _tags(n, 5)
    step, seed = jnp.int32(55), jnp.uint32(9)
    hi = rngmod.particle_hash(ti, step, seed)
    hj = rngmod.particle_hash(tj, step, seed)
    hk = rngmod.particle_hash(tk, step, seed)
    a = np.asarray(rngmod.pair_uniform_fast(hi, hj), np.float64)
    b = np.asarray(rngmod.pair_uniform_fast(hi, hk), np.float64)
    # 5-sigma bound: se(corr) ~ 1/sqrt(n)
    assert abs(np.corrcoef(a, b)[0, 1]) < 5.0 / np.sqrt(n)


def test_uniform_stream_independence():
    n = 1 << 15
    h = rngmod.combine_symmetric(
        rngmod.particle_hash(_tags(n, 6), jnp.int32(3), jnp.uint32(1)),
        rngmod.particle_hash(_tags(n, 7), jnp.int32(3), jnp.uint32(1)))
    s0 = np.asarray(rngmod.uniform_stream(h, 0), np.float64)
    s1 = np.asarray(rngmod.uniform_stream(h, 1), np.float64)
    assert abs(np.corrcoef(s0, s1)[0, 1]) < 5.0 / np.sqrt(n)
    assert abs(s0.mean()) < 0.02 and abs(s0.var() - 1.0) < 0.03


def test_maxwell_velocities_exact_kt():
    key = jax.random.PRNGKey(0)
    v = rngmod.maxwell_velocities(key, 1000, kt=1.0, mass=1.0)
    v = np.asarray(v, np.float64)
    assert np.allclose(v.mean(axis=0), 0.0, atol=1e-6)
    kt = (v ** 2).sum() / (3 * (1000 - 1))
    assert abs(kt - 1.0) < 1e-5

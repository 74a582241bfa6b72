"""Cross-path statistical parity — the reference's decisive oracle
(SURVEY.md §4 'CPU cross-validation': same deck on the CPU pair style vs
the GPU engine, compared on kT and g(r)). Here: dense O(N^2) engine vs the
bucket production engine, independent equilibrations, RDF curves compared
within statistical tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.core.system import (System, SystemParams, run_bucket_chunked,
                                  run_chunk, setup)
from meso_tpu.models.classic import classic_fluid
from meso_tpu.obs import kinetic_temperature
from meso_tpu.obs.rdf import rdf


def _avg_rdf(advance, state, n_samples, sample_every, box, mass, nbins=40):
    acc = None
    kts = []
    for _ in range(n_samples):
        state = advance(state, sample_every)
        r, g = rdf(state.x, state.mask, box, r_max=2.0, nbins=nbins)
        acc = g if acc is None else acc + g
        kts.append(float(kinetic_temperature(state.v, mass[state.typ],
                                             state.mask)))
    return np.asarray(r), np.asarray(acc) / n_samples, state, np.mean(kts)


@pytest.mark.slow
def test_rdf_and_kt_parity_dense_vs_bucket():
    l = 6.0
    # dense engine
    sys_d, params, st_d = classic_fluid(l=l, force_path="dense",
                                        rng_mode="fast")
    st_d = run_chunk(sys_d, params, st_d, 500)
    r, g_dense, st_d, kt_d = _avg_rdf(
        lambda s, n: run_chunk(sys_d, params, s, n), st_d, 15, 20, st_d.box,
        params.mass)

    # bucket engine (independent trajectory, same physics)
    sys_b, params_b, st_b = classic_fluid(l=l, force_path="bucket",
                                          rng_mode="fast", skin=0.5,
                                          rebuild_every=4, init_seed=1)
    st_b, _ = run_bucket_chunked(sys_b, params_b, st_b, 125, 4)
    r2, g_bucket, st_b, kt_b = _avg_rdf(
        lambda s, n: run_bucket_chunked(sys_b, params_b, s, n // 4, 4)[0],
        st_b, 15, 20, st_b.box, params_b.mass)

    # Groot-Warren fluid structure: soft correlation hole at r->0,
    # g -> 1 at r ~ rc
    sel = r > 0.15  # innermost bins are noise-dominated (tiny shell volume)
    assert g_dense[(r > 0.05) & (r < 0.2)].mean() < 0.7
    assert abs(g_dense[(r > 1.2) & (r < 2.0)].mean() - 1.0) < 0.05
    # parity between engines (independent runs -> statistical tolerance)
    diff = np.abs(g_dense[sel] - g_bucket[sel])
    assert diff.max() < 0.15, diff.max()
    assert diff.mean() < 0.04, diff.mean()

    # each engine thermostats to the target (15 correlated samples ->
    # effective N ~ 5, se ~ 1.5%; 3-sigma band)
    assert abs(kt_d - 1.0) < 0.05, kt_d
    assert abs(kt_b - 1.0) < 0.05, kt_b


@pytest.mark.slow
def test_pressure_profile_uniform_fluid():
    """A homogeneous equilibrated fluid must show a flat pressure profile
    matching the scalar virial pressure (compute stress/atom analog)."""
    from meso_tpu.obs.stress import pressure_profile
    sys_b, params, st = classic_fluid(l=6.0, force_path="bucket",
                                      rng_mode="fast", skin=0.5,
                                      rebuild_every=4)
    st, _ = run_bucket_chunked(sys_b, params, st, 150, 4)
    accs = []
    for _ in range(10):
        st, _ = run_bucket_chunked(sys_b, params, st, 5, 4)
        c, p = pressure_profile(sys_b, params, st, axis=0, nbins=6)
        accs.append(np.asarray(p))
    p_mean = np.mean(accs, axis=0)
    # Groot-Warren EOS at rho=3, a=25: P ~ rho kT + 0.101 a rho^2 ~ 25.7
    assert 20.0 < p_mean.mean() < 30.0, p_mean
    assert p_mean.std() / p_mean.mean() < 0.08, p_mean  # flat profile

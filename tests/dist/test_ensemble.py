"""Ensemble (replica) parallelism over the dp mesh axis (SURVEY.md §2c DP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.core.system import setup
from meso_tpu.models.classic import classic_fluid
from meso_tpu.parallel.ensemble import (make_ensemble_mesh, replicate_state,
                                        run_ensemble)


@pytest.mark.slow
def test_replicas_decorrelate_and_equilibrate():
    system, params, state = classic_fluid(l=4.8, force_path="bucket",
                                          rng_mode="fast", skin=0.6,
                                          rebuild_every=4)
    n_rep = 4
    dstate = replicate_state(state, n_rep)
    mesh = make_ensemble_mesh(n_rep)
    dstate, ke, ofs = run_ensemble(system, params, dstate, 600, mesh)
    assert int(np.max(np.asarray(ofs))) == 0
    # replicas diverged (different tags -> different noise streams)
    x = np.asarray(dstate.x)
    assert np.abs(x[0] - x[1]).max() > 0.1
    # all replicas finite, kT sane
    m = np.asarray(dstate.mask)
    assert np.isfinite(x[m[..., None].repeat(3, -1) > -1]).all()
    v = np.asarray(dstate.v)
    for r in range(n_rep):
        kt = (v[r][m[r]] ** 2).sum() / (3 * (m[r].sum() - 1))
        assert abs(kt - 1.0) < 0.1, (r, kt)

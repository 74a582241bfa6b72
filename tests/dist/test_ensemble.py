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


def _fluid_spatial(n_dev=4, rebuild_every=5):
    """Slab-shaped classic fluid sized for a 4-slab decomposition."""
    from meso_tpu.core.box import Box
    from meso_tpu.core.state import create_random
    from meso_tpu.core.system import System, SystemParams
    from meso_tpu.ops.dpd import DPDParams
    from meso_tpu.parallel.domain import build_domain

    side, rc, skin = 1.2, 1.0, 0.2
    lx, lyz = 3 * n_dev * side, 4 * side
    density = 3.0
    n = int(round(density * lx * lyz * lyz))
    box = Box.orthorhombic(lx, lyz, lyz)
    state = create_random(jax.random.PRNGKey(0), n, box, kt=1.0)
    params = SystemParams.build(
        DPDParams.build(a=25.0, gamma=4.5, rc=rc, kt=1.0, seed=777))
    system = System.for_fluid([lx, lyz, lyz], rc=rc, density=density,
                              dt=0.01, skin=skin, rng_mode="fast",
                              rebuild_every=rebuild_every)
    system = system.replace(force_path="bucket")
    state = setup(system, params, state)
    dcfg = build_domain(system, n_dev, lx_global=lx,
                        rebuild_every=rebuild_every)
    return system, params, state, dcfg


@pytest.mark.slow
def test_dp_x_sp_composed_mesh():
    """DP x SP: 2 replicas x 4 slabs on a ("dp","x") mesh. Replica 0 keeps
    the original tags, so its trajectory must match the plain 1-D spatial
    run by tag; replica 1 (reseeded tags) must decorrelate."""
    import numpy as np

    from meso_tpu.parallel.domain import (build_domain, collect_state,
                                          distribute_state, make_mesh_1d,
                                          run_distributed)
    from meso_tpu.parallel.ensemble import (collect_ensemble_spatial,
                                            distribute_ensemble_spatial,
                                            make_ensemble_spatial_mesh,
                                            run_distributed_ensemble)

    system, params, state, dcfg = _fluid_spatial()
    mesh2 = make_ensemble_spatial_mesh(2, 4)
    dstate = distribute_ensemble_spatial(state, 2, dcfg)
    dstate, diag = run_distributed_ensemble(system, params, dstate, 2,
                                            mesh2, dcfg)
    assert int(np.max(np.asarray(diag["overflow"]))) == 0
    stacked = collect_ensemble_spatial(dstate)
    rep0 = jax.tree.map(lambda a: a[0], stacked)
    rep1 = jax.tree.map(lambda a: a[1], stacked)

    mesh1 = make_mesh_1d(4)
    dref = distribute_state(state, dcfg)
    dref, _ = run_distributed(system, params, dref, 2, mesh1, dcfg)
    ref = collect_state(dref)

    def bytag(s):
        m = np.asarray(s.mask)
        t = np.asarray(s.tag)[m]
        o = np.argsort(t)
        return np.asarray(s.x)[m][o]

    x0, xr = bytag(rep0), bytag(ref)
    assert x0.shape == xr.shape
    assert np.abs(x0 - xr).max() < 1e-6
    # replica 1: same particle count, different trajectory
    x1 = np.asarray(rep1.x)[np.asarray(rep1.mask)]
    assert x1.shape[0] == xr.shape[0]
    assert np.abs(np.sort(x1[:, 0]) - np.sort(xr[:, 0])).max() > 1e-3

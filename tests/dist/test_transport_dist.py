"""Distributed eDPD/tDPD over the 1-D decomposition: trajectory parity with
the single-chip bucket paths and conservation through migration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.core.system import System, SystemParams, make_step, setup
from meso_tpu.neighbor.bucket_layout import rebuild_buckets
from meso_tpu.ops.edpd import EDPDParams
from meso_tpu.ops.tdpd import TDPDParams
from meso_tpu.parallel.domain import (build_domain, collect_state,
                                      distribute_state, make_mesh_1d,
                                      run_distributed)


def _base(model, n_dev=4, rebuild_every=5):
    side, rc, skin = 1.2, 1.0, 0.2
    lx = 3 * n_dev * side
    lyz = 4 * side
    density = 3.0
    n = int(round(density * lx * lyz * lyz))
    box = Box.orthorhombic(lx, lyz, lyz)
    state = create_random(jax.random.PRNGKey(0), n, box, kt=1.0,
                          with_energy=(model == "edpd"),
                          n_species=1 if model == "tdpd" else 0)
    if model == "edpd":
        state = state.replace(T=1.0 + 0.2 * jnp.sin(state.x[:, 0]))
        pair = EDPDParams.build(a=25.0, gamma=4.5, rc=rc, kappa=1.0,
                                cv=20.0, seed=77)
    else:
        state = state.replace(
            C=(1.0 + 0.5 * jnp.cos(2 * jnp.pi * state.x[:, 0] / lx))[:, None])
        pair = TDPDParams.build(a=25.0, gamma=4.5, rc=rc, kt=1.0,
                                kappa_c=[1.5], eps_c=[0.1], rcc=rc, seed=88)
    params = SystemParams.build_raw(pair)
    system = System.for_fluid([lx, lyz, lyz], rc=rc, density=density,
                              dt=0.01, skin=skin, rng_mode="fast",
                              rebuild_every=rebuild_every)
    system = system.replace(model=model, force_path="bucket")
    state = setup(system, params, state)
    dcfg = build_domain(system, n_dev, lx_global=lx,
                        rebuild_every=rebuild_every)
    return system, params, state, dcfg


def _bytag(state, fields):
    mask = np.asarray(state.mask)
    tag = np.asarray(state.tag)[mask]
    order = np.argsort(tag)
    return {f: np.asarray(getattr(state, f))[mask][order] for f in fields}


@pytest.mark.slow
@pytest.mark.parametrize("model", ["edpd", "tdpd"])
def test_distributed_transport_matches_single_chip(model):
    system, params, state, dcfg = _base(model)
    mesh = make_mesh_1d(4)
    dstate = distribute_state(state, dcfg)
    dstate, diag = run_distributed(system, params, dstate, 3, mesh, dcfg)
    assert int(np.max(np.asarray(diag["overflow"]))) == 0
    field = "T" if model == "edpd" else "C"
    got = _bytag(collect_state(dstate), ("x", field))

    step_fn = make_step(system)

    @jax.jit
    def chunk(s):
        s, of = rebuild_buckets(s, system.cells)
        def body(c, _):
            return step_fn(params, c), None
        s, _ = jax.lax.scan(body, s, None, length=5)
        return s, of

    sref = state
    for _ in range(3):
        sref, of = chunk(sref)
        assert int(of) == 0
    want = _bytag(sref, ("x", field))
    assert got["x"].shape == want["x"].shape
    assert np.abs(got["x"] - want["x"]).max() < 5e-4
    assert np.abs(got[field] - want[field]).max() < 5e-4


@pytest.mark.slow
def test_distributed_tdpd_conserves_mass_through_migration():
    system, params, state, dcfg = _base("tdpd", rebuild_every=5)
    mesh = make_mesh_1d(4)
    dstate = distribute_state(state, dcfg)
    c0 = float(jnp.sum(jnp.where(state.mask, state.C[:, 0], 0.0)))
    dstate, diag = run_distributed(system, params, dstate, 40, mesh, dcfg)
    assert int(np.max(np.asarray(diag["overflow"]))) == 0
    final = collect_state(dstate)
    c1 = float(jnp.sum(jnp.where(final.mask, final.C[:, 0], 0.0)))
    assert abs(c1 - c0) / abs(c0) < 1e-4
    assert int(final.n_valid()) == int(state.n_valid())

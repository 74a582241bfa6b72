"""Distributed eDPD/tDPD over the 2-D brick decomposition: trajectory
parity with the single-chip bucket paths (model-aware halo sweep)."""

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
from meso_tpu.parallel.domain2d import (build_domain2d, collect_state_2d,
                                        distribute_state_2d, make_mesh_2d,
                                        run_distributed_2d)


def _base(model, nx_dev=2, ny_dev=2, rebuild_every=5):
    side, rc, skin = 1.2, 1.0, 0.2
    lx, ly = 3 * nx_dev * side, 3 * ny_dev * side
    lz = 4 * side
    density = 3.0
    n = int(round(density * lx * ly * lz))
    box = Box.orthorhombic(lx, ly, lz)
    state = create_random(jax.random.PRNGKey(0), n, box, kt=1.0,
                          with_energy=(model == "edpd"),
                          n_species=1 if model == "tdpd" else 0)
    if model == "edpd":
        state = state.replace(T=1.0 + 0.2 * jnp.sin(state.x[:, 1]))
        pair = EDPDParams.build(a=25.0, gamma=4.5, rc=rc, kappa=1.0,
                                cv=20.0, seed=77)
    else:
        state = state.replace(
            C=(1.0 + 0.5 * jnp.cos(2 * jnp.pi * state.x[:, 1] / ly))[:, None])
        pair = TDPDParams.build(a=25.0, gamma=4.5, rc=rc, kt=1.0,
                                kappa_c=[1.5], eps_c=[0.1], rcc=rc, seed=88)
    params = SystemParams.build_raw(pair)
    system = System.for_fluid([lx, ly, lz], rc=rc, density=density,
                              dt=0.01, skin=skin, rng_mode="fast",
                              rebuild_every=rebuild_every)
    system = system.replace(model=model, force_path="bucket")
    state = setup(system, params, state)
    dcfg = build_domain2d(system, nx_dev, ny_dev, lx, ly,
                          rebuild_every=rebuild_every)
    return system, params, state, dcfg


def _bytag(state, fields):
    mask = np.asarray(state.mask)
    tag = np.asarray(state.tag)[mask]
    order = np.argsort(tag)
    return {f: np.asarray(getattr(state, f))[mask][order] for f in fields}


@pytest.mark.slow
@pytest.mark.parametrize("model", ["edpd", "tdpd"])
def test_distributed_transport_2d_matches_single_chip(model):
    system, params, state, dcfg = _base(model)
    mesh = make_mesh_2d(2, 2)
    dstate = distribute_state_2d(state, dcfg)
    dstate, diag = run_distributed_2d(system, params, dstate, 3, mesh, dcfg)
    assert int(np.max(np.asarray(diag["overflow"]))) == 0
    field = "T" if model == "edpd" else "C"
    got = _bytag(collect_state_2d(dstate), ("x", field))

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

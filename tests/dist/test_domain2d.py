"""2-D brick decomposition tests on a (2,2)/(2,4) CPU mesh (SURVEY row 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.core.system import System, SystemParams, make_step, setup
from meso_tpu.neighbor.bucket_layout import rebuild_buckets
from meso_tpu.ops.dpd import DPDParams
from meso_tpu.parallel.domain2d import (build_domain2d, collect_state_2d,
                                        distribute_state_2d, make_mesh_2d,
                                        run_distributed_2d)


def _fluid(nx_dev=2, ny_dev=2, cols=3, rebuild_every=5):
    side, rc, skin = 1.2, 1.0, 0.2
    lx, ly = cols * nx_dev * side, cols * ny_dev * side
    lz = 4 * side
    density = 3.0
    n = int(round(density * lx * ly * lz))
    box = Box.orthorhombic(lx, ly, lz)
    state = create_random(jax.random.PRNGKey(0), n, box, kt=1.0)
    params = SystemParams.build(
        DPDParams.build(a=25.0, gamma=4.5, rc=rc, kt=1.0, seed=928459))
    system = System.for_fluid([lx, ly, lz], rc=rc, density=density, dt=0.01,
                              skin=skin, rng_mode="fast",
                              rebuild_every=rebuild_every)
    system = system.replace(force_path="bucket")
    state = setup(system, params, state)
    dcfg = build_domain2d(system, nx_dev, ny_dev, lx, ly,
                          rebuild_every=rebuild_every)
    return system, params, state, dcfg, (lx, ly, lz)


def _bytag(state, fields=("x", "v")):
    mask = np.asarray(state.mask)
    tag = np.asarray(state.tag)[mask]
    order = np.argsort(tag)
    return {f: np.asarray(getattr(state, f))[mask][order] for f in fields}


def test_distribute_collect_roundtrip_2d():
    system, params, state, dcfg, _ = _fluid()
    dstate = distribute_state_2d(state, dcfg)
    back = collect_state_2d(dstate)
    a, b = _bytag(state), _bytag(back)
    assert (a["x"] == b["x"]).all()
    assert (a["v"] == b["v"]).all()


@pytest.mark.slow
def test_2d_matches_single_chip_short():
    """15 steps on a (2,2) mesh == single-chip bucket path (by tag)."""
    system, params, state, dcfg, _ = _fluid(2, 2, rebuild_every=5)
    mesh = make_mesh_2d(2, 2)
    dstate = distribute_state_2d(state, dcfg)
    dstate, diag = run_distributed_2d(system, params, dstate, 3, mesh, dcfg)
    assert int(np.max(np.asarray(diag["overflow"]))) == 0
    got = _bytag(collect_state_2d(dstate))

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
    want = _bytag(sref)
    assert got["x"].shape == want["x"].shape
    assert np.abs(got["x"] - want["x"]).max() < 2e-4
    assert np.abs(got["v"] - want["v"]).max() < 2e-3


@pytest.mark.slow
def test_2d_longer_run_conserves_particles():
    from meso_tpu.obs import kinetic_temperature

    system, params, state, dcfg, dims = _fluid(2, 4, rebuild_every=5)
    mesh = make_mesh_2d(2, 4)
    dstate = distribute_state_2d(state, dcfg)
    n0 = int(state.n_valid())
    dstate, diag = run_distributed_2d(system, params, dstate, 60, mesh, dcfg)
    assert int(np.max(np.asarray(diag["overflow"]))) == 0
    final = collect_state_2d(dstate)
    assert int(final.n_valid()) == n0
    tags = np.sort(np.asarray(final.tag)[np.asarray(final.mask)])
    assert (tags == np.arange(1, n0 + 1)).all()
    kt = float(kinetic_temperature(final.v, params.mass[final.typ],
                                   final.mask))
    assert abs(kt - 1.0) < 0.08
    x = np.asarray(final.x)[np.asarray(final.mask)]
    assert (x >= 0).all()
    assert (x[:, 0] < dims[0]).all() and (x[:, 1] < dims[1]).all()

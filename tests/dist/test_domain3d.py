"""3-D brick decomposition: roundtrip, trajectory parity, conservation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.core.system import System, SystemParams, make_step, setup
from meso_tpu.neighbor.bucket_layout import rebuild_buckets
from meso_tpu.ops.dpd import DPDParams
from meso_tpu.parallel.domain3d import (build_domain3d, collect_state_3d,
                                        distribute_state_3d, make_mesh_3d,
                                        run_distributed_3d)


def _fluid(nd=2, cols=3, rebuild_every=5):
    side, rc, skin = 1.2, 1.0, 0.2
    l = cols * nd * side
    density = 3.0
    n = int(round(density * l ** 3))
    box = Box.cubic(l)
    state = create_random(jax.random.PRNGKey(0), n, box, kt=1.0)
    params = SystemParams.build(
        DPDParams.build(a=25.0, gamma=4.5, rc=rc, kt=1.0, seed=424242))
    system = System.for_fluid([l, l, l], rc=rc, density=density, dt=0.01,
                              skin=skin, rng_mode="fast",
                              rebuild_every=rebuild_every)
    system = system.replace(force_path="bucket")
    state = setup(system, params, state)
    dcfg = build_domain3d(system, nd, nd, nd, l, l, l,
                          rebuild_every=rebuild_every)
    return system, params, state, dcfg


def _bytag(state, fields=("x", "v")):
    mask = np.asarray(state.mask)
    tag = np.asarray(state.tag)[mask]
    order = np.argsort(tag)
    return {f: np.asarray(getattr(state, f))[mask][order] for f in fields}


def test_distribute_collect_roundtrip_3d():
    system, params, state, dcfg = _fluid()
    dstate = distribute_state_3d(state, dcfg)
    back = collect_state_3d(dstate)
    a, b = _bytag(state), _bytag(back)
    assert (a["x"] == b["x"]).all()
    assert (a["v"] == b["v"]).all()


@pytest.mark.slow
def test_3d_matches_single_chip_short():
    """15 steps on a (2,2,2) mesh == single-chip bucket path (by tag)."""
    system, params, state, dcfg = _fluid(rebuild_every=5)
    mesh = make_mesh_3d(2, 2, 2)
    dstate = distribute_state_3d(state, dcfg)
    dstate, diag = run_distributed_3d(system, params, dstate, 3, mesh, dcfg)
    assert int(np.max(np.asarray(diag["overflow"]))) == 0
    got = _bytag(collect_state_3d(dstate))

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
def test_3d_longer_run_conserves_particles():
    from meso_tpu.obs import kinetic_temperature

    system, params, state, dcfg = _fluid(rebuild_every=5)
    n0 = int(state.n_valid())
    mesh = make_mesh_3d(2, 2, 2)
    dstate = distribute_state_3d(state, dcfg)
    dstate, diag = run_distributed_3d(system, params, dstate, 12, mesh, dcfg)
    assert int(np.max(np.asarray(diag["overflow"]))) == 0
    final = collect_state_3d(dstate)
    assert int(final.n_valid()) == n0
    kt = float(kinetic_temperature(final.v, params.mass[final.typ],
                                   final.mask))
    # this random start spikes to kT ~ 2.2 (overlap PE -> KE) and relaxes;
    # at 60 steps the SINGLE-CHIP reference reads 1.54 and the distributed
    # run matches it to ~1e-5, so bound the transient, not equilibrium
    assert 0.8 < kt < 1.8

"""End-to-end physics on the production nlist path (SURVEY.md §7.1 phases 2-3):
adaptive displacement-triggered rebuild loop (the Neighbor::decide analog),
kT parity, checked invariants, and dense-vs-nlist trajectory consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.core.system import System, SystemParams, run, run_adaptive, setup
from meso_tpu.obs import kinetic_temperature, total_momentum
from meso_tpu.ops.dpd import DPDParams


def _fluid(n=648, l=6.0, seed=0, **kw):
    box = Box.cubic(l)
    state = create_random(jax.random.PRNGKey(seed), n, box, kt=1.0)
    params = SystemParams.build(
        DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=928459))
    system = System.for_fluid([l] * 3, rc=1.0, density=n / l**3, dt=0.01, **kw)
    return system, params, setup(system, params, state)


@pytest.mark.slow
def test_kt_and_invariants_adaptive():
    system, params, state = _fluid()
    mass = params.mass[state.typ]
    p0 = np.asarray(total_momentum(state.v, mass, state.mask))

    state, diag = run_adaptive(system, params, state, 300)
    assert int(diag["cell_overflow"]) == 0
    assert int(diag["nlist_overflow"]) == 0
    nrb = int(diag["n_rebuilds"])
    assert 0 < nrb < 300, nrb
    # overshoot bounded by ~one step of motion beyond skin/2
    assert float(diag["worst_disp_at_rebuild"]) < system.cells.skin / 2 + 0.1

    kts = []
    for _ in range(20):
        state, _ = run_adaptive(system, params, state, 25)
        kts.append(float(kinetic_temperature(state.v, mass, state.mask)))
    kt_mean = float(np.mean(kts))
    assert abs(kt_mean - 1.0) < 0.03, f"kT={kt_mean}"

    p1 = np.asarray(total_momentum(state.v, mass, state.mask))
    assert np.abs(p1 - p0).max() < 5e-2
    # identity preserved across resorts
    assert (np.sort(np.asarray(state.tag)) == np.arange(1, 649)).all()


@pytest.mark.slow
def test_fixed_cadence_run_invariants():
    """Fixed-cadence loop: with a cadence matched to the skin, no capacity
    overflow and no skin violation."""
    system, params, state = _fluid(skin=0.5, rebuild_every=3)
    state, diags = run(system, params, state, nchunks=40)  # 120 steps
    assert int(jnp.sum(diags["cell_overflow"])) == 0
    assert int(jnp.sum(diags["nlist_overflow"])) == 0
    assert int(jnp.sum(diags["skin_violation"])) == 0
    assert bool(jnp.isfinite(state.x).all())


@pytest.mark.slow
def test_nlist_matches_dense_trajectory_short():
    """Same start, 20 steps: nlist and dense paths agree step-for-step
    (physics identical; only summation order differs)."""
    from meso_tpu.core.system import run_chunk

    sys_n, params, st_n = _fluid(n=324, l=6.0)  # rho 1.5, lighter dense matrix
    sys_d = System(dt=0.01, force_path="dense")
    # same initial state: use the nlist-setup state (sorted, forces set)
    st_d = st_n
    st_n, _ = run_adaptive(sys_n, params, st_n, 20)
    st_d = run_chunk(sys_d, params, st_d, 20)
    # compare by tag (nlist path resorts)
    order_n = np.argsort(np.asarray(st_n.tag))
    order_d = np.argsort(np.asarray(st_d.tag))
    xn = np.asarray(st_n.x)[order_n]
    xd = np.asarray(st_d.x)[order_d]
    assert np.abs(xn - xd).max() < 1e-4
    vn = np.asarray(st_n.v)[order_n]
    vd = np.asarray(st_d.v)[order_d]
    assert np.abs(vn - vd).max() < 1e-3

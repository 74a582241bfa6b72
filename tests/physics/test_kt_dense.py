"""Statistical-physics validation on the dense path (SURVEY.md §4 layer 2).

A small Groot-Warren fluid (rho=3, a=25, gamma=4.5, kT=1) must equilibrate
to kinetic temperature 1 within ~1% at dt=0.01, and total momentum must be
conserved to float roundoff (per-pair RNG symmetry guarantees bitwise
antisymmetric pair forces).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.core.system import System, SystemParams, run_chunk, setup
from meso_tpu.obs import kinetic_temperature, total_momentum
from meso_tpu.ops.dpd import DPDParams


def _fluid(n=648, l=6.0, kt=1.0, seed=0, rng_mode="tea"):
    box = Box.cubic(l)  # rho = 648/216 = 3.0
    state = create_random(jax.random.PRNGKey(seed), n, box, kt=kt)
    params = SystemParams.build(
        DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=kt, seed=928459))
    system = System(dt=0.01, lam=0.5, rng_mode=rng_mode, force_path="dense")
    return system, params, setup(system, params, state)


@pytest.mark.slow
@pytest.mark.parametrize("rng_mode", ["tea", "fast"])
def test_kt_equilibration(rng_mode):
    system, params, state = _fluid(rng_mode=rng_mode)
    mass = params.mass[state.typ]
    p0 = np.asarray(total_momentum(state.v, mass, state.mask))

    state = run_chunk(system, params, state, 500)  # equilibrate
    kts = []
    for _ in range(20):
        state = run_chunk(system, params, state, 25)
        kts.append(float(kinetic_temperature(state.v, mass, state.mask)))
    kt_mean = float(np.mean(kts))
    assert abs(kt_mean - 1.0) < 0.03, f"kT={kt_mean} ({rng_mode})"

    p1 = np.asarray(total_momentum(state.v, mass, state.mask))
    assert np.abs(p1 - p0).max() < 5e-2  # fp32 roundoff accumulation over 800 steps

    # positions stayed in the box, no NaNs
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    assert (x >= 0).all() and (x < 6.0).all()


@pytest.mark.slow
def test_kt_artifact_grows_with_dt():
    """Integrator artifact check (cond-mat/0302454): kT(dt=0.05) deviates
    more than kT(dt=0.01), both on the high side for lambda=0.5."""
    devs = {}
    for dt in (0.01, 0.05):
        system, params, state = _fluid()
        system = system.replace(dt=dt)
        state = setup(system, params, state.replace(f=jnp.zeros_like(state.f)))
        state = run_chunk(system, params, state, 400)
        mass = params.mass[state.typ]
        kts = []
        for _ in range(10):
            state = run_chunk(system, params, state, 20)
            kts.append(float(kinetic_temperature(state.v, mass, state.mask)))
        devs[dt] = abs(np.mean(kts) - 1.0)
    assert devs[0.05] > devs[0.01]


@pytest.mark.slow
def test_kt_within_one_percent_long_average():
    """BASELINE parity criterion: kT within 1% of target with proper
    sampling (measured 2026-08-16: lam=0.5/dt=0.01 -> 1.0088 +- 0.0089;
    lam=0.65 -> 1.0044; dt=0.04 -> 1.0377 — the Groot-Warren artifact)."""
    system, params, state = _fluid(rng_mode="fast")
    state = run_chunk(system, params, state, 500)
    mass = params.mass[state.typ]
    kts = []
    for _ in range(60):
        state = run_chunk(system, params, state, 20)
        kts.append(float(kinetic_temperature(state.v, mass, state.mask)))
    kts = np.asarray(kts)
    se = kts.std() / np.sqrt(len(kts) / 4)  # ~4-sample correlation blocks
    assert abs(kts.mean() - 1.0) < 0.01 + 2 * se, (kts.mean(), se)

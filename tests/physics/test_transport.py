"""eDPD/tDPD validation (BASELINE configs 3-4; SURVEY.md A.2-A.3, §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.core.system import run_adaptive
from meso_tpu.models.transport import edpd_slab, tdpd_diffusion
from meso_tpu.obs.profiles import field_profile


@pytest.mark.slow
def test_edpd_energy_conservation():
    """Free eDPD fluid (no thermostatted slabs): total energy
    (kinetic + Cv*T) conserved; internal T stays near kT."""
    from meso_tpu.obs.thermo import potential_energy_dense
    system, params, state = edpd_slab(l=5.0, cv=20.0, kappa=0.5)
    system = system.replace(fixes=())  # free running
    mass = params.mass[state.typ]

    def total_e(s):
        ke = 0.5 * float(jnp.sum(jnp.where(s.mask, mass * jnp.sum(s.v**2, -1), 0.0)))
        ie = float(params.pair.cv) * float(jnp.sum(jnp.where(s.mask, s.T, 0.0)))
        pe = float(potential_energy_dense(s.x, s.typ, s.mask, s.box,
                                          params.pair.a, params.pair.rc))
        return ke + ie + pe

    e0 = total_e(state)
    state, diag = run_adaptive(system, params, state, 300)
    e1 = total_e(state)
    assert int(diag["cell_overflow"]) == 0
    # q^C/q^R are pure exchange; q^V balances thermostat KE loss; the
    # conservative PE is included, so total energy must be conserved
    assert abs(e1 - e0) / abs(e0) < 0.01, (e0, e1)
    t = np.asarray(state.T)[np.asarray(state.mask)]
    assert np.isfinite(t).all() and (t > 0.3).all() and (t < 3.0).all()


@pytest.mark.slow
def test_edpd_fourier_slab_profile():
    """Thermostatted hot/cold slabs -> monotone steady temperature profile
    between them with the right ordering."""
    system, params, state = edpd_slab(l=8.0, cv=30.0, kappa=2.0,
                                      t_hot=1.3, t_cold=0.7)
    state, _ = run_adaptive(system, params, state, 1200)
    # average T(x) over a few samples
    nb = 16
    acc = np.zeros(nb)
    cnt_acc = np.zeros(nb)
    for _ in range(10):
        state, _ = run_adaptive(system, params, state, 30)
        xc, tbar, cnt = field_profile(state, state.T[:, None], axis=0,
                                      nbins=nb)
        acc += np.asarray(tbar[:, 0]) * np.asarray(cnt)
        cnt_acc += np.asarray(cnt)
    tprof = acc / np.maximum(cnt_acc, 1)
    xc = np.asarray(xc)
    # hot slab is [0,1), cold is [4,5): check ordering + monotone decrease
    # across the first channel (1..4)
    chan = (xc > 1.2) & (xc < 3.8)
    assert tprof[0] > 1.2 and tprof[8] < 0.8
    grad = np.diff(tprof[(xc > 0.8) & (xc < 4.2)])
    assert (grad < 0.05).all()  # essentially monotone decreasing
    # interior approximately linear: middle value near mean of boundaries
    mid = tprof[(xc > 2.2) & (xc < 2.8)].mean()
    assert abs(mid - 1.0) < 0.08


@pytest.mark.slow
def test_tdpd_mass_conservation_and_decay():
    """Cosine concentration mode: total C conserved to roundoff, amplitude
    decays exponentially, concentration stays positive."""
    system, params, state = tdpd_diffusion(l=8.0, kappa_c=2.0, eps_c=0.0)
    mask = np.asarray(state.mask)

    def mode_amp(s):
        x = np.asarray(s.x)[mask, 0]
        c = np.asarray(s.C)[mask, 0]
        return 2 * np.mean(c * np.cos(2 * np.pi * x / 8.0))

    c_tot0 = float(jnp.sum(jnp.where(state.mask, state.C[:, 0], 0.0)))
    a0 = mode_amp(state)
    assert a0 > 0.3
    amps = [a0]
    for _ in range(6):
        state, _ = run_adaptive(system, params, state, 100)
        amps.append(mode_amp(state))
    c_tot1 = float(jnp.sum(jnp.where(state.mask, state.C[:, 0], 0.0)))
    assert abs(c_tot1 - c_tot0) / abs(c_tot0) < 1e-4  # antisymmetric fluxes
    amps = np.asarray(amps)
    assert (np.diff(amps) < 0).all(), amps          # monotone decay
    assert amps[-1] < 0.5 * amps[0]                 # substantial decay
    # roughly exponential: log-linear fit residual small
    t = np.arange(len(amps), dtype=float)
    k, b = np.polyfit(t, np.log(np.maximum(amps, 1e-9)), 1)
    resid = np.log(amps) - (k * t + b)
    assert np.abs(resid).max() < 0.25
    c = np.asarray(state.C)[mask, 0]
    assert (c > -0.05).all()


@pytest.mark.slow
def test_tdpd_random_flux_conserves_mass():
    """With eps_c > 0 the antisymmetric random flux still conserves sum(C)."""
    system, params, state = tdpd_diffusion(l=5.0, kappa_c=1.0, eps_c=0.3)
    c_tot0 = float(jnp.sum(jnp.where(state.mask, state.C[:, 0], 0.0)))
    state, _ = run_adaptive(system, params, state, 200)
    c_tot1 = float(jnp.sum(jnp.where(state.mask, state.C[:, 0], 0.0)))
    assert abs(c_tot1 - c_tot0) / abs(c_tot0) < 1e-4

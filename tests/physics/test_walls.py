"""Config-2 validation: Poiseuille parabola + viscosity, Couette linear
profile, frozen walls, bounce-back confinement (SURVEY.md A.5, §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.core.system import run_adaptive
from meso_tpu.models.walls import couette, poiseuille
from meso_tpu.obs.profiles import velocity_profile


def _averaged_profile(system, params, state, nsteps_equil, nsamples,
                      sample_every, nbins, h):
    state, diag = run_adaptive(system, params, state, nsteps_equil)
    assert int(diag["cell_overflow"]) == 0
    acc = np.zeros(nbins)
    cnt_acc = np.zeros(nbins)
    for _ in range(nsamples):
        state, _ = run_adaptive(system, params, state, sample_every)
        y, u, cnt = velocity_profile(state, axis=1, flow_axis=0,
                                     nbins=nbins, typ=0)
        cnt = np.asarray(cnt)
        acc += np.asarray(u) * cnt
        cnt_acc += cnt
    u_mean = acc / np.maximum(cnt_acc, 1.0)
    return state, np.asarray(y), u_mean, cnt_acc


@pytest.mark.slow
def test_poiseuille_parabola_and_viscosity():
    g, h, w = 0.1, 6.0, 1.0
    system, params, state = poiseuille(g=g, h=h, wall_width=w)
    state, y, u, cnt = _averaged_profile(system, params, state,
                                         nsteps_equil=1500, nsamples=40,
                                         sample_every=25, nbins=24, h=h)
    # fluid bins only (channel [1, 5])
    sel = (y > w + 0.15) & (y < h - w - 0.15) & (cnt > 0)
    ys, us = y[sel], u[sel]
    # fit u = c0 + c1 y + c2 y^2
    A = np.stack([np.ones_like(ys), ys, ys * ys], 1)
    coef, res, *_ = np.linalg.lstsq(A, us, rcond=None)
    u_fit = A @ coef
    u_max = us.max()
    assert u_max > 0.2  # flow actually developed
    rms = np.sqrt(np.mean((us - u_fit) ** 2))
    assert rms / u_max < 0.08, f"not parabolic: rms={rms}, umax={u_max}"
    assert coef[2] < 0  # concave
    # viscosity from curvature: u'' = -rho g / eta
    rho = 3.0
    eta = -rho * g / (2 * coef[2])
    assert 0.5 < eta < 2.0, f"eta={eta} outside plausible DPD range"
    # vertex near channel center
    y_vertex = -coef[1] / (2 * coef[2])
    assert abs(y_vertex - h / 2) < 0.4
    # no particle escaped into/through the walls' periodic images
    x = np.asarray(state.x)
    typ = np.asarray(state.typ)[np.asarray(state.mask)]
    xy = x[np.asarray(state.mask)][:, 1]
    assert ((xy[typ == 0] > w - 0.2) & (xy[typ == 0] < h - w + 0.2)).all()


@pytest.mark.slow
def test_couette_linear_profile():
    u0, h, w = 1.0, 6.0, 1.0
    system, params, state = couette(u=u0, h=h, wall_width=w)
    state, y, u, cnt = _averaged_profile(system, params, state,
                                         nsteps_equil=1500, nsamples=40,
                                         sample_every=25, nbins=24, h=h)
    sel = (y > w + 0.15) & (y < h - w - 0.15) & (cnt > 0)
    ys, us = y[sel], u[sel]
    A = np.stack([np.ones_like(ys), ys], 1)
    coef, *_ = np.linalg.lstsq(A, us, rcond=None)
    slope_expect = u0 / (h - 2 * w)
    assert abs(coef[1] - slope_expect) / slope_expect < 0.25, coef
    u_fit = A @ coef
    rms = np.sqrt(np.mean((us - u_fit) ** 2))
    assert rms < 0.1 * u0
    # antisymmetric about the center
    assert abs(coef[0] + coef[1] * h / 2) < 0.1 * u0


@pytest.mark.slow
def test_frozen_wall_beads_do_not_move():
    system, params, state = poiseuille(g=0.1)
    wall_sel = np.asarray(state.typ) == 1
    x0 = np.asarray(state.x)[wall_sel]
    state, _ = run_adaptive(system, params, state, 100)
    # compare by tag (resorts permute rows)
    tags0 = np.asarray(state.tag)
    order = np.argsort(tags0)
    full0 = np.zeros((state.n, 3))
    # rebuild reference by tag from initial state
    system2, params2, state2 = poiseuille(g=0.1)
    t_init = np.asarray(state2.tag)
    x_init = np.asarray(state2.x)
    typ_init = np.asarray(state2.typ)
    pos_by_tag = {int(t): x_init[i] for i, t in enumerate(t_init)
                  if typ_init[i] == 1}
    x_now = np.asarray(state.x)
    typ_now = np.asarray(state.typ)
    mask_now = np.asarray(state.mask)
    moved = 0.0
    for i in range(state.n):
        if mask_now[i] and typ_now[i] == 1:
            moved = max(moved, np.abs(
                x_now[i] - pos_by_tag[int(tags0[i])]).max())
    assert moved == 0.0


@pytest.mark.slow
def test_muller_plathe_viscosity():
    """fix viscosity analog (row 15): reverse-NEMD momentum swaps give a
    linear profile whose slope + imposed flux yield eta ~ 1.0 for the
    standard GW fluid (rho=3, a=25, gamma=4.5) — cross-checks the
    Poiseuille estimate with an independent method."""
    from meso_tpu.models.classic import classic_fluid
    from meso_tpu.obs.viscosity import run_viscosity_mp

    system, params, state = classic_fluid(l=8.0, force_path="bucket",
                                          skin=0.4)
    eta, det = run_viscosity_mp(system, params, state, nswaps=150,
                                swap_every=10)
    assert det["flux"] > 0
    assert 0.6 < eta < 1.6, (eta, det["flux"], det["slope"])

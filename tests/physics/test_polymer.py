"""Config-5 validation: FENE chains + membrane vesicle in DPD solvent
(SURVEY.md A.4, §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.core.system import run_adaptive
from meso_tpu.models.polymer import membrane_suspension, polymer_melt
from meso_tpu.obs import total_momentum


def _bond_lengths(state, bond_tags):
    mask = np.asarray(state.mask)
    tag = np.asarray(state.tag)
    pos = {int(t): np.asarray(state.x)[i] for i, t in enumerate(tag)
           if mask[i]}
    box_l = float(state.box.lengths[0])
    out = []
    for (a, b) in np.asarray(bond_tags):
        d = pos[int(a)] - pos[int(b)]
        d -= np.round(d / box_l) * box_l
        out.append(np.linalg.norm(d))
    return np.asarray(out)


@pytest.mark.slow
def test_fene_chains_stay_bonded():
    system, params, state = polymer_melt(l=6.0, n_chains=3, chain_len=10)
    mass = params.mass[state.typ]
    p0 = np.asarray(total_momentum(state.v, mass, state.mask))
    state, diag = run_adaptive(system, params, state, 400)
    assert int(diag["cell_overflow"]) == 0
    bl = _bond_lengths(state, params.bonded.bond_tags)
    # FENE R0=1.5: all bonds strictly below the divergence. With soft DPD
    # repulsion (a=25, no WCA) the K=30/R0=1.5 spring equilibrates short:
    # pairwise balance 30 r/(1-(r/1.5)^2) = 25(1-r) gives r ~ 0.45.
    assert bl.max() < 1.45, bl.max()
    assert 0.30 < bl.mean() < 0.75, bl.mean()
    assert bool(jnp.isfinite(state.x).all())
    p1 = np.asarray(total_momentum(state.v, mass, state.mask))
    assert np.abs(p1 - p0).max() < 5e-2


@pytest.mark.slow
def test_membrane_conserves_area_volume():
    system, params, state, mesh = membrane_suspension(
        l=10.0, radius=2.5, subdiv=1, density=3.0)
    state, diag = run_adaptive(system, params, state, 300)
    assert int(diag["cell_overflow"]) == 0
    # recompute area/volume from current vertex positions
    mask = np.asarray(state.mask)
    tag = np.asarray(state.tag)
    pos = np.zeros((mesh["n_mem"] + 1, 3))
    for i, t in enumerate(tag):
        if mask[i] and t <= mesh["n_mem"]:
            pos[int(t)] = np.asarray(state.x)[i]
    faces = mesh["faces"]
    p0 = pos[faces[:, 0] + 1]
    e1 = pos[faces[:, 1] + 1] - p0
    e2 = pos[faces[:, 2] + 1] - p0
    cr = np.cross(e1, e2)
    area = 0.5 * np.linalg.norm(cr, axis=1).sum()
    vol = abs((p0 * cr).sum() / 6.0)
    assert abs(area - mesh["area0"]) / mesh["area0"] < 0.10, area
    assert abs(vol - mesh["vol0"]) / mesh["vol0"] < 0.10, vol
    bl = _bond_lengths(state, params.bonded.bond_tags)
    assert bl.max() < mesh["l_max"], (bl.max(), mesh["l_max"])

"""Distributed bonded systems (BASELINE config 5 under 1-D DD): FENE
polymer chains and a membrane vesicle decomposed across slabs, with
trajectory parity vs the single-chip engine (SURVEY §4 item 3 — the
rank-invariance analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.core.box import Box
from meso_tpu.core.rng import maxwell_velocities
from meso_tpu.core.state import zeros_state
from meso_tpu.core.system import (System, SystemParams, run_bucket_chunked,
                                  setup)
from meso_tpu.ops.bonded import BondedParams
from meso_tpu.ops.dpd import DPDParams
from meso_tpu.parallel.domain import (build_domain, collect_state,
                                      distribute_state, make_mesh_1d,
                                      run_distributed)


def _polymer_skinny(n_dev=4, cols_per_dev=3, special_weight=None,
                    rebuild_every=3):
    """FENE chains + solvent in a skinny slab-decomposable box."""
    side, rc, skin = 1.2, 1.0, 0.2
    lx = cols_per_dev * n_dev * side
    lyz = 4 * side
    density = 3.0
    n = int(round(density * lx * lyz * lyz))
    rs = np.random.RandomState(11)

    n_chains, chain_len = 6, 10
    n_poly = n_chains * chain_len
    chains = []
    for c in range(n_chains):
        pos = [np.array([rs.uniform(0, lx), rs.uniform(0, lyz),
                         rs.uniform(0, lyz)])]
        for _ in range(chain_len - 1):
            d = rs.normal(size=3)
            d *= 0.8 / np.linalg.norm(d)
            pos.append(pos[-1] + d)
        chains.append(np.asarray(pos) % [lx, lyz, lyz])
    x_poly = np.concatenate(chains)
    x_solv = rs.uniform(0, 1, (n - n_poly, 3)) * [lx, lyz, lyz]
    x = jnp.asarray(np.concatenate([x_poly, x_solv]), jnp.float32)

    box = Box.orthorhombic(lx, lyz, lyz)
    state = zeros_state(n, box)
    state = state.replace(
        x=x, v=maxwell_velocities(jax.random.PRNGKey(2), n, 1.0, 1.0),
        tag=jnp.arange(1, n + 1, dtype=jnp.int32),
        mask=jnp.ones(n, bool))

    bonds = []
    for c in range(n_chains):
        base = c * chain_len + 1
        bonds += [(base + b, base + b + 1) for b in range(chain_len - 1)]
    bonded = BondedParams(
        bond_tags=jnp.asarray(np.asarray(bonds, np.int32)),
        bond_type=jnp.zeros(len(bonds), jnp.int32),
        bond_coeffs=jnp.asarray([[30.0, 1.5, 0.0, 0.0]], jnp.float32))
    pair = DPDParams.build(a=25.0, gamma=4.5, rc=rc, kt=1.0, seed=99)
    if special_weight is not None:
        from meso_tpu.ops.dpd import build_exclusions
        excl, w = build_exclusions(np.asarray(bonds, np.int32), n,
                                   weight=special_weight, max_excl=2)
        pair = pair.replace(excl=excl, excl_w=w)
    params = SystemParams.build(pair).replace(bonded=bonded)
    system = System.for_fluid([lx, lyz, lyz], rc=rc, density=density,
                              dt=0.01, skin=skin, rng_mode="fast",
                              rebuild_every=rebuild_every)
    system = system.replace(force_path="bucket", bond_style="fene",
                            n_tags=n)
    state = setup(system, params, state)
    dcfg = build_domain(system, n_dev, lx_global=lx,
                        rebuild_every=rebuild_every)
    return system, params, state, dcfg, lx


def _bytag(state, fields=("x", "v")):
    mask = np.asarray(state.mask)
    tag = np.asarray(state.tag)[mask]
    order = np.argsort(tag)
    return {f: np.asarray(getattr(state, f))[mask][order] for f in fields}


def _run_both(system, params, state, dcfg, nchunks):
    mesh = make_mesh_1d(dcfg.n_dev)
    dstate = distribute_state(state, dcfg)
    dstate, diag = run_distributed(system, params, dstate, nchunks, mesh,
                                   dcfg)
    assert int(jnp.max(diag["overflow"])) == 0
    assert int(jnp.max(diag["bonded_missing"])) == 0
    dist = collect_state(dstate)
    single, _ = run_bucket_chunked(system, params, state, nchunks,
                                   dcfg.rebuild_every)
    return _bytag(dist), _bytag(single)


@pytest.mark.slow
def test_polymer_distributed_matches_single():
    system, params, state, dcfg, _ = _polymer_skinny(n_dev=4)
    a, b = _run_both(system, params, state, dcfg, nchunks=2)
    assert np.abs(a["x"] - b["x"]).max() < 1e-4
    assert np.abs(a["v"] - b["v"]).max() < 1e-3


@pytest.mark.slow
def test_polymer_distributed_special_bonds():
    """Exclusion weights ride the distributed sweep (SURVEY §2a row 7)."""
    system, params, state, dcfg, _ = _polymer_skinny(n_dev=2,
                                                     special_weight=0.25)
    a, b = _run_both(system, params, state, dcfg, nchunks=2)
    assert np.abs(a["x"] - b["x"]).max() < 1e-4
    assert np.abs(a["v"] - b["v"]).max() < 1e-3


@pytest.mark.slow
def test_membrane_distributed_matches_single():
    """Vesicle spanning both slabs: WLC-POW edges, hinges, global+local
    area and volume (psum'd scalars) — parity vs single chip."""
    from meso_tpu.models.polymer import membrane_suspension

    side = 1.3125
    lx = 6 * side   # ncx = 6 -> 2 devices x 3 columns
    system, params, state, info = membrane_suspension(
        l=lx, radius=2.5, subdiv=2, force_path="bucket", skin=0.3,
        init_seed=8)
    system = system.replace(cells=system.cells)  # unchanged; explicitness
    dcfg = build_domain(system, 2, lx_global=lx, rebuild_every=3)
    a, b = _run_both(system, params, state, dcfg, nchunks=2)
    assert np.abs(a["x"] - b["x"]).max() < 1e-4
    assert np.abs(a["v"] - b["v"]).max() < 1e-3


def test_missing_partner_invariant():
    """A bond whose partner is beyond one-cell halo reach must be counted,
    not silently dropped."""
    system, params, state, dcfg, lx = _polymer_skinny(n_dev=4)
    # add a bond between two far-apart solvent particles (tags at opposite
    # box ends -> partners never within halo reach of one brick)
    xs = np.asarray(state.x)
    mask = np.asarray(state.mask)
    tags = np.asarray(state.tag)
    lo = tags[mask & (xs[:, 0] < 0.5)][0]
    hi = tags[mask & (np.abs(xs[:, 0] - lx / 2) < 0.5)][0]
    b = params.bonded
    bt = np.concatenate([np.asarray(b.bond_tags), [[lo, hi]]]).astype(
        np.int32)
    params = params.replace(bonded=b.replace(
        bond_tags=jnp.asarray(bt),
        bond_type=jnp.zeros(len(bt), jnp.int32)))
    mesh = make_mesh_1d(4)
    dstate = distribute_state(state, dcfg)
    dstate, diag = run_distributed(system, params, dstate, 1, mesh, dcfg)
    assert int(jnp.max(diag["bonded_missing"])) > 0


def _polymer_box(lx, ly, lz, rebuild_every=3):
    side, rc, skin = 1.2, 1.0, 0.2
    density = 3.0
    n = int(round(density * lx * ly * lz))
    rs = np.random.RandomState(13)
    n_chains, chain_len = 6, 10
    n_poly = n_chains * chain_len
    chains = []
    for c in range(n_chains):
        pos = [np.array([rs.uniform(0, lx), rs.uniform(0, ly),
                         rs.uniform(0, lz)])]
        for _ in range(chain_len - 1):
            d = rs.normal(size=3)
            d *= 0.8 / np.linalg.norm(d)
            pos.append(pos[-1] + d)
        chains.append(np.asarray(pos) % [lx, ly, lz])
    x = np.concatenate([np.concatenate(chains),
                        rs.uniform(0, 1, (n - n_poly, 3)) * [lx, ly, lz]])
    box = Box.orthorhombic(lx, ly, lz)
    state = zeros_state(n, box)
    state = state.replace(
        x=jnp.asarray(x, jnp.float32),
        v=maxwell_velocities(jax.random.PRNGKey(3), n, 1.0, 1.0),
        tag=jnp.arange(1, n + 1, dtype=jnp.int32), mask=jnp.ones(n, bool))
    bonds = []
    for c in range(n_chains):
        base = c * chain_len + 1
        bonds += [(base + b, base + b + 1) for b in range(chain_len - 1)]
    bonded = BondedParams(
        bond_tags=jnp.asarray(np.asarray(bonds, np.int32)),
        bond_type=jnp.zeros(len(bonds), jnp.int32),
        bond_coeffs=jnp.asarray([[30.0, 1.5, 0.0, 0.0]], jnp.float32))
    params = SystemParams.build(
        DPDParams.build(a=25.0, gamma=4.5, rc=rc, kt=1.0, seed=99)).replace(
        bonded=bonded)
    system = System.for_fluid([lx, ly, lz], rc=rc, density=density,
                              dt=0.01, skin=skin, rng_mode="fast",
                              rebuild_every=rebuild_every)
    system = system.replace(force_path="bucket", bond_style="fene", n_tags=n)
    state = setup(system, params, state)
    return system, params, state


@pytest.mark.slow
def test_polymer_distributed_2d_matches_single():
    """FENE chains under 2-D brick decomposition (corner ghosts via the
    sequential reach-1 exchange) vs single chip."""
    from meso_tpu.parallel.domain2d import (build_domain2d, collect_state_2d,
                                            distribute_state_2d, make_mesh_2d,
                                            run_distributed_2d)

    side = 1.2
    lx = ly = 2 * 3 * side
    lz = 4 * side
    system, params, state = _polymer_box(lx, ly, lz)
    dcfg = build_domain2d(system, 2, 2, lx, ly, rebuild_every=3)
    mesh = make_mesh_2d(2, 2)
    dstate = distribute_state_2d(state, dcfg)
    dstate, diag = run_distributed_2d(system, params, dstate, 2, mesh, dcfg)
    assert int(np.max(np.asarray(diag["overflow"]))) == 0
    assert int(np.max(np.asarray(diag["bonded_missing"]))) == 0
    a = _bytag(collect_state_2d(dstate))
    single, _ = run_bucket_chunked(system, params, state, 2, 3)
    b = _bytag(single)
    assert np.abs(a["x"] - b["x"]).max() < 1e-4
    assert np.abs(a["v"] - b["v"]).max() < 1e-3


@pytest.mark.slow
def test_polymer_distributed_3d_matches_single():
    from meso_tpu.parallel.domain3d import (build_domain3d, collect_state_3d,
                                            distribute_state_3d, make_mesh_3d,
                                            run_distributed_3d)

    side = 1.2
    lx = ly = lz = 2 * 3 * side
    system, params, state = _polymer_box(lx, ly, lz)
    dcfg = build_domain3d(system, 2, 2, 2, lx, ly, lz, rebuild_every=3)
    mesh = make_mesh_3d(2, 2, 2)
    dstate = distribute_state_3d(state, dcfg)
    dstate, diag = run_distributed_3d(system, params, dstate, 2, mesh, dcfg)
    assert int(np.max(np.asarray(diag["overflow"]))) == 0
    assert int(np.max(np.asarray(diag["bonded_missing"]))) == 0
    a = _bytag(collect_state_3d(dstate))
    single, _ = run_bucket_chunked(system, params, state, 2, 3)
    b = _bytag(single)
    assert np.abs(a["x"] - b["x"]).max() < 1e-4
    assert np.abs(a["v"] - b["v"]).max() < 1e-3

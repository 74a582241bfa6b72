"""Round-3 distributed coverage (VERDICT r3 item 3): the right-spill
layout under 1-D DD (2-column halos) and the FUSED eDPD/tDPD kernels on
halo-extended bricks — interpret mode on the CPU mesh.

Spill parity is checked against the SINGLE-CHIP spill engine (the
distributed sweep cannot read a spill layout); the model kernels are
checked against the distributed sweep on strict bricks and against the
single-chip fused path on spill bricks. The counter RNG makes trajectories
decomposition-invariant, so positions/velocities/fields match to float
tolerance.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

os.environ.setdefault("MESO_PALLAS_INTERPRET", "1")

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random, zeros_state
from meso_tpu.core.system import (System, SystemParams, run_bucket_chunked,
                                  setup)
from meso_tpu.ops.dpd import DPDParams
from meso_tpu.parallel.domain import (build_domain, collect_state,
                                      distribute_state, make_mesh_1d,
                                      run_distributed)


def _bytag(state, fields=("x", "v")):
    mask = np.asarray(state.mask)
    tag = np.asarray(state.tag)[mask]
    order = np.argsort(tag)
    out = {f: np.asarray(getattr(state, f))[mask][order] for f in fields
           if getattr(state, f) is not None}
    return out


def _fluid_spill(n_dev=2, cols_per_dev=5, n_types=1):
    """Slab-decomposable fluid whose GLOBAL config uses spill packing."""
    rc, skin = 1.0, 0.2
    side = rc + skin
    density = 3.0
    lx = n_dev * cols_per_dev * side
    lyz = 4 * side
    n = int(round(density * lx * lyz * lyz))
    box = Box.orthorhombic(lx, lyz, lyz)
    state = create_random(jax.random.PRNGKey(5), n, box, kt=1.0)
    pair = DPDParams.build(a=25.0, gamma=4.5, rc=rc, kt=1.0, seed=31,
                           n_types=n_types)
    if n_types > 1:
        state = state.replace(typ=jnp.arange(n, dtype=jnp.int32) % n_types)
        pair = pair.replace(a=pair.a * jnp.asarray([[1.0, 1.5], [1.5, 2.0]]))
    params = SystemParams.build(pair)
    system = System.for_fluid([lx, lyz, lyz], rc=rc, density=density,
                              dt=0.01, skin=skin, rng_mode="fast",
                              rebuild_every=3, spill=True)
    system = system.replace(force_path="pallas")
    assert system.cells.spill
    state = setup(system.replace(force_path="dense"), params, state)
    return system, params, state, lx


def _run_dist(system, params, state, lx, n_dev, nchunks=2):
    dcfg = build_domain(system, n_dev, lx_global=lx, rebuild_every=3)
    assert dcfg.cells.spill == system.cells.spill
    mesh = make_mesh_1d(n_dev)
    dstate = distribute_state(state, dcfg)
    dstate, diag = run_distributed(system, params, dstate, nchunks, mesh,
                                   dcfg)
    assert int(np.max(np.asarray(diag["overflow"]))) == 0
    return collect_state(dstate)


@pytest.mark.slow
@pytest.mark.parametrize("n_types", [1, 2])
def test_spill_dist_matches_single_chip(n_types):
    """Distributed spill (2-column halos, in-brick no-wrap spill) follows
    the single-chip spill trajectory."""
    system, params, state, lx = _fluid_spill(n_types=n_types)
    dist = _bytag(_run_dist(system, params, state, lx, 2))
    single, _ = run_bucket_chunked(system, params, state, 2, 3)
    ref = _bytag(single)
    assert np.abs(dist["x"] - ref["x"]).max() < 1e-4
    assert np.abs(dist["v"] - ref["v"]).max() < 1e-3


def _transport(model, n_dev=2, spill=False):
    from meso_tpu.ops.edpd import EDPDParams
    from meso_tpu.ops.tdpd import TDPDParams

    rc, skin = 1.0, 0.2
    side = rc + skin
    density = 3.0
    lx = n_dev * (5 if spill else 3) * side
    lyz = 4 * side
    n = int(round(density * lx * lyz * lyz))
    box = Box.orthorhombic(lx, lyz, lyz)
    st = create_random(jax.random.PRNGKey(9), n, box, kt=1.0)
    base = zeros_state(n, box, with_energy=(model == "edpd"),
                       n_species=1 if model == "tdpd" else 0)
    st = base.replace(x=st.x, v=st.v, tag=st.tag, typ=st.typ,
                      mask=jnp.ones(n, bool))
    if model == "edpd":
        pair = EDPDParams.build(a=25.0, gamma=4.5, rc=rc, seed=3,
                                kappa=0.5, cv=100.0)
        st = st.replace(T=1.0 + 0.2 * jnp.sin(
            2 * jnp.pi * st.x[:, 0] / lx))
    else:
        pair = TDPDParams.build(a=25.0, gamma=4.5, rc=rc, kt=1.0, seed=3,
                                kappa_c=[0.5], eps_c=[0.0], rcc=rc)
        st = st.replace(C=(st.x[:, :1] < lx / 2).astype(jnp.float32))
    params = SystemParams.build_raw(pair)
    system = System.for_fluid([lx, lyz, lyz], rc=rc, density=density,
                              dt=0.01, skin=skin, rng_mode="fast",
                              rebuild_every=3, spill=spill)
    system = system.replace(model=model, force_path="pallas")
    state = setup(system.replace(force_path="dense"), params, st)
    return system, params, state, lx


@pytest.mark.slow
@pytest.mark.parametrize("model", ["edpd", "tdpd"])
def test_model_fused_dist_matches_sweep(model):
    """Distributed fused eDPD/tDPD (strict bricks) vs the distributed
    sweep: same halos, same RNG -> same trajectory + fields."""
    system, params, state, lx = _transport(model)
    field = ("T",) if model == "edpd" else ("C",)
    dist_pallas = _bytag(_run_dist(system, params, state, lx, 2),
                         ("x", "v") + field)
    dist_sweep = _bytag(
        _run_dist(system.replace(force_path="bucket"), params, state, lx, 2),
        ("x", "v") + field)
    assert np.abs(dist_pallas["x"] - dist_sweep["x"]).max() < 1e-4
    assert np.abs(dist_pallas["v"] - dist_sweep["v"]).max() < 1e-3
    fname = field[0]
    scale = max(1.0, np.abs(dist_sweep[fname]).max())
    assert np.abs(dist_pallas[fname] - dist_sweep[fname]).max() / scale \
        < 1e-4


@pytest.mark.slow
def test_model_fused_dist_spill_matches_single_chip():
    """Distributed fused eDPD on SPILL bricks vs the single-chip fused
    engine (the production kernel config, now reachable on a mesh)."""
    system, params, state, lx = _transport("edpd", spill=True)
    assert system.cells.spill
    dist = _bytag(_run_dist(system, params, state, lx, 2), ("x", "v", "T"))
    single, _ = run_bucket_chunked(system, params, state, 2, 3)
    ref = _bytag(single, ("x", "v", "T"))
    assert np.abs(dist["x"] - ref["x"]).max() < 1e-4
    assert np.abs(dist["v"] - ref["v"]).max() < 1e-3
    assert np.abs(dist["T"] - ref["T"]).max() < 1e-4


@pytest.mark.slow
@pytest.mark.parametrize("spill", [False, True])
def test_dd_overlap_split_matches_monolithic(spill):
    """The border/inner overlap split (SURVEY row 28: interior kernel call
    with no data dependency on the halo permutes + boundary-window calls)
    computes the same trajectory as the single padded-brick kernel call —
    same sources per target, so only the call partitioning differs."""
    if spill:
        system, params, state, lx = _fluid_spill(n_dev=2)
    else:
        rc, skin = 1.0, 0.2
        side = rc + skin
        density = 3.0
        lx, lyz = 2 * 3 * side, 4 * side
        box = Box.orthorhombic(lx, lyz, lyz)
        st = create_random(jax.random.PRNGKey(17),
                           int(round(density * lx * lyz * lyz)), box, kt=1.0)
        params = SystemParams.build(DPDParams.build(
            a=25.0, gamma=4.5, rc=rc, kt=1.0, seed=31))
        system = System.for_fluid([lx, lyz, lyz], rc=rc, density=density,
                                  dt=0.01, skin=skin, rng_mode="fast",
                                  rebuild_every=3).replace(
                                      force_path="pallas")
        state = setup(system.replace(force_path="dense"), params, st)
    outs = {}
    for ov in (True, False):
        outs[ov] = _bytag(_run_dist(system.replace(dd_overlap=ov), params,
                                    state, lx, 2))
    assert np.abs(outs[True]["x"] - outs[False]["x"]).max() < 1e-6
    assert np.abs(outs[True]["v"] - outs[False]["v"]).max() < 1e-5

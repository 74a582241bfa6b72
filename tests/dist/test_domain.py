"""Distributed domain-decomposition tests on the 8-device CPU mesh
(SURVEY.md §4 item 3: shard_map halo logic without a cluster; the
decomposition-invariance analog of the reference's rank-invariance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.core.system import System, SystemParams, make_step
from meso_tpu.neighbor.bucket_layout import rebuild_buckets, to_bucket_state
from meso_tpu.parallel.domain import (build_domain, collect_state,
                                      distribute_state, make_mesh_1d,
                                      run_distributed)


def _fluid(n_dev=4, rebuild_every=5, cols_per_dev=3):
    """Orthorhombic box sized so ncx = 3*n_dev with cell side 1.2."""
    from meso_tpu.core.box import Box
    from meso_tpu.core.state import create_random
    from meso_tpu.core.system import setup
    from meso_tpu.ops.dpd import DPDParams

    side, rc, skin = 1.2, 1.0, 0.2
    lx = cols_per_dev * n_dev * side
    lyz = 4 * side
    density = 3.0
    n = int(round(density * lx * lyz * lyz))
    box = Box.orthorhombic(lx, lyz, lyz)
    state = create_random(jax.random.PRNGKey(0), n, box, kt=1.0)
    params = SystemParams.build(
        DPDParams.build(a=25.0, gamma=4.5, rc=rc, kt=1.0, seed=928459))
    system = System.for_fluid([lx, lyz, lyz], rc=rc, density=density,
                              dt=0.01, skin=skin, rng_mode="fast",
                              rebuild_every=rebuild_every)
    system = system.replace(force_path="bucket")
    state = setup(system, params, state)
    dcfg = build_domain(system, n_dev, lx_global=lx,
                        rebuild_every=rebuild_every)
    return system, params, state, dcfg, lx


def _bytag(state, fields=("x", "v")):
    mask = np.asarray(state.mask)
    tag = np.asarray(state.tag)[mask]
    order = np.argsort(tag)
    return {f: np.asarray(getattr(state, f))[mask][order] for f in fields}


def test_distribute_collect_roundtrip():
    system, params, state, dcfg, _ = _fluid()
    dstate = distribute_state(state, dcfg)
    back = collect_state(dstate)
    a = _bytag(state)
    b = _bytag(back)
    assert (a["x"] == b["x"]).all()
    assert (a["v"] == b["v"]).all()


@pytest.mark.slow
def test_distributed_matches_single_chip_short():
    """15 steps on 4 devices == 15 steps single-chip bucket path (by tag,
    summation-order tolerance). The counter-based RNG makes the physics
    decomposition-invariant."""
    system, params, state, dcfg, lx = _fluid(n_dev=4, rebuild_every=5)
    mesh = make_mesh_1d(4)
    dstate = distribute_state(state, dcfg)
    dstate, diag = run_distributed(system, params, dstate, 3, mesh, dcfg)
    assert int(np.max(np.asarray(diag["overflow"]))) == 0
    got = _bytag(collect_state(dstate))

    # single-chip reference: same fixed cadence on the bucket path
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
    dx = np.abs(got["x"] - want["x"]).max()
    dv = np.abs(got["v"] - want["v"]).max()
    assert dx < 2e-4, dx
    assert dv < 2e-3, dv


@pytest.mark.slow
def test_distributed_8dev_invariants_and_kt():
    from meso_tpu.obs import kinetic_temperature, total_momentum

    system, params, state, dcfg, lx = _fluid(n_dev=8, rebuild_every=5)
    mesh = make_mesh_1d(8)
    dstate = distribute_state(state, dcfg)
    mass0 = params.mass[state.typ]
    p0 = np.asarray(total_momentum(state.v, mass0, state.mask))
    n0 = int(state.n_valid())

    dstate, diag = run_distributed(system, params, dstate, 80, mesh, dcfg)
    assert int(np.max(np.asarray(diag["overflow"]))) == 0
    final = collect_state(dstate)
    # no particle lost or duplicated through migration
    assert int(final.n_valid()) == n0
    tags = np.sort(np.asarray(final.tag)[np.asarray(final.mask)])
    assert (tags == np.arange(1, n0 + 1)).all()

    mass = params.mass[final.typ]
    kt = float(kinetic_temperature(final.v, mass, final.mask))
    assert abs(kt - 1.0) < 0.06  # single sample after 400 steps
    p1 = np.asarray(total_momentum(final.v, mass, final.mask))
    assert np.abs(p1 - p0).max() < 5e-2
    # every particle is inside its owner's slab
    x = np.asarray(final.x)[np.asarray(final.mask)]
    assert (x >= 0).all() and (x[:, 0] < lx).all()


@pytest.mark.slow
def test_distributed_multitype_matches_single_chip():
    """Two-type coefficient tables through the 1-D halo sweep: typ channel
    rides the halo exchange; trajectory matches the single-chip bucket path."""
    from meso_tpu.core.box import Box
    from meso_tpu.core.state import create_random
    from meso_tpu.core.system import setup
    from meso_tpu.ops.dpd import DPDParams

    n_dev, side, rc, skin = 4, 1.2, 1.0, 0.2
    lx, lyz, density = 3 * n_dev * side, 4 * side, 3.0
    n = int(round(density * lx * lyz * lyz))
    box = Box.orthorhombic(lx, lyz, lyz)
    state = create_random(jax.random.PRNGKey(2), n, box, kt=1.0)
    state = state.replace(typ=(state.tag % 2).astype(jnp.int32))
    a = jnp.asarray([[25.0, 40.0], [40.0, 15.0]], jnp.float32)
    g = jnp.asarray([[4.5, 9.0], [9.0, 2.0]], jnp.float32)
    params = SystemParams.build(
        DPDParams.build(a=a, gamma=g, rc=rc, kt=1.0, seed=4242, n_types=2))
    system = System.for_fluid([lx, lyz, lyz], rc=rc, density=density,
                              dt=0.01, skin=skin, rng_mode="fast",
                              rebuild_every=5)
    system = system.replace(force_path="bucket")
    state = setup(system, params, state)
    dcfg = build_domain(system, n_dev, lx_global=lx, rebuild_every=5)

    mesh = make_mesh_1d(n_dev)
    dstate = distribute_state(state, dcfg)
    dstate, diag = run_distributed(system, params, dstate, 3, mesh, dcfg)
    assert int(np.max(np.asarray(diag["overflow"]))) == 0
    got = _bytag(collect_state(dstate))

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


@pytest.mark.slow
def test_distributed_pallas_kernel_matches_bucket(monkeypatch):
    """force_path='pallas' under 1-D DD (halo_x kernel, interpret mode on
    CPU): trajectory matches the distributed XLA sweep by tag."""
    monkeypatch.setenv("MESO_PALLAS_INTERPRET", "1")
    system, params, state, dcfg, _ = _fluid(n_dev=4, rebuild_every=5)
    mesh = make_mesh_1d(4)

    dstate = distribute_state(state, dcfg)
    d_b, diag_b = run_distributed(system, params, dstate, 2, mesh, dcfg)
    assert int(np.max(np.asarray(diag_b["overflow"]))) == 0

    system_p = system.replace(force_path="pallas")
    d_p, diag_p = run_distributed(system_p, params, dstate, 2, mesh, dcfg)
    assert int(np.max(np.asarray(diag_p["overflow"]))) == 0

    got, want = _bytag(collect_state(d_p)), _bytag(collect_state(d_b))
    assert got["x"].shape == want["x"].shape
    assert np.abs(got["x"] - want["x"]).max() < 1e-5
    assert np.abs(got["v"] - want["v"]).max() < 1e-4

"""Distributed FUSED Pallas kernel under 1-D/2-D/3-D decomposition
(interpret mode on the CPU mesh; SURVEY §2c row 1 — DD x native kernel).

Parity vs the distributed XLA sweep ("bucket") on identical decompositions:
the two paths share the halo exchange and RNG streams, so trajectories
match to float tolerance.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

os.environ.setdefault("MESO_PALLAS_INTERPRET", "1")

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.core.system import System, SystemParams, setup
from meso_tpu.ops.dpd import DPDParams


def _bytag(state, fields=("x", "v")):
    mask = np.asarray(state.mask)
    tag = np.asarray(state.tag)[mask]
    order = np.argsort(tag)
    return {f: np.asarray(getattr(state, f))[mask][order] for f in fields}


def _fluid(lengths, rebuild_every=3, n_types=1):
    rc, skin = 1.0, 0.2
    density = 3.0
    lx, ly, lz = lengths
    n = int(round(density * lx * ly * lz))
    box = Box.orthorhombic(lx, ly, lz)
    state = create_random(jax.random.PRNGKey(0), n, box, kt=1.0)
    pair = DPDParams.build(a=25.0, gamma=4.5, rc=rc, kt=1.0, seed=11,
                           n_types=n_types)
    if n_types > 1:
        state = state.replace(typ=jnp.arange(n, dtype=jnp.int32) % n_types)
        pair = pair.replace(a=pair.a * jnp.asarray([[1.0, 1.5], [1.5, 2.0]]))
    params = SystemParams.build(pair)
    system = System.for_fluid([lx, ly, lz], rc=rc, density=density, dt=0.01,
                              skin=skin, rng_mode="fast",
                              rebuild_every=rebuild_every)
    return system, params, state, box


def _run_pair(system, params, state, run_fn, distribute, collect, mesh,
              dcfg, nchunks=2):
    outs = {}
    for path in ("bucket", "pallas"):
        sys_p = system.replace(force_path=path)
        st = setup(sys_p.replace(force_path="dense"), params, state)
        dstate = distribute(st, dcfg)
        dstate, diag = run_fn(sys_p, params, dstate, nchunks, mesh, dcfg)
        assert int(np.max(np.asarray(diag["overflow"]))) == 0
        outs[path] = _bytag(collect(dstate))
    a, b = outs["bucket"], outs["pallas"]
    assert np.abs(a["x"] - b["x"]).max() < 1e-4
    assert np.abs(a["v"] - b["v"]).max() < 1e-3


@pytest.mark.slow
@pytest.mark.parametrize("n_types", [1, 2])
def test_pallas_dist_1d(n_types):
    from meso_tpu.parallel.domain import (build_domain, collect_state,
                                          distribute_state, make_mesh_1d,
                                          run_distributed)

    side = 1.2
    system, params, state, _ = _fluid((4 * 3 * side, 4 * side, 4 * side),
                                      n_types=n_types)
    dcfg = build_domain(system, 4, lx_global=float(4 * 3 * side),
                        rebuild_every=3)
    _run_pair(system, params, state, run_distributed, distribute_state,
              collect_state, make_mesh_1d(4), dcfg)


@pytest.mark.slow
def test_pallas_dist_2d():
    from meso_tpu.parallel.domain2d import (build_domain2d, collect_state_2d,
                                            distribute_state_2d, make_mesh_2d,
                                            run_distributed_2d)

    side = 1.2
    lx = ly = 2 * 3 * side
    lz = 4 * side
    system, params, state, _ = _fluid((lx, ly, lz))
    dcfg = build_domain2d(system, 2, 2, lx, ly, rebuild_every=3)
    _run_pair(system, params, state, run_distributed_2d, distribute_state_2d,
              collect_state_2d, make_mesh_2d(2, 2), dcfg)


@pytest.mark.slow
def test_pallas_dist_3d():
    from meso_tpu.parallel.domain3d import (build_domain3d, collect_state_3d,
                                            distribute_state_3d, make_mesh_3d,
                                            run_distributed_3d)

    side = 1.2
    lx = ly = lz = 2 * 3 * side
    system, params, state, _ = _fluid((lx, ly, lz))
    dcfg = build_domain3d(system, 2, 2, 2, lx, ly, lz, rebuild_every=3)
    _run_pair(system, params, state, run_distributed_3d, distribute_state_3d,
              collect_state_3d, make_mesh_3d(2, 2, 2), dcfg)

"""Right-spill packing under 2-D/3-D bricks (VERDICT r4 item 7).

Same contract as the 1-D slab coverage (test_pallas_dist_r3): the brick
rebuild runs ``spill_assign(wrap=False)``, halo exchange ships TWO x
block-columns per side, and the fused kernel reads the layout via
xr=2. Parity is against the SINGLE-CHIP spill engine (the distributed
sweep cannot read a spill layout); the tag-value counter RNG makes
trajectories comparable to float tolerance across decompositions.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

os.environ.setdefault("MESO_PALLAS_INTERPRET", "1")

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.core.system import (System, SystemParams, run_bucket_chunked,
                                  setup)
from meso_tpu.ops.dpd import DPDParams


def _bytag(state, fields=("x", "v")):
    mask = np.asarray(state.mask)
    tag = np.asarray(state.tag)[mask]
    order = np.argsort(tag)
    return {f: np.asarray(getattr(state, f))[mask][order] for f in fields}


def _fluid_spill(lengths):
    rc, skin = 1.0, 0.2
    density = 3.0
    lx, ly, lz = lengths
    n = int(round(density * lx * ly * lz))
    box = Box.orthorhombic(lx, ly, lz)
    state = create_random(jax.random.PRNGKey(5), n, box, kt=1.0)
    params = SystemParams.build(
        DPDParams.build(a=25.0, gamma=4.5, rc=rc, kt=1.0, seed=31))
    system = System.for_fluid(list(lengths), rc=rc, density=density,
                              dt=0.01, skin=skin, rng_mode="fast",
                              rebuild_every=3, spill=True)
    system = system.replace(force_path="pallas")
    assert system.cells.spill
    state = setup(system.replace(force_path="dense"), params, state)
    return system, params, state


@pytest.mark.slow
def test_spill_dist_2d_matches_single_chip():
    from meso_tpu.parallel.domain2d import (build_domain2d, collect_state_2d,
                                            distribute_state_2d, make_mesh_2d,
                                            run_distributed_2d)

    side = 1.2
    lx, ly, lz = 2 * 5 * side, 2 * 3 * side, 4 * side
    system, params, state = _fluid_spill((lx, ly, lz))
    dcfg = build_domain2d(system, 2, 2, lx, ly, rebuild_every=3)
    assert dcfg.cells.spill
    dstate = distribute_state_2d(state, dcfg)
    dstate, diag = run_distributed_2d(system, params, dstate, 2,
                                      make_mesh_2d(2, 2), dcfg)
    assert int(np.max(np.asarray(diag["overflow"]))) == 0
    dist = _bytag(collect_state_2d(dstate))
    single, _ = run_bucket_chunked(system, params, state, 2, 3)
    ref = _bytag(single)
    assert np.abs(dist["x"] - ref["x"]).max() < 1e-4
    assert np.abs(dist["v"] - ref["v"]).max() < 1e-3


@pytest.mark.slow
def test_spill_dist_3d_matches_single_chip():
    from meso_tpu.parallel.domain3d import (build_domain3d, collect_state_3d,
                                            distribute_state_3d, make_mesh_3d,
                                            run_distributed_3d)

    side = 1.2
    lx, ly, lz = 2 * 5 * side, 2 * 3 * side, 2 * 3 * side
    system, params, state = _fluid_spill((lx, ly, lz))
    dcfg = build_domain3d(system, 2, 2, 2, lx, ly, lz, rebuild_every=3)
    assert dcfg.cells.spill
    dstate = distribute_state_3d(state, dcfg)
    dstate, diag = run_distributed_3d(system, params, dstate, 2,
                                      make_mesh_3d(2, 2, 2), dcfg)
    assert int(np.max(np.asarray(diag["overflow"]))) == 0
    dist = _bytag(collect_state_3d(dstate))
    single, _ = run_bucket_chunked(system, params, state, 2, 3)
    ref = _bytag(single)
    assert np.abs(dist["x"] - ref["x"]).max() < 1e-4
    assert np.abs(dist["v"] - ref["v"]).max() < 1e-3


def test_spill_brick_needs_5_columns():
    from meso_tpu.parallel.domain2d import build_domain2d

    side = 1.2
    lx, ly, lz = 2 * 3 * side, 2 * 3 * side, 4 * side
    system, params, state = _fluid_spill((lx, ly, lz))
    with pytest.raises(ValueError, match=">= 5 local cell columns"):
        build_domain2d(system, 2, 2, lx, ly, rebuild_every=3)

"""Newton fused-lane kernel v3 (kernels/pair_dpd_v3.py) vs the dense O(N^2)
oracle — interpret-mode parity on CPU (the pre-device CI gate; CLAUDE.md).

The v3 kernel enumerates each unordered pair ONCE and accumulates both
sides (Newton), so parity vs the oracle checks the enumeration-completeness
argument in the kernel docstring: half offsets, row-pair reactions, pad
harvesting, (0,0) slot ordering, spill windows, z-chunk boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.kernels.pair_dpd_v3 import bucket_forces_pallas_v3
from meso_tpu.neighbor.bucket_layout import to_bucket_state
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.ops.dpd import DPDParams, dense_forces


def _sys(n=810, l=6.0, seed=3, n_types=1, skin=0.3, spill=False, cap=None,
         **pkw):
    box = Box.cubic(l)
    st = create_random(jax.random.PRNGKey(seed), n, box, kt=1.0)
    if n_types > 1:
        st = st.replace(typ=jnp.arange(st.n, dtype=jnp.int32) % n_types)
    cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l**3, skin=skin,
                             spill=spill, capacity=cap)
    params = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=77,
                             n_types=n_types, **pkw)
    if n_types > 1:
        params = params.replace(
            a=params.a * jnp.asarray([[1.0, 1.4], [1.4, 2.0]]),
            rc=params.rc * jnp.asarray([[1.0, 0.8], [0.8, 0.9]]))
    return box, st, cfg, params


def _compare(box, st, cfg, params, rng_mode="fast", s_exp=1.0, z_chunks=0,
             dyn_roll=False, tol=2e-5):
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(42)
    f_p, vir_p = bucket_forces_pallas_v3(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        cfg, rng_mode=rng_mode, interpret=True, s_exp=s_exp,
        z_chunks=z_chunks, dyn_roll=dyn_roll)
    f_d, vir_d, _ = dense_forces(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        rng_mode=rng_mode)
    f_p, f_d = np.asarray(f_p), np.asarray(f_d)
    mask = np.asarray(bst.mask)
    scale = np.abs(f_d).max()
    assert np.abs(f_p[mask] - f_d[mask]).max() / scale < tol, (
        np.abs(f_p[mask] - f_d[mask]).max() / scale)
    assert np.abs(f_p[~mask]).max() == 0.0
    assert abs(float(vir_p) - float(vir_d)) / abs(float(vir_d)) < 1e-4
    # Newton structure: machine-exact momentum conservation of pair forces
    assert np.abs(f_p[mask].sum(0)).max() / scale < 5e-5


@pytest.fixture(autouse=True)
def _fresh_compile_state():
    """XLA:CPU segfaults (backend_compile_and_load) compiling this module's
    huge interpret-mode kernel graphs once the process has accumulated a
    long compile history (deterministic at test_v3_special_bonds in the
    full suite; the same test passes in a fresh process). Dropping the
    live executables before each test keeps the JIT state small."""
    jax.clear_caches()
    yield


@pytest.mark.parametrize("rng_mode", ["fast", "tea"])
@pytest.mark.parametrize("spill", [False, True])
def test_v3_matches_dense(rng_mode, spill):
    box, st, cfg, params = _sys(spill=spill)
    _compare(box, st, cfg, params, rng_mode=rng_mode)


def test_v3_multitype():
    box, st, cfg, params = _sys(n_types=2)
    _compare(box, st, cfg, params)


def test_v3_multitype_spill():
    box, st, cfg, params = _sys(n_types=2, spill=True)
    _compare(box, st, cfg, params)


def test_v3_s_exp():
    box, st, cfg, params = _sys(s_exp=0.5)   # rides DPDParams.build(**pkw)
    _compare(box, st, cfg, params, s_exp=0.5)


def test_v3_z_chunks():
    # l=9 -> ncz=6: z_chunks=3 exercises chunk-pad reactions + harvesting
    box, st, cfg, params = _sys(n=2187, l=9.0)
    _compare(box, st, cfg, params, z_chunks=3)


def test_v3_z_chunks_spill():
    box, st, cfg, params = _sys(n=2187, l=9.0, spill=True)
    _compare(box, st, cfg, params, z_chunks=3)


@pytest.mark.parametrize("spill", [False, True])
def test_v3_dyn_roll_interpret(spill):
    """Traced-offset roll path (semantics check; device support is probed
    separately by tools/toy_dynroll.py). dyn_roll pads lanes to a 128
    multiple and forces z halos even at z_chunks=1 — this exercises both."""
    box, st, cfg, params = _sys(spill=spill)
    _compare(box, st, cfg, params, dyn_roll=True)


def test_v3_dyn_roll_z_chunks():
    box, st, cfg, params = _sys(n=2187, l=9.0, spill=True)
    _compare(box, st, cfg, params, z_chunks=3, dyn_roll=True)


def test_v3_dyn_roll_tea():
    box, st, cfg, params = _sys(spill=True)
    _compare(box, st, cfg, params, rng_mode="tea", dyn_roll=True)


def test_v3_special_bonds():
    from meso_tpu.ops.dpd import build_exclusions
    box, st, cfg, params = _sys()
    n = int(st.n)
    bonds = np.stack([np.arange(1, 41), np.arange(41, 81)], axis=1)
    excl, w = build_exclusions(bonds.astype(np.int32), n, weight=0.25,
                               max_excl=2)
    params = params.replace(excl=excl, excl_w=w)
    _compare(box, st, cfg, params)


def test_v3_odd_capacity():
    """K not a multiple of 8 exercises the overlapped last source group."""
    box, st, cfg, params = _sys(cap=28)
    assert cfg.capacity == 28
    _compare(box, st, cfg, params)


def test_v3_wide_box_nx8():
    """nx >= 8 regression (r3): every pre-r3 test shape had nx <= 7, which
    hid a device corruption class AND left the wide-box enumeration
    untested in interpret. Non-cubic box -> ncx=8 at skin 0.3."""
    lens = [10.7, 8.0, 8.0]
    box = Box.orthorhombic(*lens)
    n = int(round(3.0 * lens[0] * lens[1] * lens[2]))
    st = create_random(jax.random.PRNGKey(3), n, box, kt=1.0)
    cfg = CellConfig.for_box(lens, rc=1.0, density=3.0, skin=0.3,
                             spill=True)
    assert cfg.ncell[0] >= 8
    params = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=77)
    _compare(box, st, cfg, params)


def test_v3_matches_v2_bitpath():
    """v2 and v3 agree to fp-reorder tolerance on the same bucket state."""
    from meso_tpu.kernels.pair_dpd_fused import bucket_forces_pallas_fused
    box, st, cfg, params = _sys(spill=True)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(7)
    f3, vir3 = bucket_forces_pallas_v3(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        cfg, rng_mode="fast", interpret=True)
    f2, vir2 = bucket_forces_pallas_fused(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        cfg, rng_mode="fast", interpret=True)
    scale = float(jnp.abs(f2).max())
    assert float(jnp.abs(f3 - f2).max()) / scale < 2e-5
    assert abs(float(vir3) - float(vir2)) / abs(float(vir2)) < 1e-4

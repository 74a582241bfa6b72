"""Cell-list / neighbor-list correctness vs the dense oracle
(SURVEY.md §4 implication 1: cell-list force == dense force on same inputs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.neighbor.cells import CellConfig, build_cells, cell_index, stencil_cells
from meso_tpu.neighbor.nlist import build_nlist, neighbor_capacity
from meso_tpu.ops.dpd import DPDParams, dense_forces, nlist_forces


def _sys(n=810, l=6.0, seed=3):
    box = Box.cubic(l)   # rho = 810/216 = 3.75
    st = create_random(jax.random.PRNGKey(seed), n, box, kt=1.0)
    cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l**3, skin=0.3)
    return box, st, cfg


def test_cell_index_bounds():
    box, st, cfg = _sys()
    cid = np.asarray(cell_index(st.x, st.mask, box, cfg))
    assert cid.min() >= 0 and cid.max() < cfg.n_cells


def test_buckets_complete_and_disjoint():
    box, st, cfg = _sys()
    st2, cells = build_cells(st, cfg)
    assert int(cells.overflow) == 0
    idx = np.asarray(cells.bucket_idx)
    msk = np.asarray(cells.bucket_mask)
    got = np.sort(idx[msk])
    assert (got == np.arange(st.n)).all()  # every particle in exactly one slot
    # slot contents actually belong to that cell
    cid = np.asarray(cells.cid)
    rows = np.repeat(np.arange(idx.shape[0]), idx.shape[1]).reshape(idx.shape)
    assert (cid[idx[msk]] == rows[msk]).all()


def test_stencil_wraps_periodically():
    cfg = CellConfig(ncell=(4, 3, 5), capacity=8)
    cid = jnp.arange(cfg.n_cells, dtype=jnp.int32)
    s = np.asarray(stencil_cells(cid, cfg))
    assert s.shape == (cfg.n_cells, 27)
    assert s.min() >= 0 and s.max() < cfg.n_cells
    # each cell appears in exactly 27 stencils (periodic regular grid)
    counts = np.bincount(s.reshape(-1), minlength=cfg.n_cells)
    assert (counts == 27).all()


def test_nlist_counts_match_dense():
    box, st, cfg = _sys()
    st2, cells = build_cells(st, cfg)
    m = neighbor_capacity(3.75, 1.0, cfg.skin)
    nl = build_nlist(st2.x, st2.mask, box, cells, cfg, 1.0, m)
    assert int(nl.overflow) == 0
    # dense count within rc+skin
    dr = box.min_image(st2.x[:, None, :] - st2.x[None, :, :])
    r2 = np.array(jnp.sum(dr * dr, -1))  # writable copy
    np.fill_diagonal(r2, 1e9)
    want = (r2 < (1.0 + cfg.skin) ** 2).sum(axis=1)
    assert (np.asarray(nl.n_neigh) == want).all()
    # listed neighbors are the right ones
    idx = np.asarray(nl.idx)
    for i in [0, 17, 101, 809]:
        listed = set(idx[i][idx[i] < st.n].tolist())
        expect = set(np.where(r2[i] < (1.3) ** 2)[0].tolist())
        assert listed == expect


@pytest.mark.parametrize("rng_mode", ["tea", "fast"])
def test_nlist_forces_match_dense(rng_mode):
    box, st, cfg = _sys()
    params = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=77)
    st2, cells = build_cells(st, cfg)
    m = neighbor_capacity(3.75, 1.0, cfg.skin)
    nl = build_nlist(st2.x, st2.mask, box, cells, cfg, 1.0, m)
    step = jnp.int32(42)
    f_d, vir_d, _ = dense_forces(st2.x, st2.v, st2.typ, st2.tag, st2.mask,
                                 box, step, params, 0.01, rng_mode=rng_mode)
    f_n, vir_n = nlist_forces(st2.x, st2.v, st2.typ, st2.tag, st2.mask,
                              box, step, params, 0.01, nl.idx,
                              rng_mode=rng_mode)
    f_d, f_n = np.asarray(f_d), np.asarray(f_n)
    scale = np.abs(f_d).max()
    assert np.abs(f_n - f_d).max() / scale < 2e-6  # summation order only
    assert abs(float(vir_n) - float(vir_d)) / abs(float(vir_d)) < 1e-5


def test_bucket_overflow_detected():
    box, st, cfg = _sys()
    tiny = CellConfig(ncell=cfg.ncell, capacity=2, skin=cfg.skin)
    _, cells = build_cells(st, tiny)
    assert int(cells.overflow) > 0


def test_nlist_overflow_detected():
    box, st, cfg = _sys()
    st2, cells = build_cells(st, cfg)
    nl = build_nlist(st2.x, st2.mask, box, cells, cfg, 1.0, m_cap=8)
    assert int(nl.overflow) > 0
    assert int(jnp.max(nl.n_neigh)) > 8  # true counts still reported

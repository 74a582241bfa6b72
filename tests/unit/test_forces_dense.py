"""Dense DPD force oracle tests (SURVEY.md §4 implication 1, A.1 contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.ops.dpd import DPDParams, dense_forces, pair_force


def _small_system(n=256, l=5.0, seed=0):
    box = Box.cubic(l)
    st = create_random(jax.random.PRNGKey(seed), n, box, kt=1.0)
    params = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=928459)
    return box, st, params


def test_two_particle_conservative_analytic():
    """Static pair at distance r: F = a*(1-r/rc) along e, dissipative=0,
    random term = sigma*w*theta/sqrt(dt) with known theta."""
    box = Box.cubic(10.0)
    x = jnp.asarray([[1.0, 1.0, 1.0], [1.6, 1.0, 1.0]])
    v = jnp.zeros((2, 3))
    typ = jnp.zeros(2, jnp.int32)
    tag = jnp.asarray([1, 2], jnp.int32)
    mask = jnp.ones(2, bool)
    params = DPDParams.build(a=25.0, gamma=0.0, rc=1.0, kt=1.0, seed=1)
    dt = 0.01
    f, virial, nn = dense_forces(x, v, typ, tag, mask, box, jnp.int32(5),
                                 params, dt)
    f = np.asarray(f)
    # gamma=0 => sigma=0 => pure conservative: |F| = 25*(1-0.6) = 10
    assert np.allclose(f[0], [-10.0, 0.0, 0.0], atol=1e-5)
    assert np.allclose(f[0], -f[1], atol=0)
    assert np.asarray(nn).tolist() == [1, 1]
    # virial = 0.5*(dr.F_i + dr.F_j) = r*|F| = 0.6*10
    assert np.allclose(virial, 6.0, atol=1e-4)


def test_dissipative_term_analytic():
    """Approaching pair: F^D = -gamma w^2 (e.v) e."""
    box = Box.cubic(10.0)
    x = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]])
    v = jnp.asarray([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    typ = jnp.zeros(2, jnp.int32)
    tag = jnp.asarray([1, 2], jnp.int32)
    mask = jnp.ones(2, bool)
    # a=0; kill random term by kt=0 => sigma=0
    params = DPDParams.build(a=0.0, gamma=4.5, rc=1.0, kt=0.0, seed=1)
    f, _, _ = dense_forces(x, v, typ, tag, mask, box, jnp.int32(0), params, 0.01)
    # e (on i=0) = (x0-x1)/r = (-1,0,0); v01 = (2,0,0); e.v = -2
    # F0 = -gamma*w^2*(e.v)*e = -4.5*0.25*(-2)*(-1,0,0) = (-2.25,0,0)
    assert np.allclose(np.asarray(f)[0], [-2.25, 0.0, 0.0], atol=1e-6)


@pytest.mark.parametrize("mode", ["tea", "fast"])
def test_pairwise_antisymmetry_bitwise(mode):
    """F_ij == -F_ji bitwise => exact momentum conservation (SURVEY.md §3.3)."""
    box, st, params = _small_system(n=128)
    from meso_tpu.core import rng as rngmod
    dr = box.min_image(st.x[:, None, :] - st.x[None, :, :])
    vij = st.v[:, None, :] - st.v[None, :, :]
    if mode == "tea":
        theta = rngmod.pair_uniform_tea(st.tag[:, None], st.tag[None, :],
                                        jnp.int32(3), params.seed)
    else:
        h = rngmod.particle_hash(st.tag, jnp.int32(3), params.seed)
        theta = rngmod.pair_uniform_fast(h[:, None], h[None, :])
    T = st.typ
    rc = jnp.where(jnp.eye(128, dtype=bool), 0.0, params.rc[T[:, None], T[None, :]])
    fp, _ = pair_force(dr, vij, theta, params.a[T[:, None], T[None, :]],
                       params.gamma[T[:, None], T[None, :]],
                       params.sigma[T[:, None], T[None, :]],
                       rc, jnp.float32(10.0), params.s_exp)
    fp = np.asarray(fp)
    assert (fp == -np.swapaxes(fp, 0, 1)).all()


def test_total_force_near_zero():
    box, st, params = _small_system(n=512)
    f, _, _ = dense_forces(st.x, st.v, st.typ, st.tag, st.mask, box,
                           jnp.int32(17), params, 0.01)
    total = np.asarray(jnp.sum(f, axis=0))
    # per-pair antisymmetry is bitwise; residual is summation-order roundoff
    assert np.abs(total).max() < 5e-3


def test_padding_rows_inert():
    box, st, params = _small_system(n=128)
    mask = st.mask.at[100:].set(False)
    f1, v1, _ = dense_forces(st.x, st.v, st.typ, st.tag, mask, box,
                             jnp.int32(2), params, 0.01)
    # moving a masked particle changes nothing
    x2 = st.x.at[110].set(jnp.asarray([0.1, 0.1, 0.1]))
    f2, v2, _ = dense_forces(x2, st.v, st.typ, st.tag, mask, box,
                             jnp.int32(2), params, 0.01)
    assert np.allclose(np.asarray(f1)[:100], np.asarray(f2)[:100], atol=0)
    assert (np.asarray(f1)[100:] == 0).all()
    assert np.allclose(v1, v2)


def test_random_force_scales_with_inv_sqrt_dt():
    box, st, params = _small_system(n=64)
    params = params.replace(a=params.a * 0, gamma=params.gamma * 0)  # only F^R
    f1, _, _ = dense_forces(st.x, st.v, st.typ, st.tag, st.mask, box,
                            jnp.int32(9), params, 0.01)
    f2, _, _ = dense_forces(st.x, st.v, st.typ, st.tag, st.mask, box,
                            jnp.int32(9), params, 0.04)
    assert np.allclose(np.asarray(f1), 2.0 * np.asarray(f2), rtol=1e-5, atol=1e-6)


def test_special_bonds_exclusion_weight():
    """special_bonds (row 7): excluded pairs scaled by excl_w in dense and
    nlist paths; weight=1 reproduces the unexcluded forces."""
    from meso_tpu.ops.dpd import build_exclusions, nlist_forces
    from meso_tpu.neighbor.cells import CellConfig, build_cells
    from meso_tpu.neighbor.nlist import build_nlist, neighbor_capacity

    box, st, params = _small_system(n=128, l=5.0)
    bonds = jnp.asarray([[1, 2], [2, 3]], jnp.int32)
    # place bonded particles within range
    x = st.x.at[0].set(jnp.asarray([1.0, 1.0, 1.0]))
    x = x.at[1].set(jnp.asarray([1.5, 1.0, 1.0]))
    x = x.at[2].set(jnp.asarray([1.5, 1.5, 1.0]))
    st = st.replace(x=x)
    step = jnp.int32(7)

    f_base, _, _ = dense_forces(st.x, st.v, st.typ, st.tag, st.mask, box,
                                step, params, 0.01)
    excl, w = build_exclusions(bonds, 128, weight=0.0)
    p_excl = params.replace(excl=excl, excl_w=w)
    f_ex, _, _ = dense_forces(st.x, st.v, st.typ, st.tag, st.mask, box,
                              step, p_excl, 0.01)
    # bonded pairs no longer contribute: forces on particles 0-2 changed
    assert np.abs(np.asarray(f_ex)[:3] - np.asarray(f_base)[:3]).max() > 0.1
    # unrelated distant particle unchanged
    assert np.allclose(np.asarray(f_ex)[100], np.asarray(f_base)[100])
    # weight=1.0 is identity
    excl1, w1 = build_exclusions(bonds, 128, weight=1.0)
    f_id, _, _ = dense_forces(st.x, st.v, st.typ, st.tag, st.mask, box,
                              step, params.replace(excl=excl1, excl_w=w1),
                              0.01)
    assert np.allclose(np.asarray(f_id), np.asarray(f_base))
    # nlist path agrees with dense under exclusions
    cfg = CellConfig.for_box([5.0] * 3, rc=1.0, density=128 / 125, skin=0.3)
    st2, cells = build_cells(st, cfg)
    m = neighbor_capacity(128 / 125, 1.0, cfg.skin)
    nl = build_nlist(st2.x, st2.mask, box, cells, cfg, 1.0, m)
    f_ed, _, _ = dense_forces(st2.x, st2.v, st2.typ, st2.tag, st2.mask, box,
                              step, p_excl, 0.01)
    f_en, _ = nlist_forces(st2.x, st2.v, st2.typ, st2.tag, st2.mask, box,
                           step, p_excl, 0.01, nl.idx)
    assert np.abs(np.asarray(f_en) - np.asarray(f_ed)).max() < 1e-4

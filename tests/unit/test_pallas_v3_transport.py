"""v3 Newton kernel eDPD/tDPD port (VERDICT r4 item 5) vs the dense
oracles — interpret-mode parity on CPU (the pre-device CI gate).

The risky piece relative to classic v3 is the Newton pairing of the flux
channels: eDPD's viscous heating q^V is SYMMETRIC (both sides gain) while
q^C/q^R and every tDPD flux are ANTISYMMETRIC — the reaction plane must
carry q_asym - q_sym (it is subtracted). Parity vs the dense oracle on
both sides of every pair checks exactly that split.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.kernels.pair_dpd_v3 import (bucket_forces_pallas_v3_edpd,
                                          bucket_forces_pallas_v3_tdpd)
from meso_tpu.neighbor.bucket_layout import to_bucket_state
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.ops.edpd import EDPDParams, dense_forces_edpd
from meso_tpu.ops.tdpd import TDPDParams, dense_forces_tdpd


@pytest.fixture(autouse=True)
def _fresh_compile_state():
    """Same guard as test_pallas_v3: XLA:CPU segfaults compiling the big
    interpret-mode kernel graphs once the JIT state has grown."""
    jax.clear_caches()
    yield


def _sys(n=500, l=5.0, seed=9, n_species=0, with_energy=False,
         spill=False):
    box = Box.cubic(l)
    st = create_random(jax.random.PRNGKey(seed), n, box, kt=1.0,
                       n_species=n_species, with_energy=with_energy)
    cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l**3, skin=0.3,
                             spill=spill)
    return box, st, cfg


def _check(got, want, mask, tol, what):
    g, w = np.asarray(got), np.asarray(want)
    s = max(np.abs(w).max(), 1e-9)
    err = np.abs(g[mask] - w[mask]).max() / s
    assert err < tol, f"{what}: rel {err}"


@pytest.mark.parametrize("rng_mode", ["fast", "tea"])
@pytest.mark.parametrize("spill", [False, True])
def test_v3_edpd_matches_dense(rng_mode, spill):
    n, l = (1536, 8.0) if spill else (500, 5.0)
    box, st, cfg = _sys(n=n, l=l, with_energy=True, spill=spill)
    st = st.replace(T=1.0 + 0.3 * jnp.sin(st.x[:, 0]))
    params = EDPDParams.build(a=25.0, gamma=4.5, rc=1.0, kappa=1.5,
                              cv=10.0, seed=7)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(12)
    f_d, q_d, v_d = dense_forces_edpd(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, rng_mode=rng_mode)
    f_p, q_p, v_p = bucket_forces_pallas_v3_edpd(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg, interpret=True, rng_mode=rng_mode)
    m = np.asarray(bst.mask)
    _check(f_p, f_d, m, 2e-5, "f")
    _check(q_p, q_d, m, 5e-5, "dTdt")
    assert abs(float(v_p) - float(v_d)) / abs(float(v_d)) < 1e-4
    # Newton structure: machine-exact momentum conservation
    fs = np.abs(np.asarray(f_d)).max()
    assert np.abs(np.asarray(f_p)[m].sum(0)).max() / fs < 5e-5
    assert np.abs(np.asarray(f_p)[~m]).max() == 0.0
    assert np.abs(np.asarray(q_p)[~m]).max() == 0.0


def test_v3_edpd_multitype():
    box, st, cfg = _sys(with_energy=True)
    st = st.replace(T=1.0 + 0.3 * jnp.sin(st.x[:, 0]),
                    typ=(st.tag % 2).astype(jnp.int32))
    a = jnp.asarray([[25.0, 35.0], [35.0, 18.0]], jnp.float32)
    g = jnp.asarray([[4.5, 6.0], [6.0, 3.0]], jnp.float32)
    kap = jnp.asarray([[1.5, 0.7], [0.7, 2.2]], jnp.float32)
    params = EDPDParams.build(a=a, gamma=g, rc=1.0, kappa=kap, cv=10.0,
                              seed=7, n_types=2)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(12)
    f_d, q_d, v_d = dense_forces_edpd(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01)
    f_p, q_p, v_p = bucket_forces_pallas_v3_edpd(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg, interpret=True)
    m = np.asarray(bst.mask)
    _check(f_p, f_d, m, 2e-5, "f")
    _check(q_p, q_d, m, 5e-5, "dTdt")


@pytest.mark.parametrize("rng_mode", ["fast", "tea"])
@pytest.mark.parametrize("spill", [False, True])
def test_v3_tdpd_matches_dense(rng_mode, spill):
    n, l = (1536, 8.0) if spill else (500, 5.0)
    box, st, cfg = _sys(n=n, l=l, n_species=2, spill=spill)
    st = st.replace(
        C=jnp.stack([1.0 + 0.5 * jnp.cos(st.x[:, 0]),
                     0.5 + 0.2 * jnp.sin(st.x[:, 1])], -1))
    params = TDPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0,
                              kappa_c=[1.0, 0.5], eps_c=[0.1, 0.05],
                              rcc=0.8, s1=2.0, seed=5)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(4)
    f_d, q_d, v_d = dense_forces_tdpd(
        bst.x, bst.v, bst.C, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, rng_mode=rng_mode)
    f_p, q_p, v_p = bucket_forces_pallas_v3_tdpd(
        bst.x, bst.v, bst.C, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg, interpret=True, rng_mode=rng_mode)
    m = np.asarray(bst.mask)
    _check(f_p, f_d, m, 2e-5, "f")
    _check(q_p, q_d, m, 5e-5, "dCdt")
    assert abs(float(v_p) - float(v_d)) / abs(float(v_d)) < 1e-4
    # antisymmetric fluxes: per-species total concentration is conserved
    qs = np.abs(np.asarray(q_d)).max()
    assert np.abs(np.asarray(q_p)[m].sum(0)).max() / qs < 5e-5


def test_v3_edpd_z_chunks():
    """Chunked-z grid (the 1M production shape class) stays exact."""
    box, st, cfg = _sys(n=1536, l=8.0, with_energy=True, spill=True)
    st = st.replace(T=1.0 + 0.3 * jnp.sin(st.x[:, 0]))
    params = EDPDParams.build(a=25.0, gamma=4.5, rc=1.0, kappa=1.5,
                              cv=10.0, seed=7)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(3)
    f_d, q_d, v_d = dense_forces_edpd(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01)
    f_p, q_p, v_p = bucket_forces_pallas_v3_edpd(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg, interpret=True, z_chunks=3)
    m = np.asarray(bst.mask)
    _check(f_p, f_d, m, 2e-5, "f")
    _check(q_p, q_d, m, 5e-5, "dTdt")

"""eDPD/tDPD structured bucket paths vs their dense oracles
(SURVEY.md §4 implication 1 for the transport variants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.neighbor.bucket_layout import to_bucket_state
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.ops.edpd import EDPDParams, bucket_forces_edpd, dense_forces_edpd
from meso_tpu.ops.tdpd import TDPDParams, bucket_forces_tdpd, dense_forces_tdpd


def _sys(n=500, l=5.0, seed=9, n_species=0, with_energy=False):
    box = Box.cubic(l)
    st = create_random(jax.random.PRNGKey(seed), n, box, kt=1.0,
                       n_species=n_species, with_energy=with_energy)
    cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l**3, skin=0.3)
    return box, st, cfg


def test_edpd_bucket_matches_dense():
    box, st, cfg = _sys(with_energy=True)
    st = st.replace(T=1.0 + 0.3 * jnp.sin(st.x[:, 0]))
    params = EDPDParams.build(a=25.0, gamma=4.5, rc=1.0, kappa=1.5, cv=10.0,
                              seed=7)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(12)
    f_d, q_d, v_d = dense_forces_edpd(bst.x, bst.v, bst.T, bst.typ, bst.tag,
                                      bst.mask, box, step, params, 0.01)
    f_b, q_b, v_b = jax.jit(
        bucket_forces_edpd, static_argnames=("dt", "cfg"))(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg)
    m = np.asarray(bst.mask)
    fs = np.abs(np.asarray(f_d)).max()
    assert np.abs(np.asarray(f_b)[m] - np.asarray(f_d)[m]).max() / fs < 2e-6
    qs = max(np.abs(np.asarray(q_d)).max(), 1e-9)
    assert np.abs(np.asarray(q_b)[m] - np.asarray(q_d)[m]).max() / qs < 2e-5
    assert abs(float(v_b) - float(v_d)) / abs(float(v_d)) < 1e-5
    # padding rows inert
    assert np.abs(np.asarray(f_b)[~m]).max() == 0.0
    assert np.abs(np.asarray(q_b)[~m]).max() == 0.0


def test_tdpd_bucket_matches_dense():
    box, st, cfg = _sys(n_species=2)
    c0 = jnp.stack([1.0 + 0.5 * jnp.cos(st.x[:, 0]),
                    0.5 + 0.2 * jnp.sin(st.x[:, 1])], -1)
    st = st.replace(C=c0)
    params = TDPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0,
                              kappa_c=[1.0, 2.0], eps_c=[0.1, 0.0],
                              rcc=1.0, seed=5)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(4)
    f_d, q_d, v_d = dense_forces_tdpd(bst.x, bst.v, bst.C, bst.typ, bst.tag,
                                      bst.mask, box, step, params, 0.01)
    f_b, q_b, v_b = jax.jit(
        bucket_forces_tdpd, static_argnames=("dt", "cfg"))(
        bst.x, bst.v, bst.C, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg)
    m = np.asarray(bst.mask)
    fs = np.abs(np.asarray(f_d)).max()
    assert np.abs(np.asarray(f_b)[m] - np.asarray(f_d)[m]).max() / fs < 2e-6
    qs = np.abs(np.asarray(q_d)).max()
    assert np.abs(np.asarray(q_b)[m] - np.asarray(q_d)[m]).max() / qs < 2e-5
    assert abs(float(v_b) - float(v_d)) / abs(float(v_d)) < 1e-5


def test_edpd_pallas_matches_bucket_interpret():
    from meso_tpu.kernels.pair_multiphysics import bucket_forces_pallas_edpd
    box, st, cfg = _sys(with_energy=True)
    st = st.replace(T=1.0 + 0.3 * jnp.sin(st.x[:, 0]))
    params = EDPDParams.build(a=25.0, gamma=4.5, rc=1.0, kappa=1.5, cv=10.0,
                              seed=7)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(12)
    f_x, q_x, v_x = jax.jit(
        bucket_forces_edpd, static_argnames=("dt", "cfg"))(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg)
    f_p, q_p, v_p = bucket_forces_pallas_edpd(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg, interpret=True)
    m = np.asarray(bst.mask)
    fs = np.abs(np.asarray(f_x)).max()
    assert np.abs(np.asarray(f_p)[m] - np.asarray(f_x)[m]).max() / fs < 1e-5
    qs = max(np.abs(np.asarray(q_x)).max(), 1e-9)
    assert np.abs(np.asarray(q_p)[m] - np.asarray(q_x)[m]).max() / qs < 1e-4
    assert abs(float(v_p) - float(v_x)) / abs(float(v_x)) < 1e-5


def test_tdpd_pallas_matches_bucket_interpret():
    from meso_tpu.kernels.pair_multiphysics import bucket_forces_pallas_tdpd
    box, st, cfg = _sys(n_species=2)
    c0 = jnp.stack([1.0 + 0.5 * jnp.cos(st.x[:, 0]),
                    0.5 + 0.2 * jnp.sin(st.x[:, 1])], -1)
    st = st.replace(C=c0)
    params = TDPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0,
                              kappa_c=[1.0, 2.0], eps_c=[0.1, 0.0],
                              rcc=1.0, seed=5)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(4)
    f_x, q_x, v_x = jax.jit(
        bucket_forces_tdpd, static_argnames=("dt", "cfg"))(
        bst.x, bst.v, bst.C, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg)
    f_p, q_p, v_p = bucket_forces_pallas_tdpd(
        bst.x, bst.v, bst.C, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg, interpret=True)
    m = np.asarray(bst.mask)
    fs = np.abs(np.asarray(f_x)).max()
    assert np.abs(np.asarray(f_p)[m] - np.asarray(f_x)[m]).max() / fs < 1e-5
    qs = np.abs(np.asarray(q_x)).max()
    assert np.abs(np.asarray(q_p)[m] - np.asarray(q_x)[m]).max() / qs < 1e-4
    assert abs(float(v_p) - float(v_x)) / abs(float(v_x)) < 1e-5


def test_tdpd_general_wdc_bucket_and_pallas_match_dense():
    """rcc < rc with s1 = 2: both structured paths reproduce the dense
    oracle's generalized w_dc = (1 - r/rcc)^s1 transport weight."""
    from meso_tpu.kernels.pair_multiphysics import bucket_forces_pallas_tdpd
    box, st, cfg = _sys(n_species=1)
    st = st.replace(C=(1.0 + 0.5 * jnp.cos(st.x[:, 0]))[:, None])
    params = TDPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0,
                              kappa_c=[1.2], eps_c=[0.05],
                              rcc=0.7, seed=31, s1=2.0)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(9)
    f_d, q_d, v_d = dense_forces_tdpd(bst.x, bst.v, bst.C, bst.typ, bst.tag,
                                      bst.mask, box, step, params, 0.01)
    f_b, q_b, v_b = jax.jit(
        bucket_forces_tdpd, static_argnames=("dt", "cfg"))(
        bst.x, bst.v, bst.C, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg)
    f_p, q_p, v_p = bucket_forces_pallas_tdpd(
        bst.x, bst.v, bst.C, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg, interpret=True)
    m = np.asarray(bst.mask)
    qs = np.abs(np.asarray(q_d)).max()
    assert qs > 0
    assert np.abs(np.asarray(q_b)[m] - np.asarray(q_d)[m]).max() / qs < 2e-5
    assert np.abs(np.asarray(q_p)[m] - np.asarray(q_d)[m]).max() / qs < 1e-4
    fs = np.abs(np.asarray(f_d)).max()
    assert np.abs(np.asarray(f_b)[m] - np.asarray(f_d)[m]).max() / fs < 2e-6
    assert np.abs(np.asarray(f_p)[m] - np.asarray(f_d)[m]).max() / fs < 1e-5


def test_tdpd_bucket_rejects_rcc_above_rc():
    import pytest
    box, st, cfg = _sys(n_species=1)
    st = st.replace(C=jnp.ones((st.n, 1)))
    params = TDPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0,
                              kappa_c=[1.0], eps_c=[0.0], rcc=1.5, seed=3)
    bst = to_bucket_state(st, cfg)
    with pytest.raises(ValueError, match="rcc <= rc"):
        bucket_forces_tdpd(bst.x, bst.v, bst.C, bst.typ, bst.tag, bst.mask,
                           box, jnp.int32(0), params, 0.01, cfg)


def test_edpd_multitype_bucket_matches_dense():
    """(2,2) eDPD tables (a/gamma/rc/kappa) through the sweep 'typ' channel
    vs the dense oracle."""
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
    f_d, q_d, v_d = dense_forces_edpd(bst.x, bst.v, bst.T, bst.typ, bst.tag,
                                      bst.mask, box, step, params, 0.01)
    f_b, q_b, v_b = jax.jit(
        bucket_forces_edpd, static_argnames=("dt", "cfg"))(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg)
    m = np.asarray(bst.mask)
    fs = np.abs(np.asarray(f_d)).max()
    assert np.abs(np.asarray(f_b)[m] - np.asarray(f_d)[m]).max() / fs < 2e-6
    qs = max(np.abs(np.asarray(q_d)).max(), 1e-9)
    assert np.abs(np.asarray(q_b)[m] - np.asarray(q_d)[m]).max() / qs < 2e-5
    assert abs(float(v_b) - float(v_d)) / abs(float(v_d)) < 1e-5


def test_tdpd_multitype_bucket_matches_dense():
    """(2,2) momentum tables in tDPD via the sweep 'typ' channel."""
    box, st, cfg = _sys(n_species=1)
    st = st.replace(C=(1.0 + 0.5 * jnp.cos(st.x[:, 0]))[:, None],
                    typ=(st.tag % 2).astype(jnp.int32))
    a = jnp.asarray([[25.0, 40.0], [40.0, 15.0]], jnp.float32)
    g = jnp.asarray([[4.5, 9.0], [9.0, 2.0]], jnp.float32)
    params = TDPDParams.build(a=a, gamma=g, rc=1.0, kt=1.0, kappa_c=[1.0],
                              eps_c=[0.1], rcc=1.0, seed=5, n_types=2)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(4)
    f_d, q_d, v_d = dense_forces_tdpd(bst.x, bst.v, bst.C, bst.typ, bst.tag,
                                      bst.mask, box, step, params, 0.01)
    f_b, q_b, v_b = jax.jit(
        bucket_forces_tdpd, static_argnames=("dt", "cfg"))(
        bst.x, bst.v, bst.C, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg)
    m = np.asarray(bst.mask)
    fs = np.abs(np.asarray(f_d)).max()
    assert np.abs(np.asarray(f_b)[m] - np.asarray(f_d)[m]).max() / fs < 2e-6
    qs = np.abs(np.asarray(q_d)).max()
    assert np.abs(np.asarray(q_b)[m] - np.asarray(q_d)[m]).max() / qs < 2e-5
    assert abs(float(v_b) - float(v_d)) / abs(float(v_d)) < 1e-5


def test_transport_tea_tier_bucket_matches_dense():
    """Reference-parity TEA pair hash (row 21) for eDPD and tDPD: bucket
    paths match the dense oracles bitwise-identically-seeded, and the tea
    stream differs from fast (it actually switched)."""
    # eDPD
    box, st, cfg = _sys(with_energy=True)
    st = st.replace(T=1.0 + 0.3 * jnp.sin(st.x[:, 0]))
    ep = EDPDParams.build(a=25.0, gamma=4.5, rc=1.0, kappa=1.5, cv=10.0,
                          seed=7)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(12)
    f_d, q_d, _ = dense_forces_edpd(bst.x, bst.v, bst.T, bst.typ, bst.tag,
                                    bst.mask, box, step, ep, 0.01,
                                    rng_mode="tea")
    f_b, q_b, _ = jax.jit(
        bucket_forces_edpd, static_argnames=("dt", "cfg", "rng_mode"))(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step, ep,
        0.01, cfg, rng_mode="tea")
    f_f, _, _ = dense_forces_edpd(bst.x, bst.v, bst.T, bst.typ, bst.tag,
                                  bst.mask, box, step, ep, 0.01,
                                  rng_mode="fast")
    m = np.asarray(bst.mask)
    fs = np.abs(np.asarray(f_d)).max()
    assert np.abs(np.asarray(f_b)[m] - np.asarray(f_d)[m]).max() / fs < 2e-6
    assert np.abs(np.asarray(f_f)[m] - np.asarray(f_d)[m]).max() / fs > 1e-3

    # tDPD
    box, st, cfg = _sys(n_species=1)
    st = st.replace(C=(1.0 + 0.5 * jnp.cos(st.x[:, 0]))[:, None])
    tp = TDPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, kappa_c=[1.0],
                          eps_c=[0.2], rcc=1.0, seed=5)
    bst = to_bucket_state(st, cfg)
    f_d, q_d, _ = dense_forces_tdpd(bst.x, bst.v, bst.C, bst.typ, bst.tag,
                                    bst.mask, box, step, tp, 0.01,
                                    rng_mode="tea")
    f_b, q_b2, _ = jax.jit(
        bucket_forces_tdpd, static_argnames=("dt", "cfg", "rng_mode"))(
        bst.x, bst.v, bst.C, bst.typ, bst.tag, bst.mask, box, step, tp,
        0.01, cfg, rng_mode="tea")
    m = np.asarray(bst.mask)
    fs = np.abs(np.asarray(f_d)).max()
    qs = np.abs(np.asarray(q_d)).max()
    assert np.abs(np.asarray(f_b)[m] - np.asarray(f_d)[m]).max() / fs < 2e-6
    assert np.abs(np.asarray(q_b2)[m] - np.asarray(q_d)[m]).max() / qs < 2e-5


def test_transport_pallas_tea_matches_bucket_interpret():
    """In-kernel TEA tier for the eDPD/tDPD Pallas kernels (interpret)."""
    from meso_tpu.kernels.pair_multiphysics import (bucket_forces_pallas_edpd,
                                                    bucket_forces_pallas_tdpd)
    box, st, cfg = _sys(with_energy=True)
    st = st.replace(T=1.0 + 0.3 * jnp.sin(st.x[:, 0]))
    ep = EDPDParams.build(a=25.0, gamma=4.5, rc=1.0, kappa=1.5, cv=10.0,
                          seed=7)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(12)
    f_x, q_x, _ = jax.jit(
        bucket_forces_edpd, static_argnames=("dt", "cfg", "rng_mode"))(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step, ep,
        0.01, cfg, rng_mode="tea")
    f_p, q_p, _ = bucket_forces_pallas_edpd(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step, ep,
        0.01, cfg, interpret=True, rng_mode="tea")
    m = np.asarray(bst.mask)
    fs = np.abs(np.asarray(f_x)).max()
    qs = max(np.abs(np.asarray(q_x)).max(), 1e-9)
    assert np.abs(np.asarray(f_p)[m] - np.asarray(f_x)[m]).max() / fs < 1e-5
    assert np.abs(np.asarray(q_p)[m] - np.asarray(q_x)[m]).max() / qs < 1e-4

    box, st, cfg = _sys(n_species=1)
    st = st.replace(C=(1.0 + 0.5 * jnp.cos(st.x[:, 0]))[:, None])
    tp = TDPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, kappa_c=[1.0],
                          eps_c=[0.2], rcc=1.0, seed=5)
    bst = to_bucket_state(st, cfg)
    f_x, q_x, _ = jax.jit(
        bucket_forces_tdpd, static_argnames=("dt", "cfg", "rng_mode"))(
        bst.x, bst.v, bst.C, bst.typ, bst.tag, bst.mask, box, step, tp,
        0.01, cfg, rng_mode="tea")
    f_p, q_p, _ = bucket_forces_pallas_tdpd(
        bst.x, bst.v, bst.C, bst.typ, bst.tag, bst.mask, box, step, tp,
        0.01, cfg, interpret=True, rng_mode="tea")
    m = np.asarray(bst.mask)
    fs = np.abs(np.asarray(f_x)).max()
    qs = np.abs(np.asarray(q_x)).max()
    assert np.abs(np.asarray(f_p)[m] - np.asarray(f_x)[m]).max() / fs < 1e-5
    assert np.abs(np.asarray(q_p)[m] - np.asarray(q_x)[m]).max() / qs < 1e-4


def test_edpd_multitype_pallas_matches_bucket():
    """Multi-type tables in the eDPD Pallas kernel (SMEM select chain;
    SURVEY row 22) vs the multi-type bucket sweep — interpret mode."""
    from meso_tpu.kernels.pair_multiphysics import bucket_forces_pallas_edpd

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
    f_b, q_b, v_b = jax.jit(
        bucket_forces_edpd, static_argnames=("dt", "cfg"))(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg)
    f_p, q_p, v_p = bucket_forces_pallas_edpd(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg, interpret=True)
    m = np.asarray(bst.mask)
    fs = np.abs(np.asarray(f_b)).max()
    assert np.abs(np.asarray(f_p)[m] - np.asarray(f_b)[m]).max() / fs < 2e-6
    qs = max(np.abs(np.asarray(q_b)).max(), 1e-9)
    assert np.abs(np.asarray(q_p)[m] - np.asarray(q_b)[m]).max() / qs < 2e-5
    assert abs(float(v_p) - float(v_b)) / abs(float(v_b)) < 1e-5


def test_tdpd_multitype_pallas_matches_bucket():
    """Multi-type momentum tables in the tDPD Pallas kernel (SURVEY row 23)
    vs the multi-type bucket sweep — interpret mode."""
    from meso_tpu.kernels.pair_multiphysics import bucket_forces_pallas_tdpd

    box, st, cfg = _sys(n_species=2)
    st = st.replace(
        C=jnp.stack([1.0 + 0.5 * jnp.cos(st.x[:, 0]),
                     0.5 + 0.2 * jnp.sin(st.x[:, 1])], -1),
        typ=(st.tag % 2).astype(jnp.int32))
    a = jnp.asarray([[25.0, 40.0], [40.0, 15.0]], jnp.float32)
    g = jnp.asarray([[4.5, 9.0], [9.0, 2.0]], jnp.float32)
    params = TDPDParams.build(a=a, gamma=g, rc=1.0, kt=1.0,
                              kappa_c=[1.0, 0.5], eps_c=[0.1, 0.05],
                              rcc=1.0, seed=5, n_types=2)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(4)
    f_b, q_b, v_b = jax.jit(
        bucket_forces_tdpd, static_argnames=("dt", "cfg"))(
        bst.x, bst.v, bst.C, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg)
    f_p, q_p, v_p = bucket_forces_pallas_tdpd(
        bst.x, bst.v, bst.C, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg, interpret=True)
    m = np.asarray(bst.mask)
    fs = np.abs(np.asarray(f_b)).max()
    assert np.abs(np.asarray(f_p)[m] - np.asarray(f_b)[m]).max() / fs < 2e-6
    qs = np.abs(np.asarray(q_b)).max()
    assert np.abs(np.asarray(q_p)[m] - np.asarray(q_b)[m]).max() / qs < 2e-5
    assert abs(float(v_p) - float(v_b)) / abs(float(v_b)) < 1e-5


@pytest.mark.parametrize("rng_mode", ["fast", "tea"])
def test_edpd_fused_kernel_matches_bucket(rng_mode):
    """The fused-lane eDPD kernel (kernels/pair_dpd_fused.py) vs the bucket
    sweep — interpret parity, single-type."""
    from meso_tpu.kernels.pair_dpd_fused import bucket_forces_pallas_edpd_fused

    box, st, cfg = _sys(with_energy=True)
    st = st.replace(T=1.0 + 0.3 * jnp.sin(st.x[:, 0]))
    params = EDPDParams.build(a=25.0, gamma=4.5, rc=1.0, kappa=1.5, cv=10.0,
                              seed=7)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(12)
    f_b, q_b, v_b = jax.jit(
        bucket_forces_edpd, static_argnames=("dt", "cfg", "rng_mode"))(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg, rng_mode=rng_mode)
    f_p, q_p, v_p = bucket_forces_pallas_edpd_fused(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg, interpret=True, rng_mode=rng_mode)
    m = np.asarray(bst.mask)
    fs = np.abs(np.asarray(f_b)).max()
    assert np.abs(np.asarray(f_p)[m] - np.asarray(f_b)[m]).max() / fs < 2e-6
    qs = max(np.abs(np.asarray(q_b)).max(), 1e-9)
    assert np.abs(np.asarray(q_p)[m] - np.asarray(q_b)[m]).max() / qs < 2e-5
    assert abs(float(v_p) - float(v_b)) / abs(float(v_b)) < 1e-5


def test_edpd_fused_kernel_multitype():
    from meso_tpu.kernels.pair_dpd_fused import bucket_forces_pallas_edpd_fused

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
    f_b, q_b, v_b = jax.jit(
        bucket_forces_edpd, static_argnames=("dt", "cfg"))(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg)
    f_p, q_p, v_p = bucket_forces_pallas_edpd_fused(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg, interpret=True)
    m = np.asarray(bst.mask)
    fs = np.abs(np.asarray(f_b)).max()
    assert np.abs(np.asarray(f_p)[m] - np.asarray(f_b)[m]).max() / fs < 2e-6
    qs = max(np.abs(np.asarray(q_b)).max(), 1e-9)
    assert np.abs(np.asarray(q_p)[m] - np.asarray(q_b)[m]).max() / qs < 2e-5


@pytest.mark.parametrize("rng_mode", ["fast", "tea"])
def test_tdpd_fused_kernel_matches_bucket(rng_mode):
    from meso_tpu.kernels.pair_dpd_fused import bucket_forces_pallas_tdpd_fused

    box, st, cfg = _sys(n_species=2)
    st = st.replace(
        C=jnp.stack([1.0 + 0.5 * jnp.cos(st.x[:, 0]),
                     0.5 + 0.2 * jnp.sin(st.x[:, 1])], -1))
    params = TDPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0,
                              kappa_c=[1.0, 0.5], eps_c=[0.1, 0.05],
                              rcc=0.8, s1=2.0, seed=5)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(4)
    f_b, q_b, v_b = jax.jit(
        bucket_forces_tdpd, static_argnames=("dt", "cfg", "rng_mode"))(
        bst.x, bst.v, bst.C, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg, rng_mode=rng_mode)
    f_p, q_p, v_p = bucket_forces_pallas_tdpd_fused(
        bst.x, bst.v, bst.C, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg, interpret=True, rng_mode=rng_mode)
    m = np.asarray(bst.mask)
    fs = np.abs(np.asarray(f_b)).max()
    assert np.abs(np.asarray(f_p)[m] - np.asarray(f_b)[m]).max() / fs < 2e-6
    qs = np.abs(np.asarray(q_b)).max()
    assert np.abs(np.asarray(q_p)[m] - np.asarray(q_b)[m]).max() / qs < 2e-5
    assert abs(float(v_p) - float(v_b)) / abs(float(v_b)) < 1e-5


def test_edpd_fused_kernel_spill_layout():
    """eDPD fused kernel on the right-spill layout vs the dense oracle."""
    from meso_tpu.kernels.pair_dpd_fused import bucket_forces_pallas_edpd_fused

    l, n = 8.0, 1536
    box = Box.cubic(l)
    st = create_random(jax.random.PRNGKey(6), n, box, kt=1.0)
    st = st.replace(T=1.0 + 0.3 * jnp.sin(st.x[:, 0]),
                    dTdt=jnp.zeros(st.n))
    cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l**3, skin=0.3,
                             spill=True)
    assert cfg.spill
    params = EDPDParams.build(a=25.0, gamma=4.5, rc=1.0, kappa=1.5,
                              cv=10.0, seed=7)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(3)
    f_d, q_d, v_d = dense_forces_edpd(bst.x, bst.v, bst.T, bst.typ, bst.tag,
                                      bst.mask, box, step, params, 0.01)
    f_p, q_p, v_p = bucket_forces_pallas_edpd_fused(
        bst.x, bst.v, bst.T, bst.typ, bst.tag, bst.mask, box, step, params,
        0.01, cfg, interpret=True)
    m = np.asarray(bst.mask)
    fs = np.abs(np.asarray(f_d)).max()
    assert np.abs(np.asarray(f_p)[m] - np.asarray(f_d)[m]).max() / fs < 1e-5
    qs = max(np.abs(np.asarray(q_d)).max(), 1e-9)
    assert np.abs(np.asarray(q_p)[m] - np.asarray(q_d)[m]).max() / qs < 1e-4

"""Fused-lane Pallas kernel (kernels/pair_dpd_fused.py) vs the XLA bucket
path — interpret-mode parity on CPU (the pre-device CI gate; CLAUDE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.kernels.pair_dpd_fused import bucket_forces_pallas_fused
from meso_tpu.neighbor.bucket_layout import to_bucket_state
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.ops.bucket_dpd import bucket_forces_xla
from meso_tpu.ops.dpd import DPDParams


def _sys(n=810, l=6.0, seed=3, n_types=1, skin=0.3, **pkw):
    box = Box.cubic(l)
    st = create_random(jax.random.PRNGKey(seed), n, box, kt=1.0)
    if n_types > 1:
        st = st.replace(typ=jnp.arange(st.n, dtype=jnp.int32) % n_types)
    cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l**3, skin=skin)
    params = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=77,
                             n_types=n_types, **pkw)
    if n_types > 1:
        params = params.replace(
            a=params.a * jnp.asarray([[1.0, 1.4], [1.4, 2.0]]),
            rc=params.rc * jnp.asarray([[1.0, 0.8], [0.8, 0.9]]))
    return box, st, cfg, params


def _compare(box, st, cfg, params, rng_mode="fast", s_exp=1.0, z_chunks=1,
             tol=2e-6):
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(42)
    f_p, vir_p = bucket_forces_pallas_fused(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        cfg, rng_mode=rng_mode, interpret=True, s_exp=s_exp,
        z_chunks=z_chunks)
    f_b, vir_b = jax.jit(
        bucket_forces_xla, static_argnames=("dt", "cfg", "rng_mode"))(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        cfg, rng_mode=rng_mode)
    f_p, f_b = np.asarray(f_p), np.asarray(f_b)
    mask = np.asarray(bst.mask)
    scale = np.abs(f_b).max()
    assert np.abs(f_p[mask] - f_b[mask]).max() / scale < tol
    assert np.abs(f_p[~mask]).max() == 0.0
    assert abs(float(vir_p) - float(vir_b)) / abs(float(vir_b)) < 1e-4


@pytest.mark.parametrize("rng_mode", ["fast", "tea"])
def test_fused_matches_bucket(rng_mode):
    box, st, cfg, params = _sys()
    _compare(box, st, cfg, params, rng_mode=rng_mode)


def test_fused_multitype():
    box, st, cfg, params = _sys(n_types=2)
    _compare(box, st, cfg, params)


def test_fused_z_chunks():
    box, st, cfg, params = _sys(n=1536, l=8.0)
    _compare(box, st, cfg, params, z_chunks=2)


def test_fused_s_exp():
    box, st, cfg, params = _sys(s_exp=0.5)
    _compare(box, st, cfg, params, s_exp=0.5)


def test_fused_special_bonds():
    """Chain exclusions: tag i excludes tags i-1, i+1 with weight 0.25."""
    box, st, cfg, params = _sys(n=600)
    n_tags = 600
    tags = np.arange(n_tags + 2)
    excl = np.zeros((n_tags + 2, 2), np.int32)
    excl[1:n_tags + 1, 0] = tags[1:n_tags + 1] - 1
    excl[1:n_tags + 1, 1] = tags[1:n_tags + 1] + 1
    params = params.replace(excl=jnp.asarray(excl),
                            excl_w=jnp.float32(0.25))
    _compare(box, st, cfg, params)


def test_fused_wrapped_particle_mid_window():
    """A particle whose coordinates wrapped the global box while its bucket
    residency is stale must keep full pair forces (min-image in-kernel)."""
    box, st, cfg, params = _sys(n=810)
    bst = to_bucket_state(st, cfg)
    # displace one valid row across the box: x -> x + L (as box.wrap output
    # would give x - L ~ small coordinate while bucket stays at far side)
    rows = np.where(np.asarray(bst.mask))[0]
    r = int(rows[17])
    x = np.array(bst.x)
    lx = float(box.lengths[0])
    x[r, 0] = x[r, 0] - lx if x[r, 0] > lx / 2 else x[r, 0] + lx
    bst = bst.replace(x=jnp.asarray(x))
    step = jnp.int32(7)
    f_p, _ = bucket_forces_pallas_fused(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        cfg, rng_mode="fast", interpret=True)
    f_b, _ = jax.jit(
        bucket_forces_xla, static_argnames=("dt", "cfg", "rng_mode"))(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        cfg, rng_mode="fast")
    mask = np.asarray(bst.mask)
    scale = np.abs(np.asarray(f_b)).max()
    assert np.abs(np.asarray(f_p)[mask] -
                  np.asarray(f_b)[mask]).max() / scale < 2e-6


def test_spill_layout_matches_strict_by_tag():
    """Right-spill packing + window +-2 kernel vs strict buckets + XLA
    sweep: same forces per tag (different row layouts)."""
    from meso_tpu.neighbor.bucket_layout import rebuild_buckets

    n, l = 1536, 8.0
    box = Box.cubic(l)
    st = create_random(jax.random.PRNGKey(5), n, box, kt=1.0)
    params = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=7)
    cfg_s = CellConfig.for_box([l] * 3, rc=1.0, density=n / l**3, skin=0.3)
    cfg_p = CellConfig.for_box([l] * 3, rc=1.0, density=n / l**3, skin=0.3,
                               spill=True)
    assert cfg_p.capacity < cfg_s.capacity
    step = jnp.int32(9)

    bst = to_bucket_state(st, cfg_s)
    f_ref, vir_ref = jax.jit(
        bucket_forces_xla, static_argnames=("dt", "cfg", "rng_mode"))(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        cfg_s, rng_mode="fast")

    pst = to_bucket_state(st, cfg_p)
    f_sp, vir_sp = bucket_forces_pallas_fused(
        pst.x, pst.v, pst.typ, pst.tag, pst.mask, box, step, params, 0.01,
        cfg_p, rng_mode="fast", interpret=True)

    def bytag(state, f):
        m = np.asarray(state.mask)
        t = np.asarray(state.tag)[m]
        o = np.argsort(t)
        return np.asarray(f)[m][o]

    a = bytag(bst, f_ref)
    b = bytag(pst, f_sp)
    scale = np.abs(a).max()
    assert np.abs(a - b).max() / scale < 1e-5
    assert abs(float(vir_sp) - float(vir_ref)) / abs(float(vir_ref)) < 1e-4


def test_spill_rebuild_places_every_particle_within_one_cell():
    from meso_tpu.neighbor.bucket_layout import rebuild_buckets

    n, l = 2000, 8.0
    box = Box.cubic(l)
    st = create_random(jax.random.PRNGKey(12), n, box, kt=1.0)
    cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l**3, skin=0.3,
                             spill=True)
    bst = to_bucket_state(st, cfg)
    assert int(bst.n_valid()) == n
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    rows = np.where(np.asarray(bst.mask))[0]
    slot_cx = rows % nx
    x = np.asarray(bst.x)[rows]
    true_cx = np.floor(x[:, 0] / float(box.lengths[0]) * nx).astype(int)
    d = (slot_cx - true_cx) % nx
    assert ((d == 0) | (d == 1)).all()   # own cell, right spill, or wrap


def test_spill_wrap_last_cell_parity():
    """A jam-packed LAST x-cell wrap-spills into cell 0's top slots; the
    kernel's circular window must still produce exact forces (vs dense)."""
    from meso_tpu.ops.dpd import dense_forces

    rs = np.random.RandomState(4)
    l = 7.5
    box = Box.cubic(l)
    n_bg = 500
    x_bg = rs.uniform(0, l, (n_bg, 3))
    # clump 20 particles inside the last x-cell of one (cy, cz) row
    nxc = 5   # ncell for l=7.5, side 1.5 (skin 0.5)
    side = l / nxc
    clump = np.stack([
        rs.uniform(l - side + 0.05, l - 0.05, 20),
        rs.uniform(0.05, side - 0.05, 20),
        rs.uniform(0.05, side - 0.05, 20)], 1)
    x = np.concatenate([x_bg, clump])
    n = len(x)
    from meso_tpu.core.state import zeros_state
    st = zeros_state(n, box).replace(
        x=jnp.asarray(x, jnp.float32),
        v=jnp.asarray(rs.normal(size=(n, 3)), jnp.float32),
        tag=jnp.arange(1, n + 1, dtype=jnp.int32),
        mask=jnp.ones(n, bool))
    cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l**3, skin=0.5,
                             capacity=16, spill=True)
    assert cfg.ncell == (nxc, nxc, nxc)
    params = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=3)
    step = jnp.int32(4)
    pst = to_bucket_state(st, cfg)   # raises if the wrap spill overflowed
    f_sp, _ = bucket_forces_pallas_fused(
        pst.x, pst.v, pst.typ, pst.tag, pst.mask, box, step, params, 0.01,
        cfg, rng_mode="fast", interpret=True)
    f_d, _, _ = dense_forces(pst.x, pst.v, pst.typ, pst.tag, pst.mask,
                             box, step, params, 0.01, rng_mode="fast")
    m = np.asarray(pst.mask)
    scale = np.abs(np.asarray(f_d)).max()
    assert np.abs(np.asarray(f_sp)[m] -
                  np.asarray(f_d)[m]).max() / scale < 1e-5



def test_spill_production_loop_matches_bucket():
    """20 steps of the fused spill path (run_bucket_chunked) == 20 steps of
    the strict XLA bucket path, compared by tag."""
    import os

    from meso_tpu.core.system import System, SystemParams, setup, \
        run_bucket_chunked

    os.environ["MESO_PALLAS_INTERPRET"] = "1"   # production path reads env
    l = 8.0
    n = int(3 * l ** 3)
    box = Box.cubic(l)
    st0 = create_random(jax.random.PRNGKey(8), n, box, kt=1.0)
    params = SystemParams.build(
        DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=5))

    outs = {}
    for path, spill in (("bucket", False), ("pallas", True)):
        system = System.for_fluid([l] * 3, rc=1.0, density=n / l**3,
                                  dt=0.01, skin=0.3, rebuild_every=5,
                                  rng_mode="fast", spill=spill)
        system = system.replace(force_path=path)
        st = setup(system, params, st0)
        st, diag = run_bucket_chunked(system, params, st, 4, 5)
        assert int(diag["bucket_overflow"]) == 0
        m = np.asarray(st.mask)
        t = np.asarray(st.tag)[m]
        o = np.argsort(t)
        outs[path] = (np.asarray(st.x)[m][o], np.asarray(st.v)[m][o])
    assert np.abs(outs["pallas"][0] - outs["bucket"][0]).max() < 1e-4
    assert np.abs(outs["pallas"][1] - outs["bucket"][1]).max() < 1e-3

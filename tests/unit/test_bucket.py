"""Bucket-resident layout + structured force path vs the dense oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.neighbor.bucket_layout import (n_rows, rebuild_buckets,
                                             to_bucket_state)
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.ops.bucket_dpd import bucket_forces_xla
from meso_tpu.ops.dpd import DPDParams, dense_forces


def _sys(n=810, l=6.0, seed=3):
    box = Box.cubic(l)
    st = create_random(jax.random.PRNGKey(seed), n, box, kt=1.0)
    cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l**3, skin=0.3)
    params = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=77)
    return box, st, cfg, params


def test_bucket_rows_complete():
    box, st, cfg, _ = _sys()
    bst = to_bucket_state(st, cfg)
    assert bst.n == n_rows(cfg)
    assert int(bst.n_valid()) == 810
    # every original tag present exactly once
    tags = np.asarray(bst.tag)[np.asarray(bst.mask)]
    assert (np.sort(tags) == np.arange(1, 811)).all()
    # row -> cell invariant: each valid row's position is inside its cell
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    rows = np.where(np.asarray(bst.mask))[0]
    cx = rows % nx
    slotbase = rows // nx
    base = slotbase // k
    cz = base % nz
    cy = base // nz
    x = np.asarray(bst.x)[rows]
    lens = np.asarray(box.lengths)
    assert (np.floor(x[:, 0] / lens[0] * nx).astype(int) == cx).all()
    assert (np.floor(x[:, 1] / lens[1] * ny).astype(int) == cy).all()
    assert (np.floor(x[:, 2] / lens[2] * nz).astype(int) == cz).all()


def test_rebuild_idempotent_and_stable():
    box, st, cfg, _ = _sys()
    bst = to_bucket_state(st, cfg)
    bst2, of = jax.jit(rebuild_buckets, static_argnames="cfg")(bst, cfg)
    assert int(of) == 0
    assert (np.asarray(bst2.tag) == np.asarray(bst.tag)).all()
    assert (np.asarray(bst2.x) == np.asarray(bst.x)).all()


@pytest.mark.parametrize("rng_mode", ["fast", "tea"])
def test_bucket_forces_match_dense(rng_mode):
    box, st, cfg, params = _sys()
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(42)
    f_b, vir_b = jax.jit(
        bucket_forces_xla, static_argnames=("dt", "cfg", "rng_mode"))(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        cfg, rng_mode=rng_mode)
    f_d, vir_d, _ = dense_forces(bst.x, bst.v, bst.typ, bst.tag, bst.mask,
                                 box, step, params, 0.01, rng_mode=rng_mode)
    f_b, f_d = np.asarray(f_b), np.asarray(f_d)
    mask = np.asarray(bst.mask)
    scale = np.abs(f_d).max()
    assert np.abs(f_b[mask] - f_d[mask]).max() / scale < 2e-6
    assert np.abs(f_b[~mask]).max() == 0.0
    assert abs(float(vir_b) - float(vir_d)) / abs(float(vir_d)) < 1e-5


def test_bucket_physics_short():
    """20 steps of the bucket path == 20 steps of the dense path."""
    from meso_tpu.core.system import (System, SystemParams, run_bucket,
                                      run_chunk, setup)
    box, st, cfg, pair = _sys(n=648)
    params = SystemParams.build(pair)
    sys_b = System(dt=0.01, force_path="bucket", cells=cfg, rng_mode="fast")
    sys_d = System(dt=0.01, force_path="dense", rng_mode="fast")
    st_b = setup(sys_b, params, st)
    st_d = setup(sys_d, params, st)
    st_b, diag = run_bucket(sys_b, params, st_b, 20)
    assert int(diag["bucket_overflow"]) == 0
    st_d = run_chunk(sys_d, params, st_d, 20)
    mask_b = np.asarray(st_b.mask)
    ob = np.argsort(np.asarray(st_b.tag)[mask_b])
    od = np.argsort(np.asarray(st_d.tag))
    xb = np.asarray(st_b.x)[mask_b][ob]
    xd = np.asarray(st_d.x)[od]
    assert np.abs(xb - xd).max() < 1e-4


@pytest.mark.parametrize("rng_mode", ["fast", "tea"])
def test_pallas_kernel_matches_xla_interpret(rng_mode):
    """Pallas kernel (interpret mode) vs the XLA bucket path: same traversal,
    same math (both RNG tiers in-kernel), roundoff-level agreement."""
    from meso_tpu.kernels.pair_dpd import bucket_forces_pallas
    box, st, cfg, params = _sys()
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(42)
    f_x, vir_x = jax.jit(
        bucket_forces_xla, static_argnames=("dt", "cfg", "rng_mode"))(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        cfg, rng_mode=rng_mode)
    f_p, vir_p = bucket_forces_pallas(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        cfg, rng_mode=rng_mode, interpret=True)
    m = np.asarray(bst.mask)
    scale = np.abs(np.asarray(f_x)).max()
    assert np.abs(np.asarray(f_p)[m] - np.asarray(f_x)[m]).max() / scale < 1e-5
    assert np.abs(np.asarray(f_p)[~m]).max() == 0.0
    assert abs(float(vir_p) - float(vir_x)) / abs(float(vir_x)) < 1e-5


def test_pallas_kernel_multitype_matches_dense():
    """2-type coefficient tables: Pallas (interpret) vs the dense oracle —
    the in-kernel SMEM select chain resolves per-pair a/gamma/sigma/rc."""
    from meso_tpu.kernels.pair_dpd import bucket_forces_pallas
    box, st, cfg, _ = _sys()
    a = jnp.asarray([[25.0, 40.0], [40.0, 15.0]], jnp.float32)
    g = jnp.asarray([[4.5, 9.0], [9.0, 2.0]], jnp.float32)
    params = DPDParams.build(a=a, gamma=g, rc=1.0, kt=1.0, seed=1234,
                             n_types=2)
    st = st.replace(typ=(st.tag % 2).astype(jnp.int32))
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(7)
    f_d, vir_d, _ = dense_forces(bst.x, bst.v, bst.typ, bst.tag, bst.mask,
                                 box, step, params, 0.01, rng_mode="fast")
    f_p, vir_p = bucket_forces_pallas(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        cfg, rng_mode="fast", interpret=True)
    m = np.asarray(bst.mask)
    scale = np.abs(np.asarray(f_d)).max()
    assert np.abs(np.asarray(f_p)[m] - np.asarray(f_d)[m]).max() / scale < 1e-5
    assert abs(float(vir_p) - float(vir_d)) / abs(float(vir_d)) < 1e-5


def test_s_exp_generalized_weights_all_paths_match():
    """s_exp = 0.5 (generalized w_R = w^s, w_D = w^(2s), Fan et al.):
    dense oracle, XLA sweep and Pallas kernel agree."""
    from meso_tpu.kernels.pair_dpd import bucket_forces_pallas
    box, st, cfg, _ = _sys()
    params = DPDParams.build(a=25.0, gamma=4.5, rc=1.0, kt=1.0, seed=55,
                             s_exp=0.5)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(3)
    f_d, vir_d, _ = dense_forces(bst.x, bst.v, bst.typ, bst.tag, bst.mask,
                                 box, step, params, 0.01, rng_mode="fast")
    f_x, vir_x = jax.jit(
        bucket_forces_xla, static_argnames=("dt", "cfg", "rng_mode"))(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        cfg, rng_mode="fast")
    f_p, vir_p = bucket_forces_pallas(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        cfg, rng_mode="fast", interpret=True)
    m = np.asarray(bst.mask)
    scale = np.abs(np.asarray(f_d)).max()
    assert np.abs(np.asarray(f_x)[m] - np.asarray(f_d)[m]).max() / scale < 2e-6
    assert np.abs(np.asarray(f_p)[m] - np.asarray(f_d)[m]).max() / scale < 1e-5
    assert abs(float(vir_x) - float(vir_d)) / abs(float(vir_d)) < 1e-5
    assert abs(float(vir_p) - float(vir_d)) / abs(float(vir_d)) < 1e-5


def test_special_bonds_bucket_and_pallas_match_dense():
    """special_bonds (row 7) through the sweep EX channels and the Pallas
    in-kernel tag-list compare: excluded pairs scaled by excl_w, parity
    with the dense oracle."""
    from meso_tpu.kernels.pair_dpd import bucket_forces_pallas
    from meso_tpu.ops.dpd import build_exclusions
    box, st, cfg, params = _sys()
    # chain-neighbor exclusions over consecutive tags (1-based convention)
    st = st.replace(tag=st.tag + 1)
    n = st.n
    bonds = np.stack([np.arange(1, n), np.arange(2, n + 1)], -1)
    excl, w = build_exclusions(bonds, n, weight=0.25, max_excl=2)
    params = params.replace(excl=excl, excl_w=w)
    bst = to_bucket_state(st, cfg)
    step = jnp.int32(6)
    f_d, vir_d, _ = dense_forces(bst.x, bst.v, bst.typ, bst.tag, bst.mask,
                                 box, step, params, 0.01, rng_mode="fast")
    f_x, vir_x = jax.jit(
        bucket_forces_xla, static_argnames=("dt", "cfg", "rng_mode"))(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        cfg, rng_mode="fast")
    f_p, vir_p = bucket_forces_pallas(
        bst.x, bst.v, bst.typ, bst.tag, bst.mask, box, step, params, 0.01,
        cfg, rng_mode="fast", interpret=True)
    m = np.asarray(bst.mask)
    scale = np.abs(np.asarray(f_d)).max()
    assert np.abs(np.asarray(f_x)[m] - np.asarray(f_d)[m]).max() / scale < 2e-6
    assert np.abs(np.asarray(f_p)[m] - np.asarray(f_d)[m]).max() / scale < 1e-5
    assert abs(float(vir_x) - float(vir_d)) / abs(float(vir_d)) < 1e-5
    assert abs(float(vir_p) - float(vir_d)) / abs(float(vir_d)) < 1e-5
    # weight actually bites: zero-weight forces differ from unexcluded
    f_u, _, _ = dense_forces(bst.x, bst.v, bst.typ, bst.tag, bst.mask,
                             box, step, params.replace(excl=None,
                                                       excl_w=None),
                             0.01, rng_mode="fast")
    assert np.abs(np.asarray(f_d)[m] - np.asarray(f_u)[m]).max() > 1e-3


def test_sort_rebuild_matches_gather():
    """rebuild_buckets_sort places every row bitwise-identically to the
    gather engine (strict and spill), in the steady state (nr-row input)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from meso_tpu.core.box import Box
    from meso_tpu.core.state import create_random
    from meso_tpu.neighbor.bucket_layout import (_rebuild_buckets_gather,
                                                 rebuild_buckets_sort,
                                                 to_bucket_state)
    from meso_tpu.neighbor.cells import CellConfig

    for spill in (False, True):
        l, n = 6.0, 810
        box = Box.cubic(l)
        st = create_random(jax.random.PRNGKey(11), n, box, kt=1.0)
        cfg = CellConfig.for_box([l] * 3, rc=1.0, density=n / l ** 3,
                                 skin=0.3, spill=spill)
        bst = to_bucket_state(st, cfg)
        # drift the positions a bit so the resort is nontrivial
        bst = bst.replace(x=box.wrap(bst.x + 0.05 * bst.v)[0])
        a, of_a = jax.jit(_rebuild_buckets_gather,
                          static_argnames="cfg")(bst, cfg)
        b, of_b = jax.jit(rebuild_buckets_sort,
                          static_argnames="cfg")(bst, cfg)
        assert int(of_a) == int(of_b) == 0
        for f in ("x", "v", "f", "tag", "typ", "mol", "image"):
            av, bv = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
            assert (av == bv).all(), (spill, f)
        assert (np.asarray(a.mask) == np.asarray(b.mask)).all()

"""Parity gate for the sort-native ``spill_assign`` (VERDICT r4 item 1).

The r3 formulation ran a segmented prefix max over all 2M sorted rows
(``associative_scan``, 58 ms on device at 1M); the r4 formulation computes
the same quantity with PLAIN cummaxes via base-offset packing (~5 ms
each on device). This test keeps the scan formulation as the oracle
and requires bitwise-identical (target, fits, overflow) on random
configurations spanning: empty cells, spill chains across many cells,
hard overflow, the wrap path (last cell -> cell 0 top slots), wrap
disabled (the DD variant), and invalid padding rows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meso_tpu.neighbor.bucket_layout import spill_assign


def spill_assign_scan(base, cxs, valid_s, n_in, nx, k, n_rows_yz,
                      wrap=True):
    """The r3 segmented-prefix-max formulation, kept verbatim as oracle."""
    nr = n_rows_yz * k * nx
    row_starts = jnp.searchsorted(
        base, jnp.arange(n_rows_yz + 1, dtype=base.dtype), side="left")
    r = jnp.arange(n_in, dtype=jnp.int32) - row_starts[
        jnp.minimum(base, n_rows_yz)].astype(jnp.int32)
    a = cxs.astype(jnp.int32) * k - r

    def comb(left, right):
        s1, v1 = left
        s2, v2 = right
        return s2, jnp.where(s1 == s2, jnp.maximum(v1, v2), v2)

    _, am = jax.lax.associative_scan(comb, (base, a))
    l_lin = r + am
    in_row = valid_s & (l_lin < jnp.minimum((cxs + 2) * k, nx * k))
    arange_n = jnp.arange(n_in, dtype=jnp.int32)
    if wrap:
        m = l_lin - nx * k
        c0_used = jnp.zeros((n_rows_yz + 1,), jnp.int32).at[
            jnp.minimum(base, n_rows_yz)].add(
            (valid_s & (l_lin < k)).astype(jnp.int32))
        wrap_ok = (valid_s & ~in_row & (cxs == nx - 1) & (m >= 0)
                   & (m < k) & (k - 1 - m >= c0_used[
                       jnp.minimum(base, n_rows_yz)]))
    else:
        wrap_ok = jnp.zeros_like(in_row)
    fits = in_row | wrap_ok
    overflow = jnp.sum(valid_s & ~fits)
    cell_a = jnp.where(wrap_ok, 0, l_lin // k)
    slot = jnp.where(wrap_ok, k - 1 - (l_lin - nx * k),
                     l_lin - (l_lin // k) * k)
    target = (base * k + slot) * nx + cell_a
    target = jnp.where(fits, target, nr + arange_n)
    return target, fits, overflow


def _make_case(seed, nx, n_rows_yz, k, mean_occ, n_pad):
    """Random sorted-key inputs as produced by both rebuild engines:
    valid rows sorted by cell key, invalid padding rows keyed n_cells."""
    rng = np.random.default_rng(seed)
    n_cells = n_rows_yz * nx
    # Poisson occupancy plus a few deliberately-slammed cells so spill
    # chains cross several cells and (at high mean_occ) overflow
    occ = rng.poisson(mean_occ, size=n_cells)
    hot = rng.integers(0, n_cells, size=max(n_cells // 16, 1))
    occ[hot] += rng.integers(k, 2 * k, size=hot.size)
    keys = np.repeat(np.arange(n_cells, dtype=np.int32), occ)
    n_valid = keys.size
    keys = np.concatenate(
        [keys, np.full(n_pad, n_cells, np.int32)])
    n_in = keys.size
    valid = np.arange(n_in) < n_valid
    base = keys // nx
    cxs = keys - base * nx
    return (jnp.asarray(base), jnp.asarray(cxs), jnp.asarray(valid),
            n_in)


CASES = [
    # (nx, n_rows_yz, k, mean_occ) — low fill, production-like, slammed
    (5, 4, 4, 1.0),
    (8, 16, 8, 3.0),
    (16, 36, 16, 9.2),    # the 1M production profile (spill K=16, occ 9.2)
    (8, 8, 4, 6.0),       # heavy overflow
    (46, 9, 16, 9.2),     # production nx
]


@pytest.mark.parametrize("wrap", [True, False])
@pytest.mark.parametrize("nx,n_rows_yz,k,mean_occ", CASES)
def test_bitwise_parity_vs_scan(nx, n_rows_yz, k, mean_occ, wrap):
    for seed in range(3):
        base, cxs, valid, n_in = _make_case(
            1000 * seed + nx + k, nx, n_rows_yz, k, mean_occ,
            n_pad=n_rows_yz * nx * k // 3)
        got = jax.jit(spill_assign, static_argnums=(3, 4, 5, 6, 7))(
            base, cxs, valid, n_in, nx, k, n_rows_yz, wrap)
        want = spill_assign_scan(base, cxs, valid, n_in, nx, k,
                                 n_rows_yz, wrap)
        for g, w, name in zip(got, want, ("target", "fits", "overflow")):
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(w),
                err_msg=f"{name} mismatch (nx={nx} rows={n_rows_yz} "
                        f"k={k} occ={mean_occ} wrap={wrap})")


def test_semantic_invariants():
    """Independent of the oracle: fitting targets are unique, in range,
    land in the particle's own or a RIGHT cell block (or the wrap block),
    and every cell's own particles fill before spilling."""
    nx, n_rows_yz, k = 16, 36, 16
    base, cxs, valid, n_in = _make_case(7, nx, n_rows_yz, k, 9.2,
                                        n_pad=512)
    target, fits, overflow = spill_assign(
        base, cxs, valid, n_in, nx, k, n_rows_yz, wrap=True)
    target, fits = np.asarray(target), np.asarray(fits)
    base_n, cxs_n = np.asarray(base), np.asarray(cxs)
    nr = n_rows_yz * nx * k
    t_fit = target[fits]
    assert np.unique(t_fit).size == t_fit.size
    assert (t_fit >= 0).all() and (t_fit < nr).all()
    # decode: row = ((R*k + slot)*nx + cx_block)
    cx_block = t_fit % nx
    rk = t_fit // nx
    R = rk // k
    assert (R == base_n[fits]).all()
    own = cxs_n[fits]
    right = (cx_block >= own)
    wrapped = (cx_block == 0) & (own == nx - 1)
    assert (right | wrapped).all()
    # non-fitting rows keep distinct OOB targets
    t_miss = target[~fits]
    assert (t_miss >= nr).all()
    assert np.unique(t_miss).size == t_miss.size


@pytest.mark.parametrize("wrap", [True, False])
@pytest.mark.parametrize("nx,n_rows_yz,k,mean_occ", CASES)
def test_dummy_targets_bijection(nx, n_rows_yz, k, mean_occ, wrap):
    """``_dummy_targets`` must hand every non-fitting sorted row a
    DISTINCT slot that no fitting row occupies, together forming a
    permutation of [0, nr) — including under heavy overflow and wrap
    relief (any steady-state nr-row input)."""
    from meso_tpu.neighbor.bucket_layout import _dummy_targets
    for seed in range(3):
        base, cxs, valid, n_in = _make_case(
            777 * seed + nx + k, nx, n_rows_yz, k, mean_occ,
            n_pad=n_rows_yz * nx * k)
        nr = n_rows_yz * nx * k
        # steady state: exactly nr rows. _make_case appends padding at the
        # end, so pad/truncate the tail (valid rows always kept — a case
        # denser than nr rows total is not a steady state, skip it).
        n_valid = int(np.sum(np.asarray(valid)))
        if n_valid > nr:
            pytest.skip("case denser than nr — not a steady state")
        if n_in < nr:
            pad = nr - n_in
            base = jnp.concatenate(
                [base, jnp.full((pad,), n_rows_yz, base.dtype)])
            cxs = jnp.concatenate([cxs, jnp.zeros((pad,), cxs.dtype)])
            valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
        else:
            base, cxs, valid = base[:nr], cxs[:nr], valid[:nr]
        n_in = nr
        target, fits, overflow = spill_assign(
            base, cxs, valid, n_in, nx, k, n_rows_yz, wrap)
        t_dummy = _dummy_targets(target, fits, nr)
        t_full = np.where(np.asarray(fits), np.asarray(target),
                          np.asarray(t_dummy))
        np.testing.assert_array_equal(
            np.sort(t_full), np.arange(nr),
            err_msg=f"not a permutation (nx={nx} rows={n_rows_yz} k={k} "
                    f"occ={mean_occ} wrap={wrap} of={int(overflow)})")


def test_empty_rows_and_cells():
    """Rows with zero particles and long empty-cell gaps must not shift
    placement (the cummax over empty cells is dominated by present ones)."""
    nx, n_rows_yz, k = 12, 6, 4
    # only two cells populated, far apart, in one row; other rows empty
    keys = np.asarray([3, 3, 3, 3, 3, 3, 10, 10], np.int32)  # row 0
    base = jnp.asarray(keys // nx)
    cxs = jnp.asarray(keys % nx)
    valid = jnp.ones(keys.size, bool)
    target, fits, overflow = spill_assign(
        base, cxs, valid, keys.size, nx, k, n_rows_yz, wrap=True)
    want = spill_assign_scan(base, cxs, valid, keys.size, nx, k,
                             n_rows_yz, wrap=True)
    np.testing.assert_array_equal(np.asarray(target), np.asarray(want[0]))
    assert int(overflow) == 0
    # cell 3 holds 6 > K=4: 4 in own block, 2 spill right into block 4
    t = np.asarray(target)
    assert (t[:4] % nx == 3).all() and (t[4:6] % nx == 4).all()
    assert (t[6:] % nx == 10).all()

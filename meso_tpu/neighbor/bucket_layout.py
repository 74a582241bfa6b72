"""Bucket-resident state layout — the TPU-native hot-path data structure.

The reference keeps atoms cell-sorted in flat GPU arrays and gathers
neighbors through index lists (SURVEY.md §2b rows 18-19). TPU hardware
punishes per-row gathers, so the TPU-native layout makes the *state rows
themselves* the cell buckets: row index

    row = ((cy * ncz + cz) * K + slot) * ncx + cx

i.e. per-particle arrays reshape *zero-copy* to planes (ncy, ncz, K, ncx)
whose trailing axis is the x-cell — lanes on the VPU. Force evaluation then
needs only static rolls/broadcasts (x-neighbors) and (ncy, ncz)-halo blocks
(y/z-neighbors): no gather, no scatter, no atomics anywhere in the hot loop.

Padding slots (mask=False) carry zero velocity/force and stale-but-finite
positions; capacity overflow (cell occupancy > K) is a *checked invariant*
(SURVEY.md §5.2) — overflowing particles are parked in the closest free
slot's stead is NOT attempted: they are counted and the run must be retried
with larger K (the recompile-on-grow policy of §7.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from meso_tpu.core.box import Box
from meso_tpu.core.state import State
from meso_tpu.neighbor.cells import CellConfig

Array = jax.Array


def grid_shape(cfg: CellConfig) -> tuple[int, int, int, int]:
    nx, ny, nz = cfg.ncell
    return (ny, nz, cfg.capacity, nx)


def n_rows(cfg: CellConfig) -> int:
    ny, nz, k, nx = grid_shape(cfg)
    return ny * nz * k * nx


def cell_coords(x: Array, mask: Array, box: Box, cfg: CellConfig):
    """(cx, cy, cz) int32 per row; masked rows get cx = -1 marker."""
    nx, ny, nz = cfg.ncell
    n_arr = jnp.asarray([nx, ny, nz], jnp.int32)
    frac = (x - box.lo) / box.lengths
    c = jnp.clip((frac * n_arr.astype(x.dtype)).astype(jnp.int32), 0, n_arr - 1)
    cx = jnp.where(mask, c[:, 0], -1)
    return cx, c[:, 1], c[:, 2]


def _pack_rows(state: State):
    """Pack all per-particle fields into one (n, W) float32 matrix (ints
    bitcast) so the rebuild permutation is ONE gather + ONE scatter instead
    of two per field — the dominant rebuild cost on TPU."""
    def bc(a):
        return jax.lax.bitcast_convert_type(a.astype(jnp.int32), jnp.float32)

    cols = [state.x, state.v, state.f,
            bc(state.tag)[:, None], bc(state.typ)[:, None],
            bc(state.mol)[:, None], bc(state.image),
            state.mask.astype(jnp.float32)[:, None]]
    layout = {"x": (0, 3), "v": (3, 3), "f": (6, 3), "tag": (9, 1),
              "typ": (10, 1), "mol": (11, 1), "image": (12, 3),
              "mask": (15, 1)}
    off = 16
    for name in ("T", "dTdt"):
        a = getattr(state, name)
        if a is not None:
            cols.append(a[:, None])
            layout[name] = (off, 1)
            off += 1
    for name in ("C", "dCdt"):
        a = getattr(state, name)
        if a is not None:
            cols.append(a)
            layout[name] = (off, a.shape[1])
            off += a.shape[1]
    return jnp.concatenate(cols, axis=1), layout


def _unpack_rows(packed: Array, layout: dict, state: State) -> State:
    def ub(name):
        o, w = layout[name]
        return jax.lax.bitcast_convert_type(packed[:, o:o + w], jnp.int32)

    def uf(name):
        o, w = layout[name]
        return packed[:, o:o + w]

    kw = dict(
        x=uf("x"), v=uf("v"), f=uf("f"),
        tag=ub("tag")[:, 0], typ=ub("typ")[:, 0], mol=ub("mol")[:, 0],
        image=ub("image"), mask=uf("mask")[:, 0] > 0.5,
        box=state.box, step=state.step,
        T=None, dTdt=None, C=None, dCdt=None)
    if "T" in layout:
        kw["T"] = uf("T")[:, 0]
        kw["dTdt"] = uf("dTdt")[:, 0]
    if "C" in layout:
        kw["C"] = uf("C")
        kw["dCdt"] = uf("dCdt")
    return State(**kw)


def spill_tables(key_s: Array, nx: int, k: int, n_rows_yz: int):
    """Per-CELL tables of the spill layout, from sorted cell keys:

    - ``starts``: (n_cells+1,) first sorted row of each cell (searchsorted)
    - ``g_cell``: (n_rows_yz, nx) row-local cummax of cx*K - starts — the
      segmented prefix max of the r3 scan formulation, constant per cell
    - ``c0_used``: (n_rows_yz,) occupied slot count of each row's cell 0

    Shared by ``spill_assign`` and the analytic dummy-slot enumeration in
    ``rebuild_buckets_sort`` so the tables are built once per rebuild.
    """
    n_cells = n_rows_yz * nx
    starts = jnp.searchsorted(
        key_s, jnp.arange(n_cells + 1, dtype=key_s.dtype),
        side="left").astype(jnp.int32)
    a_cell = (jnp.arange(nx, dtype=jnp.int32)[None, :] * k
              - starts[:n_cells].reshape(n_rows_yz, nx))
    g_cell = jax.lax.cummax(a_cell, axis=1)
    row0 = jnp.arange(n_rows_yz, dtype=jnp.int32) * nx
    c0_used = jnp.minimum(starts[row0 + 1] - starts[row0], k)
    return starts, g_cell, c0_used


def spill_assign(base: Array, cxs: Array, valid_s: Array, n_in: int,
                 nx: int, k: int, n_rows_yz: int, wrap: bool = True,
                 tables=None):
    """Right-spill slot assignment for cell-sorted rows (see
    ``rebuild_buckets``): within each (cy,cz) row, linear slot
    l = r + cummax_row(cx*K - r) places each particle at its own cell's
    block or spills it RIGHT into the next cell's free slots.

    wrap=True additionally lets the LAST cell's overflow wrap into cell 0's
    top free slots (single-chip periodic layout). wrap=False counts it as
    overflow instead — the domain-decomposition variant, where a brick's
    column 0 belongs to a DIFFERENT x-window than column nx-1 and halo
    exchange ships only boundary columns (VERDICT r3 item 3).

    Sort-native implementation (VERDICT r4 item 1): the per-row segmented
    prefix max over 2M rows (associative_scan, 58 ms on device at 1M) is
    replaced with PER-CELL tables. Because rows arrive sorted by cell key,
    the prefix max  am_i = max_{j<=i, same row}(cx_j*K - r_j)  is constant
    within a cell and equals, for cell c in row R,

        g_c = cummax_{c'<=c in R}(c'*K - starts[c'])          (row-local)

    where starts = searchsorted(key_s, arange(n_cells+1)) — empty cells are
    dominated by the next present cell (cK - starts[c] < c'K - starts[c']
    for c < c', starts equal), so including them never changes the max.
    Then l_lin_i = r_i + am_i = i + g[key_i]: one (n_cells,) cummax over
    the (n_rows_yz, nx) cell grid + ONE row-sized gather.

    Returns (target_row, fits, overflow) — bitwise identical to the scan
    formulation (tests/unit/test_spill_assign.py).
    """
    nr = n_rows_yz * k * nx
    n_cells = n_rows_yz * nx
    key_s = base * nx + cxs                      # sorted; invalid = n_cells
    if tables is None:
        tables = spill_tables(key_s, nx, k, n_rows_yz)
    starts, g_cell, c0_used = tables
    g_flat = g_cell.reshape(-1)
    # invalid rows (key == n_cells) gather garbage here; every consumer
    # below is masked by valid_s, and their target is forced OOB
    l_lin = (jnp.arange(n_in, dtype=jnp.int32)
             + g_flat[jnp.minimum(key_s, n_cells - 1)])
    in_row = valid_s & (l_lin < jnp.minimum((cxs + 2) * k, nx * k))
    arange_n = jnp.arange(n_in, dtype=jnp.int32)
    if wrap:
        m = l_lin - nx * k
        # only cx=0 particles can sit in cell 0's block (l_lin >= cx*K),
        # and for them l_lin = rank-in-cell, so the count of used cell-0
        # slots is min(count(cell R*nx), K) — pure per-row arithmetic
        wrap_ok = (valid_s & ~in_row & (cxs == nx - 1) & (m >= 0)
                   & (m < k) & (k - 1 - m >= c0_used[
                       jnp.minimum(base, n_rows_yz - 1)]))
    else:
        wrap_ok = jnp.zeros_like(in_row)
    fits = in_row | wrap_ok
    overflow = jnp.sum(valid_s & ~fits)
    cell_a = jnp.where(wrap_ok, 0, l_lin // k)
    slot = jnp.where(wrap_ok, k - 1 - (l_lin - nx * k),
                     l_lin - (l_lin // k) * k)
    target = (base * k + slot) * nx + cell_a
    # dropped rows get DISTINCT out-of-bounds targets so the scatter can
    # honestly claim unique indices
    target = jnp.where(fits, target, nr + arange_n)
    return target, fits, overflow


def _gaps_to_targets(s_all: Array, e_all: Array, miss_rank: Array,
                     nx: int, k: int) -> Array:
    """Map the j-th missing sorted row to the j-th UNUSED bucket slot,
    given the per-row ordered non-overlapping used intervals
    [s_all, e_all) in row-local linear-slot coordinates l = cx*K + slot.

    The gaps between consecutive intervals (and the row tail up to nx*K)
    enumerate every unused slot; a cumulative gap count + one searchsorted
    turns a miss rank into (interval, offset) and then into the bucket row
    index — replacing the r3 used-scatter + full argsort over nr rows
    (29 ms on device at 1M) with O(n_cells) table work (VERDICT r4 item 1).

    Any bijection misses→unused is correct (dummy rows are zeroed by the
    live mask after placement), so enumeration order need not match the
    r3 ascending-target order.
    """
    n_rows_yz, j_per_row = s_all.shape
    nxt = jnp.concatenate(
        [s_all[:, 1:],
         jnp.full((n_rows_yz, 1), nx * k, jnp.int32)], axis=1)
    gap = (nxt - e_all).reshape(-1)
    cum = jnp.cumsum(gap)
    cum_ex = cum - gap
    idx = jnp.searchsorted(cum, miss_rank.astype(cum.dtype), side="right")
    idx = jnp.minimum(idx, n_rows_yz * j_per_row - 1)
    l = e_all.reshape(-1)[idx] + (miss_rank - cum_ex[idx])
    row = idx // j_per_row
    return (row * k + l % k) * nx + l // k


def _unused_targets_spill(miss_rank: Array, tables, nx: int, k: int,
                          n_rows_yz: int, wrap: bool) -> Array:
    """Used-interval tables for the SPILL layout, fed to
    ``_gaps_to_targets``. Within each (cy,cz) row, cell c's particles
    occupy the contiguous run [starts_c + g_c, starts_{c+1} + g_c) of
    row-local linear slots, capped at min((c+2)K, nx*K) (the fits bound);
    consecutive runs never overlap (run_{c+1} starts at
    starts_{c+1} + g_{c+1} >= starts_{c+1} + g_c = raw end of run c).
    With wrap relief, the last cell's accepted overflow occupies the
    descending slots K-1-m of cell 0's block — a single interval sitting
    strictly between cell 0's run and cell 1's run.
    """
    starts, g_cell, c0_used = tables
    n_cells = n_rows_yz * nx
    st = starts[:n_cells].reshape(n_rows_yz, nx)
    st_next = starts[1:n_cells + 1].reshape(n_rows_yz, nx)
    cap = jnp.minimum((jnp.arange(nx, dtype=jnp.int32) + 2) * k,
                      nx * k)[None, :]
    run_s_raw = st + g_cell
    run_e_raw = st_next + g_cell
    run_s = jnp.minimum(run_s_raw, cap)
    run_e = jnp.minimum(run_e_raw, cap)
    if not wrap:
        return _gaps_to_targets(run_s, run_e, miss_rank, nx, k)
    # wrap interval: accepted m = l - nx*K of the last cell's overflow,
    # m in [m_lo, m_end) with m < K and K-1-m >= c0_used; slots K-1-m
    # form [K - m_end, K - m_lo). Clamped into [end(run 0), start(run 1)]
    # so empty intervals keep the global interval ordering monotone.
    m_lo = jnp.maximum(run_s_raw[:, -1] - nx * k, 0)
    m_end = jnp.minimum(run_e_raw[:, -1] - nx * k, k - c0_used)
    m_end = jnp.maximum(m_end, m_lo)
    lo0 = run_e[:, 0]
    hi1 = run_s[:, 1]
    w_s = jnp.clip(k - m_end, lo0, hi1)
    w_e = jnp.clip(k - m_lo, w_s, hi1)
    s_all = jnp.concatenate(
        [run_s[:, :1], w_s[:, None], run_s[:, 1:]], axis=1)
    e_all = jnp.concatenate(
        [run_e[:, :1], w_e[:, None], run_e[:, 1:]], axis=1)
    return _gaps_to_targets(s_all, e_all, miss_rank, nx, k)


def _unused_targets_strict(miss_rank: Array, starts: Array, nx: int,
                           k: int, n_rows_yz: int) -> Array:
    """Used-interval tables for the STRICT layout: cell c occupies
    [c*K, c*K + min(count_c, K)) of its own block, nothing spills."""
    n_cells = n_rows_yz * nx
    cnt = (starts[1:n_cells + 1] - starts[:n_cells]).reshape(n_rows_yz, nx)
    blk = (jnp.arange(nx, dtype=jnp.int32) * k)[None, :]
    s_all = jnp.broadcast_to(blk, cnt.shape)
    e_all = blk + jnp.minimum(cnt, k)
    return _gaps_to_targets(s_all, e_all, miss_rank, nx, k)


def rebuild_buckets(state: State, cfg: CellConfig) -> tuple[State, Array]:
    """Redistribute rows into bucket order. Input may have any row count;
    output has exactly n_rows(cfg) rows. Returns (bucket_state, overflow).

    Dispatches on ``cfg.rebuild``: "gather" = index-map + one wide gather
    (r2 design); "sort" = two multi-operand sorts (r3 design, see
    ``rebuild_buckets_sort`` — requires a steady-state nr-row input and
    falls back to gather otherwise). Both produce bitwise-identical
    placement.
    """
    if cfg.wrap_at_rebuild:
        # deferred global wrap (System.wrap_mode="rebuild"): positions may
        # have drifted out of the box by <= skin/2 since the last rebuild
        x_w, image_w = state.box.wrap(state.x, state.image)
        state = state.replace(x=x_w, image=image_w)
    if getattr(cfg, "rebuild", "gather") == "sort" and state.n == n_rows(cfg):
        return rebuild_buckets_sort(state, cfg)
    return _rebuild_buckets_gather(state, cfg)


def _rebuild_buckets_gather(state: State, cfg: CellConfig) -> tuple[State,
                                                                    Array]:
    """Index-map + one packed gather for all fields (the reference's
    count/scan/fill in sort+scan+scatter form, §3.4)."""
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    nr = n_rows(cfg)
    n_in = state.n

    cx, cy, cz = cell_coords(state.x, state.mask, state.box, cfg)
    # cell key in row order (cx fastest), invalid rows -> huge key (sort last)
    key = (cy * nz + cz) * nx + cx
    key = jnp.where(state.mask, key, nx * ny * nz)
    order = jnp.argsort(key, stable=True)
    key_s = key[order]
    valid_s = state.mask[order]
    base = key_s // nx
    cxs = key_s - base * nx

    if cfg.spill:
        # Right-spill assignment (segmented prefix max — one
        # associative_scan, no extra sorts); see ``spill_assign``.
        # wrap_at_rebuild: no wrap relief (a wrap-spilled row would sit in
        # column 0 carrying an x ~ L coordinate, which the no-min-image
        # kernel cannot re-image)
        target, fits, overflow = spill_assign(
            base, cxs, valid_s, n_in, nx, k, ny * nz,
            wrap=not cfg.wrap_at_rebuild)
    else:
        # rank within cell (strict buckets)
        n_cells = nx * ny * nz
        starts = jnp.searchsorted(
            key_s, jnp.arange(n_cells + 1, dtype=key_s.dtype), side="left")
        rank = jnp.arange(n_in, dtype=jnp.int32) - starts[
            jnp.minimum(key_s, n_cells)].astype(jnp.int32)
        fits = valid_s & (rank < k)
        overflow = jnp.sum(valid_s & (rank >= k))
        target = (base * k + jnp.minimum(rank, k - 1)) * nx + cxs
        target = jnp.where(fits, target,
                           nr + jnp.arange(n_in, dtype=jnp.int32))

    # Placement via an int32 INDEX MAP + one wide gather: on this backend a
    # (n, W) row scatter runs ~5x slower than the same-shape gather
    # (measured r2: scatter 236 ms vs gather 51 ms at 2M x 16), so scatter
    # only the 4-byte source indices and gather the payload once.
    idx_map = jnp.full((nr,), -1, jnp.int32).at[target].set(
        jnp.arange(n_in, dtype=jnp.int32), mode="drop", unique_indices=True)
    src = jnp.take(order, jnp.maximum(idx_map, 0))
    packed, layout = _pack_rows(state)
    out = jnp.take(packed, src, axis=0)
    out = jnp.where((idx_map >= 0)[:, None], out, 0.0)
    new = _unpack_rows(out, layout, state)
    return new, overflow


def rebuild_buckets_sort(state: State, cfg: CellConfig) -> tuple[State,
                                                                 Array]:
    """Sort-based rebuild: bitwise-identical placement to
    ``rebuild_buckets`` with the payload moved ONLY through two
    multi-operand ``lax.sort`` networks (VERDICT r3 item 5).

    Measured r2 device facts behind the design (PERF_NOTES.md): a random
    (2M, 16) row gather costs ~51 ms and the same-shape scatter ~236 ms,
    while multi-operand lax.sort moves the same payload at key-sort speed
    (~12.7 ms). So: sort #1 groups rows by cell key (payload rides),
    the slot assignment runs from per-CELL tables in sorted space
    (``spill_tables``), non-fitting rows are keyed to the unused padded
    slots enumerated analytically from the same tables
    (``_gaps_to_targets`` — r4; no scatter or argsort anywhere), and
    sort #2 by target row IS the placement (the targets are a permutation
    of [0, nr)).
    """
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    nr = n_rows(cfg)
    n_in = state.n

    cx, cy, cz = cell_coords(state.x, state.mask, state.box, cfg)
    key = (cy * nz + cz) * nx + cx
    key = jnp.where(state.mask, key, nx * ny * nz)

    packed, layout = _pack_rows(state)
    w = packed.shape[1]
    cols = [packed[:, i] for i in range(w)]
    sorted1 = jax.lax.sort([key] + cols, num_keys=1, is_stable=True)
    key_s, cols = sorted1[0], list(sorted1[1:])
    valid_s = key_s < nx * ny * nz
    base = key_s // nx
    cxs = key_s - base * nx

    # non-fitting sorted rows (padding + overflow) take the unused bucket
    # slots so sort #2's keys are a permutation of [0, nr); the slots are
    # enumerated ANALYTICALLY from per-cell tables (r4 — no used-scatter,
    # no nr-row argsort; see _gaps_to_targets)
    if cfg.spill:
        wrap_relief = not cfg.wrap_at_rebuild
        tables = spill_tables(key_s, nx, k, ny * nz)
        target, fits, overflow = spill_assign(
            base, cxs, valid_s, n_in, nx, k, ny * nz,
            wrap=wrap_relief, tables=tables)
        miss_rank = jnp.cumsum((~fits).astype(jnp.int32)) - 1
        t_dummy = _unused_targets_spill(
            miss_rank, tables, nx, k, ny * nz, wrap=wrap_relief)
    else:
        n_cells = nx * ny * nz
        starts = jnp.searchsorted(
            key_s, jnp.arange(n_cells + 1, dtype=key_s.dtype), side="left")
        rank = jnp.arange(n_in, dtype=jnp.int32) - starts[
            jnp.minimum(key_s, n_cells)].astype(jnp.int32)
        fits = valid_s & (rank < k)
        overflow = jnp.sum(valid_s & (rank >= k))
        target = (base * k + jnp.minimum(rank, k - 1)) * nx + cxs
        target = jnp.where(fits, target,
                           nr + jnp.arange(n_in, dtype=jnp.int32))
        miss_rank = jnp.cumsum((~fits).astype(jnp.int32)) - 1
        t_dummy = _unused_targets_strict(
            miss_rank, starts.astype(jnp.int32), nx, k, ny * nz)
    t_full = jnp.where(fits, target, t_dummy).astype(jnp.int32)

    live = fits.astype(jnp.float32)
    sorted2 = jax.lax.sort([t_full] + cols + [live], num_keys=1,
                           is_stable=True)
    out_cols, live_s = sorted2[1:-1], sorted2[-1]
    out = jnp.stack(out_cols, axis=1)
    out = jnp.where(live_s[:, None] > 0.5, out, 0.0)
    new = _unpack_rows(out, layout, state)
    return new, overflow


def to_bucket_state(state: State, cfg: CellConfig) -> State:
    """One-time (host-side) conversion of an N-row state into bucket rows."""
    new, overflow = jax.jit(rebuild_buckets, static_argnames="cfg")(state, cfg)
    if int(overflow):
        raise ValueError(
            f"bucket capacity K={cfg.capacity} overflowed by {int(overflow)}; "
            "increase capacity")
    return new


def planes(state: State, cfg: CellConfig):
    """Zero-copy views of per-particle data as (ncy, ncz, K, ncx) planes."""
    ny, nz, k, nx = grid_shape(cfg)

    def p(a):
        return a.reshape(ny, nz, k, nx)

    return p

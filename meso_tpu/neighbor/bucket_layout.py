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


def spill_assign(base: Array, cxs: Array, valid_s: Array, n_in: int,
                 nx: int, k: int, n_rows_yz: int, wrap: bool = True):
    """Right-spill slot assignment for cell-sorted rows (see
    ``rebuild_buckets``): within each (cy,cz) row, linear slot
    l = r + cummax_row(cx*K - r) places each particle at its own cell's
    block or spills it RIGHT into the next cell's free slots.

    wrap=True additionally lets the LAST cell's overflow wrap into cell 0's
    top free slots (single-chip periodic layout). wrap=False counts it as
    overflow instead — the domain-decomposition variant, where a brick's
    column 0 belongs to a DIFFERENT x-window than column nx-1 and halo
    exchange ships only boundary columns (VERDICT r3 item 3).

    Returns (target_row, fits, overflow).
    """
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
    # dropped rows get DISTINCT out-of-bounds targets so the scatter can
    # honestly claim unique indices
    target = jnp.where(fits, target, nr + arange_n)
    return target, fits, overflow


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
    the slot assignment runs as int32 passes in sorted space, dummy rows
    are keyed to the unused padded slots (roll trick — the k-th invalid
    sorted row takes the k-th unused slot, and both sequences are already
    in order), and sort #2 by target row IS the placement (the targets
    are a permutation of [0, nr)).
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

    if cfg.spill:
        target, fits, overflow = spill_assign(
            base, cxs, valid_s, n_in, nx, k, ny * nz,
            wrap=not cfg.wrap_at_rebuild)
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

    # unused padded slots in ascending order: mark used, stable-argsort the
    # marks (zeros keep index order), then hand the j-th non-fitting sorted
    # row the j-th unused slot via one traced roll — no payload movement
    used = jnp.zeros((nr,), jnp.int32).at[target].set(
        jnp.ones((n_in,), jnp.int32), mode="drop")
    unused_idx = jnp.argsort(used, stable=True)    # zeros (unused) first
    n_fit = jnp.sum(fits.astype(jnp.int32))
    # sorted rows are [fitting valids | rest]: not exactly — non-fitting
    # rows may interleave (spill overflow). Rank the non-fitting rows:
    miss_rank = jnp.cumsum((~fits).astype(jnp.int32)) - 1
    t_dummy = unused_idx[jnp.minimum(miss_rank, nr - 1)]
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

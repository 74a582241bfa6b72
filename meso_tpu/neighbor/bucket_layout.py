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


def _seg_starts(seg: Array) -> Array:
    """First sorted-row index of each row's segment, for a sorted segment
    id array: cummax(boundary ? i : 0). The i=0 row needs no fixup — its
    segment starts at 0 whether or not the rolled comparison flags it."""
    iota = jnp.arange(seg.shape[0], dtype=jnp.int32)
    boundary = seg != jnp.roll(seg, 1)
    return jax.lax.cummax(jnp.where(boundary, iota, 0))


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

    Sort-native implementation (r4, second design): everything derives
    from PLAIN ``lax.cummax`` passes over the sorted rows — both the r3
    segmented ``associative_scan`` (58 ms on device at 1M; the pair-carry
    operator lowers poorly) and the r4.1 per-cell-table formulation
    (whose big-needle ``searchsorted`` lowers to ~17 chained 2M-row
    gathers, ~250 ms) are gone. Segment boundaries ride a plain cummax
    via base-offset packing:

        cummax(seg * B + clip(val, 0, B-1)) - seg * B
            == segmented-cummax(val)    whenever each segment's running
                                        max is always >= 0

    which holds here: the prefix max of a~ = cx*K - r_loc includes the
    segment's own first row, whose a~ = cx*K >= 0, so clipping negative
    a~ to 0 never changes it. Measured device costs at the 1M production
    shape: plain cummax ~5 ms, the whole assignment ~3 cummaxes + fused
    elementwise.

    Returns (target_row, fits, overflow) — bitwise identical to the scan
    formulation (tests/unit/test_spill_assign.py).
    """
    nr = n_rows_yz * k * nx
    iota = jnp.arange(n_in, dtype=jnp.int32)
    # rank within the (cy,cz)-row segment (invalid rows: base ==
    # n_rows_yz > every valid base, so they form their own tail segment
    # and never perturb a valid one)
    r_loc = iota - _seg_starts(base)
    a_t = jnp.maximum(cxs * k - r_loc, 0)        # in [0, (nx-1)*K]
    if wrap:
        # The spill cummax and the cell-0 used-count cummax are
        # independent given r_loc — batch them into ONE (n, 2) cummax
        # pass (each plain cummax costs ~5 ms at 2M rows on device;
        # XLA runs the batched pass at the single-column price).
        # c0: only cx=0 particles sit in cell 0's block (l_lin >= cx*K),
        # and for them l_lin = rank-in-cell, so the count is
        # min(count(cell R*nx), K). All cell-0 rows of a segment precede
        # any cx=nx-1 row, so the prefix count equals the full count
        # everywhere wrap_ok reads it.
        c0 = jnp.where((cxs == 0) & valid_s,
                       jnp.minimum(r_loc + 1, k), 0)
        both = jax.lax.cummax(jnp.stack(
            [base * (nx * k) + a_t, base * (k + 1) + c0], axis=1), axis=0)
        am = both[:, 0] - base * (nx * k)
        c0_used = both[:, 1] - base * (k + 1)
    else:
        am = jax.lax.cummax(base * (nx * k) + a_t) - base * (nx * k)
    l_lin = r_loc + am
    in_row = valid_s & (l_lin < jnp.minimum((cxs + 2) * k, nx * k))
    if wrap:
        m = l_lin - nx * k
        wrap_ok = (valid_s & ~in_row & (cxs == nx - 1) & (m >= 0)
                   & (m < k) & (k - 1 - m >= c0_used))
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
    target = jnp.where(fits, target, nr + iota)
    return target, fits, overflow


def _dummy_targets(target: Array, fits: Array, nr: int) -> Array:
    """Key every non-fitting sorted row to a distinct UNUSED bucket slot
    so sort #2's keys form a permutation of [0, nr): one nr-row used-flag
    scatter + one stable 2-operand sort + one gather (the r3 design, ~29
    ms on device at 1M — re-adopted after the r4.1 analytic-interval
    replacement regressed to ~250 ms on its 2M-needle searchsorted).
    Any bijection misses→unused is correct: dummy rows are zeroed by the
    live mask after placement."""
    n_in = target.shape[0]
    used = jnp.zeros((nr,), jnp.int32).at[target].set(
        jnp.ones((n_in,), jnp.int32), mode="drop", unique_indices=True)
    unused_first = jax.lax.sort(
        [used, jnp.arange(nr, dtype=jnp.int32)], num_keys=1,
        is_stable=True)[1]
    miss_rank = jnp.cumsum((~fits).astype(jnp.int32)) - 1
    return unused_first[jnp.minimum(miss_rank, nr - 1)]


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
        # Right-spill assignment (see ``spill_assign``); wrap relief is
        # always on — under wrap_at_rebuild the relieved rows get
        # pre-shifted one image left below (same convention as the sort
        # engine).
        target, fits, overflow = spill_assign(
            base, cxs, valid_s, n_in, nx, k, ny * nz, wrap=True)
        if cfg.wrap_at_rebuild:
            wrapped_s = fits & (cxs == nx - 1) & (target % nx == 0)
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
    if cfg.spill and cfg.wrap_at_rebuild:
        # pre-shift the wrap-relief rows one image left (see the sort
        # engine); flags travel sorted->slot space via one small scatter
        wslot = jnp.zeros((nr,), bool).at[target].set(
            wrapped_s, mode="drop", unique_indices=True)
        lx = state.box.lengths[0]
        new = new.replace(
            x=new.x.at[:, 0].add(jnp.where(wslot, -lx, 0.0)),
            image=new.image.at[:, 0].add(wslot.astype(jnp.int32)))
    return new, overflow


def _state_cols(state: State):
    """Per-particle fields as a flat list of (n,) NATIVE-dtype columns for
    multi-operand ``lax.sort`` payloads — no packed-matrix materialization
    (the sorts are comparison-bound: an 18-operand 2M sort costs the same
    ~9 ms as a 2-operand one on device) and no int→f32 bitcasting (ints
    ride as int32 operands; see the CLAUDE.md bitcast-channel rule)."""
    cols = [state.x[:, 0], state.x[:, 1], state.x[:, 2],
            state.v[:, 0], state.v[:, 1], state.v[:, 2],
            state.f[:, 0], state.f[:, 1], state.f[:, 2],
            state.tag, state.typ, state.mol,
            state.image[:, 0], state.image[:, 1], state.image[:, 2],
            state.mask.astype(jnp.int32)]
    layout = {"x": (0, 3), "v": (3, 3), "f": (6, 3), "tag": (9, 1),
              "typ": (10, 1), "mol": (11, 1), "image": (12, 3),
              "mask": (15, 1)}
    off = 16
    for name in ("T", "dTdt"):
        a = getattr(state, name)
        if a is not None:
            cols.append(a)
            layout[name] = (off, 1)
            off += 1
    for name in ("C", "dCdt"):
        a = getattr(state, name)
        if a is not None:
            for sp in range(a.shape[1]):
                cols.append(a[:, sp])
            layout[name] = (off, a.shape[1])
            off += a.shape[1]
    return cols, layout


def _state_from_cols(cols, layout, state: State, live: Array) -> State:
    """Inverse of ``_state_cols``; rows with live=False are zeroed (same
    zeroing the gather engine applies via its idx_map sentinel)."""
    def col(name, j=0):
        o, w = layout[name]
        c = cols[o + j]
        return jnp.where(live, c, jnp.zeros((), c.dtype))

    def vec(name):
        return jnp.stack([col(name, j) for j in range(layout[name][1])],
                         axis=-1)

    kw = dict(
        x=vec("x"), v=vec("v"), f=vec("f"),
        tag=col("tag"), typ=col("typ"), mol=col("mol"), image=vec("image"),
        mask=col("mask") > 0,
        box=state.box, step=state.step,
        T=None, dTdt=None, C=None, dCdt=None)
    if "T" in layout:
        kw["T"] = col("T")
        kw["dTdt"] = col("dTdt")
    if "C" in layout:
        kw["C"] = vec("C")
        kw["dCdt"] = vec("dCdt")
    return State(**kw)


def rebuild_buckets_sort(state: State, cfg: CellConfig) -> tuple[State,
                                                                 Array]:
    """Sort-based rebuild: bitwise-identical placement to
    ``rebuild_buckets`` with the payload moved ONLY through two
    multi-operand ``lax.sort`` networks (VERDICT r3 item 5).

    Measured device facts behind the design (PERF_NOTES.md, 1M shapes):
    a random (2M, 17) row gather costs ~42 ms and the same-shape scatter
    ~150+ ms, while multi-operand lax.sort moves the same payload at
    key-sort speed (~9 ms — comparison-bound). So: sort #1 groups rows by
    cell key with the payload riding as native-dtype columns, the slot
    assignment runs as plain cummaxes in sorted space (``spill_assign``),
    non-fitting rows are keyed to the unused padded slots
    (``_dummy_targets``), and sort #2 by target row IS the placement (the
    keys are a permutation of [0, nr)).
    """
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    nr = n_rows(cfg)
    n_in = state.n

    cx, cy, cz = cell_coords(state.x, state.mask, state.box, cfg)
    key = (cy * nz + cz) * nx + cx
    key = jnp.where(state.mask, key, nx * ny * nz)

    cols, layout = _state_cols(state)
    sorted1 = jax.lax.sort([key] + cols, num_keys=1, is_stable=True)
    key_s, cols = sorted1[0], list(sorted1[1:])
    valid_s = key_s < nx * ny * nz
    base = key_s // nx
    cxs = key_s - base * nx

    if cfg.spill:
        target, fits, overflow = spill_assign(
            base, cxs, valid_s, n_in, nx, k, ny * nz, wrap=True)
        if cfg.wrap_at_rebuild:
            # deferred-wrap mode (VERDICT r4 item 8): wrap-relief rows sit
            # in cell 0's block carrying x ~ lo + Lx, which the
            # no-min-image kernel cannot re-image. Pre-shift them one box
            # image left (exactly the pre-shifted-twin convention of the
            # kernel's x wrap pads) and record it in the image flag so the
            # unwrapped trajectory x + image*L is invariant. This restores
            # wrap relief at every box size (the r3 of=42 blocker at 1M
            # was relief being disabled here).
            wrapped = fits & (cxs == nx - 1) & (target % nx == 0)
            xo = layout["x"][0]
            io = layout["image"][0]
            lx = state.box.lengths[0].astype(cols[xo].dtype)
            cols[xo] = jnp.where(wrapped, cols[xo] - lx, cols[xo])
            cols[io] = jnp.where(wrapped, cols[io] + 1, cols[io])
    else:
        # strict rank-in-cell from the same plain-cummax segment trick
        rank = jnp.arange(n_in, dtype=jnp.int32) - _seg_starts(key_s)
        fits = valid_s & (rank < k)
        overflow = jnp.sum(valid_s & (rank >= k))
        target = (base * k + jnp.minimum(rank, k - 1)) * nx + cxs
        target = jnp.where(fits, target,
                           nr + jnp.arange(n_in, dtype=jnp.int32))
    t_full = jnp.where(fits, target,
                       _dummy_targets(target, fits, nr)).astype(jnp.int32)

    live = fits.astype(jnp.int32)
    sorted2 = jax.lax.sort([t_full] + cols + [live], num_keys=1,
                           is_stable=True)
    out_cols, live_s = list(sorted2[1:-1]), sorted2[-1]
    new = _state_from_cols(out_cols, layout, state, live_s > 0)
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

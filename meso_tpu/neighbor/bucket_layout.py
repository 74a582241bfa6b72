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


def rebuild_buckets(state: State, cfg: CellConfig) -> tuple[State, Array]:
    """Redistribute rows into bucket order. Input may have any row count;
    output has exactly n_rows(cfg) rows. Returns (bucket_state, overflow).

    Pipeline (all fixed-shape, race-free): cell key -> stable sort ->
    rank-in-cell -> target row -> scatter every per-particle array.
    """
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

    # rank within cell
    n_cells = nx * ny * nz
    starts = jnp.searchsorted(key_s, jnp.arange(n_cells + 1, dtype=key_s.dtype),
                              side="left")
    rank = jnp.arange(n_in, dtype=jnp.int32) - starts[
        jnp.minimum(key_s, n_cells)].astype(jnp.int32)
    valid_s = state.mask[order]
    fits = valid_s & (rank < k)
    overflow = jnp.sum(valid_s & (rank >= k))

    # target row: key = base*nx + cx with base = cy*ncz+cz
    base = key_s // nx
    cxs = key_s - base * nx
    target = (base * k + jnp.minimum(rank, k - 1)) * nx + cxs
    target = jnp.where(fits, target, nr)  # dropped -> out of bounds ("drop")

    def scatter(a, fill=0):
        if a is None:
            return None
        a_s = jnp.take(a, order, axis=0)
        out = jnp.full((nr,) + a.shape[1:], fill, a.dtype)
        return out.at[target].set(a_s, mode="drop")

    new = State(
        x=scatter(state.x), v=scatter(state.v), f=scatter(state.f),
        typ=scatter(state.typ), tag=scatter(state.tag),
        image=scatter(state.image),
        mask=scatter(state.mask, fill=False),
        mol=scatter(state.mol),
        box=state.box, step=state.step,
        T=scatter(state.T), dTdt=scatter(state.dTdt),
        C=scatter(state.C), dCdt=scatter(state.dCdt),
    )
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

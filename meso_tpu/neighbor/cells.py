"""Cell binning with fixed-capacity padded buckets.

TPU-native analog of the reference's GPU cell list + particle reordering
(``neighbor_meso.cu``; SURVEY.md §2b rows 18-19, §3.4). The CUDA build used
warp-cooperative count + prefix-scan + fill to avoid atomics; the XLA-native
equivalent is a stable sort by cell key followed by rank-in-cell arithmetic
and one scatter — likewise race-free by construction, with *fixed shapes*:

* buckets are a dense (n_cells+1, K) index matrix (K = static capacity),
* overflowing particles are counted in ``overflow`` — a checked invariant
  surfaced per chunk (SURVEY.md §5.2); the driver reacts by rebuilding the
  system with a larger K (rare recompile, same policy as the reference's
  grow-on-demand),
* the trailing bucket row (index ``n_cells``) is the trash cell for padding
  rows; stencils never visit it.

Particles are *reordered* (cell-sorted working order) at every rebuild, the
TPU analog of the reference's space-filling-curve resort (row 18): it turns
neighbor gathers into near-contiguous memory access.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from meso_tpu.core.box import Box
from meso_tpu.core.state import State

Array = jax.Array


@dataclass(frozen=True)
class CellConfig:
    """Static cell-grid configuration (participates in jit specialization).

    ``ncell`` is fixed at system-build time from the box and cutoff+skin;
    the cell side length therefore is >= rc + skin in every dimension so a
    27-cell stencil covers the interaction range between rebuilds.
    """

    ncell: tuple[int, int, int]
    capacity: int          # K: max particles per cell
    skin: float = 0.3
    rebuild_every: int = 10
    # Right-spill packing: a cell's overflow occupies the NEXT x-cell's
    # free slots (slot-cell may exceed true cell by one). Shrinks K to
    # ~1.6x the mean occupancy (vs mean+5*sqrt for strict buckets) because
    # the Poisson tail is absorbed by the neighbor: overflow needs a
    # w-cell window holding > (w+1)K particles — >= 2.4x mean for every w.
    # Only the fused Pallas kernel (window +-2) understands this layout.
    spill: bool = False
    # Rebuild engine: "gather" (r2 index-map + wide gather) or "sort"
    # (r3 two multi-operand sorts — payload moves at key-sort speed;
    # see bucket_layout.rebuild_buckets_sort). Identical placement.
    rebuild: str = "gather"
    # System.wrap_mode="rebuild": positions are box-wrapped here (rebuild
    # time) instead of every step; the v3 kernel then skips per-candidate
    # min-image. Spill wrap-around (last cell -> cell 0) is disabled in
    # this mode — the wrapped-spill row would need a -L coordinate shift;
    # the lost relief costs ~1e-5 expected overflows at 1M.
    wrap_at_rebuild: bool = False

    @property
    def n_cells(self) -> int:
        nx, ny, nz = self.ncell
        return nx * ny * nz

    @staticmethod
    def for_box(box_lengths, rc: float, density: float, skin: float = 0.3,
                rebuild_every: int = 10, capacity: int | None = None,
                min_image_safe: bool = True,
                spill: bool = False,
                rebuild: str = "gather",
                wrap_at_rebuild: bool = False) -> "CellConfig":
        """Choose the grid so cell side >= rc+skin (host-side, static)."""
        import numpy as np
        l = np.asarray(box_lengths, float)
        ncell = np.maximum(np.floor(l / (rc + skin)).astype(int), 1)
        if min_image_safe:
            # 27-stencil with periodic wrap double-visits cells when ncell < 3
            ncell = np.maximum(ncell, 3)
        if spill and ncell[0] < 5:
            # the kernel's circular +-2 x-window is wrap-ambiguous below 5
            # columns (offsets +2 and -2 reach the same cell)
            spill = False
        if capacity is None:
            side = l / ncell
            mean_occ = density * float(np.prod(side))
            if spill:
                # neighbor-absorbed tail: 1.6x mean, multiple of 8 (full
                # fp32 sublane registers in the kernel)
                capacity = max(8, int(-(-1.6 * mean_occ // 8)) * 8)
            else:
                # Poisson tail headroom: mean + 5*sqrt(mean) + 2
                # (P(overflow) ~ 1e-9/cell), rounded to a multiple of 4
                cap = int(np.ceil(mean_occ + 5.0 * np.sqrt(mean_occ) + 2.0))
                capacity = ((cap + 3) // 4) * 4
        return CellConfig(ncell=tuple(int(v) for v in ncell),
                          capacity=capacity, skin=skin,
                          rebuild_every=rebuild_every, spill=spill,
                          rebuild=rebuild, wrap_at_rebuild=wrap_at_rebuild)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CellList:
    """Workspace pytree produced by ``build_cells`` (valid until next rebuild)."""

    cid: Array          # (N,)   cell id per (sorted) particle; n_cells = trash
    bucket_idx: Array   # (n_cells+1, K) particle row index, N = empty sentinel
    bucket_mask: Array  # (n_cells+1, K) True where slot holds a particle
    overflow: Array     # ()     count of particles that did not fit (must be 0)
    x_ref: Array        # (N,3)  positions at rebuild (displacement trigger)

    def replace(self, **kw) -> "CellList":
        return dataclasses.replace(self, **kw)


def cell_index(x: Array, mask: Array, box: Box, cfg: CellConfig) -> Array:
    """Row-major cell id per particle; masked rows -> trash cell n_cells."""
    nx, ny, nz = cfg.ncell
    n_arr = jnp.asarray([nx, ny, nz], jnp.int32)
    frac = (x - box.lo) / box.lengths
    c = jnp.clip((frac * n_arr.astype(x.dtype)).astype(jnp.int32), 0, n_arr - 1)
    cid = (c[:, 2] * ny + c[:, 1]) * nx + c[:, 0]
    return jnp.where(mask, cid, cfg.n_cells)


def sort_state(state: State, cfg: CellConfig) -> tuple[State, Array]:
    """Stable-sort all per-particle arrays by cell id (particle reordering,
    SURVEY.md row 18). Returns (sorted_state, sorted_cid)."""
    cid = cell_index(state.x, state.mask, state.box, cfg)
    order = jnp.argsort(cid, stable=True)

    def take(a):
        return jnp.take(a, order, axis=0) if a is not None else None

    sorted_state = state.replace(
        x=take(state.x), v=take(state.v), f=take(state.f),
        typ=take(state.typ), tag=take(state.tag), image=take(state.image),
        mask=take(state.mask), mol=take(state.mol),
        T=take(state.T), dTdt=take(state.dTdt),
        C=take(state.C), dCdt=take(state.dCdt),
    )
    return sorted_state, jnp.take(cid, order)


def build_cells(state: State, cfg: CellConfig) -> tuple[State, CellList]:
    """Re-sort particles by cell and build padded buckets (the rebuild path,
    SURVEY.md §3.4 steps 1-5, sort+scan+scatter instead of count+scan+fill)."""
    state, cid = sort_state(state, cfg)
    n = state.n
    k = cfg.capacity
    n_cells = cfg.n_cells

    # rank within cell: position - first position of this cid (cid is sorted)
    starts = jnp.searchsorted(cid, jnp.arange(n_cells + 1, dtype=cid.dtype),
                              side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - starts[cid].astype(jnp.int32)
    fits = rank < k
    overflow = jnp.sum((~fits) & state.mask)

    flat = jnp.full(((n_cells + 1) * k,), n, dtype=jnp.int32)
    slot = cid.astype(jnp.int32) * k + jnp.minimum(rank, k - 1)
    src = jnp.where(fits, jnp.arange(n, dtype=jnp.int32), n)
    flat = flat.at[jnp.where(fits, slot, (n_cells + 1) * k - 1)].set(
        src, mode="drop")
    # the scatter above may legitimately write sentinel into the very last
    # trash slot; bucket_mask below re-derives validity from the index value.
    bucket_idx = flat.reshape(n_cells + 1, k)
    bucket_mask = bucket_idx < n
    # trash row never participates
    bucket_mask = bucket_mask.at[n_cells].set(False)

    return state, CellList(cid=cid, bucket_idx=bucket_idx,
                           bucket_mask=bucket_mask, overflow=overflow,
                           x_ref=state.x)


def stencil_cells(cid: Array, cfg: CellConfig) -> Array:
    """(…, 27) periodic 27-stencil cell ids for each cell id in ``cid``.

    Trash cells (cid == n_cells) map to 27 copies of the trash cell, whose
    bucket_mask is all-False, so padding particles see no candidates.
    """
    nx, ny, nz = cfg.ncell
    is_trash = cid == cfg.n_cells
    c = jnp.where(is_trash, 0, cid)
    cx = c % nx
    cy = (c // nx) % ny
    cz = c // (nx * ny)
    off = jnp.arange(-1, 2, dtype=jnp.int32)
    ox = jnp.tile(off, 9)                      # (27,) x fastest
    oy = jnp.tile(jnp.repeat(off, 3), 3)
    oz = jnp.repeat(off, 9)
    sx = (cx[..., None] + ox) % nx
    sy = (cy[..., None] + oy) % ny
    sz = (cz[..., None] + oz) % nz
    s = (sz * ny + sy) * nx + sx
    return jnp.where(is_trash[..., None], cfg.n_cells, s)


def max_displacement_sq(x: Array, x_ref: Array, mask: Array, box: Box) -> Array:
    """Max squared displacement since rebuild (skin-trigger diagnostic)."""
    d = box.min_image(x - x_ref)
    d2 = jnp.sum(d * d, axis=-1)
    return jnp.max(jnp.where(mask, d2, 0.0))

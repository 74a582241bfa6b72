"""Padded full neighbor lists built from cell buckets.

The reference's two-phase atomics-free list build (count -> scan -> fill;
``neigh_list_meso.cu``, SURVEY.md §3.4 step 6) maps to a fixed-shape rank-
and-scatter: per particle, candidates from the 27-cell stencil are tested
against (rc+skin)^2 and compacted into a padded (N, M) index matrix via a
cumulative-sum ranking — race-free, no atomics, no dynamic shapes.

Like the reference GPU path we build *full* (doubled) lists: each particle
lists all its neighbors, so force accumulation has exactly one writer per
particle (SURVEY.md row 20) and no reverse ghost-force communication is
needed (§3.2).

Row overflow (> M real neighbors) is counted in ``overflow`` — a checked
invariant (§5.2); capacity M is chosen from density with Poisson headroom.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from meso_tpu.core.box import Box
from meso_tpu.neighbor.cells import CellConfig, CellList, stencil_cells

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class NeighborList:
    """(N, M) full neighbor matrix in *current sorted order*; sentinel = N."""

    idx: Array       # (N, M) int32 neighbor row indices, N where empty
    n_neigh: Array   # (N,)   int32 real neighbor count (may exceed M!)
    overflow: Array  # ()     int32 sum of neighbors dropped due to M

    def replace(self, **kw) -> "NeighborList":
        return dataclasses.replace(self, **kw)


def neighbor_capacity(density: float, rc: float, skin: float) -> int:
    """Static M from mean full-list occupancy with Poisson headroom."""
    import numpy as np
    mean = density * 4.0 / 3.0 * np.pi * (rc + skin) ** 3
    m = int(np.ceil(mean + 6.0 * np.sqrt(mean) + 4.0))
    return ((m + 7) // 8) * 8


def build_nlist(x: Array, mask: Array, box: Box, cells: CellList,
                cfg: CellConfig, rc_max: float, m_cap: int,
                block: int = 2048) -> NeighborList:
    """Build the padded neighbor matrix from cell buckets.

    The candidate tensor (N, 27*K) is large, so the build is blocked over
    particles with ``lax.map`` to bound peak memory; it runs only on the
    rebuild cadence (every ``cfg.rebuild_every`` steps).
    """
    n = x.shape[0]
    k = cfg.capacity
    cutoff_sq = jnp.float32((rc_max + cfg.skin) ** 2)

    sten = stencil_cells(cells.cid, cfg)          # (N, 27)

    def per_block(args):
        i_blk, sten_blk = args                    # (B,), (B, 27)
        cand = cells.bucket_idx[sten_blk].reshape(sten_blk.shape[0], 27 * k)
        cmask = cells.bucket_mask[sten_blk].reshape(sten_blk.shape[0], 27 * k)
        xi = x[i_blk]                             # (B, 3)
        xj = x[jnp.minimum(cand, n - 1)]          # (B, 27K, 3)
        dr = box.min_image(xi[:, None, :] - xj)
        r2 = jnp.sum(dr * dr, axis=-1)
        hit = cmask & (cand != i_blk[:, None]) & (r2 < cutoff_sq)
        # rank-and-scatter compaction (fill pass analog)
        pos = jnp.cumsum(hit.astype(jnp.int32), axis=1) - 1
        count = jnp.sum(hit, axis=1).astype(jnp.int32)
        row = jnp.full((sten_blk.shape[0], m_cap), n, jnp.int32)
        keep = hit & (pos < m_cap)
        scatter_pos = jnp.where(keep, pos, m_cap)  # m_cap -> dropped
        row = jax.vmap(lambda r, p, c: r.at[p].set(c, mode="drop"))(
            row, scatter_pos, jnp.where(keep, cand, n))
        return row, count

    n_blocks = -(-n // block)
    pad = n_blocks * block - n
    i_all = jnp.arange(n, dtype=jnp.int32)
    i_pad = jnp.concatenate([i_all, jnp.zeros((pad,), jnp.int32)])
    sten_pad = jnp.concatenate(
        [sten, jnp.full((pad, 27), cfg.n_cells, sten.dtype)])
    rows, counts = jax.lax.map(
        per_block,
        (i_pad.reshape(n_blocks, block), sten_pad.reshape(n_blocks, block, 27)))
    idx = rows.reshape(n_blocks * block, m_cap)[:n]
    n_neigh = counts.reshape(-1)[:n]
    n_neigh = jnp.where(mask, n_neigh, 0)
    overflow = jnp.sum(jnp.maximum(n_neigh - m_cap, 0))
    return NeighborList(idx=idx, n_neigh=n_neigh, overflow=overflow)

"""1-D spatial domain decomposition over a JAX device mesh.

TPU-native replacement of the reference's MPI brick decomposition
(``comm_brick.cpp`` + ``comm_meso.cu``; SURVEY.md §2a row 5, §2b rows 27-28,
§2c, §5.8): each device owns a slab of the box along x as bucket-resident
rows; per step, the two boundary cell-planes ride the ICI ring via
``lax.ppermute`` (halo/ghost exchange with pre-shifted wrap coordinates);
on the rebuild cadence, owner migration uses fixed-capacity masked send
buffers + the same ring permutes (no dynamic-size collectives exist on TPU;
overflow is a checked invariant, SURVEY.md §5.2/§7.2).

Correctness properties carried over from the single-chip engine:
* the counter-based pair RNG depends only on (tags, step, seed), so physics
  is decomposition-invariant (the reference's rank-count-invariance, §4);
* full traversals keep one writer per particle — ghost forces never need a
  reverse path (reference skips reverse_comm for the same reason, §3.2).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from meso_tpu.core.box import Box
from meso_tpu.core.state import State, zeros_state
from meso_tpu.core.system import System, SystemParams, _move_mask, _post_forces
from meso_tpu.core.integrate import final_integrate, initial_integrate
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.core import rng as rngmod

Array = jax.Array
AXIS = "x"


@dataclass(frozen=True)
class DomainConfig:
    """Static decomposition config (1-D slabs along x)."""

    n_dev: int
    cells: CellConfig          # LOCAL grid: (ncx_local, ny, nz), capacity K
    lx_global: float           # global box length along x
    cap_mig: int               # per-direction migration buffer capacity
    rebuild_every: int = 5

    @property
    def ncx_local(self) -> int:
        return self.cells.ncell[0]

    @property
    def slab_w(self) -> float:
        return self.lx_global / self.n_dev



def make_mesh_1d(n_dev: int) -> Mesh:
    return Mesh(np.array(jax.devices()[:n_dev]), (AXIS,))


# ---------------------------------------------------------------------------
# local rebuild (slab frame)
# ---------------------------------------------------------------------------

def _rebuild_slab(state: State, cfg: CellConfig, slab_lo: Array,
                  side_x: float):
    """rebuild_buckets with x-cells indexed relative to the slab origin."""
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    nr = ny * nz * k * nx
    n_in = state.n
    x = state.x
    cx = jnp.clip(((x[:, 0] - slab_lo) / side_x).astype(jnp.int32), 0, nx - 1)
    lens = state.box.lengths
    cy = jnp.clip((x[:, 1] / lens[1] * ny).astype(jnp.int32), 0, ny - 1)
    cz = jnp.clip((x[:, 2] / lens[2] * nz).astype(jnp.int32), 0, nz - 1)
    key = (cy * nz + cz) * nx + cx
    key = jnp.where(state.mask, key, nx * ny * nz)
    order = jnp.argsort(key, stable=True)
    key_s = key[order]
    valid_s = state.mask[order]
    base = key_s // nx
    cxs = key_s - base * nx
    if cfg.spill:
        # DD right-spill: in-brick only (wrap=False — a brick's column 0
        # and column nx-1 sit in different x-windows and halo exchange
        # ships only the boundary columns; VERDICT r3 item 3)
        from meso_tpu.neighbor.bucket_layout import spill_assign
        target, fits, overflow = spill_assign(
            base, cxs, valid_s, n_in, nx, k, ny * nz, wrap=False)
    else:
        n_cells = nx * ny * nz
        starts = jnp.searchsorted(
            key_s, jnp.arange(n_cells + 1, dtype=key_s.dtype), side="left")
        rank = jnp.arange(n_in, dtype=jnp.int32) - starts[
            jnp.minimum(key_s, n_cells)].astype(jnp.int32)
        fits = valid_s & (rank < k)
        overflow = jnp.sum(valid_s & (rank >= k))
        target = (base * k + jnp.minimum(rank, k - 1)) * nx + cxs
        # distinct OOB targets for dropped rows -> honest unique-indices
        # scatter
        target = jnp.where(fits, target,
                           nr + jnp.arange(n_in, dtype=jnp.int32))

    # index-map + gathers: row scatters are ~5x slower than gathers on
    # this backend (see neighbor/bucket_layout.rebuild_buckets)
    idx_map = jnp.full((nr,), -1, jnp.int32).at[target].set(
        jnp.arange(n_in, dtype=jnp.int32), mode="drop", unique_indices=True)
    src = jnp.take(order, jnp.maximum(idx_map, 0))
    live = idx_map >= 0

    def place(a, fill=0):
        if a is None:
            return None
        g = jnp.take(a, src, axis=0)
        fill_v = jnp.asarray(fill, a.dtype)
        cond = live.reshape((-1,) + (1,) * (a.ndim - 1))
        return jnp.where(cond, g, fill_v)

    new = State(
        x=place(state.x), v=place(state.v), f=place(state.f),
        typ=place(state.typ), tag=place(state.tag),
        image=place(state.image), mask=place(state.mask, fill=False),
        mol=place(state.mol), box=state.box, step=state.step,
        T=place(state.T), dTdt=place(state.dTdt),
        C=place(state.C), dCdt=place(state.dCdt))
    return new, overflow


# ---------------------------------------------------------------------------
# migration (owner exchange on the ring)
# ---------------------------------------------------------------------------

_MIG_FIELDS = ["x", "v", "f", "tag", "typ", "image", "mol"]


def _mig_fields(state: State):
    return _MIG_FIELDS + [f for f in ("T", "dTdt", "C", "dCdt")
                          if getattr(state, f) is not None]


def _pack(state: State, sel: Array, cap: int):
    """Compact selected rows into fixed-capacity buffers via a stable sort
    (selected rows first, original order preserved; no scan/cumsum)."""
    order = jnp.argsort(~sel, stable=True)
    take = order[:cap]
    buf = {f: getattr(state, f)[take] for f in _mig_fields(state)}
    buf["mask"] = sel[take]
    overflow = jnp.sum(sel) - jnp.sum(buf["mask"])
    return buf, overflow


def _migrate(state: State, dcfg: DomainConfig, slab_lo: Array,
             slab_hi: Array):
    """Ship rows whose x left the slab to the ring neighbors; returns the
    merged (nr + 2*cap)-row state and the overflow counter."""
    n = dcfg.n_dev
    x0 = state.x[:, 0]
    # target slab index (global wrap already applied by integrate)
    tgt = jnp.clip((x0 / dcfg.slab_w).astype(jnp.int32), 0, n - 1)
    me = jax.lax.axis_index(AXIS)
    delta = jnp.mod(tgt - me, n)
    go_right = state.mask & (delta == 1)
    # n == 2: both neighbors are the same device; route all moves right so
    # a crosser is shipped exactly once
    go_left = state.mask & (delta == n - 1) & ~go_right
    too_far = state.mask & (delta != 0) & ~go_right & ~go_left

    buf_r, of_r = _pack(state, go_right, dcfg.cap_mig)
    buf_l, of_l = _pack(state, go_left, dcfg.cap_mig)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    recv_from_left = jax.tree.map(
        lambda a: jax.lax.ppermute(a, AXIS, fwd), buf_r)
    recv_from_right = jax.tree.map(
        lambda a: jax.lax.ppermute(a, AXIS, bwd), buf_l)

    keep = state.mask & ~go_right & ~go_left & ~too_far
    state = state.replace(mask=keep)

    def cat(field):
        return jnp.concatenate(
            [getattr(state, field), recv_from_left[field],
             recv_from_right[field]], axis=0)

    merged = state.replace(
        mask=jnp.concatenate([keep, recv_from_left["mask"],
                              recv_from_right["mask"]]),
        **{f: cat(f) for f in _mig_fields(state)})
    overflow = of_r + of_l + jnp.sum(too_far)
    return merged, overflow


# ---------------------------------------------------------------------------
# halo exchange + force evaluation
# ---------------------------------------------------------------------------

def _halo_forces(state: State, system: System, params: SystemParams,
                 dcfg: DomainConfig, step: Array, x: Array, v: Array):
    """Classic DPD force eval with comm/compute OVERLAP (SURVEY.md row 28):
    the halo ppermutes are issued first, then the INTERIOR cell columns
    (whose stencils never touch halos) are swept with no data dependency on
    the collectives — XLA's latency-hiding scheduler runs them concurrently.
    The two BOUNDARY columns are swept last from 3-column windows that
    include the received halos. This is the border/inner split of the
    reference's stream pipeline (``comm_meso.cu`` + row 28)."""
    from meso_tpu.ops.sweep import classic_pair_fn, make_channels, sweep

    cfg = dcfg.cells
    if cfg.spill:
        raise ValueError("the distributed sweep cannot read a spill "
                         "layout; use force_path='pallas'")
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    n = dcfg.n_dev
    nr = ny * nz * k * nx
    h = rngmod.particle_hash(state.tag, step, params.pair.seed,
                             rounds=system.rng_rounds)
    channels = make_channels(x, v, state.tag, state.mask, h, {},
                             cfg.ncell, k)
    multitype = params.pair.a.shape[0] > 1
    if multitype:
        channels["typ"] = state.typ.reshape(channels["tag"].shape)
    n_excl = 0
    if params.pair.excl is not None:
        # special_bonds on the distributed sweep (SURVEY §2a row 7): each
        # particle's excluded tags ride as channels through the halo
        n_excl = params.pair.excl.shape[1]
        ex = params.pair.excl[state.tag]
        for e in range(n_excl):
            channels[f"EX{e}"] = ex[:, e].reshape(channels["tag"].shape)
    pair_fn = classic_pair_fn(params.pair, system.dt, multitype=multitype,
                              n_excl=n_excl)
    lens = state.box.lengths

    # 1) issue halo exchange (async collectives)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    me = jax.lax.axis_index(AXIS)
    lx = jnp.float32(dcfg.lx_global)
    halo_l, halo_r = {}, {}
    for name, p in channels.items():
        hl = jax.lax.ppermute(p[..., -1:], AXIS, fwd)
        hr = jax.lax.ppermute(p[..., :1], AXIS, bwd)
        if name == "x":
            hl = hl + jnp.where(me == 0, -lx, 0.0)
            hr = hr + jnp.where(me == n - 1, lx, 0.0)
        halo_l[name], halo_r[name] = hl, hr

    # 2) interior columns 1..nx-2: stencils stay within local columns
    #    0..nx-1 — no halo dependency, overlaps the permutes
    acc_int = sweep(channels, (nx - 2, ny, nz), k, (False, False, True),
                    lens, pair_fn, 4)

    # 3) boundary columns from 3-column windows including the halos
    def window(sel):
        return {name: jnp.concatenate(sel(name), axis=-1)
                for name in channels}

    left_win = window(lambda nm: (halo_l[nm], channels[nm][..., :2]))
    right_win = window(lambda nm: (channels[nm][..., -2:], halo_r[nm]))
    acc_l = sweep(left_win, (1, ny, nz), k, (False, False, True), lens,
                  pair_fn, 4)
    acc_r = sweep(right_win, (1, ny, nz), k, (False, False, True), lens,
                  pair_fn, 4)

    # stitch columns: [left | interior | right]
    outs = [jnp.concatenate([acc_l[i], acc_int[i], acc_r[i]], axis=-1)
            for i in range(4)]
    f = jnp.stack([outs[0].reshape(nr), outs[1].reshape(nr),
                   outs[2].reshape(nr)], -1)
    return f, jnp.sum(outs[3])


# ---------------------------------------------------------------------------
# distributed step + loop
# ---------------------------------------------------------------------------

def _halo_columns_1d(channels: dict, dcfg: DomainConfig, width: int = 1):
    """x-halo exchange per channel (ppermute ring) with wrap-shifted x.

    ``width``: boundary columns shipped per side — 1 for strict buckets,
    2 for the right-spill layout (slot-cell may exceed true cell by one;
    VERDICT r3 item 3). Returns (halo_left, halo_right) dicts so callers
    can keep the collectives' results SEPARATE from the local planes (the
    border/inner overlap split needs the interior compute to carry no data
    dependency on the permutes)."""
    n = dcfg.n_dev
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    me = jax.lax.axis_index(AXIS)
    lx = jnp.float32(dcfg.lx_global)
    halo_l, halo_r = {}, {}
    for name, p in channels.items():
        hl = jax.lax.ppermute(p[..., -width:], AXIS, fwd)
        hr = jax.lax.ppermute(p[..., :width], AXIS, bwd)
        if name == "x":
            hl = hl + jnp.where(me == 0, -lx, 0.0)
            hr = hr + jnp.where(me == n - 1, lx, 0.0)
        halo_l[name], halo_r[name] = hl, hr
    return halo_l, halo_r


def _halo_channels_1d(channels: dict, dcfg: DomainConfig, width: int = 1):
    """x-halo exchange, concatenated: [halo_left | local | halo_right]."""
    halo_l, halo_r = _halo_columns_1d(channels, dcfg, width)
    return {name: jnp.concatenate([halo_l[name], channels[name],
                                   halo_r[name]], axis=-1)
            for name in channels}


def _halo_forces_model_pallas(state: State, system: System,
                              params: SystemParams, dcfg: DomainConfig,
                              step: Array, x: Array, v: Array, t, c):
    """eDPD/tDPD distributed force eval on the FUSED Pallas kernel
    (VERDICT r3 item 3 — the multiphysics multi-chip hot path; supports
    the spill layout via 2-column halos)."""
    from meso_tpu.kernels.pair_dpd_fused import halo_forces_pallas_model_fused
    from meso_tpu.ops.sweep import make_channels

    cfg = dcfg.cells
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    nr = ny * nz * k * nx
    extra = {}
    if system.model == "edpd":
        extra["T"] = t
        ns = 0
    else:
        ns = params.pair.n_species
        for sidx in range(ns):
            extra[f"C{sidx}"] = c[:, sidx]
    # no "h" channel: the fused kernels hash tag VALUES in-kernel (r3
    # root cause) — one fewer plane through the halo exchange
    channels = make_channels(x, v, state.tag, state.mask, None, extra,
                             cfg.ncell, k)
    n_types = params.pair.a.shape[0]
    if n_types > 1:
        channels["typ"] = state.typ.reshape(channels["tag"].shape)
    kw = dict(model=system.model, ns=ns, ext=("x",),
              rng_mode=system.rng_mode, rng_rounds=system.rng_rounds,
              n_types=n_types, vma=("x",))
    xr = 2 if cfg.spill else 1
    nx, ny, nz = cfg.ncell
    if not (getattr(system, "dd_overlap", True) and nx >= 2 * xr + 1):
        padded = _halo_channels_1d(channels, dcfg, width=xr)
        f, ex, virial = halo_forces_pallas_model_fused(
            padded, state.box, step, params.pair, system.dt, cfg, **kw)
    else:
        # border/inner overlap split, same structure as the classic path
        # (_halo_forces_pallas): interior call on the purely local planes
        # overlaps the halo permutes; xr-wide boundary groups follow
        import dataclasses as _dc

        halo_l, halo_r = _halo_columns_1d(channels, dcfg, width=xr)
        cfg_inner = _dc.replace(cfg, ncell=(nx - 2 * xr, ny, nz))
        cfg_edge = _dc.replace(cfg, ncell=(xr, ny, nz))
        f_i, ex_i, vir_i = halo_forces_pallas_model_fused(
            channels, state.box, step, params.pair, system.dt, cfg_inner,
            **kw)
        win_l = {nm: jnp.concatenate(
            [halo_l[nm], channels[nm][..., :2 * xr]], axis=-1)
            for nm in channels}
        win_r = {nm: jnp.concatenate(
            [channels[nm][..., -2 * xr:], halo_r[nm]], axis=-1)
            for nm in channels}
        f_l, ex_l, vir_l = halo_forces_pallas_model_fused(
            win_l, state.box, step, params.pair, system.dt, cfg_edge, **kw)
        f_r, ex_r, vir_r = halo_forces_pallas_model_fused(
            win_r, state.box, step, params.pair, system.dt, cfg_edge, **kw)

        def stitch(al, ai, ar):
            tail = al.shape[1:]   # (3,) for f, () for dTdt, (ns,) for dCdt
            return jnp.concatenate(
                [al.reshape((ny, nz, k, xr) + tail),
                 ai.reshape((ny, nz, k, nx - 2 * xr) + tail),
                 ar.reshape((ny, nz, k, xr) + tail)],
                axis=3).reshape((ny * nz * k * nx,) + tail)

        f = stitch(f_l, f_i, f_r)
        ex = stitch(ex_l, ex_i, ex_r)
        virial = vir_i + vir_l + vir_r
    aux = {"virial": virial}
    if system.model == "edpd":
        aux["dTdt"] = ex
    else:
        aux["dCdt"] = ex
    return f, aux


def _halo_forces_model(state: State, system: System, params: SystemParams,
                       dcfg: DomainConfig, step: Array, x: Array, v: Array,
                       t, c):
    """eDPD/tDPD distributed force eval via the generic sweep
    (ops/sweep.py). Returns (f, aux dict with model extras)."""
    from meso_tpu.ops.sweep import (edpd_pair_fn, make_channels, sweep,
                                    tdpd_pair_fn)

    cfg = dcfg.cells
    if cfg.spill:
        raise ValueError("the distributed sweep cannot read a spill "
                         "layout; use force_path='pallas'")
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    nr = ny * nz * k * nx
    h = rngmod.particle_hash(state.tag, step, params.pair.seed,
                             rounds=system.rng_rounds)
    extra = {}
    multitype = params.pair.a.shape[0] > 1
    if system.model == "edpd":
        extra["T"] = t
        pair_fn = edpd_pair_fn(params.pair, system.dt, multitype,
                               rng_mode=system.rng_mode, step=step,
                               rng_rounds=system.rng_rounds)
        n_out = 5
    else:
        ns = params.pair.n_species
        for sidx in range(ns):
            extra[f"C{sidx}"] = c[:, sidx]
        pair_fn = tdpd_pair_fn(params.pair, system.dt, ns, multitype,
                               rng_mode=system.rng_mode, step=step,
                               rng_rounds=system.rng_rounds)
        n_out = 4 + ns
    channels = make_channels(x, v, state.tag, state.mask, h, extra,
                             cfg.ncell, k)
    if multitype:
        channels["typ"] = state.typ.reshape(channels["tag"].shape)
    padded = _halo_channels_1d(channels, dcfg)
    acc = sweep(padded, cfg.ncell, k, (False, False, True),
                state.box.lengths, pair_fn, n_out)
    f = jnp.stack([acc[0].reshape(nr), acc[1].reshape(nr),
                   acc[2].reshape(nr)], -1)
    aux = {"virial": jnp.sum(acc[3])}
    if system.model == "edpd":
        aux["dTdt"] = acc[4].reshape(nr) / params.pair.cv
    else:
        aux["dCdt"] = jnp.stack(
            [acc[4 + sidx].reshape(nr) for sidx in range(n_out - 4)], -1)
    return f, aux



def _halo_forces_pallas(state: State, system: System, params: SystemParams,
                        dcfg: DomainConfig, step: Array, x: Array, v: Array,
                        banded: bool = False):
    """Distributed classic forces on the PALLAS kernel: channel halo
    exchange (ppermute columns) then the fused-lane kernel over the
    x-extended brick — the multi-chip hot path (force_path='pallas').
    banded=True selects the round-1 banded kernel (force_path
    'pallas_banded'; no exclusion support there)."""
    from meso_tpu.kernels.pair_dpd import halo_forces_pallas_1d
    from meso_tpu.kernels.pair_dpd_fused import halo_forces_pallas_fused
    from meso_tpu.ops.sweep import make_channels

    cfg = dcfg.cells
    k = cfg.capacity
    # the banded (legacy) kernel still takes a precomputed hash plane;
    # the fused kernel hashes tag values in-kernel and ships no "h"
    h = (rngmod.particle_hash(state.tag, step, params.pair.seed,
                              rounds=system.rng_rounds)
         if banded else None)
    channels = make_channels(x, v, state.tag, state.mask, h, {},
                             cfg.ncell, k)
    n_types = params.pair.a.shape[0]
    if n_types > 1:
        channels["typ"] = state.typ.reshape(channels["tag"].shape)
    n_excl = 0
    if params.pair.excl is not None:
        if banded:
            raise NotImplementedError(
                "special_bonds on the banded distributed kernel is absent; "
                "use force_path='pallas' (fused) or 'bucket'")
        n_excl = params.pair.excl.shape[1]
        ex = params.pair.excl[state.tag]
        for e in range(n_excl):
            channels[f"EX{e}"] = ex[:, e].reshape(channels["tag"].shape)
    xr = 2 if cfg.spill else 1
    if banded:
        padded = _halo_channels_1d(channels, dcfg, width=xr)
        return halo_forces_pallas_1d(padded, state.box, step, params.pair,
                                     system.dt, cfg,
                                     rng_mode=system.rng_mode,
                                     rng_rounds=system.rng_rounds,
                                     n_types=n_types)
    kw = dict(rng_mode=system.rng_mode, rng_rounds=system.rng_rounds,
              s_exp=system.s_exp, n_types=n_types, n_excl=n_excl,
              vma=("x",))
    nx, ny, nz = cfg.ncell
    if not (getattr(system, "dd_overlap", True) and nx >= 2 * xr + 1):
        padded = _halo_channels_1d(channels, dcfg, width=xr)
        return halo_forces_pallas_fused(padded, state.box, step,
                                        params.pair, system.dt, cfg,
                                        ext=("x",), **kw)

    # Border/inner comm/compute OVERLAP on the fused kernel (SURVEY row 28,
    # VERDICT r2 weak #5 — the reference's stream pipeline, comm_meso.cu):
    # 1) issue the halo permutes; 2) sweep INTERIOR target columns
    # [xr, nx-xr) from the purely local planes — no data dependency on the
    # collectives, so XLA's latency-hiding scheduler runs them
    # concurrently; 3) sweep the xr-wide boundary column groups from small
    # windows that include the received halos; 4) stitch along x. Each
    # call discards its own window's ghost columns, and the kernel is not
    # Newton-folded across targets, so no pair is double-counted.
    import dataclasses as _dc

    k = cfg.capacity
    nr = ny * nz * k * nx
    halo_l, halo_r = _halo_columns_1d(channels, dcfg, width=xr)
    cfg_inner = _dc.replace(cfg, ncell=(nx - 2 * xr, ny, nz))
    cfg_edge = _dc.replace(cfg, ncell=(xr, ny, nz))
    f_int, vir_int = halo_forces_pallas_fused(
        channels, state.box, step, params.pair, system.dt, cfg_inner,
        ext=("x",), **kw)
    win_l = {nm: jnp.concatenate(
        [halo_l[nm], channels[nm][..., :2 * xr]], axis=-1)
        for nm in channels}
    win_r = {nm: jnp.concatenate(
        [channels[nm][..., -2 * xr:], halo_r[nm]], axis=-1)
        for nm in channels}
    f_l, vir_l = halo_forces_pallas_fused(
        win_l, state.box, step, params.pair, system.dt, cfg_edge,
        ext=("x",), **kw)
    f_r, vir_r = halo_forces_pallas_fused(
        win_r, state.box, step, params.pair, system.dt, cfg_edge,
        ext=("x",), **kw)
    f = jnp.concatenate(
        [f_l.reshape(ny, nz, k, xr, 3), f_int.reshape(
            ny, nz, k, nx - 2 * xr, 3), f_r.reshape(ny, nz, k, xr, 3)],
        axis=3).reshape(nr, 3)
    return f, vir_int + vir_l + vir_r


def _bonded_ghost_rows(state: State, dcfg: DomainConfig, x1: Array,
                       image1: Array, reach: int):
    """Halo ghost ROWS for bonded terms: ppermute ``reach`` boundary
    cell-plane columns of (x, image, tag, mask), flattened to extra rows.

    The reference ships ghost atoms for bonded gather the same way it ships
    pair ghosts (``comm_meso.cu`` forward path; SURVEY §2b row 27); here the
    bonded evaluation runs over [local rows | ghost rows] in tag space and
    each partner's owner keeps only its own side (no reverse comm). Chains
    need reach 1 (bond length < cell side); membrane hinges span up to
    ~sqrt(3) edge lengths plus skin drift and use reach 2."""
    cfg = dcfg.cells
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    n = dcfg.n_dev
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    n_ghost = ny * nz * k * reach

    def exchange(a):
        d = a.shape[1:] if a.ndim > 1 else ()
        p = a.reshape((ny, nz, k, nx) + d)
        hl = jax.lax.ppermute(p[:, :, :, nx - reach:], AXIS, fwd)
        hr = jax.lax.ppermute(p[:, :, :, :reach], AXIS, bwd)
        return jnp.concatenate(
            [hl.reshape((n_ghost,) + d), hr.reshape((n_ghost,) + d)])

    return (exchange(x1), exchange(image1),
            exchange(state.tag), exchange(state.mask.astype(jnp.int32)) > 0)


def _bonded_distributed(system: System, params: SystemParams,
                        dcfg: DomainConfig, state: State, x1: Array,
                        image1: Array):
    """Bonded forces over halo-extended rows (SURVEY §2b row 24 under DD).

    Returns (f on local rows, missing-partner count) — ``missing`` is the
    checked invariant for partners beyond one-cell halo reach."""
    from meso_tpu.ops.bonded import bonded_forces_ext

    nr = state.n
    b = params.bonded
    reach = 2 if (b.hinge_tags is not None or b.tri_tags is not None
                  or b.angle_tags is not None) else 1
    reach = min(reach, dcfg.ncx_local)
    gx, gimg, gtag, gmask = _bonded_ghost_rows(state, dcfg, x1, image1,
                                               reach)
    x_ext = jnp.concatenate([x1, gx])
    img_ext = jnp.concatenate([image1, gimg])
    tag_ext = jnp.concatenate([state.tag, gtag])
    mask_ext = jnp.concatenate([state.mask, gmask])
    owner = jnp.concatenate(
        [jnp.ones((nr,), bool), jnp.zeros(gx.shape[:1], bool)])
    f_ext, missing = bonded_forces_ext(
        x_ext, tag_ext, mask_ext, state.box, params.bonded,
        system.bond_style, system.n_tags, system.n_mols, image=img_ext,
        owner_mask=owner,
        reduce_sum=lambda a: jax.lax.psum(a, AXIS))
    return f_ext[:nr], missing


def _step_local(system: System, params: SystemParams, dcfg: DomainConfig,
                state: State):
    """One distributed step; returns (new_state, bonded-missing count)."""
    inv_m = params.inv_mass[state.typ]
    move = _move_mask(system, state.typ, state.mask)
    new_step = state.step + 1
    x1, image1, v_tilde = initial_integrate(
        state.x, state.v, state.f, state.image, state.box,
        system.dt, system.lam, inv_m, move)
    for fx in system.fixes:
        if hasattr(fx, "post_integrate"):
            x1, image1, v_tilde = fx.post_integrate(
                system, params, state, x1, image1, v_tilde)
    if system.model == "dpd":
        if system.force_path in ("pallas", "pallas_banded"):
            f_new, _ = _halo_forces_pallas(
                state, system, params, dcfg, new_step, x1, v_tilde,
                banded=system.force_path == "pallas_banded")
        else:
            f_new, _ = _halo_forces(state, system, params, dcfg, new_step,
                                    x1, v_tilde)
        aux = {}
    elif system.force_path == "pallas":
        f_new, aux = _halo_forces_model_pallas(state, system, params, dcfg,
                                               new_step, x1, v_tilde,
                                               state.T, state.C)
    else:
        f_new, aux = _halo_forces_model(state, system, params, dcfg,
                                        new_step, x1, v_tilde, state.T,
                                        state.C)
    missing = jnp.zeros((), jnp.int32)
    if system.bond_style is not None:
        f_b, missing = _bonded_distributed(system, params, dcfg, state,
                                           x1, image1)
        f_new = f_new + f_b
    f_new = _post_forces(system, params, state, x1, v_tilde, f_new,
                         skip_bonded=True, image=image1)
    v1 = final_integrate(state.v, state.f, f_new, system.dt, inv_m, move)
    new_state = state.replace(x=x1, v=v1, f=f_new, image=image1,
                              step=new_step)
    if system.model == "edpd":
        new_state = new_state.replace(
            T=state.T + system.dt * jnp.where(move, aux["dTdt"], 0.0),
            dTdt=aux["dTdt"])
    elif system.model == "tdpd":
        new_state = new_state.replace(
            C=state.C + system.dt * jnp.where(move[:, None],
                                              aux["dCdt"], 0.0),
            dCdt=aux["dCdt"])
    for fx in system.fixes:
        if hasattr(fx, "end_of_step"):
            new_state = fx.end_of_step(system, params, new_state)
    return new_state, missing


@partial(jax.jit, static_argnames=("system", "dcfg", "nchunks", "mesh"))
def run_distributed(system: System, params: SystemParams, dstate: State,
                    nchunks: int, mesh: Mesh, dcfg: DomainConfig):
    """nchunks x (migrate + rebuild + rebuild_every steps) under shard_map.

    ``dstate`` arrays carry a leading device axis sharded over the mesh.
    Returns (dstate, diag) with diag per-chunk max overflow counters psum'd
    across devices (checked invariants).
    """

    def shard_body(params, dstate):
        state = jax.tree.map(lambda a: a[0], dstate)
        me = jax.lax.axis_index(AXIS)
        slab_lo = me.astype(jnp.float32) * dcfg.slab_w
        slab_hi = slab_lo + dcfg.slab_w
        side_x = dcfg.slab_w / dcfg.ncx_local

        def chunk(state, _):
            merged, of_mig = _migrate(state, dcfg, slab_lo, slab_hi)
            state, of_cell = _rebuild_slab(merged, dcfg.cells, slab_lo,
                                           side_x)

            def body(s, _):
                s, miss = _step_local(system, params, dcfg, s)
                return s, miss

            state, misses = jax.lax.scan(body, state, None,
                                         length=dcfg.rebuild_every)
            of = jax.lax.psum(of_mig + of_cell, AXIS)
            miss = jax.lax.psum(jnp.max(misses), AXIS)
            return state, {"overflow": of, "bonded_missing": miss}

        state, diag = jax.lax.scan(chunk, state, None, length=nchunks)
        diag = {"overflow": jnp.max(diag["overflow"])[None],
                "bonded_missing": jnp.max(diag["bonded_missing"])[None]}
        return jax.tree.map(lambda a: a[None], state), diag

    # check_vma=False: pallas interpret mode (CPU tests of the pallas
    # force path) is not vma-aware inside shard_map — JAX's documented
    # workaround; compiled TPU behavior is unaffected
    return jax.shard_map(
        shard_body, mesh=mesh, in_specs=(P(), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS)), check_vma=False)(params, dstate)


# ---------------------------------------------------------------------------
# host-side distribute / collect
# ---------------------------------------------------------------------------

def build_domain(system: System, n_dev: int, cap_mig: int | None = None,
                 rebuild_every: int | None = None,
                 lx_global: float | None = None) -> DomainConfig:
    g = system.cells
    ncx, ny, nz = g.ncell
    if ncx % n_dev:
        raise ValueError(f"global ncx={ncx} not divisible by n_dev={n_dev}")
    ncx_l = ncx // n_dev
    if ncx_l < 3:
        raise ValueError("slab too thin: need >= 3 cell columns per device")
    spill = bool(getattr(g, "spill", False))
    if spill and ncx_l < 5:
        raise ValueError("spill layout under DD needs >= 5 local cell "
                         "columns per device (the +-2 slot window)")
    local = CellConfig(ncell=(ncx_l, ny, nz), capacity=g.capacity,
                       skin=g.skin, rebuild_every=g.rebuild_every,
                       spill=spill)
    if cap_mig is None:
        cap_mig = max(64, (ny * nz * g.capacity) // 4)
    return DomainConfig(n_dev=n_dev, cells=local,
                        lx_global=float(lx_global),
                        cap_mig=cap_mig,
                        rebuild_every=rebuild_every or g.rebuild_every)


def distribute_state(state: State, dcfg: DomainConfig) -> State:
    """Host-side: split a global state into per-device slab-bucket states
    stacked on a leading device axis (shard with P('x') on axis 0)."""
    from meso_tpu.neighbor.bucket_layout import n_rows

    n = dcfg.n_dev
    nr_local = n_rows(dcfg.cells)
    mask = np.asarray(state.mask)
    x = np.asarray(state.x)
    slab = np.clip((x[:, 0] / dcfg.slab_w).astype(int), 0, n - 1)
    per_dev = []
    for d in range(n):
        sel = mask & (slab == d)
        idx = np.where(sel)[0]
        if len(idx) > nr_local:
            raise ValueError(f"device {d}: {len(idx)} rows > {nr_local}")
        local = zeros_state(nr_local, state.box,
                            n_species=0 if state.C is None
                            else state.C.shape[1],
                            with_energy=state.T is not None)
        pad = nr_local - len(idx)

        def take(a, za):
            if a is None:
                return None
            sel_a = np.asarray(a)[idx]
            fill = np.zeros((pad,) + sel_a.shape[1:], sel_a.dtype)
            return jnp.asarray(np.concatenate([sel_a, fill]))

        local = local.replace(
            x=take(state.x, local.x), v=take(state.v, local.v),
            f=take(state.f, local.f), typ=take(state.typ, local.typ),
            tag=take(state.tag, local.tag),
            image=take(state.image, local.image),
            mol=take(state.mol, local.mol),
            mask=jnp.asarray(np.concatenate(
                [np.ones(len(idx), bool), np.zeros(pad, bool)])),
            step=state.step,
            T=take(state.T, None), C=take(state.C, None))
        # bucket-order the local rows in the slab frame
        side_x = dcfg.slab_w / dcfg.ncx_local
        local, of = jax.jit(_rebuild_slab, static_argnames=("cfg", "side_x"))(
            local, dcfg.cells, jnp.float32(d * dcfg.slab_w), side_x)
        if int(of):
            raise ValueError(f"device {d}: bucket overflow {int(of)}")
        per_dev.append(local)
    return jax.tree.map(lambda *ls: jnp.stack(ls), *per_dev)


_ROW_FIELDS = ["x", "v", "f", "typ", "tag", "image", "mask", "mol",
               "T", "dTdt", "C", "dCdt"]


def collect_state(dstate: State) -> State:
    """Host-side: merge the per-device states back into one global state."""
    kw = {}
    for name in _ROW_FIELDS:
        a = getattr(dstate, name)
        if a is None:
            kw[name] = None
        else:
            a = np.asarray(a)
            kw[name] = jnp.asarray(a.reshape((-1,) + a.shape[2:]))
    box = Box(lo=jnp.asarray(np.asarray(dstate.box.lo)[0]),
              hi=jnp.asarray(np.asarray(dstate.box.hi)[0]))
    step = jnp.asarray(np.asarray(dstate.step)[0])
    return State(box=box, step=step, **kw)

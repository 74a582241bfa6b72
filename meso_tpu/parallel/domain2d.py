"""2-D spatial domain decomposition over a ("x", "y") device mesh.

Extends the 1-D slab decomposition (``parallel/domain.py``) to a 2-D brick
(SURVEY.md §2a row 5: the reference's 3-D MPI brick; the third axis is the
natural next step and uses the same machinery). Idioms:

* halo exchange is SEQUENTIAL per axis: x-halos first (full y-extent), then
  y-halos of the x-EXTENDED planes — corner ghosts ride the second exchange
  for free (the standard brick-communication trick the reference's 6-stencil
  uses, ``comm_brick.cpp``);
* migration is likewise sequential: ship along x, then along y — a particle
  crossing a corner reaches its owner in two hops within one rebuild window;
* the force sweep treats BOTH x and y as halo-padded axes (z stays a
  periodic roll), with pre-shifted wrap coordinates on each axis.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from meso_tpu.core import rng as rngmod
from meso_tpu.core.box import Box  # noqa: F401  (collect_state_2d)
from meso_tpu.core.integrate import final_integrate, initial_integrate
from meso_tpu.core.state import State, zeros_state
from meso_tpu.core.system import System, SystemParams, _move_mask, _post_forces
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.ops.dpd import DPDParams
from meso_tpu.parallel.domain import _pack, _mig_fields

Array = jax.Array
AX, AY = "x", "y"


@dataclass(frozen=True)
class Domain2D:
    """Static 2-D decomposition config."""

    nx_dev: int
    ny_dev: int
    cells: CellConfig           # LOCAL grid (ncx_l, ncy_l, nz), capacity K
    lx: float                   # global box lengths
    ly: float
    cap_mig: int
    rebuild_every: int = 5

    @property
    def slab_wx(self) -> float:
        return self.lx / self.nx_dev

    @property
    def slab_wy(self) -> float:
        return self.ly / self.ny_dev


def build_domain2d(system: System, nx_dev: int, ny_dev: int, lx: float,
                   ly: float, cap_mig: int | None = None,
                   rebuild_every: int | None = None) -> Domain2D:
    g = system.cells
    ncx, ncy, ncz = g.ncell
    if ncx % nx_dev or ncy % ny_dev:
        raise ValueError(f"global ncell {g.ncell} not divisible by mesh "
                         f"({nx_dev}, {ny_dev})")
    ncx_l, ncy_l = ncx // nx_dev, ncy // ny_dev
    if ncx_l < 3 or ncy_l < 3:
        raise ValueError("bricks need >= 3 cell columns per device per axis")
    spill = bool(getattr(g, "spill", False))
    if spill and ncx_l < 5:
        # same bound as 1-D DD: 2-column halos + a >=1-column interior
        raise ValueError("spill layout under DD needs >= 5 local cell "
                         "columns per brick along x")
    local = CellConfig(ncell=(ncx_l, ncy_l, ncz), capacity=g.capacity,
                       skin=g.skin, rebuild_every=g.rebuild_every,
                       spill=spill)
    if cap_mig is None:
        cap_mig = max(64, (ncy_l * ncz * g.capacity) // 4)
    return Domain2D(nx_dev=nx_dev, ny_dev=ny_dev, cells=local, lx=lx, ly=ly,
                    cap_mig=cap_mig,
                    rebuild_every=rebuild_every or g.rebuild_every)


def make_mesh_2d(nx_dev: int, ny_dev: int) -> Mesh:
    devs = np.array(jax.devices()[:nx_dev * ny_dev]).reshape(nx_dev, ny_dev)
    return Mesh(devs, (AX, AY))


# ---------------------------------------------------------------------------
# local rebuild (brick frame): x and y relative to the brick origin
# ---------------------------------------------------------------------------

def _rebuild_brick(state: State, cfg: CellConfig, ox: Array, oy: Array,
                   side_x: float, side_y: float):
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    nr = ny * nz * k * nx
    n_in = state.n
    x = state.x
    cx = jnp.clip(((x[:, 0] - ox) / side_x).astype(jnp.int32), 0, nx - 1)
    cy = jnp.clip(((x[:, 1] - oy) / side_y).astype(jnp.int32), 0, ny - 1)
    lens = state.box.lengths
    cz = jnp.clip((x[:, 2] / lens[2] * nz).astype(jnp.int32), 0, nz - 1)
    key = (cy * nz + cz) * nx + cx
    key = jnp.where(state.mask, key, nx * ny * nz)
    order = jnp.argsort(key, stable=True)
    key_s = key[order]
    valid_s = state.mask[order]
    base = key_s // nx
    cxs = key_s - base * nx
    if cfg.spill:
        # in-brick right-spill, no wrap relief — same variant as the 1-D
        # slab path (VERDICT r4 item 7; the kernel reads it via 2-column
        # x halos)
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

    from meso_tpu.neighbor.bucket_layout import _pack_rows, _unpack_rows
    # index-map + one wide gather (see bucket_layout.rebuild_buckets)
    idx_map = jnp.full((nr,), -1, jnp.int32).at[target].set(
        jnp.arange(n_in, dtype=jnp.int32), mode="drop", unique_indices=True)
    src = jnp.take(order, jnp.maximum(idx_map, 0))
    packed, layout = _pack_rows(state)
    out = jnp.take(packed, src, axis=0)
    out = jnp.where((idx_map >= 0)[:, None], out, 0.0)
    return _unpack_rows(out, layout, state), overflow


# ---------------------------------------------------------------------------
# migration: sequential x then y
# ---------------------------------------------------------------------------

def _migrate_axis(state: State, axis_name: str, n_dev: int, coord: Array,
                  slab_w: float, cap: int):
    """Ship rows whose position coordinate left this device's slab along one
    mesh axis. Returns merged state (+2*cap rows) and overflow count."""
    tgt = jnp.clip((coord / slab_w).astype(jnp.int32), 0, n_dev - 1)
    me = jax.lax.axis_index(axis_name)
    delta = jnp.mod(tgt - me, n_dev)
    go_right = state.mask & (delta == 1)
    # n_dev == 2: both neighbors are the same device; route all moves right
    # so a crosser is shipped exactly once
    go_left = state.mask & (delta == n_dev - 1) & ~go_right
    too_far = state.mask & (delta != 0) & ~go_right & ~go_left

    buf_r, of_r = _pack(state, go_right, cap)
    buf_l, of_l = _pack(state, go_left, cap)
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    recv_l = jax.tree.map(lambda a: jax.lax.ppermute(a, axis_name, fwd),
                          buf_r)
    recv_r = jax.tree.map(lambda a: jax.lax.ppermute(a, axis_name, bwd),
                          buf_l)
    keep = state.mask & ~go_right & ~go_left & ~too_far
    state = state.replace(mask=keep)

    def cat(field):
        return jnp.concatenate([getattr(state, field), recv_l[field],
                                recv_r[field]], axis=0)

    merged = state.replace(
        mask=jnp.concatenate([keep, recv_l["mask"], recv_r["mask"]]),
        **{f: cat(f) for f in _mig_fields(state)})
    return merged, of_r + of_l + jnp.sum(too_far)


# ---------------------------------------------------------------------------
# halo exchange + xy-halo force sweep
# ---------------------------------------------------------------------------

def _exchange_halos_channels(channels: dict, dcfg: Domain2D):
    """Per-channel brick halo exchange: x first (full local extent), then
    y over the x-extended planes — corner ghosts ride the second exchange
    for free. Wrap links carry pre-shifted coordinates. Under the
    right-spill layout x ships TWO block-columns per side (a cell's
    particles may sit in the next cell's block); y rows carry their
    spilled occupants inherently."""
    nxd, nyd = dcfg.nx_dev, dcfg.ny_dev
    xr = 2 if dcfg.cells.spill else 1
    fwd_x = [(i, (i + 1) % nxd) for i in range(nxd)]
    bwd_x = [(i, (i - 1) % nxd) for i in range(nxd)]
    fwd_y = [(i, (i + 1) % nyd) for i in range(nyd)]
    bwd_y = [(i, (i - 1) % nyd) for i in range(nyd)]
    me_x = jax.lax.axis_index(AX)
    me_y = jax.lax.axis_index(AY)
    lx = jnp.float32(dcfg.lx)
    ly = jnp.float32(dcfg.ly)
    out = {}
    for name, p in channels.items():
        hl = jax.lax.ppermute(p[..., -xr:], AX, fwd_x)
        hr = jax.lax.ppermute(p[..., :xr], AX, bwd_x)
        if name == "x":
            hl = hl + jnp.where(me_x == 0, -lx, 0.0)
            hr = hr + jnp.where(me_x == nxd - 1, lx, 0.0)
        ext = jnp.concatenate([hl, p, hr], axis=-1)
        hb = jax.lax.ppermute(ext[-1:], AY, fwd_y)
        ht = jax.lax.ppermute(ext[:1], AY, bwd_y)
        if name == "y":
            hb = hb + jnp.where(me_y == 0, -ly, 0.0)
            ht = ht + jnp.where(me_y == nyd - 1, ly, 0.0)
        out[name] = jnp.concatenate([hb, ext, ht], axis=0)
    return out


def _halo_forces_2d(state: State, system: System, params: SystemParams,
                    dcfg: Domain2D, step: Array, x: Array, v: Array,
                    t=None, c=None):
    """Model-aware 2-D brick force eval via the generic sweep. Returns
    (f, aux) with model extras (virial, dTdt/dCdt)."""
    from meso_tpu.ops.sweep import (classic_pair_fn, edpd_pair_fn,
                                    make_channels, sweep, tdpd_pair_fn)

    cfg = dcfg.cells
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
    elif system.model == "tdpd":
        ns = params.pair.n_species
        for sidx in range(ns):
            extra[f"C{sidx}"] = c[:, sidx]
        pair_fn = tdpd_pair_fn(params.pair, system.dt, ns, multitype,
                               rng_mode=system.rng_mode, step=step,
                               rng_rounds=system.rng_rounds)
        n_out = 4 + ns
    else:
        pair_fn = classic_pair_fn(params.pair, system.dt,
                                  multitype=multitype)
        n_out = 4
    channels = make_channels(x, v, state.tag, state.mask, h, extra,
                             cfg.ncell, k)
    if multitype:
        channels["typ"] = state.typ.reshape(channels["tag"].shape)
    if system.model == "dpd" and system.force_path == "pallas":
        # fused Pallas kernel over the (x,y)-extended brick — the 2-D
        # multi-chip hot path (SURVEY §2c row 1)
        from meso_tpu.kernels.pair_dpd_fused import halo_forces_pallas_fused
        # the fused kernel hashes tag values in-kernel: drop the "h"
        # plane before the exchange (DCE removes its O(N) hash too)
        channels.pop("h", None)
        padded = _exchange_halos_channels(channels, dcfg)
        f, virial = halo_forces_pallas_fused(
            padded, state.box, step, params.pair, system.dt, cfg,
            ext=("x", "y"), rng_mode=system.rng_mode,
            rng_rounds=system.rng_rounds, s_exp=system.s_exp,
            n_types=params.pair.a.shape[0], vma=(AX, AY))
        return f, {"virial": virial}
    if cfg.spill:
        raise ValueError("the distributed sweep cannot read a spill "
                         "layout — 2-D bricks support spill on the classic "
                         "fused-kernel path (force_path='pallas') only")
    padded = _exchange_halos_channels(channels, dcfg)
    acc = sweep(padded, cfg.ncell, k, (True, False, True),
                state.box.lengths, pair_fn, n_out)
    f = jnp.stack([acc[0].reshape(nr), acc[1].reshape(nr),
                   acc[2].reshape(nr)], -1)
    aux = {"virial": jnp.sum(acc[3])}
    if system.model == "edpd":
        aux["dTdt"] = acc[4].reshape(nr) / params.pair.cv
    elif system.model == "tdpd":
        aux["dCdt"] = jnp.stack(
            [acc[4 + sidx].reshape(nr) for sidx in range(n_out - 4)], -1)
    return f, aux


def _bonded_distributed_2d(system: System, params: SystemParams,
                           dcfg: Domain2D, state: State, x1: Array,
                           image1: Array):
    """Bonded forces over the (x,y)-extended brick (SURVEY row 24 under
    2-D DD): sequential reach-r ppermute extension of (x, image, tag,
    mask) planes — corners ride the second exchange — then tag-space
    evaluation where each partner's owner (interior rows) keeps its own
    side. Returns (f local rows, missing count)."""
    from meso_tpu.ops.bonded import bonded_forces_ext

    cfg = dcfg.cells
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    b = params.bonded
    reach = 2 if (b.hinge_tags is not None or b.tri_tags is not None
                  or b.angle_tags is not None) else 1
    reach = min(reach, nx, ny)
    nxd, nyd = dcfg.nx_dev, dcfg.ny_dev
    fwd_x = [(i, (i + 1) % nxd) for i in range(nxd)]
    bwd_x = [(i, (i - 1) % nxd) for i in range(nxd)]
    fwd_y = [(i, (i + 1) % nyd) for i in range(nyd)]
    bwd_y = [(i, (i - 1) % nyd) for i in range(nyd)]

    def ext(a):
        d = a.shape[1:] if a.ndim > 1 else ()
        p = a.reshape((ny, nz, k, nx) + d)
        hl = jax.lax.ppermute(p[:, :, :, nx - reach:], AX, fwd_x)
        hr = jax.lax.ppermute(p[:, :, :, :reach], AX, bwd_x)
        p = jnp.concatenate([hl, p, hr], axis=3)
        hb = jax.lax.ppermute(p[ny - reach:], AY, fwd_y)
        ht = jax.lax.ppermute(p[:reach], AY, bwd_y)
        p = jnp.concatenate([hb, p, ht], axis=0)
        return p.reshape((-1,) + d)

    owner = jnp.pad(jnp.ones((ny, nz, k, nx), bool),
                    ((reach, reach), (0, 0), (0, 0), (reach, reach))
                    ).reshape(-1)
    f_ext, missing = bonded_forces_ext(
        ext(x1), ext(state.tag), ext(state.mask.astype(jnp.int32)) > 0,
        state.box, b, system.bond_style, system.n_tags, system.n_mols,
        image=ext(image1), owner_mask=owner,
        reduce_sum=lambda v: jax.lax.psum(jax.lax.psum(v, AX), AY))
    f = f_ext.reshape(ny + 2 * reach, nz, k, nx + 2 * reach, 3)[
        reach:-reach, :, :, reach:-reach]
    return f.reshape(-1, 3), missing


def _step_local_2d(system: System, params: SystemParams, dcfg: Domain2D,
                   state: State):
    inv_m = params.inv_mass[state.typ]
    move = _move_mask(system, state.typ, state.mask)
    new_step = state.step + 1
    x1, image1, v_tilde = initial_integrate(
        state.x, state.v, state.f, state.image, state.box,
        system.dt, system.lam, inv_m, move)
    f_new, aux = _halo_forces_2d(state, system, params, dcfg, new_step, x1,
                                 v_tilde, state.T, state.C)
    missing = jnp.zeros((), jnp.int32)
    if system.bond_style is not None:
        f_b, missing = _bonded_distributed_2d(system, params, dcfg, state,
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
    return new_state, missing


@partial(jax.jit, static_argnames=("system", "dcfg", "nchunks", "mesh"))
def run_distributed_2d(system: System, params: SystemParams, dstate: State,
                       nchunks: int, mesh: Mesh, dcfg: Domain2D):
    """nchunks x (migrate x, migrate y, rebuild, rebuild_every steps)."""

    def shard_body(params, dstate):
        state = jax.tree.map(lambda a: a[0, 0], dstate)
        me_x = jax.lax.axis_index(AX)
        me_y = jax.lax.axis_index(AY)
        ox = me_x.astype(jnp.float32) * dcfg.slab_wx
        oy = me_y.astype(jnp.float32) * dcfg.slab_wy
        side_x = dcfg.slab_wx / dcfg.cells.ncell[0]
        side_y = dcfg.slab_wy / dcfg.cells.ncell[1]

        def chunk(state, _):
            state, of_x = _migrate_axis(state, AX, dcfg.nx_dev,
                                        state.x[:, 0], dcfg.slab_wx,
                                        dcfg.cap_mig)
            state, of_y = _migrate_axis(state, AY, dcfg.ny_dev,
                                        state.x[:, 1], dcfg.slab_wy,
                                        dcfg.cap_mig)
            state, of_c = _rebuild_brick(state, dcfg.cells, ox, oy,
                                         side_x, side_y)

            def body(s, _):
                s, miss = _step_local_2d(system, params, dcfg, s)
                return s, miss

            state, misses = jax.lax.scan(body, state, None,
                                         length=dcfg.rebuild_every)
            of = jax.lax.psum(jax.lax.psum(of_x + of_y + of_c, AX), AY)
            miss = jax.lax.psum(jax.lax.psum(jnp.max(misses), AX), AY)
            return state, {"overflow": of, "bonded_missing": miss}

        state, diag = jax.lax.scan(chunk, state, None, length=nchunks)
        diag = {"overflow": jnp.max(diag["overflow"])[None, None],
                "bonded_missing":
                    jnp.max(diag["bonded_missing"])[None, None]}
        return jax.tree.map(lambda a: a[None, None], state), diag

    # check_vma=False: pallas interpret mode (CPU tests of the fused
    # kernel path) is not vma-aware inside shard_map (same as domain.py)
    return jax.shard_map(
        shard_body, mesh=mesh, in_specs=(P(), P(AX, AY)),
        out_specs=(P(AX, AY), P(AX, AY)), check_vma=False)(params, dstate)


def distribute_state_2d(state: State, dcfg: Domain2D) -> State:
    """Host-side: split a global state into per-brick bucket states stacked
    on leading (nx_dev, ny_dev) axes."""
    from meso_tpu.neighbor.bucket_layout import n_rows

    nr_local = n_rows(dcfg.cells)
    mask = np.asarray(state.mask)
    x = np.asarray(state.x)
    bx = np.clip((x[:, 0] / dcfg.slab_wx).astype(int), 0, dcfg.nx_dev - 1)
    by = np.clip((x[:, 1] / dcfg.slab_wy).astype(int), 0, dcfg.ny_dev - 1)
    rows = []
    for dx in range(dcfg.nx_dev):
        row = []
        for dy in range(dcfg.ny_dev):
            sel = mask & (bx == dx) & (by == dy)
            idx = np.where(sel)[0]
            if len(idx) > nr_local:
                raise ValueError(f"brick ({dx},{dy}): {len(idx)} > {nr_local}")
            local = zeros_state(nr_local, state.box,
                                n_species=0 if state.C is None
                                else state.C.shape[1],
                                with_energy=state.T is not None)
            pad = nr_local - len(idx)

            def take(a):
                if a is None:
                    return None
                sel_a = np.asarray(a)[idx]
                fill = np.zeros((pad,) + sel_a.shape[1:], sel_a.dtype)
                return jnp.asarray(np.concatenate([sel_a, fill]))

            local = local.replace(
                x=take(state.x), v=take(state.v), f=take(state.f),
                typ=take(state.typ), tag=take(state.tag),
                image=take(state.image), mol=take(state.mol),
                mask=jnp.asarray(np.concatenate(
                    [np.ones(len(idx), bool), np.zeros(pad, bool)])),
                step=state.step,
                T=take(state.T), C=take(state.C))
            side_x = dcfg.slab_wx / dcfg.cells.ncell[0]
            side_y = dcfg.slab_wy / dcfg.cells.ncell[1]
            local, of = jax.jit(
                _rebuild_brick,
                static_argnames=("cfg", "side_x", "side_y"))(
                local, dcfg.cells, jnp.float32(dx * dcfg.slab_wx),
                jnp.float32(dy * dcfg.slab_wy), side_x, side_y)
            if int(of):
                raise ValueError(f"brick ({dx},{dy}) overflow {int(of)}")
            row.append(local)
        rows.append(jax.tree.map(lambda *ls: jnp.stack(ls), *row))
    return jax.tree.map(lambda *ls: jnp.stack(ls), *rows)


def collect_state_2d(dstate: State) -> State:
    """Merge per-brick states back into one global state."""
    from meso_tpu.parallel.domain import _ROW_FIELDS

    kw = {}
    for name in _ROW_FIELDS:
        a = getattr(dstate, name)
        if a is None:
            kw[name] = None
        else:
            a = np.asarray(a)
            kw[name] = jnp.asarray(a.reshape((-1,) + a.shape[3:]))
    box = Box(lo=jnp.asarray(np.asarray(dstate.box.lo)[0, 0]),
              hi=jnp.asarray(np.asarray(dstate.box.hi)[0, 0]))
    step = jnp.asarray(np.asarray(dstate.step)[0, 0])
    return State(box=box, step=step, **kw)

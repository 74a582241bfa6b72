"""3-D spatial domain decomposition over a ("x", "y", "z") device mesh.

Completes the brick hierarchy (1-D slabs -> 2-D bricks -> 3-D bricks;
SURVEY.md §2a row 5: the reference's 3-D MPI brick). Same idioms as
``parallel/domain2d.py``, extended to the third axis:

* halo exchange is SEQUENTIAL per axis: x-halos (local extent), y-halos of
  the x-extended planes, then z-halos of the xy-extended planes — edge and
  corner ghosts ride the later exchanges for free (the 6-stencil brick
  trick of ``comm_brick.cpp``);
* migration ships along x, then y, then z — a corner-crosser reaches its
  owner in at most three hops within one rebuild window;
* the force sweep treats ALL THREE axes as halo-padded (``ops/sweep.py``
  with halo=(True, True, True)); every axis min-images against the global
  box so mid-window global-wrap crossers keep exact forces.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from meso_tpu.core import rng as rngmod
from meso_tpu.core.box import Box  # noqa: F401  (collect_state_3d)
from meso_tpu.core.integrate import final_integrate, initial_integrate
from meso_tpu.core.state import State, zeros_state
from meso_tpu.core.system import System, SystemParams, _move_mask, _post_forces
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.parallel.domain2d import _migrate_axis

Array = jax.Array
AX, AY, AZ = "x", "y", "z"


@dataclass(frozen=True)
class Domain3D:
    """Static 3-D decomposition config."""

    nx_dev: int
    ny_dev: int
    nz_dev: int
    cells: CellConfig           # LOCAL grid (ncx_l, ncy_l, ncz_l), capacity K
    lx: float
    ly: float
    lz: float
    cap_mig: int
    rebuild_every: int = 5

    @property
    def slab_wx(self) -> float:
        return self.lx / self.nx_dev

    @property
    def slab_wy(self) -> float:
        return self.ly / self.ny_dev

    @property
    def slab_wz(self) -> float:
        return self.lz / self.nz_dev


def build_domain3d(system: System, nx_dev: int, ny_dev: int, nz_dev: int,
                   lx: float, ly: float, lz: float,
                   cap_mig: int | None = None,
                   rebuild_every: int | None = None) -> Domain3D:
    g = system.cells
    ncx, ncy, ncz = g.ncell
    if ncx % nx_dev or ncy % ny_dev or ncz % nz_dev:
        raise ValueError(f"global ncell {g.ncell} not divisible by mesh "
                         f"({nx_dev}, {ny_dev}, {nz_dev})")
    ncx_l, ncy_l, ncz_l = ncx // nx_dev, ncy // ny_dev, ncz // nz_dev
    if min(ncx_l, ncy_l, ncz_l) < 3:
        raise ValueError("bricks need >= 3 cell columns per device per axis")
    spill = bool(getattr(g, "spill", False))
    if spill and ncx_l < 5:
        # same bound as 1-D DD: 2-column halos + a >=1-column interior
        raise ValueError("spill layout under DD needs >= 5 local cell "
                         "columns per brick along x")
    local = CellConfig(ncell=(ncx_l, ncy_l, ncz_l), capacity=g.capacity,
                       skin=g.skin, rebuild_every=g.rebuild_every,
                       spill=spill)
    if cap_mig is None:
        face = max(ncy_l * ncz_l, ncx_l * ncz_l, ncx_l * ncy_l)
        cap_mig = max(64, (face * g.capacity) // 4)
    return Domain3D(nx_dev=nx_dev, ny_dev=ny_dev, nz_dev=nz_dev, cells=local,
                    lx=lx, ly=ly, lz=lz, cap_mig=cap_mig,
                    rebuild_every=rebuild_every or g.rebuild_every)


def make_mesh_3d(nx_dev: int, ny_dev: int, nz_dev: int) -> Mesh:
    devs = np.array(jax.devices()[:nx_dev * ny_dev * nz_dev]).reshape(
        nx_dev, ny_dev, nz_dev)
    return Mesh(devs, (AX, AY, AZ))


# ---------------------------------------------------------------------------
# local rebuild: all three axes relative to the brick origin
# ---------------------------------------------------------------------------

def _rebuild_brick3d(state: State, cfg: CellConfig, ox: Array, oy: Array,
                     oz: Array, side_x: float, side_y: float, side_z: float):
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    nr = ny * nz * k * nx
    n_in = state.n
    x = state.x
    cx = jnp.clip(((x[:, 0] - ox) / side_x).astype(jnp.int32), 0, nx - 1)
    cy = jnp.clip(((x[:, 1] - oy) / side_y).astype(jnp.int32), 0, ny - 1)
    cz = jnp.clip(((x[:, 2] - oz) / side_z).astype(jnp.int32), 0, nz - 1)
    key = (cy * nz + cz) * nx + cx
    key = jnp.where(state.mask, key, nx * ny * nz)
    order = jnp.argsort(key, stable=True)
    key_s = key[order]
    valid_s = state.mask[order]
    base = key_s // nx
    cxs = key_s - base * nx
    if cfg.spill:
        # in-brick right-spill, no wrap relief (VERDICT r4 item 7)
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
# halo exchange: x, then y over x-extended, then z over xy-extended
# ---------------------------------------------------------------------------

def _exchange_halos_3d(channels: dict, dcfg: Domain3D):
    """Per-channel brick halo exchange over all three mesh axes. Edge and
    corner ghosts ride the later exchanges; wrap links carry pre-shifted
    coordinates. Channel planes are (ny, nz, K, nx): y=axis 0, z=axis 1,
    x=axis 3."""
    nxd, nyd, nzd = dcfg.nx_dev, dcfg.ny_dev, dcfg.nz_dev
    fwd = {AX: [(i, (i + 1) % nxd) for i in range(nxd)],
           AY: [(i, (i + 1) % nyd) for i in range(nyd)],
           AZ: [(i, (i + 1) % nzd) for i in range(nzd)]}
    bwd = {AX: [(i, (i - 1) % nxd) for i in range(nxd)],
           AY: [(i, (i - 1) % nyd) for i in range(nyd)],
           AZ: [(i, (i - 1) % nzd) for i in range(nzd)]}
    me = {ax: jax.lax.axis_index(ax) for ax in (AX, AY, AZ)}
    ndev = {AX: nxd, AY: nyd, AZ: nzd}
    span = {AX: jnp.float32(dcfg.lx), AY: jnp.float32(dcfg.ly),
            AZ: jnp.float32(dcfg.lz)}

    # right-spill: x ships TWO block-columns per side (a cell's particles
    # may sit in the next cell's block); y/z planes carry their rows'
    # spilled occupants inherently
    xr = 2 if dcfg.cells.spill else 1

    def exchange(p, ax, axis, shift_wrap, width=1):
        lo = jax.lax.ppermute(
            jax.lax.slice_in_dim(p, p.shape[axis] - width, p.shape[axis],
                                 axis=axis), ax, fwd[ax])
        hi = jax.lax.ppermute(
            jax.lax.slice_in_dim(p, 0, width, axis=axis), ax, bwd[ax])
        if shift_wrap:
            lo = lo + jnp.where(me[ax] == 0, -span[ax], 0.0)
            hi = hi + jnp.where(me[ax] == ndev[ax] - 1, span[ax], 0.0)
        return jnp.concatenate([lo, p, hi], axis=axis)

    out = {}
    for name, p in channels.items():
        p = exchange(p, AX, 3, name == "x", width=xr)
        p = exchange(p, AY, 0, name == "y")
        p = exchange(p, AZ, 1, name == "z")
        out[name] = p
    return out


def _halo_forces_3d(state: State, system: System, params: SystemParams,
                    dcfg: Domain3D, step: Array, x: Array, v: Array,
                    t=None, c=None):
    """Model-aware 3-D brick force eval via the generic sweep. Returns
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
        # fused Pallas kernel over the fully extended brick — the 3-D
        # multi-chip hot path (SURVEY §2c row 1)
        from meso_tpu.kernels.pair_dpd_fused import halo_forces_pallas_fused
        # the fused kernel hashes tag values in-kernel: drop the "h"
        # plane before the exchange (DCE removes its O(N) hash too)
        channels.pop("h", None)
        padded = _exchange_halos_3d(channels, dcfg)
        f, virial = halo_forces_pallas_fused(
            padded, state.box, step, params.pair, system.dt, cfg,
            ext=("x", "y", "z"), rng_mode=system.rng_mode,
            rng_rounds=system.rng_rounds, s_exp=system.s_exp,
            n_types=params.pair.a.shape[0], vma=(AX, AY, AZ))
        return f, {"virial": virial}
    if cfg.spill:
        raise ValueError("the distributed sweep cannot read a spill "
                         "layout — 3-D bricks support spill on the classic "
                         "fused-kernel path (force_path='pallas') only")
    padded = _exchange_halos_3d(channels, dcfg)
    acc = sweep(padded, cfg.ncell, k, (True, True, True),
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


def _bonded_distributed_3d(system: System, params: SystemParams,
                           dcfg: Domain3D, state: State, x1: Array,
                           image1: Array):
    """Bonded forces over the fully extended brick (SURVEY row 24 under
    3-D DD): sequential reach-r ppermute extension of (x, image, tag, mask)
    planes on all three axes (edges/corners ride the later exchanges), then
    tag-space evaluation where each partner's owner keeps its own side."""
    from meso_tpu.ops.bonded import bonded_forces_ext

    cfg = dcfg.cells
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    b = params.bonded
    reach = 2 if (b.hinge_tags is not None or b.tri_tags is not None
                  or b.angle_tags is not None) else 1
    reach = min(reach, nx, ny, nz)
    nxd, nyd, nzd = dcfg.nx_dev, dcfg.ny_dev, dcfg.nz_dev
    fwd = {AX: [(i, (i + 1) % nxd) for i in range(nxd)],
           AY: [(i, (i + 1) % nyd) for i in range(nyd)],
           AZ: [(i, (i + 1) % nzd) for i in range(nzd)]}
    bwd = {AX: [(i, (i - 1) % nxd) for i in range(nxd)],
           AY: [(i, (i - 1) % nyd) for i in range(nyd)],
           AZ: [(i, (i - 1) % nzd) for i in range(nzd)]}

    def ext1(p, ax, axis):
        n_ax = p.shape[axis]
        lo = jax.lax.ppermute(
            jax.lax.slice_in_dim(p, n_ax - reach, n_ax, axis=axis),
            ax, fwd[ax])
        hi = jax.lax.ppermute(
            jax.lax.slice_in_dim(p, 0, reach, axis=axis), ax, bwd[ax])
        return jnp.concatenate([lo, p, hi], axis=axis)

    def ext(a):
        d = a.shape[1:] if a.ndim > 1 else ()
        p = a.reshape((ny, nz, k, nx) + d)
        p = ext1(p, AX, 3)
        p = ext1(p, AY, 0)
        p = ext1(p, AZ, 1)
        return p.reshape((-1,) + d)

    r = reach
    owner = jnp.pad(jnp.ones((ny, nz, k, nx), bool),
                    ((r, r), (r, r), (0, 0), (r, r))).reshape(-1)

    def psum3(v):
        for ax in (AX, AY, AZ):
            v = jax.lax.psum(v, ax)
        return v

    f_ext, missing = bonded_forces_ext(
        ext(x1), ext(state.tag), ext(state.mask.astype(jnp.int32)) > 0,
        state.box, b, system.bond_style, system.n_tags, system.n_mols,
        image=ext(image1), owner_mask=owner, reduce_sum=psum3)
    f = f_ext.reshape(ny + 2 * r, nz + 2 * r, k, nx + 2 * r, 3)[
        r:-r, r:-r, :, r:-r]
    return f.reshape(-1, 3), missing


def _step_local_3d(system: System, params: SystemParams, dcfg: Domain3D,
                   state: State):
    inv_m = params.inv_mass[state.typ]
    move = _move_mask(system, state.typ, state.mask)
    new_step = state.step + 1
    x1, image1, v_tilde = initial_integrate(
        state.x, state.v, state.f, state.image, state.box,
        system.dt, system.lam, inv_m, move)
    f_new, aux = _halo_forces_3d(state, system, params, dcfg, new_step, x1,
                                 v_tilde, state.T, state.C)
    missing = jnp.zeros((), jnp.int32)
    if system.bond_style is not None:
        f_b, missing = _bonded_distributed_3d(system, params, dcfg, state,
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
def run_distributed_3d(system: System, params: SystemParams, dstate: State,
                       nchunks: int, mesh: Mesh, dcfg: Domain3D):
    """nchunks x (migrate x/y/z, rebuild, rebuild_every steps)."""

    def shard_body(params, dstate):
        state = jax.tree.map(lambda a: a[0, 0, 0], dstate)
        ox = jax.lax.axis_index(AX).astype(jnp.float32) * dcfg.slab_wx
        oy = jax.lax.axis_index(AY).astype(jnp.float32) * dcfg.slab_wy
        oz = jax.lax.axis_index(AZ).astype(jnp.float32) * dcfg.slab_wz
        side_x = dcfg.slab_wx / dcfg.cells.ncell[0]
        side_y = dcfg.slab_wy / dcfg.cells.ncell[1]
        side_z = dcfg.slab_wz / dcfg.cells.ncell[2]

        def chunk(state, _):
            state, of_x = _migrate_axis(state, AX, dcfg.nx_dev,
                                        state.x[:, 0], dcfg.slab_wx,
                                        dcfg.cap_mig)
            state, of_y = _migrate_axis(state, AY, dcfg.ny_dev,
                                        state.x[:, 1], dcfg.slab_wy,
                                        dcfg.cap_mig)
            state, of_z = _migrate_axis(state, AZ, dcfg.nz_dev,
                                        state.x[:, 2], dcfg.slab_wz,
                                        dcfg.cap_mig)
            state, of_c = _rebuild_brick3d(state, dcfg.cells, ox, oy, oz,
                                           side_x, side_y, side_z)

            def body(s, _):
                s, miss = _step_local_3d(system, params, dcfg, s)
                return s, miss

            state, misses = jax.lax.scan(body, state, None,
                                         length=dcfg.rebuild_every)
            of = of_x + of_y + of_z + of_c
            miss = jnp.max(misses)
            for ax in (AX, AY, AZ):
                of = jax.lax.psum(of, ax)
                miss = jax.lax.psum(miss, ax)
            return state, {"overflow": of, "bonded_missing": miss}

        state, diag = jax.lax.scan(chunk, state, None, length=nchunks)
        diag = {"overflow": jnp.max(diag["overflow"])[None, None, None],
                "bonded_missing":
                    jnp.max(diag["bonded_missing"])[None, None, None]}
        return jax.tree.map(lambda a: a[None, None, None], state), diag

    return jax.shard_map(
        shard_body, mesh=mesh, in_specs=(P(), P(AX, AY, AZ)),
        out_specs=(P(AX, AY, AZ), P(AX, AY, AZ)),
        check_vma=False)(params, dstate)


def distribute_state_3d(state: State, dcfg: Domain3D) -> State:
    """Host-side: split a global state into per-brick bucket states stacked
    on leading (nx_dev, ny_dev, nz_dev) axes."""
    from meso_tpu.neighbor.bucket_layout import n_rows

    nr_local = n_rows(dcfg.cells)
    mask = np.asarray(state.mask)
    x = np.asarray(state.x)
    bx = np.clip((x[:, 0] / dcfg.slab_wx).astype(int), 0, dcfg.nx_dev - 1)
    by = np.clip((x[:, 1] / dcfg.slab_wy).astype(int), 0, dcfg.ny_dev - 1)
    bz = np.clip((x[:, 2] / dcfg.slab_wz).astype(int), 0, dcfg.nz_dev - 1)
    side_x = dcfg.slab_wx / dcfg.cells.ncell[0]
    side_y = dcfg.slab_wy / dcfg.cells.ncell[1]
    side_z = dcfg.slab_wz / dcfg.cells.ncell[2]
    planes = []
    for dx in range(dcfg.nx_dev):
        rows = []
        for dy in range(dcfg.ny_dev):
            col = []
            for dz in range(dcfg.nz_dev):
                sel = mask & (bx == dx) & (by == dy) & (bz == dz)
                idx = np.where(sel)[0]
                if len(idx) > nr_local:
                    raise ValueError(
                        f"brick ({dx},{dy},{dz}): {len(idx)} > {nr_local}")
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
                local, of = jax.jit(
                    _rebuild_brick3d,
                    static_argnames=("cfg", "side_x", "side_y", "side_z"))(
                    local, dcfg.cells, jnp.float32(dx * dcfg.slab_wx),
                    jnp.float32(dy * dcfg.slab_wy),
                    jnp.float32(dz * dcfg.slab_wz), side_x, side_y, side_z)
                if int(of):
                    raise ValueError(f"brick ({dx},{dy},{dz}) overflow "
                                     f"{int(of)}")
                col.append(local)
            rows.append(jax.tree.map(lambda *ls: jnp.stack(ls), *col))
        planes.append(jax.tree.map(lambda *ls: jnp.stack(ls), *rows))
    return jax.tree.map(lambda *ls: jnp.stack(ls), *planes)


def collect_state_3d(dstate: State) -> State:
    """Merge per-brick states back into one global state."""
    from meso_tpu.parallel.domain import _ROW_FIELDS

    kw = {}
    for name in _ROW_FIELDS:
        a = getattr(dstate, name)
        if a is None:
            kw[name] = None
        else:
            a = np.asarray(a)
            kw[name] = jnp.asarray(a.reshape((-1,) + a.shape[4:]))
    box = Box(lo=jnp.asarray(np.asarray(dstate.box.lo)[0, 0, 0]),
              hi=jnp.asarray(np.asarray(dstate.box.hi)[0, 0, 0]))
    step = jnp.asarray(np.asarray(dstate.step)[0, 0, 0])
    return State(box=box, step=step, **kw)

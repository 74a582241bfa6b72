"""Pallas TPU pair-force kernel over the bucket-resident layout.

TPU-native replacement of the reference's hottest CUDA kernel
(``pair_dpd_meso.cu``, SURVEY.md §2b rows 20-21, §3.3). Design:

* state rows are cell buckets (``neighbor/bucket_layout.py``): per-particle
  channels reshape zero-copy to (ncy, ncz, K, ncx) planes;
* each grid step computes G consecutive z-rows of one cy-row; the 27-cell
  stencil = 3 cy-BAND blocks of (G+2) z-rows x 3 static lane-rolls for dx.
  The band overlap is materialized once per force eval at the XLA level
  (cheap slice+stack) so every Pallas block has exact stride == size; halo
  copies carry pre-shifted y/z coordinates — the same trick the multi-chip
  halo exchange uses. Banding amortizes neighbor re-reads: VMEM traffic per
  output row drops from 9 row-reads to 3(G+2)/G;
* every tensor in the kernel is a 2-D tile: neighbors as (K_j, ncx) lane-
  rolled then lane-tiled to (K_j, K_s*ncx); self values as (1, K_s*ncx) read
  through a SECOND alias of the unpadded planes with block shape
  (.., 1, K*ncx) — Mosaic forbids lane-crossing reshapes in-kernel, so the
  two views are prepared at the XLA level where reshape is free;
* per-pair math identical to ``ops/dpd.pair_force``: branch-free masking,
  fused counter-based RNG, register accumulation, ONE writer per particle —
  the reference's atomics-free property holds by construction;
* no gather, no scatter, no atomics, no dynamic shapes anywhere.

Multi-type support: when the coefficient tables are (T,T) with T > 1, the
particle type rides as an extra channel and per-pair a/gamma/sigma/rc are
resolved in-kernel from an SMEM table by an unrolled select chain over the
T^2 pair codes (no gathers — Mosaic-friendly; cost grows as T^2 selects
per neighbor tile, practical for the small type counts DPD decks use).
Both RNG tiers run in-kernel: "fast" (combined per-particle
hashes) and "tea" (full TEA-`rounds` on the sorted tag pair — reference
parity, row 21).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meso_tpu.core import rng as rngmod
from meso_tpu.core.box import Box
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.ops.dpd import DPDParams

Array = jax.Array

# channel indices in the stacked plane tensor
_SX, _SY, _SZ, _VX, _VY, _VZ, _H, _VALID = range(8)


def _lane_tile(p: Array, reps: int) -> Array:
    """(K, nx) -> (K, reps*nx) with [j, s*nx + c] = p[j, c] (s-major tiling)."""
    return jnp.concatenate([p] * reps, axis=1)


def _kernel(*refs, k: int, nx: int, g: int, rng_mode: str,
            rng_rounds: int, n_chan: int, n_types: int, typ_chan: int,
            n_excl: int, tag_chan: int, ex_chan: int, halo_x: bool = False):
    """refs = [scal, iscal, tab, self, band(dy=0..2), out_ref, bands_scratch].

    fori_loop over (output z-row, dy band) pairs bounds live temporaries to
    one body (scoped-VMEM stack limit is 16 MB).
    """
    scal_ref = refs[0]
    iscal_ref = refs[1]      # SMEM (1, 2) int32: [step, seed]
    tab_ref = refs[2]        # SMEM (4, max(1, T*T)): a/gamma/sigma/rc tables
    selfref = refs[3]        # (n_chan, G, 1, K*nx)
    bands = refs[4:7]        # 3 x (n_chan, G+2, K, nx)
    out_ref = refs[7]
    bands_s = refs[8]        # VMEM scratch (3, n_chan, G+2, K, nx)
    a = scal_ref[0, 0]
    gamma = scal_ref[0, 1]
    sigma = scal_ref[0, 2]
    rc = scal_ref[0, 3]
    dt_inv_sqrt = scal_ref[0, 4]
    lx = scal_ref[0, 5]
    s_e = scal_ref[0, 6]   # generalized weight exponent (w_R = w^s)
    excl_w = scal_ref[0, 7]  # special_bonds weight for excluded pairs
    ly = scal_ref[0, 8]
    lz = scal_ref[0, 9]
    if rng_mode == "tea":
        step_u = iscal_ref[0, 0].astype(jnp.uint32)
        seed_u = iscal_ref[0, 1].astype(jnp.uint32)

    for i, ref in enumerate(bands):
        bands_s[i] = ref[...]

    # lane l = s*nx + c ; sublane = j  -> self-pair exclusion
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (k, k * nx), 1) // nx
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (k, k * nx), 0)
    self_pair = j_idx == s_idx

    def body(it, _):
        # fori over (z-row, dy band, dz row): keeps only the 3 dx-unrolled
        # bodies' temporaries live at once (scoped-VMEM stack limit: Mosaic
        # does not reuse buffers across unrolled iterations)
        grow = it // 9       # output z-row 0..G-1
        dy = (it % 9) // 3   # band index 0..2
        dz = it % 3          # row within the band window

        def selfchan(c):  # (1, K*nx)
            return selfref[c, grow, :, :]

        sxs = selfchan(_SX)
        sys_ = selfchan(_SY)
        szs = selfchan(_SZ)
        vxs = selfchan(_VX)
        vys = selfchan(_VY)
        vzs = selfchan(_VZ)
        hs = pltpu.bitcast(selfchan(_H), jnp.uint32)
        vs = selfchan(_VALID)
        if rng_mode == "tea":
            tgs = pltpu.bitcast(selfchan(8), jnp.int32)
        if n_types > 1:
            tis = selfchan(typ_chan)  # f32 type codes, exact for small ints
        if n_excl:
            exs = [pltpu.bitcast(selfchan(ex_chan + e), jnp.int32)
                   for e in range(n_excl)]

        fx = jnp.zeros((1, k * nx), jnp.float32)
        fy = jnp.zeros((1, k * nx), jnp.float32)
        fz = jnp.zeros((1, k * nx), jnp.float32)
        vir = jnp.zeros((1, k * nx), jnp.float32)
        is_center_row = (dy == 1) & (dz == 1)

        def chan(c):  # (K, nx) or (K, nx+2) when halo_x
            return bands_s[dy, c, grow + dz, :, :]

        if True:
            for dx in (-1, 0, 1):
                if halo_x:
                    def nb(p, _dx=dx):  # static lane slice of the x-halo
                        return _lane_tile(p[:, 1 + _dx:1 + _dx + nx], k)
                else:
                    def nb(p, _dx=dx):
                        r = pltpu.roll(p, (-_dx) % nx, 1) if _dx else p
                        return _lane_tile(r, k)

                if n_types > 1:
                    # pair code -> unrolled SMEM-table select chain
                    code = tis * jnp.float32(n_types) + nb(chan(typ_chan))
                    a_ij = tab_ref[0, 0]
                    g_ij = tab_ref[1, 0]
                    s_ij = tab_ref[2, 0]
                    rc_ij = tab_ref[3, 0]
                    for p in range(1, n_types * n_types):
                        sel = code == jnp.float32(p)
                        a_ij = jnp.where(sel, tab_ref[0, p], a_ij)
                        g_ij = jnp.where(sel, tab_ref[1, p], g_ij)
                        s_ij = jnp.where(sel, tab_ref[2, p], s_ij)
                        rc_ij = jnp.where(sel, tab_ref[3, p], rc_ij)
                else:
                    a_ij, g_ij, s_ij, rc_ij = a, gamma, sigma, rc
                # minimum image on ALL axes: halo/pad coords are
                # pre-shifted for cross-boundary pairs, but a particle can
                # wrap the GLOBAL box mid-window while still bucketed at
                # the far side (box.wrap runs every step; buckets only at
                # rebuild) — raw dr ~ L there, and only min-image fixes it
                drx = sxs - nb(chan(_SX))
                drx = drx - jnp.round(drx / lx) * lx
                dry = sys_ - nb(chan(_SY))
                dry = dry - jnp.round(dry / ly) * ly
                drz = szs - nb(chan(_SZ))
                drz = drz - jnp.round(drz / lz) * lz
                r2 = drx * drx + dry * dry + drz * drz
                ok = (r2 < rc_ij * rc_ij) & (r2 > 0.0)
                ok = ok & (nb(chan(_VALID)) * vs > 0.5)
                if dx == 0:
                    ok = ok & ~(self_pair & is_center_row)
                r2s = jnp.where(ok, r2, 1.0)
                rinv = jax.lax.rsqrt(r2s)
                r = r2s * rinv
                w = 1.0 - r / rc_ij
                wr = jnp.where(s_e == 1.0, w, jnp.power(w, s_e))
                dvx = vxs - nb(chan(_VX))
                dvy = vys - nb(chan(_VY))
                dvz = vzs - nb(chan(_VZ))
                ev = (drx * dvx + dry * dvy + drz * dvz) * rinv
                if rng_mode == "tea":
                    tgj = pltpu.bitcast(nb(chan(8)), jnp.int32)
                    lo = jnp.minimum(tgs, tgj).astype(jnp.uint32)
                    hi = jnp.maximum(tgs, tgj).astype(jnp.uint32)
                    v0, _ = rngmod.tea(lo, hi, step_u, seed_u,
                                       rounds=rng_rounds)
                    theta = rngmod._u32_to_symmetric_uniform(v0)
                else:
                    hj = pltpu.bitcast(nb(chan(_H)), jnp.uint32)
                    theta = rngmod.pair_uniform_fast(hs, hj)
                fmag = (a_ij * w - g_ij * (wr * wr) * ev
                        + s_ij * wr * theta * dt_inv_sqrt)
                fmag = jnp.where(ok, fmag, 0.0)
                if n_excl:
                    # special_bonds: scale pairs whose neighbor tag is in
                    # this particle's exclusion list
                    tgj_x = pltpu.bitcast(nb(chan(tag_chan)), jnp.int32)
                    hit = exs[0] == tgj_x
                    for e in range(1, n_excl):
                        hit = hit | (exs[e] == tgj_x)
                    fmag = fmag * jnp.where(hit, excl_w, 1.0)
                fr = fmag * rinv
                fx = fx + jnp.sum(fr * drx, axis=0, keepdims=True)
                fy = fy + jnp.sum(fr * dry, axis=0, keepdims=True)
                fz = fz + jnp.sum(fr * drz, axis=0, keepdims=True)
                vir = vir + jnp.sum(0.5 * fmag * r, axis=0, keepdims=True)

        # accumulate into the output row (first visit writes, rest add)
        first = (it % 9) == 0

        @pl.when(first)
        def _():
            out_ref[0, grow, :, :] = fx
            out_ref[1, grow, :, :] = fy
            out_ref[2, grow, :, :] = fz
            out_ref[3, grow, :, :] = vir

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[0, grow, :, :] += fx
            out_ref[1, grow, :, :] += fy
            out_ref[2, grow, :, :] += fz
            out_ref[3, grow, :, :] += vir
        return 0

    jax.lax.fori_loop(0, 9 * g, body, 0)


@partial(jax.jit, static_argnames=("dt", "cfg", "rng_mode", "rng_rounds",
                                   "interpret", "rows_per_step"))
def bucket_forces_pallas(x: Array, v: Array, typ: Array, tag: Array,
                         mask: Array, box: Box, step: Array,
                         params: DPDParams, dt: float, cfg: CellConfig,
                         rng_mode: str = "fast", rng_rounds: int = 8,
                         interpret: bool = False, rows_per_step: int = 0):
    """Forces for bucket-resident rows via the Pallas kernel.

    Returns (f (nr,3), virial scalar). Interface matches
    ``ops.bucket_dpd.bucket_forces_xla`` (its bit-reference).
    ``rows_per_step``: output z-rows per grid step (0 = auto: the largest
    divisor of ncz up to 8).
    """
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    nr = x.shape[0]
    g = rows_per_step
    if g <= 0:
        g = max(d for d in range(1, min(nz, 8) + 1) if nz % d == 0)
    if nz % g:
        raise ValueError(f"rows_per_step={g} must divide ncz={nz}")
    nzg = nz // g

    h = rngmod.particle_hash(tag, step, params.seed, rounds=rng_rounds)
    shape = (ny, nz, k, nx)
    chans = [
        x[:, 0].reshape(shape), x[:, 1].reshape(shape), x[:, 2].reshape(shape),
        v[:, 0].reshape(shape), v[:, 1].reshape(shape), v[:, 2].reshape(shape),
        jax.lax.bitcast_convert_type(h, jnp.float32).reshape(shape),
        mask.astype(jnp.float32).reshape(shape),
    ]
    if rng_mode == "tea":
        chans.append(
            jax.lax.bitcast_convert_type(tag, jnp.float32).reshape(shape))
    elif rng_mode != "fast":
        raise ValueError(f"unknown rng_mode {rng_mode!r}")
    n_types = params.a.shape[0]
    typ_chan = -1
    if n_types > 1:
        typ_chan = len(chans)
        chans.append(typ.astype(jnp.float32).reshape(shape))
    n_excl = 0
    tag_chan = 8 if rng_mode == "tea" else -1
    ex_chan = -1
    if params.excl is not None:
        n_excl = params.excl.shape[1]
        if tag_chan < 0:
            tag_chan = len(chans)
            chans.append(
                jax.lax.bitcast_convert_type(tag, jnp.float32).reshape(shape))
        ex_chan = len(chans)
        ex = params.excl[tag]                        # (nr, E) gather
        for e in range(n_excl):
            chans.append(jax.lax.bitcast_convert_type(
                ex[:, e], jnp.float32).reshape(shape))
    n_chan = len(chans)
    planes = jnp.stack(chans)  # (n_chan, ny, nz, k, nx)

    # wrap halos along cy/cz with pre-shifted coordinates
    padded = jnp.pad(planes, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)),
                     mode="wrap")
    ly = box.lengths[1]
    lz = box.lengths[2]
    padded = padded.at[_SY, 0].add(-ly).at[_SY, -1].add(ly)
    padded = padded.at[_SZ, :, 0].add(-lz).at[_SZ, :, -1].add(lz)

    # materialize the z-band overlap so Pallas blocks have stride == size:
    # bands_mat[c, cyp, czb] = padded[c, cyp, czb*g : czb*g + g + 2]
    bands_mat = jnp.stack(
        [padded[:, :, czb * g:czb * g + g + 2] for czb in range(nzg)],
        axis=2)  # (n_chan, ny+2, nzg, g+2, k, nx)
    bands_view = bands_mat.reshape(n_chan, (ny + 2) * nzg * (g + 2), k, nx)
    # self values from the UNPADDED planes, lane-flattened
    self_view = planes.reshape(n_chan, ny * nz, 1, k * nx)

    scal = jnp.stack([params.a[0, 0], params.gamma[0, 0], params.sigma[0, 0],
                      params.rc[0, 0],
                      jnp.float32(1.0 / jnp.sqrt(dt)),
                      box.lengths[0], params.s_exp,
                      jnp.float32(1.0) if params.excl_w is None
                      else params.excl_w,
                      box.lengths[1], box.lengths[2],
                      jnp.float32(0), jnp.float32(0)]
                     ).reshape(1, 12)
    iscal = jnp.stack([jnp.asarray(step, jnp.int32),
                       params.seed.astype(jnp.int32)]).reshape(1, 2)
    if n_types > 1:
        tab = jnp.stack([params.a.reshape(-1), params.gamma.reshape(-1),
                         params.sigma.reshape(-1), params.rc.reshape(-1)])
    else:
        tab = jnp.zeros((4, 1), jnp.float32)

    def band_spec(dy):
        # block dim1 covers one (g+2)-row band; bands are consecutive in
        # bands_view, so block index == band linear index (exact stride)
        return pl.BlockSpec(
            (n_chan, g + 2, k, nx),
            index_map=lambda cy, czb: (0, (cy + dy) * nzg + czb, 0, 0),
            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 12), lambda cy, czb: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 2), lambda cy, czb: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(tab.shape, lambda cy, czb: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((n_chan, g, 1, k * nx),
                     index_map=lambda cy, czb: (0, cy * nzg + czb, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    in_specs += [band_spec(dy) for dy in (0, 1, 2)]

    out = pl.pallas_call(
        partial(_kernel, k=k, nx=nx, g=g, rng_mode=rng_mode,
                rng_rounds=rng_rounds, n_chan=n_chan, n_types=n_types,
                typ_chan=typ_chan, n_excl=n_excl, tag_chan=tag_chan,
                ex_chan=ex_chan),
        grid=(ny, nzg),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (4, g, 1, k * nx),
            index_map=lambda cy, czb: (0, cy * nzg + czb, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, ny * nz, 1, k * nx), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, n_chan, g + 2, k, nx), jnp.float32)],
        interpret=interpret,
    )(scal, iscal, tab, self_view, *[bands_view] * 3)

    out = out.reshape(4, ny, nz, k, nx)
    f = jnp.stack([out[0].reshape(nr), out[1].reshape(nr),
                   out[2].reshape(nr)], axis=-1)
    virial = jnp.sum(out[3])
    return f, virial


@partial(jax.jit, static_argnames=("dt", "cfg", "rng_mode", "rng_rounds",
                                   "interpret", "rows_per_step", "n_types",
                                   "vma"))
def halo_forces_pallas_1d(channels: dict, box: Box, step: Array,
                          params: DPDParams, dt: float, cfg: CellConfig,
                          rng_mode: str = "fast", rng_rounds: int = 8,
                          interpret: bool | None = None,
                          rows_per_step: int = 0, n_types: int = 1,
                          vma: tuple = ("x",)):
    """Pallas pair forces for a 1-D x-decomposed brick (multi-chip hot path).

    ``channels``: dict of (ny, nz, K, nx+2) planes — the LOCAL grid extended
    by one ppermuted halo column each side (wrap links pre-shifted), i.e.
    the output of ``parallel.domain._halo_channels_1d``. Required keys:
    x,y,z,vx,vy,vz,h,tag,valid (+typ when n_types>1). y/z stay periodic
    in-device (wrap pads added here). Returns (f (nr,3), virial).

    The kernel runs with halo_x=True: dx neighbors are static lane slices of
    the x-extended tiles instead of rolls, and no x min-image is applied
    (ghost coordinates already carry the wrap shift). Exclusions are not
    supported on this path (distributed bonded is rejected upstream).
    """
    import os
    if interpret is None:
        interpret = os.environ.get("MESO_PALLAS_INTERPRET") == "1"
    ny, nz, k, nxe = channels["x"].shape
    nx = nxe - 2
    nr = ny * nz * k * nx
    g = rows_per_step
    if g <= 0:
        g = max(d for d in range(1, min(nz, 8) + 1) if nz % d == 0)
    nzg = nz // g

    bc = lambda a: jax.lax.bitcast_convert_type(a.astype(jnp.int32),
                                                jnp.float32)
    chans = [channels["x"], channels["y"], channels["z"], channels["vx"],
             channels["vy"], channels["vz"], bc(channels["h"]),
             channels["valid"]]
    typ_chan = -1
    tag_chan = -1
    if rng_mode == "tea":
        tag_chan = len(chans)
        chans.append(bc(channels["tag"]))
    if n_types > 1:
        typ_chan = len(chans)
        chans.append(channels["typ"].astype(jnp.float32))
    n_chan = len(chans)
    planes = jnp.stack(chans)  # (n_chan, ny, nz, k, nx+2)

    # y/z wrap halos with pre-shifted coordinates (periodic in-device)
    padded = jnp.pad(planes, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)),
                     mode="wrap")
    ly = box.lengths[1]
    lz = box.lengths[2]
    padded = padded.at[_SY, 0].add(-ly).at[_SY, -1].add(ly)
    padded = padded.at[_SZ, :, 0].add(-lz).at[_SZ, :, -1].add(lz)

    bands_mat = jnp.stack(
        [padded[:, :, czb * g:czb * g + g + 2] for czb in range(nzg)],
        axis=2)
    bands_view = bands_mat.reshape(n_chan, (ny + 2) * nzg * (g + 2), k,
                                   nx + 2)
    self_view = planes[..., 1:-1].reshape(n_chan, ny * nz, 1, k * nx)

    scal = jnp.stack([params.a[0, 0], params.gamma[0, 0], params.sigma[0, 0],
                      params.rc[0, 0],
                      jnp.float32(1.0 / jnp.sqrt(dt)),
                      box.lengths[0], params.s_exp,
                      jnp.float32(1.0),
                      box.lengths[1], box.lengths[2],
                      jnp.float32(0), jnp.float32(0)]).reshape(1, 12)
    iscal = jnp.stack([jnp.asarray(step, jnp.int32),
                       params.seed.astype(jnp.int32)]).reshape(1, 2)
    if n_types > 1:
        tab = jnp.stack([params.a.reshape(-1), params.gamma.reshape(-1),
                         params.sigma.reshape(-1), params.rc.reshape(-1)])
    else:
        tab = jnp.zeros((4, 1), jnp.float32)

    def band_spec(dy):
        return pl.BlockSpec(
            (n_chan, g + 2, k, nx + 2),
            index_map=lambda cy, czb: (0, (cy + dy) * nzg + czb, 0, 0),
            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 12), lambda cy, czb: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 2), lambda cy, czb: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(tab.shape, lambda cy, czb: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((n_chan, g, 1, k * nx),
                     index_map=lambda cy, czb: (0, cy * nzg + czb, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    in_specs += [band_spec(dy) for dy in (0, 1, 2)]

    out = pl.pallas_call(
        partial(_kernel, k=k, nx=nx, g=g, rng_mode=rng_mode,
                rng_rounds=rng_rounds, n_chan=n_chan, n_types=n_types,
                typ_chan=typ_chan, n_excl=0, tag_chan=tag_chan,
                ex_chan=-1, halo_x=True),
        grid=(ny, nzg),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (4, g, 1, k * nx),
            index_map=lambda cy, czb: (0, cy * nzg + czb, 0, 0),
            memory_space=pltpu.VMEM),
        # vma: this call always runs inside shard_map; the output varies
        # over the decomposition axes (check_vma requires it be explicit)
        out_shape=jax.ShapeDtypeStruct((4, ny * nz, 1, k * nx), jnp.float32,
                                       vma=frozenset(vma)),
        scratch_shapes=[pltpu.VMEM((3, n_chan, g + 2, k, nx + 2),
                                   jnp.float32)],
        interpret=interpret,
    )(scal, iscal, tab, self_view, *[bands_view] * 3)

    out = out.reshape(4, ny, nz, k, nx)
    f = jnp.stack([out[0].reshape(nr), out[1].reshape(nr),
                   out[2].reshape(nr)], axis=-1)
    return f, jnp.sum(out[3])

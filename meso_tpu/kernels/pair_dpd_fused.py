"""Fused-lane Pallas DPD pair kernel — the single-chip hot path, v2.

TPU-native replacement of the reference's hottest CUDA kernel
(``pair_dpd_meso.cu``, SURVEY.md §2b rows 20-21, §3.3), redesigned from the
round-1 banded kernel after on-device profiling showed the pair-tile
materialization (K unaligned lane-copies per channel per stencil block)
dominating the step. Design:

* channel planes are viewed as (ncy, K, L) with the LANE axis fusing the
  (cz, cx) cell coordinates: L = ncz * (ncx + 2), each cz row carrying one
  wrap-duplicate x column on each side. Slots ride the SUBLANE axis.
* grid over cy (optionally x z-chunks). Per grid step the kernel sees three
  consecutive cy rows (wrap rows pre-padded at the XLA level) as blocks with
  exact stride == size — no banding machinery.
* the 27-cell stencil = 3 cy bands x 9 static lane-roll offsets
  (dz*(ncx+2) + dx). For each (source slot j, band, offset) the source is a
  SINGLE (1, L) row, lane-rolled once and broadcast against the full
  (K, L) self tile by the VPU's native sublane broadcast — NO pair-tile
  materialization at all (the round-1 kernel's dominant cost).
* per-pair math identical to ``ops/dpd.pair_force``; minimum image on all
  three axes makes the wrap-duplicate columns and rolled wrap rows correct
  without pre-shifted coordinates; in-kernel counter RNG (both tiers);
  register accumulation with ONE writer per particle — the reference's
  atomics-free property holds by construction.
* ``s_exp`` is a STATIC specialization: the common s=1 case emits no
  transcendentals (the round-1 kernel evaluated jnp.power unconditionally).

Work per output row: 27*K source rows of L lanes — identical pair count to
the round-1 kernel, at a fraction of the instruction count.
"""

from __future__ import annotations

import os
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

# channel indices in the stacked plane tensor (_TAGV = tags as exact f32
# VALUES — both RNG tiers hash them in-kernel; no bitcast integer channel
# ever rides the f32 stack: the device toolchain corrupts bitcast
# channels value- and shape-dependently, r3 root cause in PERF_NOTES.md)
_SX, _SY, _SZ, _VX, _VY, _VZ, _TAGV, _VALID = range(8)


def _roll_lane(p: Array, off: int) -> Array:
    """Value at target lane t becomes row[t + off] (circular)."""
    if off == 0:
        return p
    return pltpu.roll(p, (-off) % p.shape[-1], 1)


def _fused_kernel(*refs, k: int, w_lane: int, l_lane: int, rng_mode: str,
                  rng_rounds: int, n_chan: int, n_types: int, typ_chan: int,
                  n_excl: int, ex_chan: int, s_exp: float,
                  xr: int = 1, model: str = "dpd",
                  ns: int = 0, mc_chan: int = -1, n_out: int = 4):
    """One grid step = one (cy row, z-chunk): out (C, 1, 1, K, L)."""
    scal_ref, iscal_ref, tab_ref, jmax_ref = refs[0], refs[1], refs[2], \
        refs[3]
    b0, b1, b2 = refs[4], refs[5], refs[6]
    out_ref, bands_s = refs[7], refs[8]
    a = scal_ref[0, 0]
    gamma = scal_ref[0, 1]
    sigma_dt = scal_ref[0, 2]     # sigma / sqrt(dt), pre-folded
    rc = scal_ref[0, 3]
    lx = scal_ref[0, 4]
    ly = scal_ref[0, 5]
    lz = scal_ref[0, 6]
    inv_lx = scal_ref[0, 7]
    inv_ly = scal_ref[0, 8]
    inv_lz = scal_ref[0, 9]
    excl_w = scal_ref[0, 10]
    dt_inv_sqrt = scal_ref[0, 11]
    if model == "edpd":
        kappa0 = scal_ref[0, 12]
        inv_mass = scal_ref[0, 13]
    elif model == "tdpd":
        rcc = scal_ref[0, 12]
        s1 = scal_ref[0, 13]
    # both tiers derive their randoms in-kernel from tag VALUES
    step_u = iscal_ref[0, 0].astype(jnp.uint32)
    seed_u = iscal_ref[0, 1].astype(jnp.uint32)

    # stage the three cy bands into one scratch indexable by a traced dy
    bands_s[0] = b0[:, 0, 0]
    bands_s[1] = b1[:, 0, 0]
    bands_s[2] = b2[:, 0, 0]
    tagv_idx = _TAGV
    val_idx = _VALID

    def hash_of(tag_f):
        """Per-particle TEA hash from a tag-value block — bit-identical to
        rng.particle_hash (the oracle/sweep counter)."""
        t = tag_f.astype(jnp.int32).astype(jnp.uint32)
        v0, _ = rngmod.tea(t, t ^ jnp.uint32(0xDEADBEEF), step_u, seed_u,
                           rounds=rng_rounds)
        return v0

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (k, l_lane), 0)
    # x-window +-xr: 1 for strict buckets, 2 for right-spill packing
    # (slot-cell may differ from true cell by one on either side of a pair)
    offsets = [dz * w_lane + dx for dz in (-1, 0, 1)
               for dx in range(-xr, xr + 1)]
    n_off = len(offsets)
    branches = [
        (lambda rows, _o=o: tuple(_roll_lane(p, _o) for p in rows))
        for o in offsets
    ]

    def selfc(c):  # (k, L)
        return bands_s[1, c]

    def selfv(i):  # velocity component i, (k, L) f32
        return bands_s[1, _VX + i]

    # fast-tier per-particle hash of the self tile, hoisted out of the
    # pair loop (one (K, L) TEA per grid step; the (1, L) source rows
    # hash per iteration, ~1 TEA per 3*K pair-math lanes)
    self_h = hash_of(selfc(tagv_idx)) if rng_mode == "fast" else None

    def body(it, acc):
        fx, fy, fz, vir = acc[:4]
        j = it // (3 * n_off)
        r = it - j * (3 * n_off)
        dy = r // n_off
        o = r - dy * n_off

        rows = tuple(bands_s[dy, c, pl.ds(j, 1), :] for c in range(n_chan))
        rows = jax.lax.switch(o, branches, rows)

        def rowv(i):  # velocity component i, (1, L) f32
            return rows[_VX + i]

        if n_types > 1:
            # tab rows: dpd/tdpd (a, gamma, sigma*dtinv, rc);
            # edpd (a, gamma, kappa, rc) — x3 is kappa there
            code = selfc(typ_chan) * jnp.float32(n_types) + rows[typ_chan]
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
            a_ij, g_ij, rc_ij = a, gamma, rc
            s_ij = kappa0 if model == "edpd" else sigma_dt

        # minimum image on ALL axes: wrap-duplicate columns / rolled wrap
        # rows carry raw coordinates, and a particle can wrap the global box
        # mid-window while still bucketed at the far side (PERF_NOTES.md)
        drx = selfc(_SX) - rows[_SX]
        drx = drx - jnp.round(drx * inv_lx) * lx
        dry = selfc(_SY) - rows[_SY]
        dry = dry - jnp.round(dry * inv_ly) * ly
        drz = selfc(_SZ) - rows[_SZ]
        drz = drz - jnp.round(drz * inv_lz) * lz
        r2 = drx * drx + dry * dry + drz * drz
        ok = (r2 < rc_ij * rc_ij) & (r2 > 0.0)
        ok = ok & (selfc(val_idx) * rows[val_idx] > 0.5)
        skip_self = (dy == 1) & (o == n_off // 2)
        ok = ok & ~((s_iota == j) & skip_self)
        r2s = jnp.where(ok, r2, 1.0)
        rinv = jax.lax.rsqrt(r2s)
        rr = r2s * rinv
        w = 1.0 - rr / rc_ij
        if s_exp == 1.0:
            wr = w
        else:
            wr = jnp.power(w, jnp.float32(s_exp))
        dvx = selfv(0) - rowv(0)
        dvy = selfv(1) - rowv(1)
        dvz = selfv(2) - rowv(2)
        ev = (drx * dvx + dry * dvy + drz * dvz) * rinv
        if model == "dpd":
            if rng_mode == "tea":
                tgs = selfc(tagv_idx).astype(jnp.int32)
                tgj = rows[tagv_idx].astype(jnp.int32)
                lo = jnp.minimum(tgs, tgj).astype(jnp.uint32)
                hi = jnp.maximum(tgs, tgj).astype(jnp.uint32)
                v0, _ = rngmod.tea(lo, hi, step_u, seed_u,
                                   rounds=rng_rounds)
                theta = rngmod._u32_to_symmetric_uniform(v0)
            else:
                hj = hash_of(rows[tagv_idx])
                theta = rngmod.pair_uniform_fast(self_h, hj)
            fmag = a_ij * w - g_ij * (wr * wr) * ev + s_ij * wr * theta
            fmag = jnp.where(ok, fmag, 0.0)
            if n_excl:
                # exclusion tags are exact f32 VALUES (< 2^24): compare
                # directly on the value channels
                tgj_x = rows[tagv_idx]
                hit = selfc(ex_chan) == tgj_x
                for e in range(1, n_excl):
                    hit = hit | (selfc(ex_chan + e) == tgj_x)
                fmag = fmag * jnp.where(hit, excl_w, 1.0)
            fr = fmag * rinv
            return (fx + fr * drx, fy + fr * dry, fz + fr * drz,
                    vir + 0.5 * fmag * rr)

        # eDPD/tDPD (SURVEY A.2/A.3): symmetric pair hash -> independent
        # noise streams; antisymmetric streams use the tag-order sign —
        # the exact math of the sweep/banded paths (parity-tested)
        if rng_mode == "tea":
            tgs = selfc(tagv_idx).astype(jnp.int32)
            tgj = rows[tagv_idx].astype(jnp.int32)
            lo = jnp.minimum(tgs, tgj).astype(jnp.uint32)
            hi = jnp.maximum(tgs, tgj).astype(jnp.uint32)
            hp, _ = rngmod.tea(lo, hi, step_u, seed_u, rounds=rng_rounds)
        else:
            hj = hash_of(rows[tagv_idx])
            hp = rngmod.combine_symmetric(self_h, hj)
        theta = rngmod.uniform_stream(hp, 0)
        # tag-order sign as an exact f32 value compare
        sign = jnp.where(selfc(tagv_idx) < rows[tagv_idx], 1.0, -1.0)
        w2 = w * w
        extras = acc[4:]
        if model == "edpd":
            ts = selfc(mc_chan)
            tj = rows[mc_chan]
            sigma2 = 4.0 * g_ij * ts * tj / jnp.maximum(ts + tj, 1e-12)
            sigma = jnp.sqrt(jnp.maximum(sigma2, 0.0))
            fmag = (a_ij * w - g_ij * w2 * ev
                    + sigma * w * theta * dt_inv_sqrt)
            fmag = jnp.where(ok, fmag, 0.0)
            k_ij = s_ij * 0.25 * (ts + tj) ** 2   # s_ij = kappa here
            q_c = k_ij * w2 * (1.0 / jnp.maximum(ts, 1e-12)
                               - 1.0 / jnp.maximum(tj, 1e-12))
            q_v = 0.5 * (w2 * (g_ij * ev * ev - sigma2 * inv_mass)
                         - sigma * w * ev * theta * dt_inv_sqrt)
            zeta = sign * rngmod.uniform_stream(hp, 1)
            beta = jnp.sqrt(jnp.maximum(2.0 * k_ij, 0.0))
            q_r = beta * w * zeta * dt_inv_sqrt
            extras = (extras[0] + jnp.where(ok, q_c + q_v + q_r, 0.0),)
        else:  # tdpd
            fmag = (a_ij * w - g_ij * w2 * ev
                    + s_ij * w * theta)           # s_ij = sigma*dtinv
            fmag = jnp.where(ok, fmag, 0.0)
            inside_c = ok & (r2 < rcc * rcc)
            wdc_base = jnp.maximum(1.0 - rr / rcc, 0.0)
            wdc = jnp.where(s1 == 1.0, wdc_base,
                            jnp.power(wdc_base, s1))
            wrc = jnp.sqrt(wdc)
            new_extras = []
            for sp in range(ns):
                kap_s = scal_ref[0, 14 + 2 * sp]
                eps_s = scal_ref[0, 15 + 2 * sp]
                ci = selfc(mc_chan + sp)
                cj = rows[mc_chan + sp]
                xi = sign * rngmod.uniform_stream(hp, 2 + sp)
                qd = -kap_s * wdc * (ci - cj)
                qr = eps_s * wrc * xi * dt_inv_sqrt
                new_extras.append(
                    extras[sp] + jnp.where(inside_c, qd + qr, 0.0))
            extras = tuple(new_extras)
        fr = fmag * rinv
        return (fx + fr * drx, fy + fr * dry, fz + fr * drz,
                vir + 0.5 * fmag * rr) + extras

    zero = jnp.zeros((k, l_lane), jnp.float32)
    # dynamic trip count: source slots above the band's max occupancy are
    # all invalid — skip them entirely (the launch-shape analog of the
    # reference's occupancy-aware tuning, SURVEY row 29)
    jm = jmax_ref[0, pl.program_id(0)]
    acc = jax.lax.fori_loop(0, 3 * n_off * jm, body,
                            tuple([zero] * n_out))
    for o in range(n_out):
        out_ref[o, 0, 0] = acc[o]


def _auto_z_chunks(n_chan: int, k: int, nz: int, w_lane: int,
                   budget_bytes: int = 9 * 2 ** 20) -> int:
    """Smallest divisor of nz keeping the kernel VMEM footprint in budget:
    3 band blocks (double-buffered) + the bands scratch."""
    k_phys = -(-k // 8) * 8
    for zc in range(1, nz + 1):
        if nz % zc:
            continue
        l_phys = -(-((nz // zc + (2 if zc > 1 else 0)) * w_lane) // 128) * 128
        if 9 * n_chan * k_phys * l_phys * 4 <= budget_bytes:
            return zc
    return nz


@partial(jax.jit, static_argnames=("dt", "cfg", "rng_mode", "rng_rounds",
                                   "interpret", "s_exp", "z_chunks"))
def bucket_forces_pallas_fused(x: Array, v: Array, typ: Array, tag: Array,
                               mask: Array, box: Box, step: Array,
                               params: DPDParams, dt: float, cfg: CellConfig,
                               rng_mode: str = "fast", rng_rounds: int = 8,
                               interpret: bool | None = None,
                               s_exp: float = 1.0, z_chunks: int = 0):
    """Forces for bucket-resident rows via the fused-lane kernel.

    Interface matches ``ops.bucket_dpd.bucket_forces_xla`` (its
    bit-reference). ``s_exp`` is the STATIC generalized-weight exponent and
    must equal the runtime ``params.s_exp`` (System carries it; the s=1
    specialization emits no transcendentals). ``z_chunks``: split the fused
    (cz, cx) lane axis into chunks (0 = auto from the VMEM budget).
    """
    if interpret is None:
        interpret = os.environ.get("MESO_PALLAS_INTERPRET") == "1"
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    nr = x.shape[0]
    xr = 2 if cfg.spill else 1
    if nx < 2 * xr + 1:
        raise ValueError(f"ncx={nx} too small for the +-{xr} circular "
                         "x-window (needs ncx >= 2*xr+1)")
    w_lane = nx + 2 * xr

    if rng_mode not in ("fast", "tea"):
        raise ValueError(f"unknown rng_mode {rng_mode!r}")
    if nr >= (1 << 24):
        raise ValueError("fused kernel carries tags as exact f32 values; "
                         "tag ids must stay below 2^24")
    shape = (ny, nz, k, nx)
    # tags ride as exact f32 VALUES; both RNG tiers hash them in-kernel
    # (no bitcast integer channel — r3 root cause, PERF_NOTES.md)
    tag_f = tag.astype(jnp.float32)
    chans = [
        x[:, 0].reshape(shape), x[:, 1].reshape(shape), x[:, 2].reshape(shape),
        v[:, 0].reshape(shape), v[:, 1].reshape(shape), v[:, 2].reshape(shape),
    ]
    chans += [
        tag_f.reshape(shape),
        mask.astype(jnp.float32).reshape(shape),
    ]
    n_types = params.a.shape[0]
    typ_chan = ex_chan = -1
    n_excl = 0
    if n_types > 1:
        typ_chan = len(chans)
        chans.append(typ.astype(jnp.float32).reshape(shape))
    if params.excl is not None:
        n_excl = params.excl.shape[1]
        ex_chan = len(chans)
        ex = params.excl[tag].astype(jnp.float32)    # (nr, E) gather
        for e in range(n_excl):
            chans.append(ex[:, e].reshape(shape))
    n_chan = len(chans)

    zc = z_chunks
    if zc <= 0:
        zc = _auto_z_chunks(n_chan, k, nz, w_lane)
    if nz % zc:
        raise ValueError(f"z_chunks={zc} must divide ncz={nz}")
    nzc = nz // zc

    def prep(stack):
        """(C', ny, nz, k, nx) -> cy-padded (C', ny+2, zc, k, L) view."""
        c_dim = stack.shape[0]
        planes = stack.transpose(0, 1, 3, 2, 4)     # (C', ny, k, nz, nx)
        if zc > 1:
            zpad = jnp.concatenate(
                [planes[..., -1:, :], planes, planes[..., :1, :]], axis=3)
            chunks = jnp.stack(
                [zpad[..., i * nzc:i * nzc + nzc + 2, :]
                 for i in range(zc)], axis=2)
        else:
            chunks = planes[:, :, None]             # (C', ny, 1, k, nz, nx)
        chunks = jnp.concatenate(
            [chunks[..., -xr:], chunks, chunks[..., :xr]], axis=-1)
        vw = chunks.reshape(c_dim, ny, zc, k, l_lane)
        return jnp.concatenate([vw[:, -1:], vw, vw[:, :1]], axis=1)

    body_z = (nzc + 2) if zc > 1 else nz
    l_lane = body_z * w_lane
    view = prep(jnp.stack(chans))

    dt_inv_sqrt = jnp.float32(1.0 / jnp.sqrt(dt))
    lens = box.lengths
    scal = jnp.stack([
        params.a[0, 0], params.gamma[0, 0],
        params.sigma[0, 0] * dt_inv_sqrt, params.rc[0, 0],
        lens[0], lens[1], lens[2],
        1.0 / lens[0], 1.0 / lens[1], 1.0 / lens[2],
        jnp.float32(1.0) if params.excl_w is None else params.excl_w,
        jnp.float32(0)]).reshape(1, 12)
    iscal = jnp.stack([jnp.asarray(step, jnp.int32),
                       params.seed.astype(jnp.int32)]).reshape(1, 2)
    # per-cy-band max occupied slot (+1): the kernel's dynamic j bound
    vmask = chans[7]                             # the valid plane
    occ = jnp.max(jnp.where(
        vmask > 0.5,
        jnp.arange(1, k + 1, dtype=jnp.int32)[None, None, :, None], 0),
        axis=(1, 2, 3))                          # (ny,)
    jmax = jnp.maximum(jnp.maximum(occ, jnp.roll(occ, 1)),
                       jnp.roll(occ, -1))
    jmax = jnp.maximum(jmax, 1).reshape(1, ny)
    if n_types > 1:
        tab = jnp.stack([params.a.reshape(-1), params.gamma.reshape(-1),
                         params.sigma.reshape(-1) * dt_inv_sqrt,
                         params.rc.reshape(-1)])
    else:
        tab = jnp.zeros((4, 1), jnp.float32)

    def band_spec(dy):
        return pl.BlockSpec(
            (n_chan, 1, 1, k, l_lane),
            index_map=lambda cy, cb: (0, cy + dy, cb, 0, 0),
            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 12), lambda cy, cb: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 2), lambda cy, cb: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(tab.shape, lambda cy, cb: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, ny), lambda cy, cb: (0, 0),
                     memory_space=pltpu.SMEM),
        band_spec(0), band_spec(1), band_spec(2),
    ]
    inputs = [scal, iscal, tab, jmax, view, view, view]
    scratches = [pltpu.VMEM((3, n_chan, k, l_lane), jnp.float32)]

    out = pl.pallas_call(
        partial(_fused_kernel, k=k, w_lane=w_lane, l_lane=l_lane,
                rng_mode=rng_mode, rng_rounds=rng_rounds, n_chan=n_chan,
                n_types=n_types, typ_chan=typ_chan,
                n_excl=n_excl, ex_chan=ex_chan, s_exp=s_exp, xr=xr),
        grid=(ny, zc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (4, 1, 1, k, l_lane),
            index_map=lambda cy, cb: (0, cy, cb, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, ny, zc, k, l_lane), jnp.float32),
        scratch_shapes=scratches,
        interpret=interpret,
    )(*inputs)

    out = out.reshape(4, ny, zc, k, body_z, w_lane)[..., xr:-xr]
    if zc > 1:
        out = out[..., 1:-1, :]
    # (4, ny, zc, k, nzc, nx) -> (4, ny, zc, nzc, k, nx) -> rows
    out = out.transpose(0, 1, 2, 4, 3, 5).reshape(4, ny, nz, k, nx)
    f = jnp.stack([out[0].reshape(nr), out[1].reshape(nr),
                   out[2].reshape(nr)], axis=-1)
    return f, jnp.sum(out[3])


def _halo_call(chans, scal, iscal, tab, cfg, ext, rng_mode, rng_rounds,
               interpret, s_exp, n_types, typ_chan, n_excl,
               ex_chan, vma, valid_plane, xr, model="dpd", ns=0,
               mc_chan=-1, n_out=4):
    """Shared pallas launch over a halo-EXTENDED local brick.

    ``chans``: list of (ny_e, nz_e, K, nx_e) float planes; axes named in
    ``ext`` arrive extended by ``xr`` halo layers per side (x) / one layer
    (y, z); other axes are periodic in-brick and wrap pads are added here.
    """
    if interpret is None:
        interpret = os.environ.get("MESO_PALLAS_INTERPRET") == "1"
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    w_lane = nx + 2 * xr
    n_chan = len(chans)
    planes = jnp.stack(chans)          # (C, ny_e, nz_e, k, nx_e)
    planes = planes.transpose(0, 1, 3, 2, 4)   # (C, ny_e, k, nz_e, nx_e)

    if "x" not in ext:
        planes = jnp.concatenate(
            [planes[..., -xr:], planes, planes[..., :xr]], axis=-1)
    if "z" not in ext:
        planes = jnp.concatenate(
            [planes[..., -1:, :], planes, planes[..., :1, :]], axis=3)
    body_z = nz + 2
    l_lane = body_z * w_lane
    view = planes.reshape(n_chan, planes.shape[1], 1, k, l_lane)
    if "y" not in ext:
        view = jnp.concatenate([view[:, -1:], view, view[:, :1]], axis=1)

    # conservative dynamic j bound: the band's max occupied slot (+1)
    # over the extended local channels
    occ = jnp.max(jnp.where(
        valid_plane > 0.5,
        jnp.arange(1, k + 1, dtype=jnp.int32)[None, None, :, None], 0),
        axis=(1, 2, 3))
    ny_e = valid_plane.shape[0]
    if ny_e == ny:  # y periodic in-brick
        jmax = jnp.maximum(jnp.maximum(occ, jnp.roll(occ, 1)),
                           jnp.roll(occ, -1))
    else:           # y-extended: bands are consecutive rows
        jmax = jnp.maximum(jnp.maximum(occ[:-2], occ[1:-1]), occ[2:])
    jmax = jnp.maximum(jmax, 1).reshape(1, ny)

    def band_spec(dy):
        return pl.BlockSpec(
            (n_chan, 1, 1, k, l_lane),
            index_map=lambda cy, cb: (0, cy + dy, cb, 0, 0),
            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(scal.shape, lambda cy, cb: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 2), lambda cy, cb: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(tab.shape, lambda cy, cb: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, ny), lambda cy, cb: (0, 0),
                     memory_space=pltpu.SMEM),
        band_spec(0), band_spec(1), band_spec(2),
    ]

    out = pl.pallas_call(
        partial(_fused_kernel, k=k, w_lane=w_lane, l_lane=l_lane,
                rng_mode=rng_mode, rng_rounds=rng_rounds, n_chan=n_chan,
                n_types=n_types, typ_chan=typ_chan,
                n_excl=n_excl, ex_chan=ex_chan, s_exp=s_exp, xr=xr,
                model=model, ns=ns, mc_chan=mc_chan, n_out=n_out),
        grid=(ny, 1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (n_out, 1, 1, k, l_lane),
            index_map=lambda cy, cb: (0, cy, cb, 0, 0),
            memory_space=pltpu.VMEM),
        # vma: always called inside shard_map; the output varies over the
        # decomposition axes (check_vma needs it explicit)
        out_shape=jax.ShapeDtypeStruct((n_out, ny, 1, k, l_lane),
                                       jnp.float32, vma=frozenset(vma)),
        scratch_shapes=[pltpu.VMEM((3, n_chan, k, l_lane), jnp.float32)],
        interpret=interpret,
    )(scal, iscal, tab, jmax, view, view, view)

    out = out.reshape(n_out, ny, 1, k, body_z, w_lane)[..., xr:-xr]
    out = out[..., 1:-1, :]
    return out.transpose(0, 1, 2, 4, 3, 5).reshape(n_out, ny, nz, k, nx)


def _halo_base_chans(channels, rng_mode, n_types, n_excl):
    """Channel stack for the halo-extended launches: tag / exclusion ids
    ride as exact f32 VALUES (< 2^24) and both RNG tiers hash them
    in-kernel — no bitcast integer channels (r3 root cause) and no "h"
    channel to ship through the halos."""
    chans = [channels["x"], channels["y"], channels["z"], channels["vx"],
             channels["vy"], channels["vz"],
             channels["tag"].astype(jnp.float32),
             channels["valid"]]
    typ_chan = ex_chan = -1
    if n_types > 1:
        typ_chan = len(chans)
        chans.append(channels["typ"].astype(jnp.float32))
    if n_excl:
        ex_chan = len(chans)
        for e in range(n_excl):
            chans.append(channels[f"EX{e}"].astype(jnp.float32))
    return chans, typ_chan, ex_chan


@partial(jax.jit, static_argnames=("dt", "cfg", "ext", "rng_mode",
                                   "rng_rounds", "interpret", "s_exp",
                                   "n_types", "n_excl", "vma"))
def halo_forces_pallas_fused(channels: dict, box: Box, step: Array,
                             params: DPDParams, dt: float, cfg: CellConfig,
                             ext: tuple = ("x",), rng_mode: str = "fast",
                             rng_rounds: int = 8,
                             interpret: bool | None = None,
                             s_exp: float = 1.0, n_types: int = 1,
                             n_excl: int = 0, vma: tuple = ("x",)):
    """Fused-lane kernel over a halo-EXTENDED local brick — the multi-chip
    hot path for 1-D/2-D/3-D spatial decomposition (SURVEY §2c row 1).

    ``channels``: dict of (ny_e, nz_e, K, nx_e) planes; each axis named in
    ``ext`` is extended by ppermuted halo layers (the outputs of
    ``parallel.domain*._halo_channels*``/``_exchange_halos_channels``) —
    ONE layer per side, except x under the right-spill layout, which needs
    TWO columns per side (slot-cell may exceed true cell by one; VERDICT
    r3 item 3). Axes not in ``ext`` are periodic in-brick and wrap pads
    are added here. Required keys: x,y,z,vx,vy,vz,tag,valid (+typ when
    n_types>1, +EX* when n_excl>0); tag/EX* ride as exact f32 values and
    both RNG tiers hash in-kernel. Halo coordinates may be raw or
    wrap-pre-shifted — the kernel min-images every axis against the
    GLOBAL box.

    Returns (f (local nr, 3), virial).
    """
    nx, ny, nz = cfg.ncell
    nr = ny * nz * cfg.capacity * nx
    xr = 2 if cfg.spill else 1
    if cfg.spill and "x" not in ext:
        raise NotImplementedError(
            "spill layout under DD requires the x axis to be halo-extended "
            "(1-D slabs / x-decomposed bricks)")
    chans, typ_chan, ex_chan = _halo_base_chans(
        channels, rng_mode, n_types, n_excl)
    dt_inv_sqrt = jnp.float32(1.0 / jnp.sqrt(dt))
    lens = box.lengths
    scal = jnp.stack([
        params.a[0, 0], params.gamma[0, 0],
        params.sigma[0, 0] * dt_inv_sqrt, params.rc[0, 0],
        lens[0], lens[1], lens[2],
        1.0 / lens[0], 1.0 / lens[1], 1.0 / lens[2],
        jnp.float32(1.0) if params.excl_w is None else params.excl_w,
        jnp.float32(0)]).reshape(1, 12)
    iscal = jnp.stack([jnp.asarray(step, jnp.int32),
                       params.seed.astype(jnp.int32)]).reshape(1, 2)
    if n_types > 1:
        tab = jnp.stack([params.a.reshape(-1), params.gamma.reshape(-1),
                         params.sigma.reshape(-1) * dt_inv_sqrt,
                         params.rc.reshape(-1)])
    else:
        tab = jnp.zeros((4, 1), jnp.float32)
    out = _halo_call(chans, scal, iscal, tab, cfg, ext, rng_mode,
                     rng_rounds, interpret, s_exp, n_types, typ_chan,
                     n_excl, ex_chan, vma, channels["valid"], xr)
    f = jnp.stack([out[0].reshape(nr), out[1].reshape(nr),
                   out[2].reshape(nr)], -1)
    return f, jnp.sum(out[3])


@partial(jax.jit, static_argnames=("dt", "cfg", "ext", "rng_mode",
                                   "rng_rounds", "interpret", "n_types",
                                   "vma", "model", "ns"))
def halo_forces_pallas_model_fused(channels: dict, box: Box, step: Array,
                                   params, dt: float, cfg: CellConfig,
                                   model: str = "edpd", ns: int = 0,
                                   ext: tuple = ("x",),
                                   rng_mode: str = "fast",
                                   rng_rounds: int = 8,
                                   interpret: bool | None = None,
                                   n_types: int = 1, vma: tuple = ("x",)):
    """eDPD/tDPD fused kernel over a halo-extended brick (VERDICT r3
    item 3: the distributed multiphysics hot path — previously sweep-only).

    ``channels`` additionally carries "T" (edpd) or "C0".."C{ns-1}" (tdpd).
    Returns (f, extra, virial): extra = dTdt (already / cv) or dCdt.
    """
    nx, ny, nz = cfg.ncell
    nr = ny * nz * cfg.capacity * nx
    xr = 2 if cfg.spill else 1
    if cfg.spill and "x" not in ext:
        raise NotImplementedError(
            "spill layout under DD requires the x axis to be halo-extended")
    chans, typ_chan, _ = _halo_base_chans(channels, rng_mode, n_types, 0)
    mc_chan = len(chans)
    if model == "edpd":
        chans.append(channels["T"])
        n_out = 5
    else:
        for sp in range(ns):
            chans.append(channels[f"C{sp}"])
        n_out = 4 + ns
    dt_inv_sqrt = jnp.float32(1.0 / jnp.sqrt(dt))
    lens = box.lengths
    if model == "edpd":
        scal = jnp.stack([
            params.a[0, 0], params.gamma[0, 0], jnp.float32(0.0),
            params.rc[0, 0], lens[0], lens[1], lens[2],
            1.0 / lens[0], 1.0 / lens[1], 1.0 / lens[2],
            jnp.float32(1.0), dt_inv_sqrt,
            params.kappa[0, 0], jnp.float32(1.0 / params.mass),
            jnp.float32(0), jnp.float32(0)]).reshape(1, 16)
        tab_sig = params.kappa
    else:
        per_species = []
        for sp in range(ns):
            per_species += [params.kappa_c[sp], params.eps_c[sp]]
        scal = jnp.concatenate([jnp.stack([
            params.a[0, 0], params.gamma[0, 0],
            params.sigma[0, 0] * dt_inv_sqrt,
            params.rc[0, 0], lens[0], lens[1], lens[2],
            1.0 / lens[0], 1.0 / lens[1], 1.0 / lens[2],
            jnp.float32(1.0), dt_inv_sqrt,
            params.rcc, params.s1]),
            jnp.stack(per_species).astype(jnp.float32)]).reshape(1, -1)
        tab_sig = params.sigma * dt_inv_sqrt
    iscal = jnp.stack([jnp.asarray(step, jnp.int32),
                       params.seed.astype(jnp.int32)]).reshape(1, 2)
    if n_types > 1:
        tab = jnp.stack([params.a.reshape(-1), params.gamma.reshape(-1),
                         tab_sig.reshape(-1), params.rc.reshape(-1)])
    else:
        tab = jnp.zeros((4, 1), jnp.float32)
    out = _halo_call(chans, scal, iscal, tab, cfg, ext, rng_mode,
                     rng_rounds, interpret, 1.0, n_types, typ_chan,
                     0, -1, vma, channels["valid"], xr,
                     model=model, ns=ns, mc_chan=mc_chan, n_out=n_out)
    f = jnp.stack([out[0].reshape(nr), out[1].reshape(nr),
                   out[2].reshape(nr)], -1)
    if model == "edpd":
        return f, out[4].reshape(nr) / params.cv, jnp.sum(out[3])
    dcdt = jnp.stack([out[4 + sp].reshape(nr) for sp in range(ns)], -1)
    return f, dcdt, jnp.sum(out[3])




def _model_call(chans, mc_chan, typ_chan, scal, tab, box, step,
                seed, cfg, rng_mode, rng_rounds, interpret, model, ns,
                n_out, n_types, z_chunks=0):
    """Shared single-chip launch for the eDPD/tDPD fused kernels."""
    if interpret is None:
        interpret = os.environ.get("MESO_PALLAS_INTERPRET") == "1"
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    xr = 2 if cfg.spill else 1
    if nx < 2 * xr + 1:
        raise ValueError(f"ncx={nx} too small for the +-{xr} window")
    w_lane = nx + 2 * xr
    n_chan = len(chans)

    zc = z_chunks
    if zc <= 0:
        zc = _auto_z_chunks(n_chan, k, nz, w_lane)
    if nz % zc:
        raise ValueError(f"z_chunks={zc} must divide ncz={nz}")
    nzc = nz // zc
    body_z = (nzc + 2) if zc > 1 else nz
    l_lane = body_z * w_lane

    def prep(stack):
        c_dim = stack.shape[0]
        planes = stack.transpose(0, 1, 3, 2, 4)
        if zc > 1:
            zpad = jnp.concatenate(
                [planes[..., -1:, :], planes, planes[..., :1, :]], axis=3)
            chunks = jnp.stack(
                [zpad[..., i * nzc:i * nzc + nzc + 2, :]
                 for i in range(zc)], axis=2)
        else:
            chunks = planes[:, :, None]
        chunks = jnp.concatenate(
            [chunks[..., -xr:], chunks, chunks[..., :xr]], axis=-1)
        vw = chunks.reshape(c_dim, ny, zc, k, l_lane)
        return jnp.concatenate([vw[:, -1:], vw, vw[:, :1]], axis=1)

    view = prep(jnp.stack(chans))
    iscal = jnp.stack([jnp.asarray(step, jnp.int32),
                       jnp.asarray(seed).astype(jnp.int32)]).reshape(1, 2)
    occ = jnp.max(jnp.where(
        chans[7] > 0.5,
        jnp.arange(1, k + 1, dtype=jnp.int32)[None, None, :, None], 0),
        axis=(1, 2, 3))
    jmax = jnp.maximum(jnp.maximum(occ, jnp.roll(occ, 1)),
                       jnp.roll(occ, -1))
    jmax = jnp.maximum(jmax, 1).reshape(1, ny)

    def band_spec(dy):
        return pl.BlockSpec(
            (n_chan, 1, 1, k, l_lane),
            index_map=lambda cy, cb: (0, cy + dy, cb, 0, 0),
            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(scal.shape, lambda cy, cb: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 2), lambda cy, cb: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(tab.shape, lambda cy, cb: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, ny), lambda cy, cb: (0, 0),
                     memory_space=pltpu.SMEM),
        band_spec(0), band_spec(1), band_spec(2),
    ]
    out = pl.pallas_call(
        partial(_fused_kernel, k=k, w_lane=w_lane, l_lane=l_lane,
                rng_mode=rng_mode, rng_rounds=rng_rounds, n_chan=n_chan,
                n_types=n_types, typ_chan=typ_chan,
                n_excl=0, ex_chan=-1, s_exp=1.0, xr=xr, model=model,
                ns=ns, mc_chan=mc_chan, n_out=n_out),
        grid=(ny, zc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (n_out, 1, 1, k, l_lane),
            index_map=lambda cy, cb: (0, cy, cb, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, ny, zc, k, l_lane),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, n_chan, k, l_lane), jnp.float32)],
        interpret=interpret,
    )(scal, iscal, tab, jmax, view, view, view)

    out = out.reshape(n_out, ny, zc, k, body_z, w_lane)[..., xr:-xr]
    if zc > 1:
        out = out[..., 1:-1, :]
    out = out.transpose(0, 1, 2, 4, 3, 5).reshape(n_out, ny, nz, k, nx)
    return out


def _model_chans(x, v, typ, tag, mask, shape, n_types, extra):
    """Model-kernel channel stack: tags as exact f32 VALUES at _TAGV; both
    RNG tiers hash in-kernel (no bitcast integer channels — r3 root
    cause, PERF_NOTES.md)."""
    if x.shape[0] >= (1 << 24):
        raise ValueError("fused kernel carries tags as exact f32 values; "
                         "tag ids must stay below 2^24")
    chans = [
        x[:, 0].reshape(shape), x[:, 1].reshape(shape), x[:, 2].reshape(shape),
        v[:, 0].reshape(shape), v[:, 1].reshape(shape), v[:, 2].reshape(shape),
        tag.astype(jnp.float32).reshape(shape),
        mask.astype(jnp.float32).reshape(shape),
    ]
    typ_chan = -1
    if n_types > 1:
        typ_chan = len(chans)
        chans.append(typ.astype(jnp.float32).reshape(shape))
    mc_chan = len(chans)
    chans += [e.reshape(shape) for e in extra]
    return chans, typ_chan, mc_chan


@partial(jax.jit, static_argnames=("dt", "cfg", "rng_rounds", "interpret",
                                   "rng_mode", "z_chunks"))
def bucket_forces_pallas_edpd_fused(x, v, t, typ, tag, mask, box: Box, step,
                                    params, dt: float, cfg: CellConfig,
                                    rng_rounds: int = 8,
                                    interpret: bool | None = None,
                                    rng_mode: str = "fast",
                                    z_chunks: int = 0):
    """eDPD forces + heat via the fused-lane kernel (SURVEY rows 22/A.2).
    Returns (f, dTdt, virial); interface matches ops.edpd.bucket_forces_edpd.
    Multi-type tables, spill packing, z-chunking and the dynamic j bound all
    apply (same machinery as the classic fused kernel)."""
    nx, ny, nz = cfg.ncell
    nr = x.shape[0]
    shape = (ny, nz, cfg.capacity, nx)
    n_types = params.a.shape[0]
    chans, typ_chan, mc_chan = _model_chans(
        x, v, typ, tag, mask, shape, n_types, [t])
    lens = box.lengths
    dt_inv_sqrt = jnp.float32(1.0 / jnp.sqrt(dt))
    scal = jnp.stack([
        params.a[0, 0], params.gamma[0, 0], jnp.float32(0.0),
        params.rc[0, 0], lens[0], lens[1], lens[2],
        1.0 / lens[0], 1.0 / lens[1], 1.0 / lens[2],
        jnp.float32(1.0), dt_inv_sqrt,
        params.kappa[0, 0], jnp.float32(1.0 / params.mass),
        jnp.float32(0), jnp.float32(0)]).reshape(1, 16)
    if n_types > 1:
        tab = jnp.stack([params.a.reshape(-1), params.gamma.reshape(-1),
                         params.kappa.reshape(-1), params.rc.reshape(-1)])
    else:
        tab = jnp.zeros((4, 1), jnp.float32)
    out = _model_call(chans, mc_chan, typ_chan, scal, tab, box,
                      step, params.seed, cfg, rng_mode, rng_rounds,
                      interpret, "edpd", 0, 5, n_types, z_chunks)
    f = jnp.stack([out[0].reshape(nr), out[1].reshape(nr),
                   out[2].reshape(nr)], -1)
    return f, out[4].reshape(nr) / params.cv, jnp.sum(out[3])


@partial(jax.jit, static_argnames=("dt", "cfg", "rng_rounds", "interpret",
                                   "rng_mode", "z_chunks"))
def bucket_forces_pallas_tdpd_fused(x, v, c, typ, tag, mask, box: Box, step,
                                    params, dt: float, cfg: CellConfig,
                                    rng_rounds: int = 8,
                                    interpret: bool | None = None,
                                    rng_mode: str = "fast",
                                    z_chunks: int = 0):
    """tDPD forces + per-species fluxes via the fused-lane kernel (SURVEY
    rows 23/A.3). Returns (f, dCdt, virial); interface matches
    ops.tdpd.bucket_forces_tdpd. Full w_dc = (1-r/rcc)^s1 (rcc <= rc)."""
    nx, ny, nz = cfg.ncell
    nr = x.shape[0]
    ns = params.n_species
    shape = (ny, nz, cfg.capacity, nx)
    n_types = params.a.shape[0]
    chans, typ_chan, mc_chan = _model_chans(
        x, v, typ, tag, mask, shape, n_types,
        [c[:, sp] for sp in range(ns)])
    lens = box.lengths
    dt_inv_sqrt = jnp.float32(1.0 / jnp.sqrt(dt))
    per_species = []
    for sp in range(ns):
        per_species += [params.kappa_c[sp], params.eps_c[sp]]
    scal = jnp.concatenate([jnp.stack([
        params.a[0, 0], params.gamma[0, 0],
        params.sigma[0, 0] * dt_inv_sqrt,
        params.rc[0, 0], lens[0], lens[1], lens[2],
        1.0 / lens[0], 1.0 / lens[1], 1.0 / lens[2],
        jnp.float32(1.0), dt_inv_sqrt,
        params.rcc, params.s1]),
        jnp.stack(per_species).astype(jnp.float32)]).reshape(1, -1)
    if n_types > 1:
        tab = jnp.stack([params.a.reshape(-1), params.gamma.reshape(-1),
                         params.sigma.reshape(-1) * dt_inv_sqrt,
                         params.rc.reshape(-1)])
    else:
        tab = jnp.zeros((4, 1), jnp.float32)
    out = _model_call(chans, mc_chan, typ_chan, scal, tab, box,
                      step, params.seed, cfg, rng_mode, rng_rounds,
                      interpret, "tdpd", ns, 4 + ns, n_types, z_chunks)
    f = jnp.stack([out[0].reshape(nr), out[1].reshape(nr),
                   out[2].reshape(nr)], -1)
    dcdt = jnp.stack([out[4 + sp].reshape(nr) for sp in range(ns)], -1)
    return f, dcdt, jnp.sum(out[3])

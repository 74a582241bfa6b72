"""Pallas TPU pair kernels for the eDPD and tDPD variants.

Native-parity analogs of the reference's ``pair_edpd_*_meso.cu`` /
``pair_tdpd_meso.cu`` (SURVEY.md §2b rows 22-23): the same bucket-row sweep
as ``kernels/pair_dpd.py`` (9 halo-row blocks x 3 lane rolls, 2-D
(K_j, K_s*ncx) tiles, fori-loop row sweep) extended with per-particle
temperature / concentration channels and heat / flux outputs:

* eDPD: sigma_ij from the generalized FDT in-kernel; outputs (f, virial, q)
  with q = conduction + viscous + random heat (A.2);
* tDPD: per-species Fickian + antisymmetric random fluxes (A.3), S species
  unrolled statically;
* the antisymmetric noises use the tag channel for the i<j orientation, so
  both owners generate exactly opposite values — conservation is bitwise.
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

Array = jax.Array

# base channels (match kernels/pair_dpd.py) + TAG; model channels follow
_SX, _SY, _SZ, _VX, _VY, _VZ, _H, _VALID, _TAG = range(9)


def _lane_tile(p: Array, reps: int) -> Array:
    return jnp.concatenate([p] * reps, axis=1)


def _kernel(*refs, k: int, nx: int, model: str, ns: int, n_chan: int,
            n_out: int, rng_mode: str, rng_rounds: int, n_types: int = 1,
            typ_chan: int = -1):
    scal_ref = refs[0]
    iscal_ref = refs[1]      # SMEM (1, 2) int32: [step, seed]
    tab_ref = refs[2]        # SMEM (4, max(1, T*T)): per-type-pair tables
    selfref = refs[3]
    rows = refs[4:13]
    out_ref = refs[13]
    rows_s = refs[14]
    a = scal_ref[0, 0]
    gamma = scal_ref[0, 1]
    sigma0 = scal_ref[0, 2]   # tdpd: precomputed sigma; edpd: unused
    rc = scal_ref[0, 3]
    dt_inv_sqrt = scal_ref[0, 4]
    lx = scal_ref[0, 5]
    ly = scal_ref[0, 6]
    lz = scal_ref[0, 7]
    kappa = scal_ref[0, 8]    # edpd conduction coefficient
    inv_mass = scal_ref[0, 9]
    if rng_mode == "tea":
        step_u = iscal_ref[0, 0].astype(jnp.uint32)
        seed_u = iscal_ref[0, 1].astype(jnp.uint32)

    for i, ref in enumerate(rows):
        rows_s[i, :, :, :] = ref[:, 0, :, :]

    def selfchan(c):  # (1, K*nx)
        return selfref[c, 0, :, :]

    sxs = selfchan(_SX)
    sys_ = selfchan(_SY)
    szs = selfchan(_SZ)
    vxs = selfchan(_VX)
    vys = selfchan(_VY)
    vzs = selfchan(_VZ)
    hs = pltpu.bitcast(selfchan(_H), jnp.uint32)
    vs = selfchan(_VALID)
    tgs = pltpu.bitcast(selfchan(_TAG), jnp.int32)
    if model == "edpd":
        ts = selfchan(9)
    else:
        cs = [selfchan(9 + s) for s in range(ns)]
    if n_types > 1:
        tis = selfchan(typ_chan)   # f32 type codes

    s_idx = jax.lax.broadcasted_iota(jnp.int32, (k, k * nx), 1) // nx
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (k, k * nx), 0)
    self_pair = j_idx == s_idx

    def row_body(r9, acc):
        is_center = r9 == 4

        def chan(c):
            return rows_s[r9, c, :, :]

        for dx in (-1, 0, 1):
            def nb(p):
                r = pltpu.roll(p, (-dx) % nx, 1) if dx else p
                return _lane_tile(r, k)

            if n_types > 1:
                # per-pair coefficients via the SMEM select chain (same
                # mechanism as the classic kernels; SURVEY rows 22-23)
                code = tis * jnp.float32(n_types) + nb(chan(typ_chan))
                a_ij = tab_ref[0, 0]
                g_ij = tab_ref[1, 0]
                rc_ij = tab_ref[2, 0]
                x4_ij = tab_ref[3, 0]   # edpd: kappa; tdpd: sigma
                for pcode in range(1, n_types * n_types):
                    sel = code == jnp.float32(pcode)
                    a_ij = jnp.where(sel, tab_ref[0, pcode], a_ij)
                    g_ij = jnp.where(sel, tab_ref[1, pcode], g_ij)
                    rc_ij = jnp.where(sel, tab_ref[2, pcode], rc_ij)
                    x4_ij = jnp.where(sel, tab_ref[3, pcode], x4_ij)
            else:
                a_ij, g_ij, rc_ij = a, gamma, rc
                x4_ij = kappa if model == "edpd" else sigma0
            # min-image ALL axes: a particle can wrap the global box
            # mid-window while still bucketed at the far side
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
                ok = ok & ~(self_pair & is_center)
            r2s = jnp.where(ok, r2, 1.0)
            rinv = jax.lax.rsqrt(r2s)
            r = r2s * rinv
            w = 1.0 - r / rc_ij
            w2 = w * w
            dvx = vxs - nb(chan(_VX))
            dvy = vys - nb(chan(_VY))
            dvz = vzs - nb(chan(_VZ))
            ev = (drx * dvx + dry * dvy + drz * dvz) * rinv
            tgj = pltpu.bitcast(nb(chan(_TAG)), jnp.int32)
            if rng_mode == "tea":
                # reference-parity pair hash: full TEA on the sorted tags
                lo_t = jnp.minimum(tgs, tgj).astype(jnp.uint32)
                hi_t = jnp.maximum(tgs, tgj).astype(jnp.uint32)
                hp, _unused = rngmod.tea(lo_t, hi_t, step_u, seed_u,
                                         rounds=rng_rounds)
            else:
                hj = pltpu.bitcast(nb(chan(_H)), jnp.uint32)
                hp = rngmod.combine_symmetric(hs, hj)
            theta = rngmod.uniform_stream(hp, 0)
            sign = jnp.where(tgs < tgj, 1.0, -1.0)

            if model == "edpd":
                tj = nb(chan(9))
                sigma2 = 4.0 * g_ij * ts * tj / jnp.maximum(ts + tj, 1e-12)
                sigma = jnp.sqrt(jnp.maximum(sigma2, 0.0))
                fmag = (a_ij * w - g_ij * w2 * ev
                        + sigma * w * theta * dt_inv_sqrt)
                fmag = jnp.where(ok, fmag, 0.0)
                k_ij = x4_ij * 0.25 * (ts + tj) ** 2
                q_c = k_ij * w2 * (1.0 / jnp.maximum(ts, 1e-12)
                                   - 1.0 / jnp.maximum(tj, 1e-12))
                q_v = 0.5 * (w2 * (g_ij * ev * ev - sigma2 * inv_mass)
                             - sigma * w * ev * theta * dt_inv_sqrt)
                zeta = sign * rngmod.uniform_stream(hp, 1)
                beta = jnp.sqrt(jnp.maximum(2.0 * k_ij, 0.0))
                q_r = beta * w * zeta * dt_inv_sqrt
                q = jnp.where(ok, q_c + q_v + q_r, 0.0)
                extra = [q]
            else:  # tdpd
                fmag = (a_ij * w - g_ij * w2 * ev
                        + x4_ij * w * theta * dt_inv_sqrt)
                fmag = jnp.where(ok, fmag, 0.0)
                # transport weight: w_dc = (1 - r/rcc)^s1 with its own
                # cutoff rcc <= rc (scal slots 6/7 repurposed from edpd)
                rcc = scal_ref[0, 8]
                s1 = scal_ref[0, 9]
                inside_c = ok & (r2 < rcc * rcc)
                wdc_base = jnp.maximum(1.0 - r / rcc, 0.0)
                wdc = jnp.where(s1 == 1.0, wdc_base,
                                jnp.power(wdc_base, s1))
                wrc = jnp.sqrt(wdc)
                extra = []
                for s in range(ns):
                    kap_s = scal_ref[0, 10 + 2 * s]
                    eps_s = scal_ref[0, 11 + 2 * s]
                    ci = selfchan(9 + s) * 1.0
                    cj = nb(chan(9 + s))
                    xi = sign * rngmod.uniform_stream(hp, 2 + s)
                    qd = -kap_s * wdc * (ci - cj)
                    qr = eps_s * wrc * xi * dt_inv_sqrt
                    extra.append(jnp.where(inside_c, qd + qr, 0.0))

            fr = fmag * rinv
            acc = list(acc)
            acc[0] = acc[0] + jnp.sum(fr * drx, axis=0, keepdims=True)
            acc[1] = acc[1] + jnp.sum(fr * dry, axis=0, keepdims=True)
            acc[2] = acc[2] + jnp.sum(fr * drz, axis=0, keepdims=True)
            acc[3] = acc[3] + jnp.sum(0.5 * fmag * r, axis=0, keepdims=True)
            for e, val in enumerate(extra):
                acc[4 + e] = acc[4 + e] + jnp.sum(val, axis=0, keepdims=True)
            acc = tuple(acc)
        return acc

    zero = jnp.zeros((1, k * nx), jnp.float32)
    acc = jax.lax.fori_loop(0, 9, row_body, tuple([zero] * n_out))
    for o in range(n_out):
        out_ref[o, 0, :, :] = acc[o]


@partial(jax.jit, static_argnames=("dt", "cfg", "rng_rounds", "interpret",
                                   "rng_mode"))
def bucket_forces_pallas_edpd(x, v, t, typ, tag, mask, box: Box, step,
                              params, dt: float, cfg: CellConfig,
                              rng_rounds: int = 8, interpret: bool = False,
                              rng_mode: str = "fast"):
    """eDPD forces + heat via the Pallas kernel. Returns (f, dTdt, virial).
    Interface matches ops.edpd.bucket_forces_edpd (both RNG tiers)."""
    scal_extra = jnp.stack([params.kappa[0, 0], 1.0 / params.mass])
    model_chans = [t]
    n_types = params.a.shape[0]
    tab = None
    if n_types > 1:
        model_chans = model_chans + [typ.astype(jnp.float32)]
        tab = jnp.stack([params.a.reshape(-1), params.gamma.reshape(-1),
                         params.rc.reshape(-1), params.kappa.reshape(-1)])
    out = _call(x, v, tag, mask, box, step, params, dt, cfg, rng_rounds,
                interpret, rng_mode=rng_mode,
                model="edpd", ns=0, model_chans=model_chans,
                scal_mid=jnp.stack([params.a[0, 0], params.gamma[0, 0],
                                    jnp.float32(0.0), params.rc[0, 0]]),
                scal_extra=scal_extra, n_out=5, n_types=n_types, tab=tab)
    nr = x.shape[0]
    f = jnp.stack([out[0].reshape(nr), out[1].reshape(nr),
                   out[2].reshape(nr)], -1)
    return f, out[4].reshape(nr) / params.cv, jnp.sum(out[3])


@partial(jax.jit, static_argnames=("dt", "cfg", "rng_rounds", "interpret",
                                   "rng_mode"))
def bucket_forces_pallas_tdpd(x, v, c, typ, tag, mask, box: Box, step,
                              params, dt: float, cfg: CellConfig,
                              rng_rounds: int = 8, interpret: bool = False,
                              rng_mode: str = "fast"):
    """tDPD forces + fluxes via the Pallas kernel. Returns (f, dCdt, virial).
    Full w_dc = (1 - r/rcc)^s1; requires rcc <= rc (rc-based stencil).
    Both RNG tiers."""
    ns = params.n_species
    model_chans = [c[:, s] for s in range(ns)]
    per_species = []
    for s in range(ns):
        per_species += [params.kappa_c[s], params.eps_c[s]]
    n_types = params.a.shape[0]
    tab = None
    if n_types > 1:
        model_chans = model_chans + [typ.astype(jnp.float32)]
        tab = jnp.stack([params.a.reshape(-1), params.gamma.reshape(-1),
                         params.rc.reshape(-1), params.sigma.reshape(-1)])
    out = _call(x, v, tag, mask, box, step, params, dt, cfg, rng_rounds,
                interpret, rng_mode=rng_mode,
                model="tdpd", ns=ns, model_chans=model_chans,
                scal_mid=jnp.stack([params.a[0, 0], params.gamma[0, 0],
                                    params.sigma[0, 0], params.rc[0, 0]]),
                scal_extra=jnp.stack([params.rcc, params.s1]
                                     + per_species),
                n_out=4 + ns, n_types=n_types, tab=tab)
    nr = x.shape[0]
    f = jnp.stack([out[0].reshape(nr), out[1].reshape(nr),
                   out[2].reshape(nr)], -1)
    dcdt = jnp.stack([out[4 + s].reshape(nr) for s in range(ns)], -1)
    return f, dcdt, jnp.sum(out[3])


def _call(x, v, tag, mask, box, step, params, dt, cfg, rng_rounds,
          interpret, *, model, ns, model_chans, scal_mid, scal_extra, n_out,
          rng_mode="fast", n_types=1, tab=None):
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    h = rngmod.particle_hash(tag, step, params.seed, rounds=rng_rounds)
    shape = (ny, nz, k, nx)
    chans = [
        x[:, 0].reshape(shape), x[:, 1].reshape(shape),
        x[:, 2].reshape(shape),
        v[:, 0].reshape(shape), v[:, 1].reshape(shape),
        v[:, 2].reshape(shape),
        jax.lax.bitcast_convert_type(h, jnp.float32).reshape(shape),
        mask.astype(jnp.float32).reshape(shape),
        jax.lax.bitcast_convert_type(tag, jnp.float32).reshape(shape),
    ] + [mc.reshape(shape) for mc in model_chans]
    n_chan = len(chans)
    typ_chan = n_chan - 1 if n_types > 1 else -1
    if tab is None:
        tab = jnp.zeros((4, 1), jnp.float32)
    planes = jnp.stack(chans)
    padded = jnp.pad(planes, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)),
                     mode="wrap")
    ly = box.lengths[1]
    lz = box.lengths[2]
    padded = padded.at[_SY, 0].add(-ly).at[_SY, -1].add(ly)
    padded = padded.at[_SZ, :, 0].add(-lz).at[_SZ, :, -1].add(lz)
    rows_view = padded.reshape(n_chan, (ny + 2) * (nz + 2), k, nx)
    self_view = padded.reshape(n_chan, (ny + 2) * (nz + 2), 1, k * nx)

    scal = jnp.concatenate([
        scal_mid.astype(jnp.float32),
        jnp.stack([jnp.float32(1.0 / jnp.sqrt(dt)), box.lengths[0],
                   box.lengths[1], box.lengths[2]]),
        scal_extra.astype(jnp.float32)]).reshape(1, -1)
    n_scal = scal.shape[1]
    iscal = jnp.stack([jnp.asarray(step, jnp.int32),
                       params.seed.astype(jnp.int32)]).reshape(1, 2)

    def row_spec(dy, dz):
        return pl.BlockSpec(
            (n_chan, 1, k, nx),
            index_map=lambda cy, cz: (0, (cy + dy) * (nz + 2) + (cz + dz),
                                      0, 0),
            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, n_scal), lambda cy, cz: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 2), lambda cy, cz: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(tab.shape, lambda cy, cz: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((n_chan, 1, 1, k * nx),
                     index_map=lambda cy, cz: (
                         0, (cy + 1) * (nz + 2) + (cz + 1), 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    in_specs += [row_spec(dy, dz) for dy in (0, 1, 2) for dz in (0, 1, 2)]

    out = pl.pallas_call(
        partial(_kernel, k=k, nx=nx, model=model, ns=ns, n_chan=n_chan,
                n_out=n_out, rng_mode=rng_mode, rng_rounds=rng_rounds,
                n_types=n_types, typ_chan=typ_chan),
        grid=(ny, nz),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (n_out, 1, 1, k * nx),
            index_map=lambda cy, cz: (0, cy * nz + cz, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out, ny * nz, 1, k * nx),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((9, n_chan, k, nx), jnp.float32)],
        interpret=interpret,
    )(scal, iscal, tab, self_view, *([rows_view] * 9))
    return [out[o].reshape(ny, nz, k, nx) for o in range(n_out)]

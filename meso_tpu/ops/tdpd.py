"""tDPD — transport DPD with per-particle concentration fields.

Physics contract: SURVEY.md A.3 (Li, Yazdani, Tartakovsky, Karniadakis,
JCP 143, 014101 (2015); reference ``pair_tdpd_meso.cu`` expected path,
§2b row 23):

momentum:  classic Groot-Warren DPD (A.1)
transport: dC_i/dt = sum_j (Q^D + Q^R) per species s,
           Q^D = -kappa_s w_dc(r) (C_i - C_j),  w_dc = (1 - r/r_cc)^s1
           Q^R = eps_s w_rc(r) xi_ij dt^-1/2,   w_rc = w_dc^{1/2},
           xi antisymmetric (xi_ij = -xi_ji) => total C conserved exactly.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from meso_tpu.core import rng as rngmod
from meso_tpu.core.box import Box
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.ops.dpd import pair_force

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TDPDParams:
    """Momentum tables (as DPDParams) + per-species transport coefficients."""

    a: Array        # (T,T)
    gamma: Array    # (T,T)
    sigma: Array    # (T,T)
    rc: Array       # (T,T)
    kappa_c: Array  # (S,) diffusion coefficient per species
    eps_c: Array    # (S,) random-flux amplitude per species
    rcc: Array      # ()   concentration cutoff
    s1: Array       # ()   w_dc exponent
    seed: Array     # ()   uint32
    s_exp: Array    # ()   momentum w_D exponent control (1.0 default)

    @staticmethod
    def build(a, gamma, rc, kt: float, kappa_c, eps_c, rcc: float,
              seed: int, n_types: int = 1, s1: float = 1.0) -> "TDPDParams":
        def table(v):
            arr = jnp.asarray(v, jnp.float32)
            return jnp.full((n_types, n_types), arr) if arr.ndim == 0 else arr
        g = table(gamma)
        return TDPDParams(
            a=table(a), gamma=g, sigma=jnp.sqrt(2.0 * jnp.float32(kt) * g),
            rc=table(rc),
            kappa_c=jnp.atleast_1d(jnp.asarray(kappa_c, jnp.float32)),
            eps_c=jnp.atleast_1d(jnp.asarray(eps_c, jnp.float32)),
            rcc=jnp.asarray(rcc, jnp.float32),
            s1=jnp.asarray(s1, jnp.float32),
            seed=jnp.asarray(seed, jnp.uint32),
            s_exp=jnp.asarray(1.0, jnp.float32))

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def n_species(self) -> int:
        return self.kappa_c.shape[0]


def tdpd_flux(dr, c_i, c_j, xi, kappa_c, eps_c, rcc, s1, dt_inv_sqrt,
              inside_m):
    """Per-pair concentration flux into particle i, per species.

    c_i, c_j: (..., S); xi: (..., S) antisymmetric noise. Returns (..., S).
    """
    r2 = jnp.sum(dr * dr, axis=-1)
    inside = (r2 < rcc * rcc) & (r2 > 0.0) & inside_m
    r = jnp.sqrt(jnp.where(inside, r2, 1.0))
    wdc_base = jnp.maximum(1.0 - r / rcc, 0.0)
    wdc = jnp.where(s1 == 1.0, wdc_base, jnp.power(wdc_base, s1))
    q_d = -kappa_c * wdc[..., None] * (c_i - c_j)
    wrc = jnp.sqrt(wdc)
    q_r = eps_c * wrc[..., None] * xi * dt_inv_sqrt
    return jnp.where(inside[..., None], q_d + q_r, 0.0)


def _noises(tag_i, tag_j, step, seed, rounds, n_species):
    h_i = rngmod.particle_hash(tag_i, step, seed, rounds=rounds)
    h_j = rngmod.particle_hash(tag_j, step, seed, rounds=rounds)
    h = rngmod.combine_symmetric(h_i, h_j)
    theta = rngmod.uniform_stream(h, 0)
    sign = jnp.where(tag_i < tag_j, 1.0, -1.0).astype(jnp.float32)
    xi = jnp.stack([sign * rngmod.uniform_stream(h, 2 + s)
                    for s in range(n_species)], axis=-1)
    return theta, xi


@partial(jax.jit, static_argnames=("dt", "rng_rounds"))
def dense_forces_tdpd(x, v, c, typ, tag, mask, box: Box, step,
                      params: TDPDParams, dt: float, rng_rounds: int = 8):
    """O(N^2) tDPD oracle. Returns (f, dCdt, virial)."""
    n = x.shape[0]
    dr = box.min_image(x[:, None, :] - x[None, :, :])
    vij = v[:, None, :] - v[None, :, :]
    theta, xi = _noises(tag[:, None], tag[None, :], step, params.seed,
                        rng_rounds, params.n_species)
    ti, tj = typ[:, None], typ[None, :]
    valid = (mask[:, None] & mask[None, :]) & ~jnp.eye(n, dtype=bool)
    rc = jnp.where(valid, params.rc[ti, tj], 0.0)
    dt_inv_sqrt = jnp.float32(1.0 / jnp.sqrt(dt))
    f_p, vir = pair_force(dr, vij, theta, params.a[ti, tj],
                          params.gamma[ti, tj], params.sigma[ti, tj], rc,
                          dt_inv_sqrt, params.s_exp)
    q_p = tdpd_flux(dr, c[:, None, :], c[None, :, :], xi, params.kappa_c,
                    params.eps_c, params.rcc, params.s1, dt_inv_sqrt, valid)
    return jnp.sum(f_p, 1), jnp.sum(q_p, 1), jnp.sum(vir)


def bucket_forces_tdpd(x, v, c, typ, tag, mask, box: Box, step,
                       params: TDPDParams, dt: float, cfg: CellConfig,
                       rng_rounds: int = 8):
    """Structured (roll-based) tDPD forces over bucket-resident rows."""
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    nr = x.shape[0]
    ns = params.n_species
    shape = (ny, nz, k, nx)

    def plane(a):
        return a.reshape(shape)

    def plane_s(a):  # (nr, S) -> (ny,nz,k,nx,S)
        return a.reshape(shape + (ns,))

    sx, sy, sz = plane(x[:, 0]), plane(x[:, 1]), plane(x[:, 2])
    ux, uy, uz = plane(v[:, 0]), plane(v[:, 1]), plane(v[:, 2])
    tp = plane(typ)
    cc = plane_s(c)
    tg = plane(tag)
    valid = plane(mask)
    h = plane(rngmod.particle_hash(tag, step, params.seed, rounds=rng_rounds))
    lens = box.lengths

    def mi(d, axis):
        return d - jnp.round(d / lens[axis]) * lens[axis]

    def selfe(p):
        return p[:, :, None, :, :]

    def neigh(p, dy, dz, dx):
        return jnp.roll(p, (-dy, -dz, -dx), (0, 1, 3))[:, :, :, None, :]

    def selfe_s(p):
        return p[:, :, None, :, :, :]

    def neigh_s(p, dy, dz, dx):
        return jnp.roll(p, (-dy, -dz, -dx), (0, 1, 3))[:, :, :, None, :, :]

    eye = jnp.eye(k, dtype=bool)[None, None, :, :, None]
    dt_inv_sqrt = jnp.float32(1.0 / jnp.sqrt(dt))
    f_acc = [jnp.zeros(shape, jnp.float32) for _ in range(3)]
    q_acc = jnp.zeros(shape + (ns,), jnp.float32)
    vir_acc = jnp.zeros(shape, jnp.float32)

    for dy in (-1, 0, 1):
        for dz in (-1, 0, 1):
            for dx in (-1, 0, 1):
                drx = mi(selfe(sx) - neigh(sx, dy, dz, dx), 0)
                dry = mi(selfe(sy) - neigh(sy, dy, dz, dx), 1)
                drz = mi(selfe(sz) - neigh(sz, dy, dz, dx), 2)
                dvx = selfe(ux) - neigh(ux, dy, dz, dx)
                dvy = selfe(uy) - neigh(uy, dy, dz, dx)
                dvz = selfe(uz) - neigh(uz, dy, dz, dx)
                hj = neigh(h, dy, dz, dx)
                hp = rngmod.combine_symmetric(selfe(h), hj)
                theta = rngmod.uniform_stream(hp, 0)
                tgj = neigh(tg, dy, dz, dx)
                sign = jnp.where(selfe(tg) < tgj, 1.0, -1.0)
                xi = jnp.stack([sign * rngmod.uniform_stream(hp, 2 + s)
                                for s in range(ns)], axis=-1)
                ti = selfe(tp)
                tj = neigh(tp, dy, dz, dx)
                ok = selfe(valid) & neigh(valid, dy, dz, dx)
                if dx == 0 and dy == 0 and dz == 0:
                    ok = ok & ~eye
                rc = jnp.where(ok, params.rc[ti, tj], 0.0)
                dr = jnp.stack([drx, dry, drz], -1)
                dv = jnp.stack([dvx, dvy, dvz], -1)
                fp, vh = pair_force(dr, dv, theta, params.a[ti, tj],
                                    params.gamma[ti, tj],
                                    params.sigma[ti, tj], rc, dt_inv_sqrt,
                                    params.s_exp)
                qp = tdpd_flux(dr, selfe_s(cc), neigh_s(cc, dy, dz, dx), xi,
                               params.kappa_c, params.eps_c, params.rcc,
                               params.s1, dt_inv_sqrt, ok)
                for cmp in range(3):
                    f_acc[cmp] = f_acc[cmp] + jnp.sum(fp[..., cmp], axis=2)
                q_acc = q_acc + jnp.sum(qp, axis=2)
                vir_acc = vir_acc + jnp.sum(vh, axis=2)

    f = jnp.stack([f_acc[cmp].reshape(nr) for cmp in range(3)], -1)
    return f, q_acc.reshape(nr, ns), jnp.sum(vir_acc)

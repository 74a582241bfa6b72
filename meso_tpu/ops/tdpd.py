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


def _noises(tag_i, tag_j, step, seed, rounds, n_species,
            rng_mode="fast"):
    if rng_mode == "tea":
        h = rngmod.pair_hash_tea(tag_i, tag_j, step, seed, rounds=rounds)
    else:
        h_i = rngmod.particle_hash(tag_i, step, seed, rounds=rounds)
        h_j = rngmod.particle_hash(tag_j, step, seed, rounds=rounds)
        h = rngmod.combine_symmetric(h_i, h_j)
    theta = rngmod.uniform_stream(h, 0)
    sign = jnp.where(tag_i < tag_j, 1.0, -1.0).astype(jnp.float32)
    xi = jnp.stack([sign * rngmod.uniform_stream(h, 2 + s)
                    for s in range(n_species)], axis=-1)
    return theta, xi


@partial(jax.jit, static_argnames=("dt", "rng_rounds", "rng_mode"))
def dense_forces_tdpd(x, v, c, typ, tag, mask, box: Box, step,
                      params: TDPDParams, dt: float, rng_rounds: int = 8,
                      rng_mode: str = "fast"):
    """O(N^2) tDPD oracle. Returns (f, dCdt, virial)."""
    n = x.shape[0]
    dr = box.min_image(x[:, None, :] - x[None, :, :])
    vij = v[:, None, :] - v[None, :, :]
    theta, xi = _noises(tag[:, None], tag[None, :], step, params.seed,
                        rng_rounds, params.n_species, rng_mode)
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
                       rng_rounds: int = 8, rng_mode: str = "fast"):
    """Structured tDPD forces over bucket-resident rows via the shared
    sweep. Full w_dc = (1 - r/rcc)^s1; requires rcc <= rc so the rc-based
    cell stencil covers every transport pair. Returns (f, dCdt, virial)."""
    from meso_tpu.ops.sweep import make_channels, sweep, tdpd_pair_fn

    try:  # static guard only when values are concrete (not under jit)
        if float(params.rcc) > float(params.rc.max()):
            raise ValueError(
                "bucket tDPD path requires rcc <= rc (rc-based stencil): "
                f"rcc={float(params.rcc)}, rc={float(params.rc.max())}")
    except jax.errors.ConcretizationTypeError:
        pass

    nr = x.shape[0]
    ns = params.n_species
    h = rngmod.particle_hash(tag, step, params.seed, rounds=rng_rounds)
    extra = {f"C{s}": c[:, s] for s in range(ns)}
    channels = make_channels(x, v, tag, mask, h, extra, cfg.ncell,
                             cfg.capacity)
    multitype = params.a.shape[0] > 1
    if multitype:
        channels["typ"] = typ.reshape(channels["tag"].shape)
    acc = sweep(channels, cfg.ncell, cfg.capacity, (False, False, False),
                box.lengths,
                tdpd_pair_fn(params, dt, ns, multitype, rng_mode=rng_mode,
                             step=step, rng_rounds=rng_rounds), 4 + ns)
    f = jnp.stack([acc[0].reshape(nr), acc[1].reshape(nr),
                   acc[2].reshape(nr)], -1)
    dcdt = jnp.stack([acc[4 + s].reshape(nr) for s in range(ns)], -1)
    return f, dcdt, jnp.sum(acc[3])

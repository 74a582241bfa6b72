"""eDPD — energy-conserving DPD with per-particle internal temperature.

Physics contract: SURVEY.md A.2 (Espanol 1997 formulation as implemented by
Li et al., reference ``pair_edpd_*_meso.cu`` expected path, §2b row 22):

momentum:  F = a w e  - gamma w^2 (e.v) e  + sigma_ij w theta dt^-1/2 e,
           sigma_ij^2 = 4 gamma k_B T_i T_j / (T_i + T_j)   (generalized FDT)
energy:    C_v dT_i/dt = sum_j (q^C + q^V + q^R)
           q^C = k_ij w_ct(r) (1/T_i - 1/T_j),  k_ij = kappa (T_i+T_j)^2/4
           q^V = 1/2 [ w^2 (gamma (e.v)^2 - sigma_ij^2/m)
                       - sigma_ij w (e.v) theta dt^-1/2 ]
           q^R = beta_ij w_ct(r)^{1/2}... beta_ij^2 = 2 k_B k_ij,
                 zeta antisymmetric (zeta_ij = -zeta_ji) so internal energy
                 is exchanged, not created.

Conservation structure: q^C and q^R are antisymmetric (pure exchange);
2*q^V exactly equals the pairwise kinetic-energy loss of the thermostat in
expectation, so total (kinetic + internal) energy is conserved.

k_B = 1 (reduced units). w_ct = w^2 by default.
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

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class EDPDParams:
    """Coefficients for eDPD (single tables; type-pair tables like DPDParams)."""

    a: Array       # (T,T) conservative amplitude
    gamma: Array   # (T,T) dissipative coefficient
    rc: Array      # (T,T) cutoff
    kappa: Array   # (T,T) thermal-conductivity coefficient (k_ij prefactor)
    cv: Array      # ()    per-particle heat capacity
    mass: Array    # ()    particle mass (enters q^V)
    seed: Array    # ()    uint32

    @staticmethod
    def build(a, gamma, rc, kappa, cv: float, seed: int, n_types: int = 1,
              mass: float = 1.0) -> "EDPDParams":
        def table(v):
            arr = jnp.asarray(v, jnp.float32)
            return jnp.full((n_types, n_types), arr) if arr.ndim == 0 else arr
        return EDPDParams(a=table(a), gamma=table(gamma), rc=table(rc),
                          kappa=table(kappa),
                          cv=jnp.asarray(cv, jnp.float32),
                          mass=jnp.asarray(mass, jnp.float32),
                          seed=jnp.asarray(seed, jnp.uint32))

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def edpd_pair(dr, vij, t_i, t_j, theta, zeta, a, gamma, rc, kappa,
              mass, dt_inv_sqrt):
    """Per-pair momentum force + heat rate for particle i.

    Returns (f (...,3), q (...), virial_half (...)). theta symmetric,
    zeta antisymmetric under i<->j.
    """
    r2 = jnp.sum(dr * dr, axis=-1)
    inside = (r2 < rc * rc) & (r2 > 0.0)
    r2s = jnp.where(inside, r2, 1.0)
    rinv = jax.lax.rsqrt(r2s)
    r = r2s * rinv
    w = 1.0 - r / rc
    ev = jnp.sum(dr * vij, axis=-1) * rinv
    # generalized FDT
    sigma2 = 4.0 * gamma * t_i * t_j / jnp.maximum(t_i + t_j, 1e-12)
    sigma = jnp.sqrt(jnp.maximum(sigma2, 0.0))
    w2 = w * w
    fmag = a * w - gamma * w2 * ev + sigma * w * theta * dt_inv_sqrt
    fmag = jnp.where(inside, fmag, 0.0)
    f = (fmag * rinv)[..., None] * dr

    k_ij = kappa * 0.25 * (t_i + t_j) ** 2
    q_c = k_ij * w2 * (1.0 / jnp.maximum(t_i, 1e-12)
                       - 1.0 / jnp.maximum(t_j, 1e-12))
    q_v = 0.5 * (w2 * (gamma * ev * ev - sigma2 / mass)
                 - sigma * w * ev * theta * dt_inv_sqrt)
    beta = jnp.sqrt(jnp.maximum(2.0 * k_ij, 0.0))
    q_r = beta * w * zeta * dt_inv_sqrt
    q = jnp.where(inside, q_c + q_v + q_r, 0.0)
    virial_half = 0.5 * fmag * r
    return f, q, virial_half


def _pair_noises(tag_i, tag_j, step, seed, rounds, rng_mode="fast"):
    """(theta symmetric, zeta antisymmetric) from one pair-hash. rng_mode
    'tea' uses the reference-parity TEA hash of the sorted tag pair."""
    if rng_mode == "tea":
        h = rngmod.pair_hash_tea(tag_i, tag_j, step, seed, rounds=rounds)
    else:
        h_i = rngmod.particle_hash(tag_i, step, seed, rounds=rounds)
        h_j = rngmod.particle_hash(tag_j, step, seed, rounds=rounds)
        h = rngmod.combine_symmetric(h_i, h_j)
    theta = rngmod.uniform_stream(h, 0)
    sign = jnp.where(tag_i < tag_j, 1.0, -1.0).astype(jnp.float32)
    zeta = sign * rngmod.uniform_stream(h, 1)
    return theta, zeta


@partial(jax.jit, static_argnames=("dt", "rng_rounds", "rng_mode"))
def dense_forces_edpd(x, v, t, typ, tag, mask, box: Box, step, params:
                      EDPDParams, dt: float, rng_rounds: int = 8,
                      rng_mode: str = "fast"):
    """O(N^2) eDPD oracle. Returns (f, dTdt, virial)."""
    n = x.shape[0]
    dr = box.min_image(x[:, None, :] - x[None, :, :])
    vij = v[:, None, :] - v[None, :, :]
    theta, zeta = _pair_noises(tag[:, None], tag[None, :], step, params.seed,
                               rng_rounds, rng_mode)
    ti = typ[:, None]
    tj = typ[None, :]
    valid = (mask[:, None] & mask[None, :]) & ~jnp.eye(n, dtype=bool)
    rc = jnp.where(valid, params.rc[ti, tj], 0.0)
    f_p, q_p, vir = edpd_pair(dr, vij, t[:, None], t[None, :], theta, zeta,
                              params.a[ti, tj], params.gamma[ti, tj], rc,
                              params.kappa[ti, tj], params.mass,
                              jnp.float32(1.0 / jnp.sqrt(dt)))
    f = jnp.sum(f_p, axis=1)
    dtdt = jnp.sum(q_p, axis=1) / params.cv
    return f, dtdt, jnp.sum(vir)


def bucket_forces_edpd(x, v, t, typ, tag, mask, box: Box, step,
                       params: EDPDParams, dt: float, cfg: CellConfig,
                       rng_rounds: int = 8, rng_mode: str = "fast"):
    """Structured eDPD forces over bucket-resident rows via the shared
    sweep (ops/sweep.py). Returns (f (nr,3), dTdt (nr,), virial)."""
    from meso_tpu.ops.sweep import edpd_pair_fn, make_channels, sweep

    nr = x.shape[0]
    h = rngmod.particle_hash(tag, step, params.seed, rounds=rng_rounds)
    channels = make_channels(x, v, tag, mask, h, {"T": t}, cfg.ncell,
                             cfg.capacity)
    multitype = params.a.shape[0] > 1
    if multitype:
        channels["typ"] = typ.reshape(channels["tag"].shape)
    acc = sweep(channels, cfg.ncell, cfg.capacity, (False, False, False),
                box.lengths,
                edpd_pair_fn(params, dt, multitype, rng_mode=rng_mode,
                             step=step, rng_rounds=rng_rounds), 5)
    f = jnp.stack([acc[0].reshape(nr), acc[1].reshape(nr),
                   acc[2].reshape(nr)], -1)
    return f, acc[4].reshape(nr) / params.cv, jnp.sum(acc[3])

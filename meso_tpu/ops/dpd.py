"""Classic Groot-Warren DPD pair forces.

TPU-native analog of the reference's CPU ``pair_style dpd`` and the CUDA
``pair_dpd_meso`` kernel (expected ``src/pair_dpd.cpp`` /
``src/USER-MESO/pair_dpd_meso.cu``; SURVEY.md §2a row 15, §2b rows 20-21,
§3.3). Physics contract: SURVEY.md Appendix A.1 —

    F_ij = [ a_ij w(r) - gamma_ij w(r)^2 (e.v_ij) + sigma_ij w(r) theta_ij
             / sqrt(dt) ] e,   w(r) = 1 - r/r_c,  sigma^2 = 2 gamma kT.

The per-pair term is one shared function (`pair_force`) so that every
traversal (dense O(N^2) reference, XLA cell-list, Pallas kernel) computes
identical math and can be cross-validated. Like the reference GPU path, we
use *full* neighbor traversals: each particle computes its own force sum —
one writer per particle, no scatter/atomics (SURVEY.md row 20), and momentum
conservation is exact because theta_ij is symmetric and F_ij = -F_ji holds
bitwise in IEEE arithmetic.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from meso_tpu.core import rng as rngmod
from meso_tpu.core.box import Box

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DPDParams:
    """Per-type-pair coefficient tables (reference ``pair_coeff i j a gamma rc``).

    ``sigma`` is derived from the fluctuation-dissipation theorem at build
    time: sigma_ij = sqrt(2 * gamma_ij * kT).
    """

    a: Array       # (T, T) conservative amplitude
    gamma: Array   # (T, T) dissipative coefficient
    sigma: Array   # (T, T) random-force amplitude
    rc: Array      # (T, T) cutoff
    kt: Array      # ()     target temperature (FDT)
    seed: Array    # ()     uint32 global RNG seed (pair_style dpd's seed arg)
    s_exp: Array   # ()     w_D = w^(2*s_exp); reference default s_exp = 1
    # special_bonds (SURVEY §2a row 7): per-particle excluded-tag lists and
    # the scale applied to excluded pairs (LAMMPS `special_bonds` weight;
    # 1.0 = no exclusion — the usual DPD-polymer convention)
    excl: "Array | None" = None     # (n_tags+1, E) int32 tags, 0 = empty
    excl_w: "Array | None" = None   # () float32 weight for excluded pairs

    @staticmethod
    def build(a, gamma, rc, kt: float, seed: int, n_types: int = 1,
              s_exp: float = 1.0) -> "DPDParams":
        def table(val):
            arr = jnp.asarray(val, jnp.float32)
            if arr.ndim == 0:
                arr = jnp.full((n_types, n_types), arr)
            return arr
        a_t, g_t, rc_t = table(a), table(gamma), table(rc)
        return DPDParams(
            a=a_t, gamma=g_t,
            sigma=jnp.sqrt(2.0 * jnp.float32(kt) * g_t),
            rc=rc_t,
            kt=jnp.asarray(kt, jnp.float32),
            seed=jnp.asarray(seed, jnp.uint32),
            s_exp=jnp.asarray(s_exp, jnp.float32),
        )

    def replace(self, **kw) -> "DPDParams":
        return dataclasses.replace(self, **kw)


def pair_force(dr: Array, vij: Array, theta: Array, a: Array, gamma: Array,
               sigma: Array, rc: Array, dt_inv_sqrt: Array,
               s_exp: Array) -> tuple[Array, Array]:
    """Groot-Warren force for one (batched) pair.

    Args:
      dr:    (..., 3) minimum-imaged x_i - x_j
      vij:   (..., 3) v_i - v_j
      theta: (...)    symmetric unit-variance noise
      a, gamma, sigma, rc: (...) per-pair coefficients
      dt_inv_sqrt: scalar 1/sqrt(dt)
    Returns:
      f:  (..., 3) force on particle i (zero where r >= rc or r == 0)
      virial_half: (...) 0.5 * dr . f  (per-pair half-virial; summing over a
        full double-counted traversal yields the standard pair virial)
    """
    r2 = jnp.sum(dr * dr, axis=-1)
    inside = (r2 < rc * rc) & (r2 > 0.0)
    r2s = jnp.where(inside, r2, 1.0)  # guard rsqrt
    rinv = jax.lax.rsqrt(r2s)
    r = r2s * rinv
    w = 1.0 - r / rc
    # generalized weights (Fan et al.): w_R = w^s, w_D = w_R^2 (FDT pair)
    wr = jnp.where(s_exp == 1.0, w, jnp.power(w, s_exp))
    wd = wr * wr
    ev = jnp.sum(dr * vij, axis=-1) * rinv  # e . v_ij
    fmag = a * w - gamma * wd * ev + sigma * wr * theta * dt_inv_sqrt
    fmag = jnp.where(inside, fmag, 0.0)
    f = (fmag * rinv)[..., None] * dr
    virial_half = 0.5 * fmag * r
    return f, virial_half


def special_weight(tag_i: Array, tag_j: Array, params: DPDParams) -> Array:
    """Pairwise special_bonds weight: excl_w where tag_j is in tag_i's
    exclusion list, else 1. Shapes broadcast like tag_i/tag_j."""
    if params.excl is None:
        return jnp.ones(jnp.broadcast_shapes(tag_i.shape, tag_j.shape),
                        jnp.float32)
    ex = params.excl[tag_i]                      # (..., E)
    hit = jnp.any(ex == tag_j[..., None], axis=-1)
    return jnp.where(hit, params.excl_w, 1.0).astype(jnp.float32)


def build_exclusions(bond_tags, n_tags: int, weight: float = 0.0,
                     max_excl: int = 6):
    """Host-side: per-tag exclusion lists from a (NB,2) bond-tag table."""
    import numpy as np
    ex = np.zeros((n_tags + 1, max_excl), np.int32)
    cnt = np.zeros(n_tags + 1, np.int32)
    for a, b in np.asarray(bond_tags):
        if a <= 0:
            continue
        for (s, t) in ((a, b), (b, a)):
            if cnt[s] >= max_excl:
                raise ValueError(f"tag {s}: more than {max_excl} exclusions")
            ex[s, cnt[s]] = t
            cnt[s] += 1
    return jnp.asarray(ex), jnp.asarray(weight, jnp.float32)


def _theta_dense(tag: Array, step: Array, params: DPDParams,
                 rng_mode: str, rng_rounds: int) -> Array:
    """(N, N) symmetric noise matrix for the dense path."""
    if rng_mode == "tea":
        return rngmod.pair_uniform_tea(tag[:, None], tag[None, :], step,
                                       params.seed, rounds=rng_rounds)
    elif rng_mode == "fast":
        h = rngmod.particle_hash(tag, step, params.seed, rounds=rng_rounds)
        return rngmod.pair_uniform_fast(h[:, None], h[None, :])
    raise ValueError(f"unknown rng_mode {rng_mode!r}")


def nlist_forces(x: Array, v: Array, typ: Array, tag: Array, mask: Array,
                 box: Box, step: Array, params: DPDParams, dt: float,
                 nlist_idx: Array, rng_mode: str = "tea", rng_rounds: int = 8):
    """O(N*M) force evaluation over a padded full neighbor matrix.

    The per-step analog of the reference pair kernel's neighbor-list loop
    (``pair_dpd_meso.cu``, SURVEY.md §3.3): one writer per particle, RNG
    recomputed per pair from tags. Lists carry pairs out to rc+skin; the
    per-pair cutoff test inside ``pair_force`` zeroes the skin shell.
    """
    n = x.shape[0]
    valid = nlist_idx < n
    j = jnp.minimum(nlist_idx, n - 1)               # (N, M)
    dr = box.min_image(x[:, None, :] - x[j])
    vij = v[:, None, :] - v[j]
    tag_j = tag[j]
    if rng_mode == "tea":
        theta = rngmod.pair_uniform_tea(tag[:, None], tag_j, step,
                                        params.seed, rounds=rng_rounds)
    elif rng_mode == "fast":
        h = rngmod.particle_hash(tag, step, params.seed, rounds=rng_rounds)
        theta = rngmod.pair_uniform_fast(h[:, None], h[j])
    else:
        raise ValueError(f"unknown rng_mode {rng_mode!r}")
    typ_j = typ[j]
    ti = typ[:, None]
    a = params.a[ti, typ_j]
    gamma = params.gamma[ti, typ_j]
    sigma = params.sigma[ti, typ_j]
    rc = jnp.where(valid & mask[:, None], params.rc[ti, typ_j], 0.0)
    dt_inv_sqrt = jnp.float32(1.0 / jnp.sqrt(dt))
    f_pair, vir_half = pair_force(dr, vij, theta, a, gamma, sigma, rc,
                                  dt_inv_sqrt, params.s_exp)
    if params.excl is not None:
        w_sp = special_weight(tag[:, None], tag_j, params)
        f_pair = f_pair * w_sp[..., None]
        vir_half = vir_half * w_sp
    f = jnp.sum(f_pair, axis=1)
    virial = jnp.sum(vir_half)
    return f, virial


@partial(jax.jit, static_argnames=("rng_mode", "rng_rounds"))
def dense_forces(x: Array, v: Array, typ: Array, tag: Array, mask: Array,
                 box: Box, step: Array, params: DPDParams, dt: float,
                 rng_mode: str = "tea", rng_rounds: int = 8):
    """O(N^2) reference force evaluation (the CPU ground-truth oracle,
    SURVEY.md §4 'CPU cross-validation').

    Returns (f, virial, n_neighbors) where virial is the scalar pair virial
    sum_i 0.5 sum_j dr.F and n_neighbors the per-particle within-cutoff count
    (diagnostics for the cell-list path).
    """
    dr = box.min_image(x[:, None, :] - x[None, :, :])          # (N,N,3)
    vij = v[:, None, :] - v[None, :, :]
    theta = _theta_dense(tag, step, params, rng_mode, rng_rounds)
    a = params.a[typ[:, None], typ[None, :]]
    gamma = params.gamma[typ[:, None], typ[None, :]]
    sigma = params.sigma[typ[:, None], typ[None, :]]
    rc = params.rc[typ[:, None], typ[None, :]]
    valid = (mask[:, None] & mask[None, :]) & ~jnp.eye(x.shape[0], dtype=bool)
    rc = jnp.where(valid, rc, 0.0)  # rc=0 disables the pair in pair_force
    dt_inv_sqrt = jnp.float32(1.0 / jnp.sqrt(dt))
    f_pair, vir_half = pair_force(dr, vij, theta, a, gamma, sigma, rc,
                                  dt_inv_sqrt, params.s_exp)
    if params.excl is not None:
        w_sp = special_weight(tag[:, None], tag[None, :], params)
        f_pair = f_pair * w_sp[..., None]
        vir_half = vir_half * w_sp
    f = jnp.sum(f_pair, axis=1)
    virial = jnp.sum(vir_half)
    r2 = jnp.sum(dr * dr, axis=-1)
    n_neigh = jnp.sum(valid & (r2 < rc * rc) & (r2 > 0.0), axis=1)
    return f, virial, n_neigh

"""Spatial profile observables — `fix ave/chunk` analog (SURVEY.md §5.5).

Bin particles along one coordinate and accumulate per-bin density, mean
velocity, kinetic temperature, or concentration — used for the
Poiseuille/Couette velocity profiles, eDPD Fourier slab, and tDPD diffusion
validations (BASELINE configs 2-4). Pure masked segment-sums, jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def bin_index(x: Array, axis: int, lo, hi, nbins: int) -> Array:
    t = (x[:, axis] - lo) / (hi - lo)
    return jnp.clip((t * nbins).astype(jnp.int32), 0, nbins - 1)


def profile(x: Array, weights: Array, mask: Array, axis: int, lo, hi,
            nbins: int):
    """Returns (count per bin, sum of weights per bin).

    ``weights`` may be (N,) or (N, D) — e.g. velocities for a flow profile,
    m*v^2 for temperature, C for concentration.
    """
    idx = bin_index(x, axis, lo, hi, nbins)
    idx = jnp.where(mask, idx, nbins)  # masked rows -> overflow bin
    cnt = jnp.zeros((nbins + 1,), jnp.float32).at[idx].add(1.0)[:nbins]
    w = weights if weights.ndim > 1 else weights[:, None]
    w = jnp.where(mask[:, None], w, 0.0)
    acc = jnp.zeros((nbins + 1, w.shape[1]), jnp.float32).at[idx].add(w)[:nbins]
    return cnt, acc


def velocity_profile(state, axis: int, flow_axis: int, nbins: int,
                     typ: int | None = None):
    """Mean flow velocity vs coordinate (Poiseuille/Couette validation)."""
    mask = state.mask if typ is None else (state.mask & (state.typ == typ))
    lo = state.box.lo[axis]
    hi = state.box.hi[axis]
    cnt, acc = profile(state.x, state.v[:, flow_axis], mask, axis, lo, hi,
                       nbins)
    centers = lo + (jnp.arange(nbins) + 0.5) * (hi - lo) / nbins
    return centers, acc[:, 0] / jnp.maximum(cnt, 1.0), cnt


def temperature_profile(state, mass, axis: int, nbins: int,
                        typ: int | None = None, subtract_flow: bool = True):
    """Per-bin kinetic temperature (eDPD Fourier slab validation).

    With ``subtract_flow`` the per-bin mean velocity is removed first
    (thermal temperature, not flow kinetic energy).
    """
    mask = state.mask if typ is None else (state.mask & (state.typ == typ))
    lo = state.box.lo[axis]
    hi = state.box.hi[axis]
    cnt, mv = profile(state.x, mass[:, None] * state.v, mask, axis, lo, hi,
                      nbins)
    _, mv2 = profile(state.x, mass * jnp.sum(state.v ** 2, -1), mask, axis,
                     lo, hi, nbins)
    _, msum = profile(state.x, mass, mask, axis, lo, hi, nbins)
    cnt_safe = jnp.maximum(cnt, 1.0)
    if subtract_flow:
        vbar = mv / jnp.maximum(msum, 1e-9)
        flow2 = jnp.sum(vbar ** 2, -1) * msum[:, 0]
        kt = (mv2[:, 0] - flow2) / (3.0 * cnt_safe)
    else:
        kt = mv2[:, 0] / (3.0 * cnt_safe)
    centers = lo + (jnp.arange(nbins) + 0.5) * (hi - lo) / nbins
    return centers, kt, cnt


def field_profile(state, field: Array, axis: int, nbins: int,
                  typ: int | None = None):
    """Mean of a per-particle field vs coordinate (eDPD T, tDPD C)."""
    mask = state.mask if typ is None else (state.mask & (state.typ == typ))
    lo = state.box.lo[axis]
    hi = state.box.hi[axis]
    cnt, acc = profile(state.x, field, mask, axis, lo, hi, nbins)
    centers = lo + (jnp.arange(nbins) + 0.5) * (hi - lo) / nbins
    return centers, acc / jnp.maximum(cnt, 1.0)[:, None], cnt

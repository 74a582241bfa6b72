"""Per-particle virial and stress profiles — `compute stress/atom` +
`fix ave/chunk` analogs (SURVEY.md §2a row 9/§5.5).

Uses the generic bucket sweep to obtain each particle's half-virial sum
(0.5 sum_j r_ij . F_ij), from which the local pressure profile follows:
P(bin) = [sum_i m v_i^2 + sum_i w_i] / (3 V_bin).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from meso_tpu.core import rng as rngmod
from meso_tpu.core.state import State
from meso_tpu.core.system import System, SystemParams
from meso_tpu.obs.profiles import profile

Array = jax.Array


def per_particle_virial(system: System, params: SystemParams,
                        state: State) -> Array:
    """(N,) half-virial per particle on the bucket layout (classic DPD)."""
    from meso_tpu.ops.sweep import classic_pair_fn, make_channels, sweep

    cfg = system.cells
    nx, ny, nz = cfg.ncell
    nr = state.n
    h = rngmod.particle_hash(state.tag, state.step, params.pair.seed,
                             rounds=system.rng_rounds)
    channels = make_channels(state.x, state.v, state.tag, state.mask, h, {},
                             cfg.ncell, cfg.capacity)
    acc = sweep(channels, cfg.ncell, cfg.capacity, (False, False, False),
                state.box.lengths, classic_pair_fn(params.pair, system.dt),
                4)
    return acc[3].reshape(nr)


def pressure_profile(system: System, params: SystemParams, state: State,
                     axis: int, nbins: int):
    """(bin centers, P(bin)) — local pressure along one axis."""
    w = per_particle_virial(system, params, state)
    mass = params.mass[state.typ]
    ke2 = mass * jnp.sum(state.v ** 2, -1)
    lo = state.box.lo[axis]
    hi = state.box.hi[axis]
    cnt, acc = profile(state.x, ke2 + w, state.mask, axis, lo, hi, nbins)
    v_bin = state.box.volume / nbins
    centers = lo + (jnp.arange(nbins) + 0.5) * (hi - lo) / nbins
    return centers, acc[:, 0] / (3.0 * v_bin)

"""Configs 3-4 — eDPD slab conduction and tDPD diffusion
(BASELINE.json configs[2], configs[3]; SURVEY.md A.2-A.3).

eDPD slab: periodic box, thermostatted hot/cold slabs (FixRegionT resets
per-particle T inside the slabs each step) -> steady linear Fourier profile
between them.

tDPD diffusion: periodic box, initial concentration step (or cosine mode);
the fundamental Fourier mode decays exponentially with an effective
diffusivity; total concentration is conserved exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.core.system import System, SystemParams, setup
from meso_tpu.ops.edpd import EDPDParams
from meso_tpu.ops.tdpd import TDPDParams


@dataclass(frozen=True)
class FixRegionT:
    """Clamp per-particle internal temperature inside two slabs along
    ``axis`` — the eDPD Fourier-slab boundary condition."""

    axis: int = 0
    hot_lo: float = 0.0
    hot_hi: float = 1.0
    cold_lo: float = 0.0
    cold_hi: float = 1.0
    t_hot: float = 1.2
    t_cold: float = 0.8

    def end_of_step(self, system, params, state):
        xa = state.x[:, self.axis]
        in_hot = (xa >= self.hot_lo) & (xa < self.hot_hi) & state.mask
        in_cold = (xa >= self.cold_lo) & (xa < self.cold_hi) & state.mask
        t = jnp.where(in_hot, self.t_hot,
                      jnp.where(in_cold, self.t_cold, state.T))
        return state.replace(T=t)


def edpd_slab(l: float = 8.0, density: float = 3.0, kt: float = 1.0,
              a: float = 25.0, gamma: float = 4.5, rc: float = 1.0,
              kappa: float = 1.0, cv: float = 100.0, t_hot: float = 1.2,
              t_cold: float = 0.8, slab_w: float = 1.0, dt: float = 0.01,
              seed: int = 331, init_seed: int = 3,
              force_path: str = "dense", skin: float = 0.3):
    """Hot slab at x in [0, w), cold slab at [L/2, L/2+w): two half-channels
    by periodicity. Returns (system, params, state)."""
    box = Box.cubic(l)
    n = int(round(density * l ** 3))
    state = create_random(jax.random.PRNGKey(init_seed), n, box, kt=kt,
                          with_energy=True)
    state = state.replace(T=jnp.full((n,), kt, jnp.float32))
    pair = EDPDParams.build(a=a, gamma=gamma, rc=rc, kappa=kappa, cv=cv,
                            seed=seed)
    params = SystemParams.build_raw(pair)
    fix = FixRegionT(axis=0, hot_lo=0.0, hot_hi=slab_w,
                     cold_lo=l / 2, cold_hi=l / 2 + slab_w,
                     t_hot=t_hot, t_cold=t_cold)
    system = System.for_fluid([l] * 3, rc=rc, density=density, dt=dt,
                              spill=force_path == "pallas",
                              skin=skin, rng_mode="fast")
    system = system.replace(model="edpd", force_path=force_path, fixes=(fix,))
    return system, params, setup(system, params, state)


def tdpd_diffusion(l: float = 8.0, density: float = 3.0, kt: float = 1.0,
                   a: float = 25.0, gamma: float = 4.5, rc: float = 1.0,
                   kappa_c: float = 2.0, eps_c: float = 0.0,
                   rcc: float = 1.0, dt: float = 0.01, seed: int = 441,
                   init_seed: int = 4, force_path: str = "dense",
                   skin: float = 0.3, profile: str = "cosine"):
    """Single-species tDPD with an initial cosine concentration mode along x.
    Returns (system, params, state)."""
    box = Box.cubic(l)
    n = int(round(density * l ** 3))
    state = create_random(jax.random.PRNGKey(init_seed), n, box, kt=kt,
                          n_species=1)
    if profile == "cosine":
        c0 = 1.0 + 0.5 * jnp.cos(2 * jnp.pi * state.x[:, 0] / l)
    else:  # step
        c0 = jnp.where(state.x[:, 0] < l / 2, 1.5, 0.5)
    state = state.replace(C=c0[:, None])
    pair = TDPDParams.build(a=a, gamma=gamma, rc=rc, kt=kt,
                            kappa_c=[kappa_c], eps_c=[eps_c], rcc=rcc,
                            seed=seed)
    params = SystemParams.build_raw(pair)
    system = System.for_fluid([l] * 3, rc=rc, density=density, dt=dt,
                              spill=force_path == "pallas",
                              skin=skin, rng_mode="fast")
    system = system.replace(model="tdpd", force_path=force_path)
    return system, params, setup(system, params, state)

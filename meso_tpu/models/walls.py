"""Config 2 — Poiseuille/Couette flow between frozen-particle walls
(BASELINE.json configs[1], SURVEY.md A.5).

Geometry: periodic box; wall slabs (type 1, frozen) at y < w and y > H - w,
fluid (type 0) in the channel [w, H - w]; bounce-back planes at the two
fluid-wall interfaces. Poiseuille adds a body force g along x on the fluid;
Couette assigns the walls velocities +/- U/2 along x and translates them.

Validation: u(y) = rho g / (2 eta) (y - w)(H - w - y) for Poiseuille
(viscosity from the parabola), linear profile for Couette.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.core.system import System, SystemParams, setup
from meso_tpu.ops.dpd import DPDParams
from meso_tpu.ops.fixes import FixBodyForce, FixBounceBack, FixWallMove


def _channel(lx: float, h: float, lz: float, wall_width: float,
             density: float, kt: float, a, gamma, rc, dt, seed, init_seed,
             force_path: str, rng_mode: str, skin: float):
    box = Box.orthorhombic(lx, h, lz)
    n = int(round(density * lx * h * lz))
    state = create_random(jax.random.PRNGKey(init_seed), n, box, kt=kt)
    in_wall = (state.x[:, 1] < wall_width) | (state.x[:, 1] > h - wall_width)
    typ = jnp.where(in_wall, 1, 0).astype(jnp.int32)
    # wall beads start at rest (Poiseuille) — Couette overrides below
    v = jnp.where(in_wall[:, None], 0.0, state.v)
    state = state.replace(typ=typ, v=v)
    params = SystemParams.build(
        DPDParams.build(a=a, gamma=gamma, rc=rc, kt=kt, seed=seed, n_types=2))
    system = System.for_fluid([lx, h, lz], rc=rc, density=density, dt=dt,
                              skin=skin, rng_mode=rng_mode)
    if force_path != "nlist":
        system = system.replace(force_path=force_path)
    return box, state, params, system


def poiseuille(lx: float = 10.0, h: float = 6.0, lz: float = 10.0,
               wall_width: float = 1.0, density: float = 3.0, g: float = 0.1,
               kt: float = 1.0, a: float = 25.0, gamma: float = 4.5,
               rc: float = 1.0, dt: float = 0.01, seed: int = 7771,
               init_seed: int = 1, force_path: str = "nlist",
               rng_mode: str = "fast", skin: float = 0.3):
    """Body-force-driven channel flow. Returns (system, params, state)."""
    box, state, params, system = _channel(
        lx, h, lz, wall_width, density, kt, a, gamma, rc, dt, seed,
        init_seed, force_path, rng_mode, skin)
    system = system.replace(
        frozen_types=(1,),
        fixes=(FixBodyForce(fx=g, typ=0),
               FixBounceBack(axis=1, lo=wall_width, hi=h - wall_width)))
    return system, params, setup(system, params, state)


def couette(u: float = 1.0, lx: float = 10.0, h: float = 6.0,
            lz: float = 10.0, wall_width: float = 1.0, density: float = 3.0,
            kt: float = 1.0, a: float = 25.0, gamma: float = 4.5,
            rc: float = 1.0, dt: float = 0.01, seed: int = 7772,
            init_seed: int = 2, force_path: str = "nlist",
            rng_mode: str = "fast", skin: float = 0.3):
    """Shear flow: lower wall -U/2, upper wall +U/2 along x."""
    box, state, params, system = _channel(
        lx, h, lz, wall_width, density, kt, a, gamma, rc, dt, seed,
        init_seed, force_path, rng_mode, skin)
    lower = (state.typ == 1) & (state.x[:, 1] < h * 0.5)
    upper = (state.typ == 1) & ~lower
    v = state.v
    v = jnp.where(lower[:, None],
                  jnp.asarray([-u / 2, 0.0, 0.0], v.dtype), v)
    v = jnp.where(upper[:, None],
                  jnp.asarray([u / 2, 0.0, 0.0], v.dtype), v)
    state = state.replace(v=v)
    system = system.replace(
        frozen_types=(1,),
        fixes=(FixBounceBack(axis=1, lo=wall_width, hi=h - wall_width,
                             u_lo=(-u / 2, 0.0, 0.0),
                             u_hi=(u / 2, 0.0, 0.0)),
               FixWallMove(typ=1)))
    return system, params, setup(system, params, state)

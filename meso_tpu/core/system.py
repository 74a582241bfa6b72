"""System definition and the jitted timestep — the `Verlet::run` analog.

The reference drives a step loop in C++ calling GPU kernels per stage
(``src/verlet.cpp`` + MESO fixes; SURVEY.md §3.2). The TPU-native design
instead composes the whole step as ONE pure function

    state' = step(params, state)

and runs chunks of steps under ``lax.scan`` so thousands of steps execute
with zero host round-trips (SURVEY.md §7.0). Hook order mirrors the
reference's Modify pipeline: initial_integrate -> post_integrate ->
forces -> post_force -> final_integrate -> end_of_step (§2a row 9).

``System`` is the *static* configuration (hashable; participates in jit
specialization); ``SystemParams`` is the pytree of coefficient arrays.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from meso_tpu.core.box import Box
from meso_tpu.core.integrate import initial_integrate, final_integrate
from meso_tpu.core.state import State
from meso_tpu.ops.dpd import DPDParams, dense_forces

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SystemParams:
    """All coefficient arrays: pair tables + per-type masses."""

    pair: DPDParams
    mass: Array       # (T,) per-type mass
    inv_mass: Array   # (T,) 1/mass

    @staticmethod
    def build(pair: DPDParams, mass=1.0) -> "SystemParams":
        n_types = pair.a.shape[0]
        m = jnp.asarray(mass, jnp.float32)
        if m.ndim == 0:
            m = jnp.full((n_types,), m)
        return SystemParams(pair=pair, mass=m, inv_mass=1.0 / m)

    def replace(self, **kw) -> "SystemParams":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class System:
    """Static simulation configuration (the input-deck analog, SURVEY.md §5.6)."""

    dt: float = 0.01
    lam: float = 0.5              # Groot-Warren lambda (0.65 for large dt)
    rng_mode: str = "tea"         # "tea" (reference parity) | "fast"
    rng_rounds: int = 8
    force_path: str = "dense"     # "dense" | "cells" | "pallas"
    frozen_types: Tuple[int, ...] = ()   # wall particle types: forces yes, motion no
    fixes: Tuple[Any, ...] = ()          # post-integrate/post-force hook objects

    def replace(self, **kw) -> "System":
        return dataclasses.replace(self, **kw)


def _move_mask(system: System, typ: Array, mask: Array) -> Array:
    mm = mask
    for t in system.frozen_types:
        mm = mm & (typ != t)
    return mm


def compute_forces(system: System, params: SystemParams, state: State,
                   x: Array, v: Array, step: Array):
    """Dispatch to the configured force path. Returns (f, aux dict)."""
    if system.force_path == "dense":
        f, virial, _ = dense_forces(
            x, v, state.typ, state.tag, state.mask, state.box, step,
            params.pair, system.dt,
            rng_mode=system.rng_mode, rng_rounds=system.rng_rounds)
        return f, {"virial": virial}
    raise ValueError(f"unknown force_path {system.force_path!r}")


def make_step(system: System):
    """Build the pure one-step function for this system."""

    def step_fn(params: SystemParams, state: State) -> State:
        inv_m = params.inv_mass[state.typ]
        move = _move_mask(system, state.typ, state.mask)
        new_step = state.step + 1

        # --- initial_integrate (predictor + drift) ---
        x1, image1, v_tilde = initial_integrate(
            state.x, state.v, state.f, state.image, state.box,
            system.dt, system.lam, inv_m, move)

        # --- post_integrate fixes (bounce-back walls etc.) ---
        for fx in system.fixes:
            if hasattr(fx, "post_integrate"):
                x1, image1, v_tilde = fx.post_integrate(
                    system, params, state, x1, image1, v_tilde)

        # --- force evaluation at (x', v~), RNG counter = new step ---
        f_new, aux = compute_forces(system, params, state, x1, v_tilde, new_step)

        # --- post_force fixes (body force etc.) ---
        for fx in system.fixes:
            if hasattr(fx, "post_force"):
                f_new = fx.post_force(system, params, state, x1, v_tilde, f_new)

        # --- final_integrate (corrector) ---
        v1 = final_integrate(state.v, state.f, f_new, system.dt, inv_m, move)

        new_state = state.replace(x=x1, v=v1, f=f_new, image=image1,
                                  step=new_step)

        # --- end_of_step fixes ---
        for fx in system.fixes:
            if hasattr(fx, "end_of_step"):
                new_state = fx.end_of_step(system, params, new_state)
        return new_state

    return step_fn


def setup(system: System, params: SystemParams, state: State) -> State:
    """Initial force evaluation (Verlet::setup analog, SURVEY.md §3.1)."""
    f0, _ = compute_forces(system, params, state, state.x, state.v, state.step)
    return state.replace(f=f0)


@partial(jax.jit, static_argnames=("system", "nsteps"))
def run_chunk(system: System, params: SystemParams, state: State,
              nsteps: int) -> State:
    """Advance `nsteps` steps under one lax.scan (zero host round-trips)."""
    step_fn = make_step(system)

    def body(s, _):
        return step_fn(params, s), None

    state, _ = jax.lax.scan(body, state, None, length=nsteps)
    return state

"""Debug validation — cell-list completeness against the O(N^2) oracle
(SURVEY.md §5.2): on demand, recompute the configured force path AND the
dense reference on the same state and report the deviation. Run it when a
checked invariant fires or physics looks off; O(N^2), so validation-scale
states only.
"""

from __future__ import annotations

import jax.numpy as jnp

from meso_tpu.core.state import State
from meso_tpu.core.system import System, SystemParams, compute_forces
from meso_tpu.ops.dpd import dense_forces


def validate_forces(system: System, params: SystemParams,
                    state: State) -> dict:
    """Returns {'max_abs': .., 'max_rel': .., 'scale': ..} between the
    configured classic-DPD force path and the dense oracle at this state."""
    if system.model != "dpd":
        raise NotImplementedError("validate_forces: classic DPD only")
    f_path, _ = compute_forces(system, params, state, state.x, state.v,
                               state.step)
    f_ref, _, _ = dense_forces(
        state.x, state.v, state.typ, state.tag, state.mask, state.box,
        state.step, params.pair, system.dt,
        rng_mode=system.rng_mode, rng_rounds=system.rng_rounds)
    m = state.mask[:, None]
    diff = jnp.abs(jnp.where(m, f_path - f_ref, 0.0))
    scale = jnp.max(jnp.abs(jnp.where(m, f_ref, 0.0)))
    return {"max_abs": float(jnp.max(diff)),
            "max_rel": float(jnp.max(diff) / jnp.maximum(scale, 1e-12)),
            "scale": float(scale)}

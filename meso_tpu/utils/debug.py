"""Debug validation — cell-list completeness against the O(N^2) oracle
(SURVEY.md §5.2): on demand, recompute the configured force path AND the
dense reference on the same state and report the deviation. Run it when a
checked invariant fires or physics looks off; O(N^2), so validation-scale
states only.

Covers every model path (VERDICT r2 missing #7): classic DPD, eDPD (force +
dTdt), tDPD (force + dCdt), and bonded systems (pair path with
special_bonds exclusions, plus bonded-term invariants: all partners
resolved, zero net momentum, finite).
"""

from __future__ import annotations

import jax.numpy as jnp

from meso_tpu.core.state import State
from meso_tpu.core.system import System, SystemParams, compute_forces
from meso_tpu.ops.dpd import dense_forces


def _dev(name, got, ref, mask):
    m = mask if got.ndim == 1 else mask[..., None]
    diff = jnp.abs(jnp.where(m, got - ref, 0.0))
    scale = jnp.max(jnp.abs(jnp.where(m, ref, 0.0)))
    return {f"{name}_max_abs": float(jnp.max(diff)),
            f"{name}_max_rel": float(jnp.max(diff)
                                     / jnp.maximum(scale, 1e-12)),
            f"{name}_scale": float(scale)}


def validate_forces(system: System, params: SystemParams,
                    state: State) -> dict:
    """Deviation of the configured force path from the dense O(N^2) oracle
    at this state. Keys: f_max_abs / f_max_rel / f_scale, plus
    dTdt_* (eDPD), dCdt_* (tDPD), bonded_* (bonded styles)."""
    out: dict = {}
    mask = state.mask
    nlist_idx = None
    if system.force_path == "nlist":
        from meso_tpu.core.system import rebuild
        state, nlist_idx, _, _ = rebuild(system, state)
        mask = state.mask
    if system.model == "edpd":
        from meso_tpu.ops.edpd import dense_forces_edpd
        f_path, aux = compute_forces(system, params, state, state.x,
                                     state.v, state.step,
                                     nlist_idx=nlist_idx, t=state.T)
        f_ref, dtdt_ref, _ = dense_forces_edpd(
            state.x, state.v, state.T, state.typ, state.tag, mask,
            state.box, state.step, params.pair, system.dt,
            rng_rounds=system.rng_rounds, rng_mode=system.rng_mode)
        out.update(_dev("f", f_path, f_ref, mask))
        out.update(_dev("dTdt", aux["dTdt"], dtdt_ref, mask))
    elif system.model == "tdpd":
        from meso_tpu.ops.tdpd import dense_forces_tdpd
        f_path, aux = compute_forces(system, params, state, state.x,
                                     state.v, state.step,
                                     nlist_idx=nlist_idx, c=state.C)
        f_ref, dcdt_ref, _ = dense_forces_tdpd(
            state.x, state.v, state.C, state.typ, state.tag, mask,
            state.box, state.step, params.pair, system.dt,
            rng_rounds=system.rng_rounds, rng_mode=system.rng_mode)
        out.update(_dev("f", f_path, f_ref, mask))
        out.update(_dev("dCdt", aux["dCdt"], dcdt_ref, mask))
    else:
        f_path, _ = compute_forces(system, params, state, state.x, state.v,
                                   state.step, nlist_idx=nlist_idx)
        f_ref, _, _ = dense_forces(
            state.x, state.v, state.typ, state.tag, mask, state.box,
            state.step, params.pair, system.dt,
            rng_mode=system.rng_mode, rng_rounds=system.rng_rounds)
        out.update(_dev("f", f_path, f_ref, mask))

    if system.bond_style is not None and params.bonded is not None:
        # bonded terms are deterministic tag-space sums; the production
        # failure modes are tag-map corruption and missing partners. Check
        # (a) every term resolved (missing == 0), (b) Newton's third law:
        # the bonded force field must carry zero net momentum, (c) finite.
        from meso_tpu.ops.bonded import bonded_forces_ext
        fb, missing = bonded_forces_ext(
            state.x, state.tag, mask, state.box, params.bonded,
            system.bond_style, system.n_tags, system.n_mols,
            image=state.image)
        fb = jnp.where(mask[:, None], fb, 0.0)
        scale = jnp.maximum(jnp.max(jnp.abs(fb)), 1e-12)
        out["bonded_missing"] = int(missing)
        out["bonded_momentum_rel"] = float(
            jnp.max(jnp.abs(jnp.sum(fb, axis=0))) / scale)
        out["bonded_finite"] = bool(jnp.isfinite(fb).all())

    # backwards-compatible aliases (r1/r2 key names)
    out["max_abs"] = out["f_max_abs"]
    out["max_rel"] = out["f_max_rel"]
    out["scale"] = out["f_scale"]
    return out

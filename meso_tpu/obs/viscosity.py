"""Müller-Plathe reverse-NEMD viscosity (SURVEY.md §2a row 15:
``fix viscosity``; Müller-Plathe, PRE 59, 4894 (1999)).

Momentum is swapped between the extremal particles of two slabs, imposing a
known momentum flux; the fluid answers with a linear velocity profile whose
slope gives the shear viscosity eta = j / (2 |dv/dz|), with j = P/(2 t A)
(the factor 2s: the flux crosses two slab interfaces under PBC, and each
swap moves 2x the single-particle momentum difference... we follow the
standard bookkeeping: P = sum of m*(v_hot - v_cold) over swaps, crossing
area A = Lx*Ly twice).

Host-chunked by design — the swap is a tiny jitted op between production
chunks (the same pattern as the thermo/diag loop), so the hot loop stays
fused.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from meso_tpu.core.state import State

Array = jax.Array


@partial(jax.jit, static_argnames=("flow_axis", "grad_axis", "nbins"))
def muller_plathe_swap(state: State, mass: Array, flow_axis: int = 0,
                       grad_axis: int = 2, nbins: int = 20):
    """Swap the flow-velocity of the most-negative mover in slab 0 with the
    most-positive mover in the middle slab. Returns (state, dp) where dp is
    the momentum transferred this swap (>= 0 once the profile develops)."""
    lo = state.box.lo[grad_axis]
    lz = state.box.lengths[grad_axis]
    z = state.x[:, grad_axis] - lo
    wbin = lz / nbins
    vx = state.v[:, flow_axis]
    in0 = state.mask & (z < wbin)
    inm = state.mask & (z >= lz / 2) & (z < lz / 2 + wbin)
    big = jnp.float32(1e30)
    i0 = jnp.argmin(jnp.where(in0, vx, big))          # most negative in slab0
    im = jnp.argmax(jnp.where(inm, vx, -big))         # most positive in mid
    v0, vm = vx[i0], vx[im]
    do = in0[i0] & inm[im] & (vm > v0)                # only productive swaps
    new_vx = vx.at[i0].set(jnp.where(do, vm, v0)).at[im].set(
        jnp.where(do, v0, vm))
    v = state.v.at[:, flow_axis].set(new_vx)
    m = 0.5 * (mass[i0] + mass[im])                   # equal-mass in practice
    dp = jnp.where(do, m * (vm - v0), 0.0)
    return state.replace(v=v), dp


def run_viscosity_mp(system, params, state, nswaps: int, swap_every: int,
                     flow_axis: int = 0, grad_axis: int = 2,
                     nbins: int = 20, warmup_frac: float = 0.5):
    """Drive the MP experiment on the bucket production loop and return
    (eta, details). ``swap_every`` steps run between swaps."""
    import numpy as np

    from meso_tpu.core.system import run_bucket_chunked
    from meso_tpu.obs.profiles import velocity_profile

    every = system.cells.rebuild_every
    nchunks = max(swap_every // every, 1)
    mass = params.mass[state.typ]
    p_total = 0.0
    n_measured = 0
    for s in range(nswaps):
        state, diag = run_bucket_chunked(system, params, state, nchunks,
                                         every)
        state, dp = muller_plathe_swap(state, mass, flow_axis, grad_axis,
                                       nbins)
        if s >= int(nswaps * warmup_frac):
            p_total += float(dp)
            n_measured += 1
    t_measured = n_measured * nchunks * every * system.dt
    lens = np.asarray(state.box.lengths)
    area = float(np.prod([lens[a] for a in range(3) if a != grad_axis]))
    j = p_total / (2.0 * t_measured * area)

    # slope from the two linear branches of the steady profile
    zc, vprof, _ = velocity_profile(state, axis=grad_axis,
                                    flow_axis=flow_axis, nbins=nbins)
    zc, vprof = np.asarray(zc), np.asarray(vprof)
    half = nbins // 2
    # branch between slab 0 (min v) and mid slab (max v), excluding the
    # swap slabs themselves
    sl = slice(1, half)
    slope = np.polyfit(zc[sl], vprof[sl], 1)[0]
    eta = j / abs(slope)
    return eta, {"flux": j, "slope": float(slope), "p_total": p_total,
                 "t": t_measured, "profile": (zc, vprof)}

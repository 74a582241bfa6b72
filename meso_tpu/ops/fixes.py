"""Fixes — per-step extension hooks (SURVEY.md §2a row 9, §2b row 26, A.5).

TPU-native analogs of the reference's Modify/Fix pipeline. Each fix is a
frozen dataclass of static floats/ints (participates in jit specialization
via System.fixes) whose hook methods are pure array transforms:

* ``post_integrate(system, params, state, x, image, v_tilde)`` -> same triple
* ``post_force(system, params, state, x, v_tilde, f)`` -> f
* ``end_of_step(system, params, state)`` -> state

Hook order inside the step mirrors the reference (SURVEY.md §3.2).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class FixBodyForce:
    """`fix addforce`/gravity analog: constant extra force on mobile
    particles (optionally one type) — drives Poiseuille flow (A.5)."""

    fx: float = 0.0
    fy: float = 0.0
    fz: float = 0.0
    typ: Optional[int] = None

    def post_force(self, system, params, state, x, v_tilde, f):
        add = jnp.asarray([self.fx, self.fy, self.fz], f.dtype)
        sel = state.mask
        if self.typ is not None:
            sel = sel & (state.typ == self.typ)
        for t in system.frozen_types:
            sel = sel & (state.typ != t)
        return jnp.where(sel[:, None], f + add, f)


@dataclass(frozen=True)
class FixBounceBack:
    """Bounce-back reflection at two planes normal to ``axis`` (A.5):
    a mobile particle that crossed ``lo`` (from above) or ``hi`` (from
    below) is mirrored across the plane and its velocity negated — no-slip
    without density artifacts (used with frozen-particle walls,
    reference ``fix_bounce_back_meso.cu`` expected path, row 26).

    Applied once per step, end_of_step, on (x, v) after the corrector — the
    one-step overshoot sits inside the frozen-wall slab where forces remain
    valid (same guarantee as the reference fix).
    """

    axis: int = 1
    lo: float = 0.0
    hi: float = 1.0
    # wall velocities (flow frame): reflection is v -> 2 u_wall - v so a
    # moving wall (Couette) imposes its own velocity, not zero
    u_lo: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    u_hi: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    def _reflect(self, x, v, mobile):
        xa = x[:, self.axis]
        below = mobile & (xa < self.lo)
        above = mobile & (xa > self.hi)
        xr = jnp.where(below, 2.0 * self.lo - xa,
                       jnp.where(above, 2.0 * self.hi - xa, xa))
        x = x.at[:, self.axis].set(xr)
        ulo = jnp.asarray(self.u_lo, v.dtype)
        uhi = jnp.asarray(self.u_hi, v.dtype)
        v = jnp.where(below[:, None], 2.0 * ulo - v,
                      jnp.where(above[:, None], 2.0 * uhi - v, v))
        return x, v

    def _mobile(self, system, state):
        m = state.mask
        for t in system.frozen_types:
            m = m & (state.typ != t)
        return m

    def end_of_step(self, system, params, state):
        x, v = self._reflect(state.x, state.v, self._mobile(system, state))
        return state.replace(x=x, v=v)


@dataclass(frozen=True)
class FixWallMove:
    """Couette moving wall: translate frozen wall particles by their
    (constant) velocity each step — shear without integrating wall forces."""

    typ: int

    def post_integrate(self, system, params, state, x, image, v_tilde):
        sel = (state.typ == self.typ) & state.mask
        xn = x + system.dt * state.v
        xn, imn = state.box.wrap(xn, image)
        x = jnp.where(sel[:, None], xn, x)
        image = jnp.where(sel[:, None], imn, image)
        return x, image, v_tilde


@dataclass(frozen=True)
class FixMomentumZero:
    """`fix momentum` analog: periodically remove center-of-mass drift."""

    every: int = 100

    def end_of_step(self, system, params, state):
        do = (state.step % self.every) == 0
        mass = params.mass[state.typ]
        mv = jnp.where(state.mask[:, None], mass[:, None] * state.v, 0.0)
        m_tot = jnp.sum(jnp.where(state.mask, mass, 0.0))
        vcom = jnp.sum(mv, axis=0) / m_tot
        mobile = state.mask
        for t in system.frozen_types:
            mobile = mobile & (state.typ != t)
        v = jnp.where(do & mobile[:, None], state.v - vcom, state.v)
        return state.replace(v=v)


@dataclass(frozen=True)
class FixSetForce:
    """`fix setforce` analog: override force components on selected
    particles (by type, or all mobile); None leaves a component untouched.
    Classic use: pin wall beads (0,0,0) or constrain a direction."""

    fx: Optional[float] = None
    fy: Optional[float] = None
    fz: Optional[float] = None
    typ: Optional[int] = None

    def post_force(self, system, params, state, x, v_tilde, f):
        sel = state.mask
        if self.typ is not None:
            sel = sel & (state.typ == self.typ)
        for i, c in enumerate((self.fx, self.fy, self.fz)):
            if c is not None:
                f = f.at[:, i].set(jnp.where(sel, jnp.float32(c), f[:, i]))
        return f


@dataclass(frozen=True)
class FixSourceC:
    """tDPD per-species source/reaction term (SURVEY.md §2b row 23
    'optional source/reaction term'): dC_s/dt += S_s - k_s C_s applied
    end-of-step (first-order splitting) to mobile particles inside an
    optional slab region along ``axis``."""

    source: Tuple[float, ...] = (0.0,)
    rate: Tuple[float, ...] = (0.0,)
    axis: Optional[int] = None
    lo: float = 0.0
    hi: float = 0.0

    def end_of_step(self, system, params, state):
        if state.C is None:
            return state
        sel = state.mask
        for t in system.frozen_types:
            sel = sel & (state.typ != t)
        if self.axis is not None:
            xa = state.x[:, self.axis]
            sel = sel & (xa >= self.lo) & (xa < self.hi)
        s = jnp.asarray(self.source, jnp.float32)
        k = jnp.asarray(self.rate, jnp.float32)
        dc = system.dt * (s - k * state.C)
        return state.replace(C=jnp.where(sel[:, None], state.C + dc,
                                         state.C))

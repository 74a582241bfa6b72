"""Geometric regions — the `region`/`group`/`set`/`delete_atoms` command
family (SURVEY.md §2a row 10: ``src/region*.cpp``, ``create_atoms``,
``delete_atoms``).

Regions are small frozen dataclasses with a vectorized ``inside(x)``
predicate; the helpers below apply them to State the way the reference's
setup commands do: assign types (``set type``), freeze/delete particles,
or carve wall slabs. All host-or-trace safe (pure jnp ops).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from meso_tpu.core.state import State

Array = jax.Array


@dataclass(frozen=True)
class Block:
    """Axis-aligned box [lo, hi) per axis; +/-inf for open faces."""

    lo: Tuple[float, float, float] = (-jnp.inf,) * 3
    hi: Tuple[float, float, float] = (jnp.inf,) * 3

    def inside(self, x: Array) -> Array:
        lo = jnp.asarray(self.lo, x.dtype)
        hi = jnp.asarray(self.hi, x.dtype)
        return jnp.all((x >= lo) & (x < hi), axis=-1)


@dataclass(frozen=True)
class Sphere:
    center: Tuple[float, float, float]
    radius: float

    def inside(self, x: Array) -> Array:
        d = x - jnp.asarray(self.center, x.dtype)
        return jnp.sum(d * d, axis=-1) < self.radius ** 2


@dataclass(frozen=True)
class Cylinder:
    """Infinite/finite cylinder along ``axis`` through (c1, c2) in the two
    transverse coordinates, radius r, optional [lo, hi) along the axis."""

    axis: int
    c1: float
    c2: float
    radius: float
    lo: float = -jnp.inf
    hi: float = jnp.inf

    def inside(self, x: Array) -> Array:
        others = [a for a in range(3) if a != self.axis]
        d1 = x[..., others[0]] - self.c1
        d2 = x[..., others[1]] - self.c2
        xa = x[..., self.axis]
        return ((d1 * d1 + d2 * d2 < self.radius ** 2)
                & (xa >= self.lo) & (xa < self.hi))


@dataclass(frozen=True)
class Union:
    regions: tuple

    def inside(self, x: Array) -> Array:
        m = self.regions[0].inside(x)
        for r in self.regions[1:]:
            m = m | r.inside(x)
        return m


@dataclass(frozen=True)
class Complement:
    region: object

    def inside(self, x: Array) -> Array:
        return ~self.region.inside(x)


def set_type_in_region(state: State, region, typ: int) -> State:
    """``set region R type T`` analog."""
    sel = state.mask & region.inside(state.x)
    return state.replace(typ=jnp.where(sel, jnp.int32(typ), state.typ))


def delete_in_region(state: State, region) -> State:
    """``delete_atoms region R`` analog: mask out (rows keep their slots —
    fixed shapes; a later rebuild compacts them into padding)."""
    sel = state.mask & region.inside(state.x)
    return state.replace(mask=state.mask & ~sel)


def count_in_region(state: State, region) -> Array:
    return jnp.sum(state.mask & region.inside(state.x))

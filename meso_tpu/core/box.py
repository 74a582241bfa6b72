"""Orthogonal periodic simulation box.

TPU-native analog of the reference's ``Domain`` (LAMMPS ``src/domain.cpp``,
SURVEY.md §2a row 4): orthogonal box bounds, periodic wrapping with image
flags, and minimum-image displacement. Everything is a pure function over
fixed-shape arrays so it composes under jit/vmap/shard_map.

Only fully-periodic orthogonal boxes are supported (the DPD validation
configs are all periodic; walls are realized with frozen particles +
bounce-back fixes, SURVEY.md A.5, not with non-periodic boundaries).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Box:
    """Orthogonal periodic box. ``lo``/``hi`` are (3,) float32 arrays."""

    lo: Array
    hi: Array

    @staticmethod
    def cubic(l: float) -> "Box":
        return Box(lo=jnp.zeros(3, jnp.float32), hi=jnp.full(3, l, jnp.float32))

    @staticmethod
    def orthorhombic(lx: float, ly: float, lz: float) -> "Box":
        return Box(
            lo=jnp.zeros(3, jnp.float32),
            hi=jnp.asarray([lx, ly, lz], jnp.float32),
        )

    @property
    def lengths(self) -> Array:
        return self.hi - self.lo

    @property
    def volume(self) -> Array:
        return jnp.prod(self.lengths)

    def wrap(self, x: Array, image: Array | None = None):
        """Wrap positions into [lo, hi); update image flags if given.

        Analog of ``Domain::pbc`` (SURVEY.md §3.2). Uses floor-division so a
        particle arbitrarily far outside is wrapped in one shot.
        Returns ``(x_wrapped, image)`` (image is None iff input image is None).
        """
        l = self.lengths
        shift = jnp.floor((x - self.lo) / l).astype(jnp.int32)
        xw = x - shift.astype(x.dtype) * l
        # guard: floating point can leave xw == hi exactly; nudge inside.
        xw = jnp.where(xw >= self.hi, self.lo, xw)
        if image is None:
            return xw, None
        return xw, image + shift

    def min_image(self, dr: Array) -> Array:
        """Minimum-image convention for displacement vectors ``dr``.

        Valid when interaction cutoff < half of every box length; correctness
        asserted at system-build time, not here (jit-safe).
        """
        l = self.lengths
        return dr - jnp.round(dr / l) * l

    def replace(self, **kw) -> "Box":
        return dataclasses.replace(self, **kw)

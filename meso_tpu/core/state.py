"""The simulation State pytree — the TPU-native analog of LAMMPS atom arrays.

One immutable dataclass of fixed-shape SoA arrays mirroring the reference's
``Atom``/``AtomVec*`` storage by *name* (``x, v, f, type, tag, image, mask,
mol``; SURVEY.md §2a row 3, §7.0) plus the eDPD per-particle internal
temperature ``T`` and tDPD concentrations ``C`` carried as optional fields
(reference ``atom_vec_edpd_*`` / ``atom_vec_tdpd_*``, §2b row 17).

Design decisions (SURVEY.md §7.0):
* fixed shapes everywhere — ``mask`` marks valid rows so per-shard particle
  counts can vary without reshapes/recompiles;
* arrays may be stored in *cell-sorted order* (changes at every neighbor
  rebuild); ``tag`` carries identity, so observables and the pair RNG are
  permutation-invariant;
* ``step`` lives in the state so the counter-based RNG and `lax.scan`
  chunks need no host round-trips.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from meso_tpu.core.box import Box

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class State:
    """Per-particle SoA arrays + box + step counter. All leaves are arrays."""

    x: Array        # (N, 3) float32 positions, wrapped into box
    v: Array        # (N, 3) float32 velocities
    f: Array        # (N, 3) float32 forces from the last evaluation
    typ: Array      # (N,)  int32 particle type, 0-based
    tag: Array      # (N,)  int32 unique id, 1-based (0 = padding)
    image: Array    # (N, 3) int32 periodic image flags
    mask: Array     # (N,)  bool, False for padding rows
    mol: Array      # (N,)  int32 molecule id (0 = none)
    box: Box
    step: Array     # ()    int32 timestep counter
    T: Optional[Array] = None      # (N,)  eDPD internal temperature
    dTdt: Optional[Array] = None   # (N,)  eDPD heat-rate accumulator (like f)
    C: Optional[Array] = None      # (N, S) tDPD concentrations
    dCdt: Optional[Array] = None   # (N, S) tDPD flux accumulator (like f)

    @property
    def n(self) -> int:
        """Capacity (padded row count). Use ``n_valid()`` for real count."""
        return self.x.shape[0]

    def n_valid(self) -> Array:
        return jnp.sum(self.mask.astype(jnp.int32))

    def replace(self, **kw) -> "State":
        return dataclasses.replace(self, **kw)

    def unwrapped_x(self) -> Array:
        """Positions unwrapped across periodic images (for MSD/diffusion)."""
        return self.x + self.image.astype(self.x.dtype) * self.box.lengths


def zeros_state(n: int, box: Box, n_species: int = 0, with_energy: bool = False) -> State:
    f32, i32 = jnp.float32, jnp.int32
    return State(
        x=jnp.zeros((n, 3), f32),
        v=jnp.zeros((n, 3), f32),
        f=jnp.zeros((n, 3), f32),
        typ=jnp.zeros((n,), i32),
        tag=jnp.zeros((n,), i32),
        image=jnp.zeros((n, 3), i32),
        mask=jnp.zeros((n,), bool),
        mol=jnp.zeros((n,), i32),
        box=box,
        step=jnp.zeros((), i32),
        T=jnp.ones((n,), f32) if with_energy else None,
        dTdt=jnp.zeros((n,), f32) if with_energy else None,
        C=jnp.zeros((n, n_species), f32) if n_species else None,
        dCdt=jnp.zeros((n, n_species), f32) if n_species else None,
    )


# ---------------------------------------------------------------------------
# Creation helpers — analogs of `lattice` / `create_atoms` / `velocity create`
# (LAMMPS src/create_atoms.cpp, src/velocity.cpp; SURVEY.md §2a row 10)
# ---------------------------------------------------------------------------

def create_random(key: Array, n: int, box: Box, kt: float = 1.0,
                  mass: float = 1.0, typ: int = 0,
                  n_species: int = 0, with_energy: bool = False) -> State:
    """Uniform-random positions (the standard DPD start: soft potential
    tolerates overlaps) + Maxwell velocities at ``kt``."""
    from meso_tpu.core.rng import maxwell_velocities

    kx, kv = jax.random.split(key)
    x = box.lo + jax.random.uniform(kx, (n, 3), jnp.float32) * box.lengths
    v = maxwell_velocities(kv, n, kt, mass)
    s = zeros_state(n, box, n_species=n_species, with_energy=with_energy)
    return s.replace(
        x=x, v=v,
        typ=jnp.full((n,), typ, jnp.int32),
        tag=jnp.arange(1, n + 1, dtype=jnp.int32),
        mask=jnp.ones((n,), bool),
    )


def create_lattice(n_cells: tuple[int, int, int], box: Box, kt: float,
                   key: Array, mass: float = 1.0, per_cell: int = 3) -> State:
    """Simple-cubic lattice with `per_cell` particles jittered per site —
    a reproducible dense start matching rho = per_cell * ncells/V."""
    nx, ny, nz = n_cells
    ii = jnp.stack(jnp.meshgrid(jnp.arange(nx), jnp.arange(ny), jnp.arange(nz),
                                indexing="ij"), -1).reshape(-1, 3)
    base = box.lo + (ii + 0.5) * (box.lengths / jnp.asarray([nx, ny, nz]))
    kx, kv = jax.random.split(key)
    n = base.shape[0] * per_cell
    jitter = (jax.random.uniform(kx, (n, 3), jnp.float32) - 0.5) \
        * (box.lengths / jnp.asarray([nx, ny, nz]))
    x = jnp.repeat(base, per_cell, axis=0) + jitter
    x, _ = box.wrap(x)
    from meso_tpu.core.rng import maxwell_velocities
    v = maxwell_velocities(kv, n, kt, mass)
    s = zeros_state(n, box)
    return s.replace(
        x=x, v=v,
        tag=jnp.arange(1, n + 1, dtype=jnp.int32),
        mask=jnp.ones((n,), bool),
    )

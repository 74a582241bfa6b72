"""Scalar thermodynamic observables (compute temp / pressure analogs).

Reference: LAMMPS ``compute temp`` / ``thermo`` (SURVEY.md §2a rows 9,11)
and the MESO on-device reductions (row 30). All are masked reductions over
the state arrays, jit-safe, and run on-device inside the scan chunk.

DOF convention matches LAMMPS ``compute temp``: dof = dim*(N_mobile) - dim
(center-of-mass drift removed once at init).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def kinetic_energy(v: Array, mass: Array, mask: Array) -> Array:
    """Sum of 1/2 m v^2 over valid particles."""
    mv2 = mass * jnp.sum(v * v, axis=-1)
    return 0.5 * jnp.sum(jnp.where(mask, mv2, 0.0))


def kinetic_temperature(v: Array, mass: Array, mask: Array,
                        dim: int = 3) -> Array:
    """kT from equipartition with dim*(N-1) degrees of freedom."""
    n = jnp.sum(mask.astype(jnp.float32))
    dof = dim * (n - 1.0)
    return 2.0 * kinetic_energy(v, mass, mask) / dof


def total_momentum(v: Array, mass: Array, mask: Array) -> Array:
    """(3,) total momentum — conserved to float32 roundoff by construction."""
    mv = mass[:, None] * v if mass.ndim else mass * v
    return jnp.sum(jnp.where(mask[:, None], mv, 0.0), axis=0)


def pressure(v: Array, mass: Array, mask: Array, virial: Array,
             volume: Array, dim: int = 3) -> Array:
    """P = (sum m v^2 + sum_pairs r.F) / (dim V), full-traversal virial.

    ``virial`` is sum_i 0.5*sum_j dr_ij.F_ij from the (double-counted) pair
    traversal, i.e. already the standard sum over unique pairs.
    """
    mv2 = jnp.sum(jnp.where(mask, mass * jnp.sum(v * v, -1), 0.0))
    return (mv2 + virial) / (dim * volume)


def potential_energy_dense(x, typ, mask, box, a_table, rc_table) -> Array:
    """Exact conservative pair energy U = sum_{i<j} a rc/2 (1-r/rc)^2 via the
    O(N^2) path (validation-scale; the Groot-Warren potential whose force is
    a w(r))."""
    import jax.numpy as jnp
    dr = box.min_image(x[:, None, :] - x[None, :, :])
    r2 = jnp.sum(dr * dr, -1)
    n = x.shape[0]
    valid = (mask[:, None] & mask[None, :]) & ~jnp.eye(n, dtype=bool)
    a = a_table[typ[:, None], typ[None, :]]
    rc = rc_table[typ[:, None], typ[None, :]]
    r = jnp.sqrt(jnp.maximum(r2, 1e-12))
    w = jnp.maximum(1.0 - r / rc, 0.0)
    u = 0.5 * a * rc * w * w
    return 0.5 * jnp.sum(jnp.where(valid, u, 0.0))

"""Modified velocity-Verlet integration (Groot-Warren lambda scheme).

TPU-native analog of the reference's GPU integrator fixes
(``fix_nve_meso.cu`` expected path; SURVEY.md §2b row 25) and the step
split of ``Verlet::run`` (SURVEY.md §3.2): the step is expressed as two pure
half-updates around the force evaluation,

    v~     = v + lambda dt f/m            (initial_integrate, predictor)
    x'     = x + dt v + 1/2 dt^2 f/m      (initial_integrate, drift)
    f'     = F(x', v~)                    (pair/bond forces)
    v'     = v + 1/2 dt (f + f')/m        (final_integrate, corrector)

lambda = 0.5 is plain velocity-Verlet; Groot-Warren recommend 0.65 for DPD
at large dt (SURVEY.md A.1; artifact analysis refs cond-mat/0010219,
cond-mat/0302454). Frozen particles (wall atoms) are excluded via
``move_mask`` — they contribute forces but never move (SURVEY.md A.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from meso_tpu.core.box import Box

Array = jax.Array


def initial_integrate(x: Array, v: Array, f: Array, image: Array, box: Box,
                      dt: float, lam: float, inv_mass: Array,
                      move_mask: Array, wrap: bool = True):
    """Predictor: returns (x_new, image_new, v_tilde).

    ``v_tilde`` is the half-advanced velocity the dissipative force is
    evaluated with; the true velocity ``v`` is untouched until the corrector.
    ``wrap=False`` (System.wrap_mode="rebuild"): positions drift out of the
    box by <= skin/2 between rebuilds and the rebuild wraps them — removes
    mid-window global-wrap crossers so the pair kernel can skip min-image.
    """
    m = move_mask[:, None]
    a = f * inv_mass[:, None]
    v_tilde = jnp.where(m, v + (lam * dt) * a, v)
    x_new = jnp.where(m, x + dt * v + (0.5 * dt * dt) * a, x)
    if wrap:
        x_new, image_new = box.wrap(x_new, image)
    else:
        image_new = image
    return x_new, image_new, v_tilde


def final_integrate(v: Array, f_old: Array, f_new: Array, dt: float,
                    inv_mass: Array, move_mask: Array) -> Array:
    """Corrector: v' = v + dt/2 (f_old + f_new)/m on mobile particles."""
    a = (f_old + f_new) * inv_mass[:, None]
    return jnp.where(move_mask[:, None], v + (0.5 * dt) * a, v)

"""Mean-squared displacement / self-diffusion (the `compute msd` analog).

Uses unwrapped coordinates (x + image * L — exact because image flags are
integrated with the drift), so box wraps never fold the displacement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from meso_tpu.core.box import Box

Array = jax.Array


def unwrapped(x: Array, image: Array, box: Box) -> Array:
    return x + image.astype(x.dtype) * box.lengths


@jax.jit
def msd(x: Array, image: Array, x0u: Array, mask: Array, box: Box) -> Array:
    """Mean squared displacement vs the reference unwrapped positions
    ``x0u`` (= unwrapped(x_ref, image_ref, box)), masked mean."""
    d = unwrapped(x, image, box) - x0u
    w = mask.astype(x.dtype)
    return jnp.sum(jnp.sum(d * d, axis=-1) * w) / jnp.maximum(
        jnp.sum(w), 1.0)


def diffusion_coefficient(msd_t: Array, dt_total: float, dim: int = 3):
    """Einstein relation D = MSD / (2 d t)."""
    return msd_t / (2.0 * dim * dt_total)

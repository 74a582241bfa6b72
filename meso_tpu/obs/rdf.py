"""Radial distribution function g(r) — `compute rdf` analog (SURVEY.md §5.5).

Dense O(N^2) histogram (validation-scale only; runs per-sample, off the hot
loop). Normalized by ideal-gas shell counts so g(r) -> 1 at large r.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from meso_tpu.core.box import Box

Array = jax.Array


@partial(jax.jit, static_argnames=("nbins",))
def rdf(x: Array, mask: Array, box: Box, r_max, nbins: int = 100):
    """Returns (bin centers, g(r)). Minimum-image; requires r_max < L/2."""
    n = x.shape[0]
    dr = box.min_image(x[:, None, :] - x[None, :, :])
    r = jnp.sqrt(jnp.maximum(jnp.sum(dr * dr, -1), 1e-12))
    valid = (mask[:, None] & mask[None, :]) & ~jnp.eye(n, dtype=bool)
    idx = jnp.clip((r / r_max * nbins).astype(jnp.int32), 0, nbins)
    idx = jnp.where(valid & (r < r_max), idx, nbins)
    hist = jnp.zeros((nbins + 1,), jnp.float32).at[idx.reshape(-1)].add(
        1.0)[:nbins]
    n_real = jnp.sum(mask.astype(jnp.float32))
    rho = n_real / box.volume
    edges = jnp.arange(nbins + 1, dtype=jnp.float32) * (r_max / nbins)
    shell = 4.0 / 3.0 * jnp.pi * (edges[1:] ** 3 - edges[:-1] ** 3)
    ideal = rho * shell * n_real
    centers = 0.5 * (edges[1:] + edges[:-1])
    return centers, hist / jnp.maximum(ideal, 1e-12)

"""Structured (gather-free) DPD forces over the bucket-resident layout.

XLA twin of the Pallas pair kernel (``kernels/pair_dpd.py``) built on the
shared generic traversal (``ops/sweep.py``): 27 static cell offsets as
rolls/broadcast pair blocks, zero gathers, zero scatters, one writer per
particle — the same constructive race-freedom as the reference CUDA kernel
(SURVEY.md row 20) in pure-XLA form, so it runs everywhere (CPU tests,
shard_map interiors) and serves as the bit-reference for the kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from meso_tpu.core import rng as rngmod
from meso_tpu.core.box import Box
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.ops.dpd import DPDParams
from meso_tpu.ops.sweep import classic_pair_fn, make_channels, sweep

Array = jax.Array


def bucket_forces_xla(x: Array, v: Array, typ: Array, tag: Array, mask: Array,
                      box: Box, step: Array, params: DPDParams, dt: float,
                      cfg: CellConfig, rng_mode: str = "fast",
                      rng_rounds: int = 8):
    """Forces for bucket-resident rows. Returns (f (nr,3), virial scalar).

    Supports multi-type coefficient tables and both RNG tiers. Requires
    cell side >= max rc (enforced by CellConfig.for_box).
    """
    if cfg.spill:
        raise ValueError("bucket_forces_xla requires strict buckets; the "
                         "right-spill layout is fused-kernel only")
    nr = x.shape[0]
    h = rngmod.particle_hash(tag, step, params.seed, rounds=rng_rounds)
    channels = make_channels(x, v, tag, mask, h, {}, cfg.ncell, cfg.capacity)
    multitype = params.a.shape[0] > 1
    if multitype:
        channels["typ"] = typ.reshape(channels["tag"].shape)
    n_excl = 0
    if params.excl is not None:
        n_excl = params.excl.shape[1]
        ex = params.excl[tag]                       # (nr, E) gather
        for e in range(n_excl):
            channels[f"EX{e}"] = ex[:, e].reshape(channels["tag"].shape)
    pair_fn = classic_pair_fn(params, dt, rng_mode=rng_mode, step=step,
                              rng_rounds=rng_rounds, multitype=multitype,
                              n_excl=n_excl)
    acc = sweep(channels, cfg.ncell, cfg.capacity, (False, False, False),
                box.lengths, pair_fn, 4)
    f = jnp.stack([acc[0].reshape(nr), acc[1].reshape(nr),
                   acc[2].reshape(nr)], axis=-1)
    return f, jnp.sum(acc[3])

"""Structured (gather-free) DPD forces over the bucket-resident layout.

XLA formulation of the pair traversal used by the Pallas kernel
(``meso_tpu/kernels/pair_dpd.py``): 27 static cell offsets realized as
``jnp.roll`` of the (ncy, ncz, K, ncx) planes + broadcast (K_j, K_s) pair
blocks. Zero gathers, zero scatters, one writer per particle — the same
constructive race-freedom as the reference CUDA kernel (SURVEY.md row 20)
but in pure-XLA form, so it runs everywhere (CPU tests, shard_map interiors)
and serves as the bit-reference for the Pallas kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from meso_tpu.core import rng as rngmod
from meso_tpu.core.box import Box
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.ops.dpd import DPDParams, pair_force

Array = jax.Array


def bucket_forces_xla(x: Array, v: Array, typ: Array, tag: Array, mask: Array,
                      box: Box, step: Array, params: DPDParams, dt: float,
                      cfg: CellConfig, rng_mode: str = "fast",
                      rng_rounds: int = 8):
    """Forces for bucket-resident rows. Returns (f (nr,3), virial scalar).

    Requires single-cutoff tables (cell side >= max rc). Multi-type
    coefficients are looked up per pair (small tables; fine in XLA).
    """
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    nr = x.shape[0]
    shape = (ny, nz, k, nx)

    def plane(a):
        return a.reshape(shape)

    sx, sy, sz = (plane(x[:, 0]), plane(x[:, 1]), plane(x[:, 2]))
    ux, uy, uz = (plane(v[:, 0]), plane(v[:, 1]), plane(v[:, 2]))
    tp = plane(typ)
    valid = plane(mask)
    if rng_mode == "fast":
        h = plane(rngmod.particle_hash(tag, step, params.seed,
                                       rounds=rng_rounds))
    elif rng_mode == "tea":
        tg = plane(tag)
    else:
        raise ValueError(f"unknown rng_mode {rng_mode!r}")

    dt_inv_sqrt = jnp.float32(1.0 / jnp.sqrt(dt))
    fx = jnp.zeros(shape, jnp.float32)
    fy = jnp.zeros(shape, jnp.float32)
    fz = jnp.zeros(shape, jnp.float32)
    vir = jnp.zeros(shape, jnp.float32)

    # self along axis -2 inserted (K_s), neighbor along new axis (K_j)
    def selfe(p):   # (ny,nz,1,K_s,nx)
        return p[:, :, None, :, :]

    def neigh(p, dy, dz, dx):  # (ny,nz,K_j,1,nx)
        r = jnp.roll(p, (-dy, -dz, -dx), (0, 1, 3))
        return r[:, :, :, None, :]

    eye = jnp.eye(k, dtype=bool)[None, None, :, :, None]  # j == s

    lens = box.lengths

    def mi(d, axis):  # per-component minimum image
        return d - jnp.round(d / lens[axis]) * lens[axis]

    for dy in (-1, 0, 1):
        for dz in (-1, 0, 1):
            for dx in (-1, 0, 1):
                drx = mi(selfe(sx) - neigh(sx, dy, dz, dx), 0)
                dry = mi(selfe(sy) - neigh(sy, dy, dz, dx), 1)
                drz = mi(selfe(sz) - neigh(sz, dy, dz, dx), 2)
                dvx = selfe(ux) - neigh(ux, dy, dz, dx)
                dvy = selfe(uy) - neigh(uy, dy, dz, dx)
                dvz = selfe(uz) - neigh(uz, dy, dz, dx)
                if rng_mode == "fast":
                    theta = rngmod.pair_uniform_fast(
                        selfe(h), neigh(h, dy, dz, dx))
                else:
                    theta = rngmod.pair_uniform_tea(
                        selfe(tg), neigh(tg, dy, dz, dx), step, params.seed,
                        rounds=rng_rounds)
                ti = selfe(tp)
                tj = neigh(tp, dy, dz, dx)
                pair_ok = selfe(valid) & neigh(valid, dy, dz, dx)
                if dx == 0 and dy == 0 and dz == 0:
                    pair_ok = pair_ok & ~eye
                a = params.a[ti, tj]
                gamma = params.gamma[ti, tj]
                sigma = params.sigma[ti, tj]
                rc = jnp.where(pair_ok, params.rc[ti, tj], 0.0)
                dr = jnp.stack([drx, dry, drz], axis=-1)
                dv = jnp.stack([dvx, dvy, dvz], axis=-1)
                fp, vh = pair_force(dr, dv, theta, a, gamma, sigma, rc,
                                    dt_inv_sqrt, params.s_exp)
                # sum over neighbor slot axis (K_j) -> (ny,nz,K_s,nx)
                fx = fx + jnp.sum(fp[..., 0], axis=2)
                fy = fy + jnp.sum(fp[..., 1], axis=2)
                fz = fz + jnp.sum(fp[..., 2], axis=2)
                vir = vir + jnp.sum(vh, axis=2)

    f = jnp.stack([fx.reshape(nr), fy.reshape(nr), fz.reshape(nr)], axis=-1)
    return f, jnp.sum(vir)


def bucket_forces_xla_xhalo(planes_padded: Array, box_lengths: Array,
                            params: DPDParams, dt: float,
                            ncell: tuple[int, int, int], capacity: int):
    """Distributed variant: x-axis is halo-padded (ncx+2 columns, halo
    coordinate channels pre-shifted at the global wrap), y/z periodic rolls.

    ``planes_padded``: (8, ny, nz, K, ncx+2) stacked channels
    [sx, sy, sz, vx, vy, vz, hash_bits_f32, valid]. Single coefficient set
    (type tables uniform) — asserted by the caller. Returns
    (f (nr,3), virial) for the ncx interior columns (nr = ny*nz*K*ncx).
    """
    nx, ny, nz = ncell
    k = capacity
    nr = ny * nz * k * nx
    sx, sy, sz, ux, uy, uz, hb, valid = [planes_padded[i] for i in range(8)]
    h = jax.lax.bitcast_convert_type(hb, jnp.uint32)

    def mi_x(d):
        # a particle can wrap the GLOBAL box mid-window while staying in a
        # far slab's buckets; min-image restores its pair distances
        return d - jnp.round(d / box_lengths[0]) * box_lengths[0]

    def mi_y(d):
        return d - jnp.round(d / box_lengths[1]) * box_lengths[1]

    def mi_z(d):
        return d - jnp.round(d / box_lengths[2]) * box_lengths[2]

    def selfe(p):  # interior columns, add K_j axis
        return p[:, :, None, :, 1:-1]

    def neigh(p, dy, dz, dx):  # roll y/z, slice x
        r = jnp.roll(p, (-dy, -dz), (0, 1))
        return r[:, :, :, None, 1 + dx:1 + dx + nx]

    a = params.a[0, 0]
    gamma = params.gamma[0, 0]
    sigma = params.sigma[0, 0]
    rc = params.rc[0, 0]
    dt_inv_sqrt = jnp.float32(1.0 / jnp.sqrt(dt))
    eye = jnp.eye(k, dtype=bool)[None, None, :, :, None]

    shape = (ny, nz, k, nx)
    fx = jnp.zeros(shape, jnp.float32)
    fy = jnp.zeros(shape, jnp.float32)
    fz = jnp.zeros(shape, jnp.float32)
    vir = jnp.zeros(shape, jnp.float32)

    for dy in (-1, 0, 1):
        for dz in (-1, 0, 1):
            for dx in (-1, 0, 1):
                drx = mi_x(selfe(sx) - neigh(sx, dy, dz, dx))
                dry = mi_y(selfe(sy) - neigh(sy, dy, dz, dx))
                drz = mi_z(selfe(sz) - neigh(sz, dy, dz, dx))
                r2 = drx * drx + dry * dry + drz * drz
                ok = (r2 < rc * rc) & (r2 > 0.0)
                ok = ok & ((selfe(valid) * neigh(valid, dy, dz, dx)) > 0.5)
                if dx == 0 and dy == 0 and dz == 0:
                    ok = ok & ~eye
                r2s = jnp.where(ok, r2, 1.0)
                rinv = jax.lax.rsqrt(r2s)
                r = r2s * rinv
                w = 1.0 - r / rc
                dvx = selfe(ux) - neigh(ux, dy, dz, dx)
                dvy = selfe(uy) - neigh(uy, dy, dz, dx)
                dvz = selfe(uz) - neigh(uz, dy, dz, dx)
                ev = (drx * dvx + dry * dvy + drz * dvz) * rinv
                hj = jax.lax.bitcast_convert_type(
                    planes_padded[6], jnp.uint32)
                hj = jnp.roll(hj, (-dy, -dz), (0, 1))[
                    :, :, :, None, 1 + dx:1 + dx + nx]
                theta = rngmod.pair_uniform_fast(h[:, :, None, :, 1:-1], hj)
                fmag = (a * w - gamma * (w * w) * ev
                        + sigma * w * theta * dt_inv_sqrt)
                fmag = jnp.where(ok, fmag, 0.0)
                fr = fmag * rinv
                fx = fx + jnp.sum(fr * drx, axis=2)
                fy = fy + jnp.sum(fr * dry, axis=2)
                fz = fz + jnp.sum(fr * drz, axis=2)
                vir = vir + jnp.sum(0.5 * fmag * r, axis=2)

    f = jnp.stack([fx.reshape(nr), fy.reshape(nr), fz.reshape(nr)], -1)
    return f, jnp.sum(vir)

"""Pallas TPU pair-force kernel over the bucket-resident layout.

TPU-native replacement of the reference's hottest CUDA kernel
(``pair_dpd_meso.cu``, SURVEY.md §2b rows 20-21, §3.3). Design:

* state rows are cell buckets (``neighbor/bucket_layout.py``): per-particle
  channels reshape zero-copy to (ncy, ncz, K, ncx) planes; the kernel grid
  is one (cy, cz) cell-row per step, processing all ncx cells of the row;
* the 27-cell stencil = 9 neighbor (cy+dy, cz+dz) row blocks (the same HBM
  array bound 9 times with shifted index maps over a wrap-padded input whose
  halo copies carry pre-shifted y/z coordinates — the same trick the
  multi-chip halo exchange uses) x 3 static lane-rolls for dx;
* every tensor in the kernel is a 2-D tile: neighbors as (K_j, ncx) lane-
  rolled then lane-tiled to (K_j, K_s*ncx); self values as (1, K_s*ncx) read
  through a SECOND alias of the same HBM planes with block shape
  (.., 1, K*ncx) — Mosaic forbids lane-crossing reshapes in-kernel, so the
  two views are prepared at the XLA level where reshape is free;
* per-pair math identical to ``ops/dpd.pair_force``: branch-free masking,
  fused counter-based RNG (per-particle TEA hashes combined symmetrically
  in-kernel, ~10 uint32 VPU ops/pair), register accumulation, ONE writer per
  particle — the reference's atomics-free property holds by construction;
* no gather, no scatter, no atomics, no dynamic shapes anywhere.

v1 restrictions (asserted at dispatch): single coefficient set (all type
pairs share a/gamma/sigma/rc — true for every BASELINE config), s_exp=1,
rng_mode="fast" (the "tea" tier runs via ops/bucket_dpd.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meso_tpu.core import rng as rngmod
from meso_tpu.core.box import Box
from meso_tpu.neighbor.cells import CellConfig
from meso_tpu.ops.dpd import DPDParams

Array = jax.Array

# channel indices in the stacked plane tensor
_SX, _SY, _SZ, _VX, _VY, _VZ, _H, _VALID = range(8)


def _lane_tile(p: Array, reps: int) -> Array:
    """(K, nx) -> (K, reps*nx) with [j, s*nx + c] = p[j, c] (s-major tiling)."""
    return jnp.concatenate([p] * reps, axis=1)


def _kernel(*refs, k: int, nx: int):
    """refs = [scal, self_alias, 9 x row refs, out_ref, rows_scratch].

    The 27-offset sweep runs as a fori_loop over the 9 (dy,dz) rows (staged
    into one VMEM scratch so the loop can index them dynamically) with the 3
    x-rolls unrolled inside — bounding live temporaries to one body instead
    of 27 (scoped-VMEM stack limit is 16 MB).
    """
    scal_ref = refs[0]
    selfref = refs[1]        # (8, 1, 1, K*nx) — flattened self view
    rows = refs[2:11]        # 9 x (8, 1, K, nx), (dy,dz) row-major
    out_ref = refs[11]
    rows_s = refs[12]        # VMEM scratch (9, 8, K, nx)
    a = scal_ref[0, 0]
    gamma = scal_ref[0, 1]
    sigma = scal_ref[0, 2]
    rc = scal_ref[0, 3]
    dt_inv_sqrt = scal_ref[0, 4]
    lx = scal_ref[0, 5]

    for i, ref in enumerate(rows):
        rows_s[i, :, :, :] = ref[:, 0, :, :]

    def selfchan(c):  # (1, K*nx)
        return selfref[c, 0, :, :]

    sxs = selfchan(_SX)
    sys_ = selfchan(_SY)
    szs = selfchan(_SZ)
    vxs = selfchan(_VX)
    vys = selfchan(_VY)
    vzs = selfchan(_VZ)
    hs = pltpu.bitcast(selfchan(_H), jnp.uint32)
    vs = selfchan(_VALID)

    # lane l = s*nx + c ; sublane = j  -> self-pair exclusion at (0,0,0)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (k, k * nx), 1) // nx
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (k, k * nx), 0)
    self_pair = j_idx == s_idx

    def row_body(r9, acc):
        fx, fy, fz, vir = acc
        is_center = r9 == 4  # traced

        def chan(c):
            return rows_s[r9, c, :, :]  # (K, nx), dynamic leading index

        for dx in (-1, 0, 1):
            def nb(p):  # (K, nx) -> (K_j, K_s*nx)
                r = pltpu.roll(p, (-dx) % nx, 1) if dx else p
                return _lane_tile(r, k)

            drx = sxs - nb(chan(_SX))
            # x-wrap minimum image (y/z handled by shifted halo coords)
            drx = drx - jnp.round(drx / lx) * lx
            dry = sys_ - nb(chan(_SY))
            drz = szs - nb(chan(_SZ))
            r2 = drx * drx + dry * dry + drz * drz
            ok = (r2 < rc * rc) & (r2 > 0.0)
            ok = ok & (nb(chan(_VALID)) * vs > 0.5)
            if dx == 0:
                ok = ok & ~(self_pair & is_center)
            r2s = jnp.where(ok, r2, 1.0)
            rinv = jax.lax.rsqrt(r2s)
            r = r2s * rinv
            w = 1.0 - r / rc
            dvx = vxs - nb(chan(_VX))
            dvy = vys - nb(chan(_VY))
            dvz = vzs - nb(chan(_VZ))
            ev = (drx * dvx + dry * dvy + drz * dvz) * rinv
            hj = pltpu.bitcast(nb(chan(_H)), jnp.uint32)
            theta = rngmod.pair_uniform_fast(hs, hj)
            fmag = (a * w - gamma * (w * w) * ev
                    + sigma * w * theta * dt_inv_sqrt)
            fmag = jnp.where(ok, fmag, 0.0)
            fr = fmag * rinv
            fx = fx + jnp.sum(fr * drx, axis=0, keepdims=True)
            fy = fy + jnp.sum(fr * dry, axis=0, keepdims=True)
            fz = fz + jnp.sum(fr * drz, axis=0, keepdims=True)
            vir = vir + jnp.sum(0.5 * fmag * r, axis=0, keepdims=True)
        return (fx, fy, fz, vir)

    zero = jnp.zeros((1, k * nx), jnp.float32)
    fx, fy, fz, vir = jax.lax.fori_loop(
        0, 9, row_body, (zero, zero, zero, zero))

    out_ref[0, 0, :, :] = fx
    out_ref[1, 0, :, :] = fy
    out_ref[2, 0, :, :] = fz
    out_ref[3, 0, :, :] = vir


@partial(jax.jit, static_argnames=("dt", "cfg", "rng_mode", "rng_rounds",
                                   "interpret"))
def bucket_forces_pallas(x: Array, v: Array, typ: Array, tag: Array,
                         mask: Array, box: Box, step: Array,
                         params: DPDParams, dt: float, cfg: CellConfig,
                         rng_mode: str = "fast", rng_rounds: int = 8,
                         interpret: bool = False):
    """Forces for bucket-resident rows via the Pallas kernel.

    Returns (f (nr,3), virial scalar). Interface matches
    ``ops.bucket_dpd.bucket_forces_xla`` (its bit-reference).
    """
    if rng_mode != "fast":
        raise NotImplementedError("pallas path: rng_mode='fast' only (v1)")
    nx, ny, nz = cfg.ncell
    k = cfg.capacity
    nr = x.shape[0]

    h = rngmod.particle_hash(tag, step, params.seed, rounds=rng_rounds)
    shape = (ny, nz, k, nx)
    planes = jnp.stack([
        x[:, 0].reshape(shape), x[:, 1].reshape(shape), x[:, 2].reshape(shape),
        v[:, 0].reshape(shape), v[:, 1].reshape(shape), v[:, 2].reshape(shape),
        jax.lax.bitcast_convert_type(h, jnp.float32).reshape(shape),
        mask.astype(jnp.float32).reshape(shape),
    ])  # (8, ny, nz, k, nx)

    # wrap halos along cy/cz with pre-shifted coordinates
    padded = jnp.pad(planes, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)),
                     mode="wrap")
    ly = box.lengths[1]
    lz = box.lengths[2]
    padded = padded.at[_SY, 0].add(-ly).at[_SY, -1].add(ly)
    padded = padded.at[_SZ, :, 0].add(-lz).at[_SZ, :, -1].add(lz)
    # two aliases of the same data: row view and lane-flattened self view
    rows_view = padded.reshape(8, (ny + 2) * (nz + 2), k, nx)
    self_view = padded.reshape(8, (ny + 2) * (nz + 2), 1, k * nx)

    scal = jnp.stack([params.a[0, 0], params.gamma[0, 0], params.sigma[0, 0],
                      params.rc[0, 0],
                      jnp.float32(1.0 / jnp.sqrt(dt)),
                      box.lengths[0], jnp.float32(0), jnp.float32(0)]
                     ).reshape(1, 8)

    def row_spec(dy, dz):
        return pl.BlockSpec(
            (8, 1, k, nx),
            index_map=lambda cy, cz: (0, (cy + dy) * (nz + 2) + (cz + dz), 0, 0),
            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 8), lambda cy, cz: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((8, 1, 1, k * nx),
                     index_map=lambda cy, cz: (
                         0, (cy + 1) * (nz + 2) + (cz + 1), 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    in_specs += [row_spec(dy, dz) for dy in (0, 1, 2) for dz in (0, 1, 2)]

    out = pl.pallas_call(
        partial(_kernel, k=k, nx=nx),
        grid=(ny, nz),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (4, 1, 1, k * nx),
            index_map=lambda cy, cz: (0, cy * nz + cz, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, ny * nz, 1, k * nx), jnp.float32),
        scratch_shapes=[pltpu.VMEM((9, 8, k, nx), jnp.float32)],
        interpret=interpret,
    )(scal, self_view, *([rows_view] * 9))

    out = out.reshape(4, ny, nz, k, nx)
    f = jnp.stack([out[0].reshape(nr), out[1].reshape(nr),
                   out[2].reshape(nr)], axis=-1)
    virial = jnp.sum(out[3])
    return f, virial

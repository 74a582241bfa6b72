"""Generic 27-offset bucket sweep, parameterized by axis mode and physics.

One traversal to rule the XLA bucket paths: each of the three cell axes is
either "roll" (periodic within this device's grid — the single-chip case)
or "halo" (padded by one ghost layer each side — the decomposed axes of the
multi-chip case). The per-pair physics is a callback, so classic DPD, eDPD
and tDPD share the traversal; noise construction (symmetric theta,
antisymmetric zeta/xi) is provided to the callback.

Channels are (ny[, +2], nz[, +2], K, nx[, +2]) planes; per-species tDPD
channels are separate planes. All decomposed/periodic distances are
min-imaged against the GLOBAL box (a particle can wrap the global box
mid-window while still bucketed on a far brick).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from meso_tpu.core import rng as rngmod

Array = jax.Array


def sweep(channels: dict, ncell, capacity: int, halo: tuple,
          box_lengths: Array, pair_fn: Callable, n_out: int):
    """Run the 27-offset traversal.

    channels: dict name -> plane; coordinate channels 'x','y','z' are f32;
      'h' uint32 hash; 'valid' f32 0/1; 'tag' int32; extra model channels
      f32. Planes are (ny+2?, nz+2?, K, nx+2?) per the halo tuple
      (halo_y, halo_z, halo_x) of bools.
    pair_fn(dr, dvs..., sv, nv, ok, noise) -> tuple of per-pair arrays of
      length n_out (first three MUST be fx, fy, fz contributions is NOT
      assumed — caller interprets); each is summed over the neighbor slot
      axis (axis 2).
    Returns a list of n_out (ny, nz, K, nx) accumulators.
    """
    nx, ny, nz = ncell
    k = capacity
    hy, hz, hx = halo

    def selfe(p):
        q = p
        if hy:
            q = q[1:-1]
        if hz:
            q = q[:, 1:-1]
        if hx:
            q = q[..., 1:-1]
        return q[:, :, None, :, :]

    def neigh(p, dy, dz, dx):
        q = p
        # y
        if hy:
            q = q[1 + dy:1 + dy + ny]
        else:
            q = jnp.roll(q, -dy, 0)
        # z
        if hz:
            q = q[:, 1 + dz:1 + dz + nz]
        else:
            q = jnp.roll(q, -dz, 1)
        # x
        if hx:
            q = q[..., 1 + dx:1 + dx + nx]
        else:
            q = jnp.roll(q, -dx, 2 + 1)  # axis 3 is x on (y,z,K,x)
        return q[:, :, :, None, :]

    def mi(d, axis):
        return d - jnp.round(d / box_lengths[axis]) * box_lengths[axis]

    eye = jnp.eye(k, dtype=bool)[None, None, :, :, None]
    shape = (ny, nz, k, nx)
    acc = [jnp.zeros(shape, jnp.float32) for _ in range(n_out)]

    sv = {name: selfe(p) for name, p in channels.items()}

    for dy in (-1, 0, 1):
        for dz in (-1, 0, 1):
            for dx in (-1, 0, 1):
                nv = {name: neigh(p, dy, dz, dx)
                      for name, p in channels.items()}
                dr = (mi(sv["x"] - nv["x"], 0),
                      mi(sv["y"] - nv["y"], 1),
                      mi(sv["z"] - nv["z"], 2))
                ok = (sv["valid"] * nv["valid"]) > 0.5
                if dx == 0 and dy == 0 and dz == 0:
                    ok = ok & ~eye
                hp = rngmod.combine_symmetric(sv["h"], nv["h"])
                sign = jnp.where(sv["tag"] < nv["tag"], 1.0, -1.0)
                outs = pair_fn(dr, sv, nv, ok, hp, sign)
                for i, o in enumerate(outs):
                    acc[i] = acc[i] + jnp.sum(o, axis=2)
    return acc


def make_channels(x, v, tag, mask, h, extra: dict, ncell, capacity: int):
    """Reshape per-row arrays into plane channels (no halos).

    ``h=None`` omits the per-particle hash plane — the fused Pallas
    kernels hash tag VALUES in-kernel (r3 root cause: bitcast integer
    channels are corrupted on device) and need no "h" channel; the XLA
    sweep's fast tier still takes a precomputed hash."""
    nx, ny, nz = ncell
    shape = (ny, nz, capacity, nx)
    ch = {
        "x": x[:, 0].reshape(shape), "y": x[:, 1].reshape(shape),
        "z": x[:, 2].reshape(shape),
        "vx": v[:, 0].reshape(shape), "vy": v[:, 1].reshape(shape),
        "vz": v[:, 2].reshape(shape),
        "tag": tag.reshape(shape),
        "valid": mask.astype(jnp.float32).reshape(shape),
    }
    if h is not None:
        ch["h"] = h.reshape(shape)
    for name, arr in extra.items():
        ch[name] = arr.reshape(shape)
    return ch


def classic_pair_fn(params, dt: float, rng_mode: str = "fast",
                    step=None, rng_rounds: int = 8,
                    multitype: bool = False, n_excl: int = 0):
    """Per-pair physics for classic DPD -> (fx, fy, fz, virial).

    multitype: look coefficients up from the (T,T) tables via the 'typ'
    channel; tea: full TEA on sorted tag pairs (reference parity);
    n_excl > 0: special_bonds — channels EX0..EX{n_excl-1} carry each
    particle's excluded tags and matching pairs are scaled by excl_w."""
    dt_inv_sqrt = jnp.float32(1.0 / jnp.sqrt(dt))

    def fn(dr, sv, nv, ok, hp, sign):
        if multitype:
            ti, tj = sv["typ"], nv["typ"]
            a = params.a[ti, tj]
            gamma = params.gamma[ti, tj]
            sigma = params.sigma[ti, tj]
            rc = params.rc[ti, tj]
        else:
            a = params.a[0, 0]
            gamma = params.gamma[0, 0]
            sigma = params.sigma[0, 0]
            rc = params.rc[0, 0]
        drx, dry, drz = dr
        r2 = drx * drx + dry * dry + drz * drz
        ok = ok & (r2 < rc * rc) & (r2 > 0.0)
        r2s = jnp.where(ok, r2, 1.0)
        rinv = jax.lax.rsqrt(r2s)
        r = r2s * rinv
        w = 1.0 - r / rc
        wr = jnp.where(params.s_exp == 1.0, w, jnp.power(w, params.s_exp))
        ev = (drx * (sv["vx"] - nv["vx"]) + dry * (sv["vy"] - nv["vy"])
              + drz * (sv["vz"] - nv["vz"])) * rinv
        if rng_mode == "tea":
            theta = rngmod.pair_uniform_tea(sv["tag"], nv["tag"], step,
                                            params.seed, rounds=rng_rounds)
        else:
            # same stream as pair_uniform_fast -> bitwise parity with the
            # single-chip classic bucket/Pallas paths
            theta = rngmod._u32_to_symmetric_uniform(hp)
        fmag = a * w - gamma * (wr * wr) * ev + sigma * wr * theta \
            * dt_inv_sqrt
        fmag = jnp.where(ok, fmag, 0.0)
        if n_excl:
            hit = sv["EX0"] == nv["tag"]
            for e in range(1, n_excl):
                hit = hit | (sv[f"EX{e}"] == nv["tag"])
            fmag = fmag * jnp.where(hit, params.excl_w, 1.0)
        fr = fmag * rinv
        return fr * drx, fr * dry, fr * drz, 0.5 * fmag * r

    return fn


def edpd_pair_fn(params, dt: float, multitype: bool = False,
                 rng_mode: str = "fast", step=None, rng_rounds: int = 8):
    """eDPD physics -> (fx, fy, fz, virial, q) (SURVEY A.2).

    multitype: a/gamma/rc/kappa from the (T,T) tables via the 'typ'
    channel (the generalized-FDT sigma is per-pair already). rng_mode
    'tea': the pair hash is full TEA on the sorted tag pair (reference
    parity) instead of the combined per-particle hashes."""
    inv_m = 1.0 / params.mass
    dt_inv_sqrt = jnp.float32(1.0 / jnp.sqrt(dt))

    def fn(dr, sv, nv, ok, hp, sign):
        if rng_mode == "tea":
            hp = rngmod.pair_hash_tea(sv["tag"], nv["tag"], step,
                                      params.seed, rounds=rng_rounds)
        if multitype:
            ty_i, ty_j = sv["typ"], nv["typ"]
            a = params.a[ty_i, ty_j]
            gamma = params.gamma[ty_i, ty_j]
            rc = params.rc[ty_i, ty_j]
            kappa = params.kappa[ty_i, ty_j]
        else:
            a = params.a[0, 0]
            gamma = params.gamma[0, 0]
            rc = params.rc[0, 0]
            kappa = params.kappa[0, 0]
        drx, dry, drz = dr
        r2 = drx * drx + dry * dry + drz * drz
        ok = ok & (r2 < rc * rc) & (r2 > 0.0)
        r2s = jnp.where(ok, r2, 1.0)
        rinv = jax.lax.rsqrt(r2s)
        r = r2s * rinv
        w = 1.0 - r / rc
        w2 = w * w
        ev = (drx * (sv["vx"] - nv["vx"]) + dry * (sv["vy"] - nv["vy"])
              + drz * (sv["vz"] - nv["vz"])) * rinv
        ti, tj = sv["T"], nv["T"]
        sigma2 = 4.0 * gamma * ti * tj / jnp.maximum(ti + tj, 1e-12)
        sigma = jnp.sqrt(jnp.maximum(sigma2, 0.0))
        theta = rngmod.uniform_stream(hp, 0)
        fmag = a * w - gamma * w2 * ev + sigma * w * theta * dt_inv_sqrt
        fmag = jnp.where(ok, fmag, 0.0)
        k_ij = kappa * 0.25 * (ti + tj) ** 2
        q_c = k_ij * w2 * (1.0 / jnp.maximum(ti, 1e-12)
                           - 1.0 / jnp.maximum(tj, 1e-12))
        q_v = 0.5 * (w2 * (gamma * ev * ev - sigma2 * inv_m)
                     - sigma * w * ev * theta * dt_inv_sqrt)
        zeta = sign * rngmod.uniform_stream(hp, 1)
        beta = jnp.sqrt(jnp.maximum(2.0 * k_ij, 0.0))
        q_r = beta * w * zeta * dt_inv_sqrt
        q = jnp.where(ok, q_c + q_v + q_r, 0.0)
        fr = fmag * rinv
        return fr * drx, fr * dry, fr * drz, 0.5 * fmag * r, q

    return fn


def tdpd_pair_fn(params, dt: float, ns: int, multitype: bool = False,
                 rng_mode: str = "fast", step=None, rng_rounds: int = 8):
    """tDPD physics -> (fx, fy, fz, virial, dC_0..dC_{ns-1}) (SURVEY A.3).

    Full w_dc = (1 - r/rcc)^s1 with its own cutoff rcc (must be <= rc so
    the rc-based cell stencil covers all transport pairs — asserted by the
    bucket wrapper). multitype: momentum tables via the 'typ' channel.
    rng_mode 'tea': reference-parity TEA pair hash."""
    rcc = params.rcc
    s1 = params.s1
    dt_inv_sqrt = jnp.float32(1.0 / jnp.sqrt(dt))

    def fn(dr, sv, nv, ok, hp, sign):
        if rng_mode == "tea":
            hp = rngmod.pair_hash_tea(sv["tag"], nv["tag"], step,
                                      params.seed, rounds=rng_rounds)
        if multitype:
            ty_i, ty_j = sv["typ"], nv["typ"]
            a = params.a[ty_i, ty_j]
            gamma = params.gamma[ty_i, ty_j]
            sigma0 = params.sigma[ty_i, ty_j]
            rc = params.rc[ty_i, ty_j]
        else:
            a = params.a[0, 0]
            gamma = params.gamma[0, 0]
            sigma0 = params.sigma[0, 0]
            rc = params.rc[0, 0]
        drx, dry, drz = dr
        r2 = drx * drx + dry * dry + drz * drz
        ok = ok & (r2 < rc * rc) & (r2 > 0.0)
        r2s = jnp.where(ok, r2, 1.0)
        rinv = jax.lax.rsqrt(r2s)
        r = r2s * rinv
        w = 1.0 - r / rc
        ev = (drx * (sv["vx"] - nv["vx"]) + dry * (sv["vy"] - nv["vy"])
              + drz * (sv["vz"] - nv["vz"])) * rinv
        theta = rngmod.uniform_stream(hp, 0)
        fmag = (a * w - gamma * (w * w) * ev
                + sigma0 * w * theta * dt_inv_sqrt)
        fmag = jnp.where(ok, fmag, 0.0)
        fr = fmag * rinv
        outs = [fr * drx, fr * dry, fr * drz, 0.5 * fmag * r]
        inside_c = ok & (r2 < rcc * rcc)
        wdc_base = jnp.maximum(1.0 - r / rcc, 0.0)
        wdc = jnp.where(s1 == 1.0, wdc_base, jnp.power(wdc_base, s1))
        wrc = jnp.sqrt(wdc)
        for s in range(ns):
            kap = params.kappa_c[s]
            eps = params.eps_c[s]
            xi = sign * rngmod.uniform_stream(hp, 2 + s)
            qd = -kap * wdc * (sv[f"C{s}"] - nv[f"C{s}"])
            qr = eps * wrc * xi * dt_inv_sqrt
            outs.append(jnp.where(inside_c, qd + qr, 0.0))
        return tuple(outs)

    return fn

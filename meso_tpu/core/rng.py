"""Counter-based, per-pair symmetric random numbers.

TPU-native analog of the reference's TEA-hash pair RNG
(``src/USER-MESO/rand_meso.h`` expected path; SURVEY.md §2b row 21, §3.3):
theta_ij is a pure function of (min(tag_i,tag_j), max(tag_i,tag_j), step,
seed), so

* both owners of a pair regenerate the identical theta_ij -> exact momentum
  conservation with no communication and no atomics,
* no RNG state exists -> checkpoint/resume and domain-decomposition
  invariance are exact (SURVEY.md §5.3/§5.4),
* everything is branch-free uint32 VPU arithmetic, equally valid inside
  XLA and Pallas kernels.

Two quality/speed tiers are provided:

* ``pair_uniform_tea`` — full TEA hash with configurable rounds (default 8,
  matching the reference's quality analysis; SURVEY.md row 21).
* ``pair_uniform_fast`` — per-particle TEA-hashed randoms combined with a
  short symmetric finalizer (~10 ops/pair instead of ~110). The per-particle
  hashes are recomputed per step; statistical quality is validated by the
  kT / momentum / RDF physics tests next to the TEA-8 tier.

All "uniform" outputs are zero-mean unit-variance uniforms on
(-sqrt(3), sqrt(3)) — the standard DPD choice (Groot & Warren showed
uniform and Gaussian noises give identical physics).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

# python ints (not jnp constants) so Pallas kernels don't capture consts
_DELTA = 0x9E3779B9
_K2 = 0xC2B2AE35
_K3 = 0x27D4EB2F
# top 23 bits -> [0, 1): full float32 mantissa resolution, and int32-castable
# (Mosaic TPU kernels support int32->f32 but not uint32->f32)
_U23_TO_UNIT = 1.1920928955078125e-07  # 2^-23
_SQRT12 = 3.4641016151377544  # sqrt(12): uniform -> unit variance


def _u32(x) -> Array:
    return jnp.asarray(x).astype(jnp.uint32)


def tea(v0: Array, v1: Array, k0: Array, k1: Array, rounds: int = 8):
    """Tiny Encryption Algorithm with a (k0,k1,const,const) key schedule.

    Unrolled at trace time (``rounds`` is static). Returns mixed (v0, v1).
    """
    v0, v1, k0, k1 = _u32(v0), _u32(v1), _u32(k0), _u32(k1)
    s = jnp.uint32(0)
    for _ in range(rounds):
        s = s + jnp.uint32(_DELTA)
        v0 = v0 + (((v1 << 4) + k0) ^ (v1 + s) ^ ((v1 >> 5) + k1))
        v1 = v1 + (((v0 << 4) + jnp.uint32(_K2)) ^ (v0 + s)
                   ^ ((v0 >> 5) + jnp.uint32(_K3)))
    return v0, v1


def _u32_to_symmetric_uniform(u: Array) -> Array:
    """uint32 -> zero-mean unit-variance uniform on (-sqrt 3, sqrt 3).

    Uses the top 23 bits through an int32 cast so the identical code runs
    inside Mosaic TPU kernels and in XLA.
    """
    bits = jax.lax.bitcast_convert_type(u >> 9, jnp.int32)  # in [0, 2^23)
    unit = bits.astype(jnp.float32) * jnp.float32(_U23_TO_UNIT)  # [0, 1)
    return (unit - jnp.float32(0.5)) * jnp.float32(_SQRT12)


@partial(jax.jit, static_argnames=("rounds",))
def pair_uniform_tea(tag_i, tag_j, step, seed, rounds: int = 8) -> Array:
    """Symmetric theta_ij ~ uniform, mean 0, variance 1. TEA-`rounds` tier.

    theta(i,j) == theta(j,i) holds bitwise because the counter is the sorted
    tag pair (SURVEY.md §3.3).
    """
    lo = jnp.minimum(tag_i, tag_j)
    hi = jnp.maximum(tag_i, tag_j)
    v0, _ = tea(lo, hi, _u32(step), _u32(seed), rounds=rounds)
    return _u32_to_symmetric_uniform(v0)


@partial(jax.jit, static_argnames=("rounds",))
def particle_hash(tag, step, seed, rounds: int = 8) -> Array:
    """Well-mixed per-particle uint32, one TEA evaluation per particle.

    The expensive hash runs O(N) per step; pair combination is O(pairs) but
    cheap (see ``combine_symmetric``).
    """
    v0, _ = tea(tag, _u32(tag) ^ jnp.uint32(0xDEADBEEF), _u32(step), _u32(seed),
                rounds=rounds)
    return v0


def combine_symmetric(h_i: Array, h_j: Array) -> Array:
    """Short symmetric mixer of two already-random uint32s (~10 VPU ops).

    Uses the symmetric pair (sum, xor) — invariant under i<->j — followed by
    one xorshift-multiply round for avalanche across both words.
    """
    a = _u32(h_i) + _u32(h_j)
    b = _u32(h_i) ^ _u32(h_j)
    a = a ^ (a >> 16)
    a = a * jnp.uint32(0x7FEB352D)
    a = a ^ b
    a = a ^ (a >> 15)
    a = a * jnp.uint32(0x846CA68B)
    a = a ^ (a >> 16)
    return a


def pair_uniform_fast(h_i: Array, h_j: Array) -> Array:
    """Symmetric theta_ij from precomputed per-particle hashes."""
    return _u32_to_symmetric_uniform(combine_symmetric(h_i, h_j))


def uniform_stream(h: Array, salt: int) -> Array:
    """Derive an independent symmetric-uniform stream from a pair hash.

    Used where one pair needs several independent noises (eDPD heat flux,
    tDPD per-species flux): re-mix the combined hash with a salt.
    """
    a = _u32(h) ^ (_u32(salt) * jnp.uint32(0x9E3779B9))
    a = a ^ (a >> 16)
    a = a * jnp.uint32(0x2C1B3C6D)
    a = a ^ (a >> 12)
    a = a * jnp.uint32(0x297A2D39)
    a = a ^ (a >> 15)
    return _u32_to_symmetric_uniform(a)


# ---------------------------------------------------------------------------
# Initialization RNG (host-side, uses jax.random; not in the hot loop)
# ---------------------------------------------------------------------------

def maxwell_velocities(key: Array, n: int, kt: float, mass, dim: int = 3,
                       dtype=jnp.float32) -> Array:
    """`velocity create`-style Maxwell init: draw, zero momentum, rescale to kT.

    Analog of LAMMPS ``src/velocity.cpp`` (SURVEY.md §2a row 10): after
    removing the center-of-mass drift, velocities are rescaled so the kinetic
    temperature (with dim*(n-1) degrees of freedom) is exactly ``kt``.
    """
    mass = jnp.asarray(mass, dtype)
    v = jax.random.normal(key, (n, dim), dtype) * jnp.sqrt(kt / mass).reshape(-1, 1)
    mv = (mass.reshape(-1, 1) * v) if mass.ndim else mass * v
    v = v - jnp.mean(mv, axis=0) / jnp.mean(mass)
    m_col = mass.reshape(-1, 1) if mass.ndim else mass
    ke2 = jnp.sum(m_col * v * v)  # = 2 * kinetic energy
    dof = dim * (n - 1)
    scale = jnp.sqrt(dof * kt / ke2)
    return v * scale


def pair_hash_tea(tag_i, tag_j, step, seed, rounds: int = 8) -> Array:
    """Symmetric per-pair hash from full TEA on the sorted tag pair — the
    reference-parity counter (SURVEY.md §3.3). Feed to ``uniform_stream``
    for models that need several independent noises per pair (eDPD heat,
    tDPD per-species fluxes)."""
    lo = jnp.minimum(tag_i, tag_j)
    hi = jnp.maximum(tag_i, tag_j)
    v0, _ = tea(lo, hi, _u32(step), _u32(seed), rounds=rounds)
    return v0

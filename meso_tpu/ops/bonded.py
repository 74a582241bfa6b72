"""Bonded mesostructure forces — FENE polymers and RBC-like membranes.

TPU-native analog of the reference's bonded CUDA kernels
(``bond_fene_meso.cu``, membrane angle/area/volume fixes; SURVEY.md §2b
row 24, A.4). Design:

* topology lives in TAG space so it survives the bucket resort: a
  tag->row inverse map is rebuilt per force call (one scatter);
* pair-bond terms (FENE, harmonic, WLC-POW) are explicit closed-form
  forces gathered per bond end and scatter-added to rows;
* the full membrane energy (WLC-POW springs + cos-bending across adjacent
  triangles + global/local area and volume penalties) is written as a
  scalar energy function and differentiated with ``jax.grad`` — exact
  forces by construction (the reference hand-codes these; autodiff is the
  idiomatic functional equivalent and is validated against finite
  differences in tests);
* scatter-adds are XLA deterministic-order; two writers per bond is safe.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from meso_tpu.core.box import Box

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BondedParams:
    """Static-shape topology + coefficients. Indices are 1-based tags;
    rows with tag 0 are padding (masked out)."""

    # 2-body bonds
    bond_tags: Array           # (NB, 2) int32 tags (0 = padding)
    bond_type: Array           # (NB,) int32 -> coefficient row
    bond_coeffs: Array         # (n_btypes, 4): FENE (K, R0, eps, sigma)
    #                            or harmonic (K, r0, 0, 0) or
    #                            WLC-POW (kT/p, l_max, k_p, m)
    # 3-body angles (harmonic bending)
    angle_tags: Optional[Array] = None   # (NA, 3) int32
    angle_coeffs: Optional[Array] = None  # (n_atypes, 2): (k, theta0)
    angle_type: Optional[Array] = None
    # membrane triangulation
    tri_tags: Optional[Array] = None     # (NT, 3) int32 triangle vertices
    tri_mol: Optional[Array] = None      # (NT,) int32 molecule id (0-based)
    membrane: Optional[Array] = None     # (n_mols, 6): (ka_g, A0, kv, V0,
    #                                       ka_local, unused)
    tri_a0: Optional[Array] = None       # (NT,) per-triangle rest areas for
    #                                      LOCAL area conservation (A.4)
    # bending hinges: adjacent-triangle pairs sharing edge (a,b) with
    # opposite vertices c,d; E = kb (1 - cos(theta - theta0))
    hinge_tags: Optional[Array] = None   # (NH, 4) int32 tags (a, b, c, d)
    hinge_coeffs: Optional[Array] = None  # (NH, 2): (kb, theta0)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def inverse_tag_map(tag: Array, mask: Array, n_tags: int) -> Array:
    """inv[t] = row holding tag t (1-based tags; inv[0] = 0 junk)."""
    inv = jnp.zeros((n_tags + 1,), jnp.int32)
    src = jnp.where(mask, tag, 0)
    return inv.at[src].set(jnp.arange(tag.shape[0], dtype=jnp.int32))


def presence_map(tag: Array, mask: Array, n_tags: int) -> Array:
    """present[t] = True iff some masked row carries tag t (present[0] =
    False). Under domain decomposition, rows include halo ghosts and a
    missing tag means the partner is beyond halo reach — a checked
    invariant (SURVEY.md §5.2)."""
    present = jnp.zeros((n_tags + 1,), bool)
    src = jnp.where(mask, tag, 0)
    present = present.at[src].set(True)
    return present.at[0].set(False)


# ---------------------------------------------------------------------------
# 2-body bonds
# ---------------------------------------------------------------------------

def fene_force(dr: Array, k, r0):
    """FENE: U = -1/2 K R0^2 ln(1-(r/R0)^2); f_i = -K dr / (1-(r/R0)^2).

    Clamped at 0.99 R0 like common MD practice to avoid inf on overshoot.
    """
    r2 = jnp.sum(dr * dr, -1)
    x = jnp.minimum(r2 / (r0 * r0), 0.9801)
    fmag = -k / (1.0 - x)          # force factor multiplying dr (on i)
    return fmag[..., None] * dr


def harmonic_force(dr: Array, k, r0):
    r = jnp.sqrt(jnp.maximum(jnp.sum(dr * dr, -1), 1e-12))
    fmag = -2.0 * k * (r - r0) / r
    return fmag[..., None] * dr


def wlc_pow_force(dr: Array, kbt_p, l_max, k_p, m):
    """WLC-POW spring (Fedosov RBC): attraction f_wlc = -(kBT/p) *
    [1/(4(1-x)^2) - 1/4 + x], x = r/l_max, plus repulsive power k_p/r^m.
    Returns force on i along dr."""
    r = jnp.sqrt(jnp.maximum(jnp.sum(dr * dr, -1), 1e-12))
    x = jnp.minimum(r / l_max, 0.99)
    f_wlc = -(kbt_p) * (0.25 / ((1.0 - x) ** 2) - 0.25 + x)
    f_pow = k_p / jnp.power(r, m)
    fmag = (f_wlc + f_pow) / r
    return fmag[..., None] * dr


def bond_forces(x: Array, tag: Array, mask: Array, box: Box,
                params: BondedParams, style: str, n_tags: int) -> Array:
    """Accumulate 2-body bond forces into (N,3) rows."""
    inv = inverse_tag_map(tag, mask, n_tags)
    bi = inv[params.bond_tags[:, 0]]
    bj = inv[params.bond_tags[:, 1]]
    valid = (params.bond_tags[:, 0] > 0)[:, None]
    dr = box.min_image(x[bi] - x[bj])
    c = params.bond_coeffs[params.bond_type]
    if style == "fene":
        f_i = fene_force(dr, c[:, 0], c[:, 1])
    elif style == "harmonic":
        f_i = harmonic_force(dr, c[:, 0], c[:, 1])
    elif style == "wlc_pow":
        f_i = wlc_pow_force(dr, c[:, 0], c[:, 1], c[:, 2], c[:, 3])
    else:
        raise ValueError(f"unknown bond style {style!r}")
    f_i = jnp.where(valid, f_i, 0.0)
    f = jnp.zeros_like(x)
    f = f.at[bi].add(f_i)
    f = f.at[bj].add(-f_i)
    return f


# ---------------------------------------------------------------------------
# 3-body angles (harmonic in theta)
# ---------------------------------------------------------------------------

def angle_energy(x: Array, inv: Array, params: BondedParams,
                 box: Box, present: Array | None = None) -> Array:
    ta = params.angle_tags
    i, j, k_ = inv[ta[:, 0]], inv[ta[:, 1]], inv[ta[:, 2]]
    valid = ta[:, 0] > 0
    if present is not None:
        valid = valid & jnp.all(present[ta], axis=1)
    r1 = box.min_image(x[i] - x[j])
    r2 = box.min_image(x[k_] - x[j])
    cosang = jnp.sum(r1 * r2, -1) * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(r1 * r1, -1) * jnp.sum(r2 * r2, -1), 1e-12))
    cosang = jnp.clip(cosang, -0.9999, 0.9999)
    theta = jnp.arccos(cosang)
    c = params.angle_coeffs[params.angle_type]
    e = c[:, 0] * (theta - c[:, 1]) ** 2
    return jnp.sum(jnp.where(valid, e, 0.0))


def hinge_bending_energy(x: Array, inv: Array, params: BondedParams,
                         box: Box, present: Array | None = None) -> Array:
    """Fedosov-type bending across adjacent triangles (A.4): for triangles
    (a,b,c) and (b,a,d) sharing edge ab, E = kb (1 - cos(theta - theta0))
    with theta the dihedral between their normals."""
    h = params.hinge_tags
    a, b, c, d = inv[h[:, 0]], inv[h[:, 1]], inv[h[:, 2]], inv[h[:, 3]]
    valid = h[:, 0] > 0
    if present is not None:
        valid = valid & jnp.all(present[h], axis=1)
    xa = x[a]
    e_ab = box.min_image(x[b] - xa)
    e_ac = box.min_image(x[c] - xa)
    e_ad = box.min_image(x[d] - xa)
    n1 = jnp.cross(e_ab, e_ac)
    n2 = jnp.cross(e_ad, e_ab)  # orientation so flat sheet -> theta = 0
    cosq = jnp.sum(n1 * n2, -1) * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(n1 * n1, -1) * jnp.sum(n2 * n2, -1), 1e-18))
    cosq = jnp.clip(cosq, -0.9999, 0.9999)
    theta = jnp.arccos(cosq)
    kb = params.hinge_coeffs[:, 0]
    th0 = params.hinge_coeffs[:, 1]
    e = kb * (1.0 - jnp.cos(theta - th0))
    return jnp.sum(jnp.where(valid, e, 0.0))


# ---------------------------------------------------------------------------
# Membrane (triangulated closed surface; Fedosov-type)
# ---------------------------------------------------------------------------

def _tri_geometry(xu: Array, inv: Array, params: BondedParams,
                  valid: Array):
    """(area_t, v_t) per triangle from UNWRAPPED coordinates.

    Unwrapped positions (x + image * L) make the signed volume exact and
    shift-invariant for a closed mesh even when the vesicle wraps the
    periodic box (the round-1 origin-anchored form was valid only while it
    did not; VERDICT r1 weak #7 / SURVEY A.4)."""
    tri = params.tri_tags
    i, j, k_ = inv[tri[:, 0]], inv[tri[:, 1]], inv[tri[:, 2]]
    p0 = xu[i]
    e1 = xu[j] - p0
    e2 = xu[k_] - p0
    cross = jnp.cross(e1, e2)
    area_t = 0.5 * jnp.sqrt(jnp.maximum(jnp.sum(cross * cross, -1), 1e-18))
    area_t = jnp.where(valid, area_t, 0.0)
    v_t = jnp.where(valid, jnp.sum(p0 * cross, -1) / 6.0, 0.0)
    return area_t, v_t


def membrane_scalars(xu: Array, inv: Array, present: Array, owner: Array,
                     params: BondedParams, n_mols: int):
    """Per-molecule (area, signed volume) partial sums over triangles whose
    FIRST tag this rank owns (so a cross-device psum counts each triangle
    exactly once)."""
    tri = params.tri_tags
    valid = ((tri[:, 0] > 0) & present[tri[:, 0]] & present[tri[:, 1]]
             & present[tri[:, 2]] & owner[tri[:, 0]])
    area_t, v_t = _tri_geometry(xu, inv, params, valid)
    mol = params.tri_mol
    area = jnp.zeros((n_mols,)).at[mol].add(area_t)
    vol = jnp.zeros((n_mols,)).at[mol].add(v_t)
    return area, vol


def membrane_energy(xu: Array, inv: Array, present: Array,
                    params: BondedParams, n_mols: int,
                    area_g: Array, vol_g: Array) -> Array:
    """Membrane energy terms given the GLOBAL per-molecule area/volume.

    Global conservation enters linearized with stop-gradient multipliers
    lambda = dE/dA — exactly equivalent to differentiating the quadratic
    penalty (E = ka (A-A0)^2/(2A0) => dE/dx = lambda dA/dx), and the form
    that distributes: each rank needs only the psum'd scalars (A, V) plus
    its own triangles' geometry (SURVEY A.4). Adds per-triangle LOCAL area
    conservation when ``tri_a0`` is set."""
    tri = params.tri_tags
    valid = ((tri[:, 0] > 0) & present[tri[:, 0]] & present[tri[:, 1]]
             & present[tri[:, 2]])
    area_t, v_t = _tri_geometry(xu, inv, params, valid)
    mol = params.tri_mol
    c = params.membrane  # (n_mols, 6)
    ka, a0, kv, v0 = c[:, 0], c[:, 1], c[:, 2], c[:, 3]
    lam_a = jax.lax.stop_gradient(
        ka * (area_g - a0) / jnp.maximum(a0, 1e-9))
    lam_v = jax.lax.stop_gradient(
        kv * (jnp.abs(vol_g) - v0) / jnp.maximum(v0, 1e-9)
        * jnp.sign(vol_g))
    e = jnp.sum(lam_a[mol] * area_t) + jnp.sum(lam_v[mol] * v_t)
    if params.tri_a0 is not None:
        ka_l = c[:, 4][mol]
        a0_t = jnp.maximum(params.tri_a0, 1e-9)
        e_loc = ka_l * (area_t - params.tri_a0) ** 2 / (2.0 * a0_t)
        e = e + jnp.sum(jnp.where(valid, e_loc, 0.0))
    return e


def _count_missing(present: Array, owned: Array, tags: Array) -> Array:
    """Checked invariant: terms with an owned participant but an
    unresolvable partner (beyond halo reach under DD)."""
    real = tags[:, 0] > 0
    relevant = real & jnp.any(owned[tags], axis=1)
    resolved = jnp.all(present[tags] | (tags == 0), axis=1)
    return jnp.sum(relevant & ~resolved).astype(jnp.int32)


def bonded_forces_ext(x: Array, tag: Array, mask: Array, box: Box,
                      params: BondedParams, style: str, n_tags: int,
                      n_mols: int = 0, image: Array | None = None,
                      owner_mask: Array | None = None,
                      reduce_sum=None):
    """Total bonded force with domain-decomposition support.

    Rows may include halo ghosts: ``mask`` marks rows usable for tag lookup;
    ``owner_mask`` marks rows whose forces this rank owns (ghost-row forces
    are zeroed — each partner's owner computes its own side of every term,
    the same no-reverse-comm property as the pair path, SURVEY §3.2);
    ``reduce_sum`` (e.g. a psum) combines per-molecule membrane scalars
    across ranks. Returns (f, missing) where ``missing`` counts terms with
    an owned participant whose partner is beyond halo reach (checked
    invariant, SURVEY.md §5.2).
    """
    owner_rows = mask if owner_mask is None else (mask & owner_mask)
    inv = inverse_tag_map(tag, mask, n_tags)
    present = presence_map(tag, mask, n_tags)
    owned = presence_map(tag, owner_rows, n_tags)

    # --- 2-body bonds (explicit closed form) ---
    bt = params.bond_tags
    resolved_b = ((bt[:, 0] > 0) & present[bt[:, 0]] & present[bt[:, 1]])
    missing = _count_missing(present, owned, bt)
    bi = inv[bt[:, 0]]
    bj = inv[bt[:, 1]]
    dr = box.min_image(x[bi] - x[bj])
    c = params.bond_coeffs[params.bond_type]
    if style == "fene":
        f_i = fene_force(dr, c[:, 0], c[:, 1])
    elif style == "harmonic":
        f_i = harmonic_force(dr, c[:, 0], c[:, 1])
    elif style == "wlc_pow":
        f_i = wlc_pow_force(dr, c[:, 0], c[:, 1], c[:, 2], c[:, 3])
    else:
        raise ValueError(f"unknown bond style {style!r}")
    f_i = jnp.where(resolved_b[:, None], f_i, 0.0)
    f = jnp.zeros_like(x)
    f = f.at[bi].add(f_i)
    f = f.at[bj].add(-f_i)

    # --- 3-body / membrane terms via autodiff of the energy ---
    needs_grad = (params.angle_tags is not None or
                  params.tri_tags is not None or
                  params.hinge_tags is not None)
    if needs_grad:
        img = jnp.zeros_like(x) if image is None else \
            image.astype(x.dtype) * box.lengths
        if params.angle_tags is not None:
            missing = missing + _count_missing(present, owned,
                                               params.angle_tags)
        if params.hinge_tags is not None:
            missing = missing + _count_missing(present, owned,
                                               params.hinge_tags)
        if params.tri_tags is not None:
            missing = missing + _count_missing(present, owned,
                                               params.tri_tags)
            area_p, vol_p = membrane_scalars(x + img, inv, present, owned,
                                             params, n_mols)
            if reduce_sum is not None:
                area_p = reduce_sum(area_p)
                vol_p = reduce_sum(vol_p)

        def energy(xx):
            e = 0.0
            if params.angle_tags is not None:
                e = e + angle_energy(xx, inv, params, box,
                                     present=present)
            if params.tri_tags is not None:
                e = e + membrane_energy(xx + img, inv, present, params,
                                        n_mols, area_p, vol_p)
            if params.hinge_tags is not None:
                e = e + hinge_bending_energy(xx, inv, params, box,
                                             present=present)
            return e

        f = f - jax.grad(energy)(x)
    return jnp.where(owner_rows[:, None], f, 0.0), missing


def bonded_forces(x: Array, tag: Array, mask: Array, box: Box,
                  params: BondedParams, style: str, n_tags: int,
                  n_mols: int = 0, image: Array | None = None) -> Array:
    """Single-rank bonded force (all tags resolvable by construction)."""
    f, _ = bonded_forces_ext(x, tag, mask, box, params, style, n_tags,
                             n_mols, image=image)
    return f

"""Bonded-force unit tests: closed-form vs autodiff-of-energy, momentum
conservation, topology-through-resort invariance (SURVEY.md §4 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np

from meso_tpu.core.box import Box
from meso_tpu.ops.bonded import (BondedParams, bond_forces, bonded_forces,
                                 fene_force, harmonic_force,
                                 inverse_tag_map, wlc_pow_force)


def test_fene_matches_autodiff():
    def fene_energy(dr, k, r0):
        r2 = jnp.sum(dr * dr)
        return -0.5 * k * r0 ** 2 * jnp.log(1.0 - r2 / r0 ** 2)

    dr = jnp.asarray([0.4, -0.3, 0.2])
    k, r0 = 30.0, 1.5
    f_closed = fene_force(dr, k, r0)
    f_grad = -jax.grad(fene_energy)(dr, k, r0)
    assert np.allclose(f_closed, f_grad, rtol=1e-5)


def test_harmonic_matches_autodiff():
    def e(dr, k, r0):
        r = jnp.sqrt(jnp.sum(dr * dr))
        return k * (r - r0) ** 2

    dr = jnp.asarray([0.5, 0.1, -0.7])
    f_closed = harmonic_force(dr, 10.0, 0.8)
    f_grad = -jax.grad(e)(dr, 10.0, 0.8)
    assert np.allclose(f_closed, f_grad, rtol=1e-5)


def test_wlc_pow_matches_autodiff():
    def e(dr, kbt_p, l_max, k_p, m):
        r = jnp.sqrt(jnp.sum(dr * dr))
        x = r / l_max
        e_wlc = kbt_p * l_max * (0.25 / (1.0 - x) - 0.25 * x + 0.5 * x * x)
        e_pow = k_p * jnp.power(r, 1.0 - m) / (m - 1.0)
        return e_wlc + e_pow

    dr = jnp.asarray([0.3, 0.2, -0.1])
    args = (50.0, 1.2, 0.2, 2.0)
    f_closed = wlc_pow_force(dr, *args)
    f_grad = -jax.grad(e)(dr, *args)
    assert np.allclose(f_closed, f_grad, rtol=1e-4), (f_closed, f_grad)


def test_bond_forces_newton_and_padding():
    box = Box.cubic(10.0)
    x = jnp.asarray([[1.0, 1.0, 1.0], [1.8, 1.0, 1.0], [5.0, 5.0, 5.0]])
    tag = jnp.asarray([1, 2, 3], jnp.int32)
    mask = jnp.ones(3, bool)
    params = BondedParams(
        bond_tags=jnp.asarray([[1, 2], [0, 0]], jnp.int32),  # 1 real + pad
        bond_type=jnp.zeros(2, jnp.int32),
        bond_coeffs=jnp.asarray([[30.0, 1.5, 0, 0]], jnp.float32))
    f = bond_forces(x, tag, mask, box, params, "fene", 3)
    f = np.asarray(f)
    assert np.allclose(f[0], -f[1])
    assert np.allclose(f[2], 0.0)
    assert f[0, 0] > 0  # dr = x0-x1 = (-0.8,..); FENE pulls 0 toward 1? no:
    # FENE is attractive: force on particle 0 points toward particle 1 (+x)


def test_bond_across_periodic_boundary():
    box = Box.cubic(10.0)
    x = jnp.asarray([[0.2, 5.0, 5.0], [9.9, 5.0, 5.0]])  # 0.3 apart via wrap
    tag = jnp.asarray([1, 2], jnp.int32)
    params = BondedParams(
        bond_tags=jnp.asarray([[1, 2]], jnp.int32),
        bond_type=jnp.zeros(1, jnp.int32),
        bond_coeffs=jnp.asarray([[30.0, 1.5, 0, 0]], jnp.float32))
    f = np.asarray(bond_forces(x, tag, jnp.ones(2, bool), box, params,
                               "fene", 2))
    # attraction through the boundary: particle 0 pulled in -x
    assert f[0, 0] < 0 and np.allclose(f[0], -f[1])
    # magnitude matches direct computation at r=0.3
    k, r0 = 30.0, 1.5
    expect = k * 0.3 / (1 - (0.3 / r0) ** 2)
    assert abs(abs(f[0, 0]) - expect) < 1e-3


def test_topology_invariant_under_permutation():
    """Row permutation (the bucket resort) must not change bonded forces."""
    box = Box.cubic(6.0)
    rs = np.random.RandomState(0)
    n = 20
    x = jnp.asarray(rs.uniform(0, 6, (n, 3)), jnp.float32)
    tag = jnp.arange(1, n + 1, dtype=jnp.int32)
    mask = jnp.ones(n, bool)
    bonds = jnp.asarray([[i, i + 1] for i in range(1, n, 2)], jnp.int32)
    params = BondedParams(
        bond_tags=bonds, bond_type=jnp.zeros(len(bonds), jnp.int32),
        bond_coeffs=jnp.asarray([[30.0, 1.5, 0, 0]], jnp.float32))
    f1 = np.asarray(bonded_forces(x, tag, mask, box, params, "fene", n))
    perm = rs.permutation(n)
    f2 = np.asarray(bonded_forces(x[perm], tag[perm], mask, box, params,
                                  "fene", n))
    assert np.allclose(f1[perm], f2, atol=1e-6)


def test_membrane_energy_grad_shrinks_inflated_sphere():
    """A vesicle inflated beyond V0 must feel inward forces."""
    from meso_tpu.models.polymer import icosphere
    verts, faces = icosphere(1)
    box = Box.cubic(20.0)
    x0 = jnp.asarray(verts * 2.0 + 10.0, jnp.float32)
    n = len(verts)
    tag = jnp.arange(1, n + 1, dtype=jnp.int32)
    mask = jnp.ones(n, bool)
    # rest state computed at radius 2, then inflate by 10%
    p = np.asarray(x0)
    e1 = p[faces[:, 1]] - p[faces[:, 0]]
    e2 = p[faces[:, 2]] - p[faces[:, 0]]
    cr = np.cross(e1, e2)
    area0 = 0.5 * np.linalg.norm(cr, axis=1).sum()
    vol0 = abs((p[faces[:, 0]] * cr).sum() / 6.0)
    params = BondedParams(
        bond_tags=jnp.zeros((1, 2), jnp.int32),  # no bonds
        bond_type=jnp.zeros(1, jnp.int32),
        bond_coeffs=jnp.asarray([[0.0, 1.0, 0, 0]], jnp.float32),
        tri_tags=jnp.asarray(faces + 1, jnp.int32),
        tri_mol=jnp.zeros(len(faces), jnp.int32),
        membrane=jnp.asarray([[100.0, area0, 100.0, vol0, 0, 0]],
                             jnp.float32))
    center = jnp.asarray([10.0, 10.0, 10.0])
    x_inflated = (x0 - center) * 1.1 + center
    f = np.asarray(bonded_forces(x_inflated, tag, mask, box, params,
                                 "harmonic", n, n_mols=1))
    # radial component must point inward everywhere
    radial = np.sum(f * np.asarray(x_inflated - center), axis=1)
    assert (radial < 0).all()


def test_hinge_bending_flat_vs_folded():
    """Bending energy gradient flattens a folded hinge toward theta0=0."""
    from meso_tpu.ops.bonded import hinge_bending_energy
    import jax as _jax
    box = Box.cubic(20.0)
    # two triangles sharing edge (1,2): verts 1=(0,0,0), 2=(1,0,0),
    # 3=(0.5,1,0) [tri 1], 4=(0.5,-1,0.5) folded out of plane [tri 2]
    x = jnp.asarray([[0., 0., 0.], [1., 0., 0.],
                     [0.5, 1., 0.], [0.5, -1., 0.5]])
    tag = jnp.arange(1, 5, dtype=jnp.int32)
    mask = jnp.ones(4, bool)
    params = BondedParams(
        bond_tags=jnp.zeros((1, 2), jnp.int32),
        bond_type=jnp.zeros(1, jnp.int32),
        bond_coeffs=jnp.asarray([[0.0, 1.0, 0, 0]], jnp.float32),
        hinge_tags=jnp.asarray([[1, 2, 3, 4]], jnp.int32),
        hinge_coeffs=jnp.asarray([[5.0, 0.0]], jnp.float32))
    inv = inverse_tag_map(tag, mask, 4)
    e_folded = float(hinge_bending_energy(x, inv, params, box))
    x_flat = x.at[3, 2].set(0.0)
    e_flat = float(hinge_bending_energy(x_flat, inv, params, box))
    assert e_flat < 1e-3  # cos-clip guard leaves ~5e-4 residual
    assert e_folded > 0.1
    # force pushes the folded vertex back toward the plane
    f = bonded_forces(x, tag, mask, box, params, "harmonic", 4)
    assert float(f[3, 2]) < 0.0


def test_membrane_with_hinges_runs():
    from meso_tpu.models.polymer import build_hinges, icosphere
    verts, faces = icosphere(1)
    hinges = build_hinges(faces)
    # closed surface: every edge shared by exactly 2 faces -> NH = 3F/2
    assert len(hinges) == 3 * len(faces) // 2

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


def _vesicle_params(verts, faces, radius=2.0, center=10.0, ka=100.0,
                    kv=100.0, ka_local=0.0):
    p = np.asarray(verts) * radius + center
    e1 = p[faces[:, 1]] - p[faces[:, 0]]
    e2 = p[faces[:, 2]] - p[faces[:, 0]]
    cr = np.cross(e1, e2)
    tri_a0 = 0.5 * np.linalg.norm(cr, axis=1)
    area0 = float(tri_a0.sum())
    vol0 = float(abs((p[faces[:, 0]] * cr).sum() / 6.0))
    return BondedParams(
        bond_tags=jnp.zeros((1, 2), jnp.int32),
        bond_type=jnp.zeros(1, jnp.int32),
        bond_coeffs=jnp.asarray([[0.0, 1.0, 0, 0]], jnp.float32),
        tri_tags=jnp.asarray(faces + 1, jnp.int32),
        tri_mol=jnp.zeros(len(faces), jnp.int32),
        membrane=jnp.asarray([[ka, area0, kv, vol0, ka_local, 0]],
                             jnp.float32),
        tri_a0=jnp.asarray(tri_a0, jnp.float32)), jnp.asarray(p, jnp.float32)


def test_membrane_volume_box_wrap_invariant():
    """Forces on a vesicle that wraps the periodic box (with consistent
    image flags) must equal the unwrapped case — the round-1 origin-anchored
    volume failed exactly this (VERDICT r1 weak #7)."""
    from meso_tpu.models.polymer import icosphere
    verts, faces = icosphere(1)
    l = 20.0
    box = Box.cubic(l)
    params, x = _vesicle_params(verts, faces)
    n = len(verts)
    tag = jnp.arange(1, n + 1, dtype=jnp.int32)
    mask = jnp.ones(n, bool)
    x_infl = (x - 10.0) * 1.1 + 10.0
    img0 = jnp.zeros((n, 3), jnp.int32)
    f_ref = np.asarray(bonded_forces(x_infl, tag, mask, box, params,
                                     "harmonic", n, n_mols=1, image=img0))
    # translate so the vesicle straddles the x boundary, rewrap + images
    shift = jnp.asarray([l - 10.0, 0.0, 0.0])
    xs = x_infl + shift
    img = (xs[:, 0] >= l).astype(jnp.int32)
    x_wrapped = xs.at[:, 0].add(-img * l)
    image = jnp.stack([img, jnp.zeros_like(img), jnp.zeros_like(img)], -1)
    f_wrap = np.asarray(bonded_forces(x_wrapped, tag, mask, box, params,
                                      "harmonic", n, n_mols=1, image=image))
    assert np.abs(f_wrap - f_ref).max() < 1e-4


def test_membrane_local_area_conservation():
    """Per-triangle local area term (SURVEY A.4 'global + local'): shear a
    single vertex tangentially so GLOBAL area stays ~fixed but local areas
    change -> only the local term produces restoring forces."""
    from meso_tpu.models.polymer import icosphere
    verts, faces = icosphere(1)
    l = 20.0
    box = Box.cubic(l)
    n = len(verts)
    tag = jnp.arange(1, n + 1, dtype=jnp.int32)
    mask = jnp.ones(n, bool)
    params_g, x = _vesicle_params(verts, faces, ka=100.0, kv=0.0,
                                  ka_local=0.0)
    params_l, _ = _vesicle_params(verts, faces, ka=0.0, kv=0.0,
                                  ka_local=50.0)
    rs = np.random.RandomState(3)
    xp = np.array(x)
    # tangential displacement of one vertex redistributes area between
    # adjacent triangles at ~constant total
    v0 = xp[0] - 10.0
    t = np.cross(v0, [0, 0, 1.0])
    t /= np.linalg.norm(t)
    xp[0] += 0.2 * t
    xp = jnp.asarray(xp, jnp.float32)
    f_g = np.asarray(bonded_forces(xp, tag, mask, box, params_g,
                                   "harmonic", n, n_mols=1))
    f_l = np.asarray(bonded_forces(xp, tag, mask, box, params_l,
                                   "harmonic", n, n_mols=1))
    assert np.abs(f_l).max() > 5 * np.abs(f_g).max()
    # and the local force opposes the displacement
    assert float(np.dot(f_l[0], t)) < 0.0


def test_membrane_forces_match_quadratic_penalty_grad():
    """The stop-gradient lambda formulation must equal differentiating the
    full quadratic penalty E = ka(A-A0)^2/2A0 + kv(|V|-V0)^2/2V0."""
    from meso_tpu.models.polymer import icosphere
    verts, faces = icosphere(1)
    box = Box.cubic(20.0)
    params, x = _vesicle_params(verts, faces, ka=80.0, kv=120.0)
    n = len(verts)
    tag = jnp.arange(1, n + 1, dtype=jnp.int32)
    mask = jnp.ones(n, bool)
    xp = (x - 10.0) * 1.07 + 10.0
    f = np.asarray(bonded_forces(xp, tag, mask, box, params,
                                 "harmonic", n, n_mols=1))

    c = np.asarray(params.membrane)[0]
    tri = np.asarray(params.tri_tags) - 1

    def quad_energy(xx):
        p0 = xx[tri[:, 0]]
        cr = jnp.cross(xx[tri[:, 1]] - p0, xx[tri[:, 2]] - p0)
        area = jnp.sum(0.5 * jnp.sqrt(jnp.sum(cr * cr, -1)))
        vol = jnp.abs(jnp.sum(jnp.sum(p0 * cr, -1)) / 6.0)
        return (c[0] * (area - c[1]) ** 2 / (2 * c[1])
                + c[2] * (vol - c[3]) ** 2 / (2 * c[3]))

    f_ref = np.asarray(-jax.grad(quad_energy)(xp))
    scale = np.abs(f_ref).max()
    assert np.abs(f - f_ref).max() / scale < 2e-3


def test_hinge_theta_matches_atan2_dihedral():
    """Dihedral-form parity (round-2 ledger): the hinge's normal-angle
    theta must equal the standard atan2 dihedral angle magnitude."""
    from meso_tpu.ops.bonded import hinge_bending_energy
    rs = np.random.RandomState(9)
    box = Box.cubic(50.0)
    for trial in range(5):
        x = jnp.asarray(rs.uniform(20, 22, (4, 3)), jnp.float32)
        tag = jnp.arange(1, 5, dtype=jnp.int32)
        mask = jnp.ones(4, bool)
        kb = 1.0
        params = BondedParams(
            bond_tags=jnp.zeros((1, 2), jnp.int32),
            bond_type=jnp.zeros(1, jnp.int32),
            bond_coeffs=jnp.asarray([[0.0, 1.0, 0, 0]], jnp.float32),
            hinge_tags=jnp.asarray([[1, 2, 3, 4]], jnp.int32),
            hinge_coeffs=jnp.asarray([[kb, 0.0]], jnp.float32))
        inv = inverse_tag_map(tag, mask, 4)
        e = float(hinge_bending_energy(x, inv, params, box))
        # standard dihedral about axis b = x2-x1 between half-planes to
        # x3 and x4: theta_hinge = |pi - |dihedral|| by construction of
        # the normals n1 = (b x e_ac), n2 = (e_ad x b)
        xa, xb, xc, xd = np.asarray(x)
        b = xb - xa
        n1 = np.cross(b, xc - xa)
        n2 = np.cross(xd - xa, b)
        m = np.cross(n1, b / np.linalg.norm(b))
        dih = np.arctan2(np.dot(m, n2), np.linalg.norm(b) *
                         np.dot(n1, n2) / np.linalg.norm(b))
        theta = np.arccos(np.clip(np.dot(n1, n2) /
                                  (np.linalg.norm(n1) * np.linalg.norm(n2)),
                                  -1, 1))
        e_ref = kb * (1.0 - np.cos(theta))
        assert abs(e - e_ref) < 5e-3
        assert abs(abs(dih) - theta) < 5e-3

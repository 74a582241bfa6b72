"""Config 5 — FENE polymer chains and RBC-like membrane in DPD solvent
(BASELINE.json configs[4]; SURVEY.md A.4).

Polymers: Nc chains of Lc beads (FENE K=30, R0=1.5 classic DPD polymer)
initialized as compact random walks, solvent filling to the target density.

Membrane: an icosphere vesicle whose edges carry WLC-POW springs with
global area/volume conservation penalties (Fedosov-type; bending dihedrals
can be layered on the same topology later), suspended in DPD solvent.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from meso_tpu.core.box import Box
from meso_tpu.core.rng import maxwell_velocities
from meso_tpu.core.state import zeros_state
from meso_tpu.core.system import System, SystemParams, setup
from meso_tpu.ops.bonded import BondedParams
from meso_tpu.ops.dpd import DPDParams


def _random_walk_chain(rs, start, nbeads, step_len, l):
    pos = [np.asarray(start, float)]
    for _ in range(nbeads - 1):
        d = rs.normal(size=3)
        d *= step_len / np.linalg.norm(d)
        pos.append(pos[-1] + d)
    return np.asarray(pos) % l


def polymer_melt(l: float = 10.0, density: float = 3.0, n_chains: int = 10,
                 chain_len: int = 20, kt: float = 1.0, a: float = 25.0,
                 gamma: float = 4.5, rc: float = 1.0, fene_k: float = 30.0,
                 fene_r0: float = 1.5, dt: float = 0.01, seed: int = 551,
                 init_seed: int = 5, force_path: str = "nlist",
                 rng_mode: str = "fast", skin: float = 0.3,
                 special_weight: float | None = None):
    """FENE chains + solvent. Returns (system, params, state).

    special_weight: if set, bonded-neighbor pairs get their non-bonded DPD
    force scaled by this weight (LAMMPS ``special_bonds``; works on every
    force path including the Pallas kernel)."""
    rs = np.random.RandomState(init_seed)
    n_poly = n_chains * chain_len
    n_total = int(round(density * l ** 3))
    n_solvent = n_total - n_poly
    assert n_solvent > 0

    chains = [
        _random_walk_chain(rs, rs.uniform(0, l, 3), chain_len, 0.9, l)
        for _ in range(n_chains)]
    x_poly = np.concatenate(chains)
    x_solv = rs.uniform(0, l, (n_solvent, 3))
    x = jnp.asarray(np.concatenate([x_poly, x_solv]), jnp.float32)

    box = Box.cubic(l)
    state = zeros_state(n_total, box)
    mol = np.zeros(n_total, np.int32)
    for c in range(n_chains):
        mol[c * chain_len:(c + 1) * chain_len] = c + 1
    v = maxwell_velocities(jax.random.PRNGKey(init_seed), n_total, kt, 1.0)
    state = state.replace(
        x=x, v=v, tag=jnp.arange(1, n_total + 1, dtype=jnp.int32),
        mask=jnp.ones(n_total, bool), mol=jnp.asarray(mol))

    # consecutive-bead bonds, tags are 1-based
    bonds = []
    for c in range(n_chains):
        base = c * chain_len + 1
        for b in range(chain_len - 1):
            bonds.append((base + b, base + b + 1))
    bond_tags = jnp.asarray(np.asarray(bonds, np.int32))
    bonded = BondedParams(
        bond_tags=bond_tags,
        bond_type=jnp.zeros(len(bonds), jnp.int32),
        bond_coeffs=jnp.asarray([[fene_k, fene_r0, 0.0, 0.0]], jnp.float32))

    pair = DPDParams.build(a=a, gamma=gamma, rc=rc, kt=kt, seed=seed)
    if special_weight is not None:
        from meso_tpu.ops.dpd import build_exclusions
        excl, w = build_exclusions(np.asarray(bonds, np.int32), n_total,
                                   weight=special_weight, max_excl=2)
        pair = pair.replace(excl=excl, excl_w=w)
    params = SystemParams.build(pair).replace(bonded=bonded)
    system = System.for_fluid([l] * 3, rc=rc, density=density, dt=dt,
                              skin=skin, rng_mode=rng_mode)
    system = system.replace(bond_style="fene", n_tags=n_total,
                            force_path=force_path)
    return system, params, setup(system, params, state)


def icosphere(subdiv: int = 1):
    """Unit icosphere: returns (vertices (V,3), triangles (F,3) int)."""
    phi = (1 + 5 ** 0.5) / 2
    verts = np.asarray([
        [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
        [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
        [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1]], float)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.asarray([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], int)
    for _ in range(subdiv):
        cache = {}
        vlist = list(verts)

        def mid(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                m = (vlist[i] + vlist[j]) / 2
                m /= np.linalg.norm(m)
                cache[key] = len(vlist)
                vlist.append(m)
            return cache[key]

        nf = []
        for (i, j, k) in faces:
            ij, jk, ki = mid(i, j), mid(j, k), mid(k, i)
            nf += [[i, ij, ki], [j, jk, ij], [k, ki, jk], [ij, jk, ki]]
        verts = np.asarray(vlist)
        faces = np.asarray(nf, int)
    return verts, faces


def build_hinges(faces) -> np.ndarray:
    """(NH, 4) hinge quadruples (a, b, c, d): triangles (a,b,c) and (b,a,d)
    share edge ab; c/d are the opposite vertices. 0-based vertex indices."""
    edge_map = {}
    hinges = []
    for f, (i, j, k) in enumerate(faces):
        for (a, b, opp) in ((i, j, k), (j, k, i), (k, i, j)):
            key = (min(a, b), max(a, b))
            if key in edge_map:
                a0, b0, c0 = edge_map.pop(key)
                hinges.append((a0, b0, c0, opp))
            else:
                edge_map[key] = (a, b, opp)
    return np.asarray(hinges, np.int64)


def membrane_suspension(l: float = 12.0, density: float = 3.0,
                        radius: float = 3.0, subdiv: int = 2,
                        kt: float = 1.0, a: float = 25.0, gamma: float = 4.5,
                        rc: float = 1.0, dt: float = 0.01,
                        kbt_p: float = 50.0, k_p: float = 0.2, m_pow: float = 2.0,
                        ka: float = 500.0, kv: float = 500.0, kb: float = 20.0,
                        ka_local: float = 100.0,
                        seed: int = 661, init_seed: int = 6,
                        force_path: str = "nlist", rng_mode: str = "fast",
                        skin: float = 0.3):
    """One icosphere vesicle (type 0 like solvent) in DPD solvent.
    Edges: WLC-POW springs; global + per-triangle LOCAL area conservation
    and volume penalty (SURVEY A.4). Returns
    (system, params, state, mesh_info)."""
    rs = np.random.RandomState(init_seed)
    verts, faces = icosphere(subdiv)
    x_mem = verts * radius + l / 2
    n_mem = len(x_mem)
    n_total = int(round(density * l ** 3))
    # solvent outside the vesicle shell
    x_solv = []
    while len(x_solv) < n_total - n_mem:
        cand = rs.uniform(0, l, (4096, 3))
        r = np.linalg.norm(cand - l / 2, axis=1)
        keep = np.abs(r - radius) > 0.4
        x_solv.extend(cand[keep].tolist())
    x_solv = np.asarray(x_solv[: n_total - n_mem])
    x = jnp.asarray(np.concatenate([x_mem, x_solv]), jnp.float32)

    box = Box.cubic(l)
    state = zeros_state(n_total, box)
    mol = np.zeros(n_total, np.int32)
    mol[:n_mem] = 1
    v = maxwell_velocities(jax.random.PRNGKey(init_seed), n_total, kt, 1.0)
    state = state.replace(
        x=x, v=v, tag=jnp.arange(1, n_total + 1, dtype=jnp.int32),
        mask=jnp.ones(n_total, bool), mol=jnp.asarray(mol))

    # edges from faces (unique)
    edges = set()
    for (i, j, k) in faces:
        for e in ((i, j), (j, k), (k, i)):
            edges.add((min(e) + 1, max(e) + 1))  # 1-based tags
    edges = np.asarray(sorted(edges), np.int32)
    # equilibrium edge length -> l_max at ~2.2x
    el = np.linalg.norm(x_mem[edges[:, 0] - 1] - x_mem[edges[:, 1] - 1],
                        axis=1)
    l_max = float(el.mean() * 2.2)

    # rest area/volume of the icosphere
    p = x_mem
    e1 = p[faces[:, 1]] - p[faces[:, 0]]
    e2 = p[faces[:, 2]] - p[faces[:, 0]]
    cr = np.cross(e1, e2)
    tri_a0 = 0.5 * np.linalg.norm(cr, axis=1)
    area0 = float(tri_a0.sum())
    vol0 = float(np.abs((p[faces[:, 0]] * cr).sum() / 6.0))

    # bending hinges with the icosphere's rest dihedral as theta0
    hinges = build_hinges(faces)
    ha, hb, hc, hd = (x_mem[hinges[:, 0]], x_mem[hinges[:, 1]],
                      x_mem[hinges[:, 2]], x_mem[hinges[:, 3]])
    n1 = np.cross(hb - ha, hc - ha)
    n2 = np.cross(hd - ha, hb - ha)
    cos0 = (n1 * n2).sum(1) / np.sqrt((n1 * n1).sum(1) * (n2 * n2).sum(1))
    theta0 = np.arccos(np.clip(cos0, -1, 1))
    hinge_coeffs = np.stack([np.full(len(hinges), kb), theta0], 1)

    bonded = BondedParams(
        bond_tags=jnp.asarray(edges),
        bond_type=jnp.zeros(len(edges), jnp.int32),
        bond_coeffs=jnp.asarray([[kbt_p, l_max, k_p, m_pow]], jnp.float32),
        tri_tags=jnp.asarray(faces + 1, jnp.int32),
        tri_mol=jnp.zeros(len(faces), jnp.int32),
        membrane=jnp.asarray([[ka, area0, kv, vol0, ka_local, 0.0]],
                             jnp.float32),
        tri_a0=jnp.asarray(tri_a0, jnp.float32),
        hinge_tags=jnp.asarray(hinges + 1, jnp.int32),
        hinge_coeffs=jnp.asarray(hinge_coeffs, jnp.float32))

    params = SystemParams.build(
        DPDParams.build(a=a, gamma=gamma, rc=rc, kt=kt, seed=seed)
    ).replace(bonded=bonded)
    system = System.for_fluid([l] * 3, rc=rc, density=density, dt=dt,
                              skin=skin, rng_mode=rng_mode)
    system = system.replace(bond_style="wlc_pow", n_tags=n_total, n_mols=1,
                            force_path=force_path)
    mesh_info = {"area0": area0, "vol0": vol0, "n_mem": n_mem,
                 "faces": faces, "l_max": l_max}
    return system, params, setup(system, params, state), mesh_info

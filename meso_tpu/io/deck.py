"""Declarative TOML decks — the input-script analog (SURVEY.md §5.6).

The reference's config system is the imperative LAMMPS input DSL
(``pair_style dpd A gamma seed``, ``pair_coeff``, ``fix``, ``run``;
``src/input.cpp``). Our deck is declarative TOML whose field names mirror
those concepts 1:1 so reference decks translate mechanically:

    [box]            lengths = [32.0, 32.0, 32.0]
    [atoms]          density = 3.0   kt = 1.0   types = 1   create = "random"
    [pair.dpd]       a = 25.0  gamma = 4.5  rc = 1.0  kt = 1.0  seed = 928459
    [[pair.coeff]]   i = 1  j = 1  a = 25.0  gamma = 4.5  rc = 1.0
    [integrate]      dt = 0.01  lambda_ = 0.5
    [neighbor]       skin = 0.3  rebuild = "adaptive"
    [run]            steps = 1000  thermo_every = 100

``pair.coeff`` rows use 1-based type indices like LAMMPS; mixing for
unspecified off-diagonal pairs follows the DPD convention (arithmetic mean
of a, geometric-free: a_ij given explicitly or averaged).
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass

import jax
import numpy as np

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.core.system import System, SystemParams, setup
from meso_tpu.ops.dpd import DPDParams


@dataclass(frozen=True)
class RunConfig:
    steps: int = 1000
    thermo_every: int = 100
    dump_every: int = 0
    dump_path: str = "dump.lammpstrj"
    restart_every: int = 0
    restart_path: str = "restart.npz"


def _substitute(obj, variables: dict):
    """Recursive ``${name}`` substitution (the LAMMPS ``variable``/``$x``
    analog, SURVEY.md §2a row 2). A string that is exactly one ``${name}``
    keeps the variable's native type (float/int/list); embedded references
    stringify."""
    if isinstance(obj, dict):
        return {k: _substitute(v, variables) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_substitute(v, variables) for v in obj]
    if isinstance(obj, str):
        import re
        m = re.fullmatch(r"\$\{(\w+)\}", obj)
        if m:
            name = m.group(1)
            if name not in variables:
                raise KeyError(f"deck variable ${{{name}}} undefined")
            return variables[name]
        return re.sub(r"\$\{(\w+)\}",
                      lambda mm: str(variables[mm.group(1)]), obj)
    return obj


def load_deck(path: str, overrides: dict | None = None) -> dict:
    """Load a TOML deck. The optional ``[variables]`` table defines values
    referenced elsewhere as ``"${name}"``; ``overrides`` (e.g. from the CLI
    ``--var name=value``) replace them before substitution."""
    with open(path, "rb") as fh:
        deck = tomllib.load(fh)
    variables = dict(deck.pop("variables", {}))
    if overrides:
        for k, v in overrides.items():
            variables[k] = v
    # variables may reference earlier variables (one pass, like LAMMPS)
    resolved = {}
    for k, v in variables.items():
        resolved[k] = _substitute(v, resolved)
    return _substitute(deck, resolved)


_BUILDERS = {
    "classic_fluid": "meso_tpu.models.classic:classic_fluid",
    "poiseuille": "meso_tpu.models.walls:poiseuille",
    "couette": "meso_tpu.models.walls:couette",
    "edpd_slab": "meso_tpu.models.transport:edpd_slab",
    "tdpd_diffusion": "meso_tpu.models.transport:tdpd_diffusion",
    "polymer_melt": "meso_tpu.models.polymer:polymer_melt",
    "membrane_suspension": "meso_tpu.models.polymer:membrane_suspension",
}


def _run_cfg(deck: dict) -> "RunConfig":
    rn = deck.get("run", {})
    return RunConfig(
        steps=int(rn.get("steps", 1000)),
        thermo_every=int(rn.get("thermo_every", 100)),
        dump_every=int(rn.get("dump_every", 0)),
        dump_path=str(rn.get("dump_path", "dump.lammpstrj")),
        restart_every=int(rn.get("restart_every", 0)),
        restart_path=str(rn.get("restart_path", "restart.npz")))


def build_from_deck(deck: dict):
    """deck dict -> (system, params, state, run_cfg).

    Two forms: the explicit [box]/[atoms]/[pair.dpd] schema below, or a
    named model builder (the five validation configs):

        [model]       builder = "poiseuille"
        [model.args]  g = 0.1  h = 6.0
    """
    if "model" in deck:
        import importlib
        name = deck["model"]["builder"]
        modpath, fn = _BUILDERS[name].split(":")
        builder = getattr(importlib.import_module(modpath), fn)
        out = builder(**deck["model"].get("args", {}))
        system, params, state = out[:3]
        return system, params, state, _run_cfg(deck)
    boxcfg = deck.get("box", {})
    lengths = boxcfg.get("lengths") or [boxcfg.get("l", 10.0)] * 3
    box = Box.orthorhombic(*[float(v) for v in lengths])
    vol = float(np.prod(lengths))

    atoms = deck.get("atoms", {})
    n_types = int(atoms.get("types", 1))
    kt_init = float(atoms.get("kt", 1.0))
    if "n" in atoms:
        n = int(atoms["n"])
    else:
        n = int(round(float(atoms.get("density", 3.0)) * vol))
    density = n / vol

    pd = deck.get("pair", {}).get("dpd", {})
    kt = float(pd.get("kt", 1.0))
    a = np.full((n_types, n_types), float(pd.get("a", 25.0)), np.float32)
    gamma = np.full((n_types, n_types), float(pd.get("gamma", 4.5)), np.float32)
    rc = np.full((n_types, n_types), float(pd.get("rc", 1.0)), np.float32)
    for row in deck.get("pair", {}).get("coeff", []):
        i, j = int(row["i"]) - 1, int(row["j"]) - 1
        for tbl, key in ((a, "a"), (gamma, "gamma"), (rc, "rc")):
            if key in row:
                tbl[i, j] = tbl[j, i] = float(row[key])
    pair = DPDParams.build(a=a, gamma=gamma, rc=rc, kt=kt,
                           seed=int(pd.get("seed", 12345)), n_types=n_types)
    params = SystemParams.build(pair, mass=atoms.get("mass", 1.0))

    integ = deck.get("integrate", {})
    neigh = deck.get("neighbor", {})
    engine = deck.get("engine", {})
    force_path = str(engine.get("force_path", "nlist"))
    # right-spill packing: default on for the fused pallas kernel (every
    # rng tier — the r2 spill+tea miscompile is closed; tools/v2_gate.py)
    spill = bool(engine.get("spill", force_path == "pallas"))
    # wrap_mode="rebuild" (deferred box wrap) is validated at every box
    # size since r5: the r4 pre-shifted wrap-relief rows (bucket_layout
    # spill_assign) keep of=0 at 1M on device, the min-image-free kernel
    # program passes the 1M subset oracle (rel 9.3e-7), and the mode is
    # ~10% faster (60.9 vs 67.5 ms/step; tools/r5a_wrap.py). The stale
    # r3 of=42 warning (relief disabled back then) is gone.
    wrap_mode = str(engine.get("wrap_mode", "step"))

    def _engine_kw():
        return dict(
            spill=spill, rebuild=str(engine.get("rebuild", "gather")),
            wrap_mode=wrap_mode)

    def _engine_replace(sys_):
        return sys_.replace(
            lam=float(integ.get("lambda_", integ.get("lambda", 0.5))),
            force_path=force_path,
            pair_kernel=str(engine.get("pair_kernel", "v3")),
            z_chunks=int(engine.get("z_chunks", 0)))

    system = System.for_fluid(
        lengths, rc=float(np.max(rc)), density=density,
        dt=float(integ.get("dt", 0.01)),
        skin=float(neigh.get("skin", 0.3)),
        rebuild_every=int(neigh.get("rebuild_every", 10)),
        rng_mode=str(deck.get("rng", {}).get("mode", "tea")),
        **_engine_kw(),
    )
    system = _engine_replace(system)

    create = atoms.get("create", "random")
    if create == "random":
        state = create_random(jax.random.PRNGKey(int(atoms.get("init_seed", 0))),
                              n, box, kt=kt_init)
    elif create == "read_data":
        # external configuration (LAMMPS-style data file or .npz) —
        # SURVEY §2a row 13 (read_data). Note the file's box/atom count
        # override the deck's [box]/density sizing.
        from meso_tpu.io.data import read_data, state_from_data
        data = read_data(str(atoms["file"]))
        box, state = state_from_data(data, kt_init=kt_init,
                                     init_seed=int(atoms.get("init_seed",
                                                             0)))
        n = data["n"]
        lengths = [float(v) for v in (data["box_hi"] - data["box_lo"])]
        density = n / float(np.prod(lengths))
        system = _engine_replace(System.for_fluid(
            lengths, rc=float(np.max(rc)), density=density,
            dt=float(integ.get("dt", 0.01)),
            skin=float(neigh.get("skin", 0.3)),
            rebuild_every=int(neigh.get("rebuild_every", 10)),
            rng_mode=str(deck.get("rng", {}).get("mode", "tea")),
            **_engine_kw(),
        ))
        if data["masses"] is not None:
            params = SystemParams.build(pair, mass=data["masses"])
        if data["bonds"] is not None:
            from meso_tpu.ops.bonded import BondedParams
            bsec = deck.get("bonds", {})
            style = str(bsec.get("style", "harmonic"))
            coeffs = np.asarray(bsec.get(
                "coeffs", [[30.0, 1.5, 0.0, 0.0]]), np.float32)
            if coeffs.shape[1] < 4:
                coeffs = np.pad(coeffs, ((0, 0), (0, 4 - coeffs.shape[1])))
            import jax.numpy as jnp
            bonded = BondedParams(
                bond_tags=jnp.asarray(data["bonds"]),
                bond_type=jnp.asarray(data["bond_type"]),
                bond_coeffs=jnp.asarray(coeffs))
            if data["angles"] is not None:
                acoeffs = np.asarray(deck.get("angles", {}).get(
                    "coeffs", [[5.0, 3.14159265]]), np.float32)
                bonded = bonded.replace(
                    angle_tags=jnp.asarray(data["angles"]),
                    angle_type=jnp.asarray(data["angle_type"]),
                    angle_coeffs=jnp.asarray(acoeffs))
            params = params.replace(bonded=bonded)
            # tags need not be contiguous 1..N: size the inverse-tag tables
            # from the max tag, and reject bonds referencing unknown tags
            # (out-of-range scatter would silently drop partners, ADVICE r2)
            n_tags = int(np.max(data["tag"]))
            max_bond_tag = int(np.max(data["bonds"]))
            if data["angles"] is not None:
                max_bond_tag = max(max_bond_tag, int(np.max(data["angles"])))
            if max_bond_tag > n_tags or int(np.min(data["bonds"])) < 1:
                raise ValueError(
                    f"read_data: bond/angle tag out of range (max referenced "
                    f"{max_bond_tag}, max atom tag {n_tags})")
            system = system.replace(bond_style=style, n_tags=n_tags)
    else:
        raise ValueError(f"unknown atoms.create {create!r}")
    state = setup(system, params, state)

    return system, params, state, _run_cfg(deck)

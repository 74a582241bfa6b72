"""I/O round-trips: restart exactness, deck building, dump format, CLI.
(SURVEY.md §3.5 restart path, §5.4, §5.6)."""

import io
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from meso_tpu.core.box import Box
from meso_tpu.core.state import create_random
from meso_tpu.core.system import SystemParams, run_adaptive, setup
from meso_tpu.io.deck import build_from_deck, load_deck
from meso_tpu.io.dump import write_lammpstrj, write_xyz
from meso_tpu.io.restart import load_restart, save_restart
from meso_tpu.ops.dpd import DPDParams

DECK = os.path.join(os.path.dirname(__file__), "..", "golden_decks",
                    "classic_fluid.toml")


def test_restart_roundtrip_bitwise(tmp_path):
    box = Box.cubic(5.0)
    st = create_random(jax.random.PRNGKey(3), 100, box, kt=1.0)
    st = st.replace(step=jnp.int32(777))
    p = str(tmp_path / "r.npz")
    save_restart(p, st)
    st2 = load_restart(p)
    for name in ["x", "v", "f", "typ", "tag", "image", "mask", "mol"]:
        a, b = np.asarray(getattr(st, name)), np.asarray(getattr(st2, name))
        assert (a == b).all(), name
    assert int(st2.step) == 777
    assert st2.T is None and st2.C is None
    assert np.allclose(st2.box.hi, 5.0)


def test_restart_resume_is_deterministic(tmp_path):
    """Resume from snapshot reproduces the uninterrupted trajectory bitwise
    (counter-based RNG needs no state; SURVEY.md §5.3)."""
    deck = load_deck(DECK)
    deck["atoms"]["n"] = 200
    system, params, state, _ = build_from_deck(deck)

    state_mid, _ = run_adaptive(system, params, state, 10)
    p = str(tmp_path / "mid.npz")
    save_restart(p, state_mid)
    cont, _ = run_adaptive(system, params, state_mid, 10)
    resumed, _ = run_adaptive(system, params, load_restart(p), 10)
    # compare by tag (both paths resort identically from identical state)
    oa = np.argsort(np.asarray(cont.tag))
    ob = np.argsort(np.asarray(resumed.tag))
    assert (np.asarray(cont.x)[oa] == np.asarray(resumed.x)[ob]).all()
    assert (np.asarray(cont.v)[oa] == np.asarray(resumed.v)[ob]).all()


def test_build_from_deck():
    system, params, state, run_cfg = build_from_deck(load_deck(DECK))
    assert state.n == 648  # 3.0 * 216
    assert float(params.pair.a[0, 0]) == 25.0
    assert float(params.pair.sigma[0, 0]) == 3.0  # sqrt(2*1*4.5)
    assert system.dt == 0.01
    assert run_cfg.steps == 300


def test_dump_formats(tmp_path):
    box = Box.cubic(4.0)
    st = create_random(jax.random.PRNGKey(1), 32, box, kt=1.0)
    xyz = str(tmp_path / "t.xyz")
    trj = str(tmp_path / "t.lammpstrj")
    write_xyz(xyz, st, append=False)
    write_lammpstrj(trj, st, append=False)
    lines = open(xyz).read().splitlines()
    assert lines[0] == "32" and len(lines) == 34
    tl = open(trj).read().splitlines()
    assert tl[0] == "ITEM: TIMESTEP"
    assert tl[3] == "32"
    assert tl[8].startswith("ITEM: ATOMS id type x y z")
    assert len(tl) == 9 + 32


def test_cli_runs_deck(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    out = subprocess.run(
        [sys.executable, "-m", "meso_tpu", DECK, "--steps", "30"],
        capture_output=True, text=True, env=env,
        cwd=os.path.join(os.path.dirname(__file__), "..", ".."), timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "temp" in out.stdout


def test_orbax_restart_roundtrip(tmp_path):
    """Orbax backend (SURVEY 5.4 alt): bitwise State roundtrip incl.
    optional fields."""
    import jax
    import numpy as np

    from meso_tpu.core.box import Box
    from meso_tpu.core.state import create_random
    from meso_tpu.io.restart import load_restart_orbax, save_restart_orbax

    box = Box.cubic(5.0)
    st = create_random(jax.random.PRNGKey(3), 64, box, kt=1.0,
                       with_energy=True)
    p = str(tmp_path / "ck")
    save_restart_orbax(p, st)
    back = load_restart_orbax(p)
    assert (np.asarray(back.x) == np.asarray(st.x)).all()
    assert (np.asarray(back.T) == np.asarray(st.T)).all()
    assert back.C is None
    assert int(back.step) == int(st.step)


def test_polymer_special_deck_builds_and_steps():
    """Golden deck: special_bonds polymer melt on the bucket path builds and
    the exclusions reach the pair params."""
    import jax.numpy as jnp

    from meso_tpu.core.system import run_bucket_chunked
    from meso_tpu.io.deck import build_from_deck, load_deck

    deck = load_deck(os.path.join(os.path.dirname(__file__), "..",
                                  "golden_decks", "polymer_special.toml"))
    system, params, state, run_cfg = build_from_deck(deck)
    assert params.pair.excl is not None
    assert float(params.pair.excl_w) == 0.5
    assert system.force_path == "bucket"
    state, diag = run_bucket_chunked(system, params, state, 2,
                                     system.cells.rebuild_every)
    assert int(diag["bucket_overflow"]) == 0
    assert bool(jnp.isfinite(state.x).all())


def test_deck_variables_substitution(tmp_path):
    """LAMMPS variable/$x analog: [variables] + ${name} substitution with
    CLI-style overrides and type preservation."""
    from meso_tpu.io.deck import load_deck

    p = tmp_path / "d.toml"
    p.write_text('''
[variables]
L = 6.0
dens = 3.0
tag = "run_${L}"

[box]
lengths = ["${L}", "${L}", "${L}"]

[atoms]
density = "${dens}"

[run]
steps = 100
label = "${tag}"
''')
    deck = load_deck(str(p))
    assert deck["box"]["lengths"] == [6.0, 6.0, 6.0]
    assert deck["atoms"]["density"] == 3.0
    assert deck["run"]["label"] == "run_6.0"
    deck2 = load_deck(str(p), overrides={"L": 8.0})
    assert deck2["box"]["lengths"] == [8.0, 8.0, 8.0]
    import pytest
    (tmp_path / "bad.toml").write_text('[box]\nlengths = ["${nope}", 1, 1]\n')
    with pytest.raises(KeyError):
        load_deck(str(tmp_path / "bad.toml"))

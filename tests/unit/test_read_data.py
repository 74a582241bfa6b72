"""read_data analog (io/data.py; SURVEY §2a row 13): LAMMPS-style text and
npz configuration input, standalone and through a deck."""

import numpy as np
import jax.numpy as jnp

from meso_tpu.io.data import read_data, state_from_data

LAMMPS_DATA = """polymer test data
6 atoms
2 bonds
1 angles
2 atom types
1 bond types
1 angle types
0.0 6.0 xlo xhi
0.0 6.0 ylo yhi
0.0 6.0 zlo zhi

Masses

1 1.0
2 2.5

Atoms  # molecular

1 1 1 1.0 1.0 1.0 0 0 0
2 1 1 1.8 1.0 1.0 0 0 0
3 1 2 2.6 1.0 1.0 1 0 0
4 0 2 4.0 4.0 4.0
5 0 1 5.0 5.0 5.0
6 0 2 0.5 2.5 3.5

Velocities

1 0.1 0.0 0.0
2 0.0 0.2 0.0
3 0.0 0.0 0.3

Bonds

1 1 1 2
2 1 2 3

Angles

1 1 1 2 3
"""


def test_read_lammps_text(tmp_path):
    p = tmp_path / "config.data"
    p.write_text(LAMMPS_DATA)
    d = read_data(str(p))
    assert d["n"] == 6
    assert np.allclose(d["box_hi"], 6.0)
    assert d["typ"].tolist() == [0, 0, 1, 1, 0, 1]
    assert d["mol"].tolist() == [1, 1, 1, 0, 0, 0]
    assert np.allclose(d["x"][1], [1.8, 1.0, 1.0])
    assert d["image"][2].tolist() == [1, 0, 0]
    assert np.allclose(d["v"][2], [0.0, 0.0, 0.3])
    assert d["masses"].tolist() == [1.0, 2.5]
    assert d["bonds"].tolist() == [[1, 2], [2, 3]]
    assert d["angles"].tolist() == [[1, 2, 3]]

    box, state = state_from_data(d)
    assert int(state.n_valid()) == 6
    assert float(box.lengths[0]) == 6.0
    assert np.allclose(np.asarray(state.x)[1], [1.8, 1.0, 1.0])


ATOMIC_DATA = """atomic style with image flags (style hint is a comment)
2 atoms
1 atom types
0.0 4.0 xlo xhi
0.0 4.0 ylo yhi
0.0 4.0 zlo zhi

Atoms # atomic

1 1 1.0 2.0 3.0 0 1 0
2 1 3.5 0.5 1.5 0 0 0

Velocities

1 0.0 0.0 0.0
2 0.0 0.0 0.0
"""


def test_read_atomic_style_with_image_flags(tmp_path):
    """'Atoms # atomic' rows (id type x y z ix iy iz) must parse as atomic:
    the style hint lives in the comment _strip used to remove (ADVICE r2)."""
    p = tmp_path / "atomic.data"
    p.write_text(ATOMIC_DATA)
    d = read_data(str(p))
    assert d["typ"].tolist() == [0, 0]
    assert d["mol"].tolist() == [0, 0]
    assert np.allclose(d["x"][0], [1.0, 2.0, 3.0])
    assert d["image"][0].tolist() == [0, 1, 0]


def test_read_atomic_style_inferred_from_columns(tmp_path):
    """Without a style comment, 5/8-column rows parse as atomic."""
    p = tmp_path / "atomic2.data"
    p.write_text(ATOMIC_DATA.replace("Atoms # atomic", "Atoms"))
    d = read_data(str(p))
    assert d["typ"].tolist() == [0, 0]
    assert np.allclose(d["x"][1], [3.5, 0.5, 1.5])


def test_cold_start_velocities_stay_cold(tmp_path):
    """A file WITH a Velocities section of zeros is a deliberate cold start:
    kt_init must not re-randomize it (ADVICE r2). A file WITHOUT the section
    gets Maxwell velocities."""
    p = tmp_path / "cold.data"
    p.write_text(ATOMIC_DATA)
    d = read_data(str(p))
    assert d["has_velocities"]
    _, state = state_from_data(d, kt_init=1.0)
    assert float(jnp.abs(state.v).max()) == 0.0

    p2 = tmp_path / "novel.data"
    p2.write_text(ATOMIC_DATA.split("Velocities")[0])
    d2 = read_data(str(p2))
    assert not d2["has_velocities"]
    _, state2 = state_from_data(d2, kt_init=1.0)
    assert float(jnp.abs(state2.v).max()) > 0.0


def test_deck_noncontiguous_tags_and_bad_bonds(tmp_path):
    """n_tags is sized from max(tag), and bonds referencing unknown tags
    raise instead of silently dropping partners (ADVICE r2)."""
    import pytest
    from meso_tpu.io.deck import build_from_deck

    rs = np.random.RandomState(2)
    n = 375
    x = rs.uniform(0, 5, (n, 3)).astype(np.float32)
    x[1] = x[0] + 0.4
    tags = np.arange(1, n + 1, dtype=np.int32)
    tags[-1] = 1000  # non-contiguous: max tag 1000 > n
    p = tmp_path / "tags.npz"
    np.savez(p, x=x, box_hi=np.asarray([5.0, 5.0, 5.0]), tag=tags,
             bonds=np.asarray([[1, 1000]], np.int32))
    deck = {
        "atoms": {"create": "read_data", "file": str(p), "kt_init": 1.0},
        "pair": {"dpd": {"a": 25.0, "gamma": 4.5, "rc": 1.0, "kt": 1.0,
                         "seed": 7}},
        "bonds": {"style": "harmonic", "coeffs": [[30.0, 1.0, 0.0, 0.0]]},
        "engine": {"force_path": "dense"},
        "run": {"steps": 1},
    }
    system, params, state, _ = build_from_deck(deck)
    assert system.n_tags == 1000

    bad = dict(deck)
    p2 = tmp_path / "bad.npz"
    np.savez(p2, x=x, box_hi=np.asarray([5.0, 5.0, 5.0]),
             bonds=np.asarray([[1, 9999]], np.int32))
    bad["atoms"] = {"create": "read_data", "file": str(p2), "kt_init": 1.0}
    with pytest.raises(ValueError, match="out of range"):
        build_from_deck(bad)


def test_read_npz_roundtrip(tmp_path):
    p = tmp_path / "config.npz"
    x = np.random.RandomState(0).uniform(0, 5, (20, 3)).astype(np.float32)
    bonds = np.asarray([[1, 2], [3, 4]], np.int32)
    np.savez(p, x=x, box_hi=np.asarray([5.0, 5.0, 5.0]), bonds=bonds)
    d = read_data(str(p))
    assert d["n"] == 20
    assert np.allclose(d["x"], x)
    assert d["bonds"].tolist() == bonds.tolist()


def test_deck_read_data_runs(tmp_path):
    """A deck referencing a data file builds and steps (FENE bonds from the
    file, coefficients from the deck)."""
    from meso_tpu.core.system import run_chunk
    from meso_tpu.io.deck import build_from_deck

    rs = np.random.RandomState(1)
    n = 375  # rho ~ 3 in a 5^3 box
    x = rs.uniform(0, 5, (n, 3))
    x[1] = x[0] + 0.4  # bonded pair adjacent
    p = tmp_path / "cfg.npz"
    np.savez(p, x=x.astype(np.float32),
             box_hi=np.asarray([5.0, 5.0, 5.0]),
             bonds=np.asarray([[1, 2]], np.int32))
    deck = {
        "atoms": {"create": "read_data", "file": str(p), "kt_init": 1.0},
        "pair": {"dpd": {"a": 25.0, "gamma": 4.5, "rc": 1.0, "kt": 1.0,
                         "seed": 7}},
        "bonds": {"style": "fene", "coeffs": [[30.0, 1.5, 0.0, 0.0]]},
        "engine": {"force_path": "dense"},
        "run": {"steps": 5},
    }
    system, params, state, run_cfg = build_from_deck(deck)
    assert system.bond_style == "fene"
    state = run_chunk(system, params, state, 5)
    assert bool(jnp.isfinite(state.x).all())
    assert int(state.step) == 5

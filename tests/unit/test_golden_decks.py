"""Every golden deck loads, builds, and runs through the CLI surface
(VERDICT r2 missing #5: poiseuille/couette/edpd_slab/membrane were dead
files — the physics was tested via builders but the decks themselves never
parsed in CI), and ``--validate`` works on every model path (missing #7).

These are smoke tests: deep physics validation of each config lives in
tests/physics/ against the same builders the decks call.
"""

import glob
import os

import jax.numpy as jnp
import pytest

DECK_DIR = os.path.join(os.path.dirname(__file__), "..", "golden_decks")
ALL_DECKS = sorted(glob.glob(os.path.join(DECK_DIR, "*.toml")))


def _build(path):
    from meso_tpu.io.deck import build_from_deck, load_deck
    return build_from_deck(load_deck(path))


@pytest.mark.parametrize("deck_path", ALL_DECKS,
                         ids=[os.path.basename(p)[:-5] for p in ALL_DECKS])
def test_deck_builds_and_steps(deck_path):
    """Parse → build → a few steps → finite state, for EVERY shipped deck."""
    from meso_tpu.core.system import run_adaptive, run_bucket_chunked

    system, params, state, run_cfg = _build(deck_path)
    assert run_cfg.steps > 0
    if system.force_path in ("bucket", "pallas"):
        every = system.cells.rebuild_every
        state, diag = run_bucket_chunked(system, params, state, 2, every)
        for key in ("bucket_overflow", "cell_overflow"):
            if key in diag:
                assert float(jnp.max(jnp.asarray(diag[key]))) == 0.0
    else:
        state, _ = run_adaptive(system, params, state, 6)
    assert bool(jnp.isfinite(state.x).all())
    assert bool(jnp.isfinite(state.v).all())
    if state.T is not None:
        assert bool(jnp.isfinite(state.T).all())
    if state.C is not None:
        assert bool(jnp.isfinite(state.C).all())


# one deck per model path: classic bucketed, walls+frozen, eDPD, tDPD,
# bonded polymer, membrane+FENE suspension (config 5)
_VALIDATE_DECKS = ["classic_fluid", "poiseuille", "edpd_slab",
                   "tdpd_diffusion", "polymer_special",
                   "membrane_suspension"]


@pytest.mark.parametrize("name", _VALIDATE_DECKS)
def test_validate_forces_on_deck(name):
    """The dense-oracle validator covers every model path (SURVEY 5.2)."""
    from meso_tpu.utils.debug import validate_forces

    system, params, state, _ = _build(os.path.join(DECK_DIR, name + ".toml"))
    report = validate_forces(system, params, state)
    assert report["max_rel"] < 1e-4, report
    if "dTdt_max_rel" in report:
        assert report["dTdt_max_rel"] < 1e-4, report
    if "dCdt_max_rel" in report:
        assert report["dCdt_max_rel"] < 1e-4, report
    if "bonded_missing" in report:
        assert report["bonded_missing"] == 0
        assert report["bonded_finite"]
        assert report["bonded_momentum_rel"] < 1e-4, report

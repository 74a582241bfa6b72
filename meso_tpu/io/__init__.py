"""I/O: declarative decks, thermo logging, trajectory dumps, restart files
(SURVEY.md §2a rows 2,11-13; §5.4-§5.6)."""

from meso_tpu.io.deck import load_deck, build_from_deck
from meso_tpu.io.restart import save_restart, load_restart
from meso_tpu.io.thermo import ThermoLogger
from meso_tpu.io.dump import write_xyz, write_lammpstrj

__all__ = ["load_deck", "build_from_deck", "save_restart", "load_restart",
           "ThermoLogger", "write_xyz", "write_lammpstrj"]

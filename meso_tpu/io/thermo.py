"""Thermo logging — the `thermo_style custom` analog (SURVEY.md §5.5).

The reference prints a reduction row every N steps and a Pair/Neigh/Comm
timing breakdown at the end (LAMMPS ``src/thermo.cpp``/``timer.cpp``,
§2a row 11, §5.1). Here: observables are computed on-device from the State
(one reduction kernel), rows are printed/JSONL-appended host-side between
scan chunks, and wall-clock per chunk gives the timing column.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from meso_tpu.core.state import State
from meso_tpu.core.system import System, SystemParams, compute_forces
from meso_tpu.obs import kinetic_temperature, pressure, total_momentum


def thermo_row(system: System, params: SystemParams, state: State,
               virial=None) -> dict:
    """Device-side reductions -> host dict (scalars only cross the boundary,
    the analog of the reference's D2H-scalars-only thermo, §2b row 30)."""
    mass = params.mass[state.typ]
    row = {
        "step": int(state.step),
        "temp": float(kinetic_temperature(state.v, mass, state.mask)),
        "px": float(total_momentum(state.v, mass, state.mask)[0]),
    }
    if virial is not None:
        row["press"] = float(pressure(state.v, mass, state.mask, virial,
                                      state.box.volume))
    return row


class ThermoLogger:
    """Accumulates thermo rows; prints LAMMPS-style columns and/or JSONL."""

    def __init__(self, every: int = 100, stream=sys.stdout,
                 jsonl_path: str | None = None):
        self.every = every
        self.stream = stream
        self.jsonl_path = jsonl_path
        self.rows: list[dict] = []
        self._t_last = time.perf_counter()
        self._header_done = False

    def log(self, system: System, params: SystemParams, state: State,
            virial=None, extra: dict | None = None) -> dict:
        row = thermo_row(system, params, state, virial)
        now = time.perf_counter()
        row["wall_s"] = round(now - self._t_last, 4)
        self._t_last = now
        if extra:
            row.update(extra)
        self.rows.append(row)
        if self.stream is not None:
            if not self._header_done:
                self.stream.write("  ".join(f"{k:>12}" for k in row) + "\n")
                self._header_done = True
            self.stream.write("  ".join(
                f"{v:12.6g}" if isinstance(v, float) else f"{v:>12}"
                for v in row.values()) + "\n")
            self.stream.flush()
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as fh:
                fh.write(json.dumps(row) + "\n")
        return row

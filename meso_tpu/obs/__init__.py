"""Observables — analogs of LAMMPS computes (SURVEY.md §2a rows 9,11,30)."""

from meso_tpu.obs.rdf import rdf
from meso_tpu.obs.thermo import (kinetic_energy, kinetic_temperature,
                                 pressure, total_momentum)
from meso_tpu.obs.viscosity import muller_plathe_swap, run_viscosity_mp

__all__ = ["kinetic_temperature", "total_momentum", "pressure",
           "kinetic_energy", "rdf", "muller_plathe_swap", "run_viscosity_mp"]
from meso_tpu.obs.msd import (msd, unwrapped,  # noqa: F401,E402
                              diffusion_coefficient)

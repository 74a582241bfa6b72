"""Observables — analogs of LAMMPS computes (SURVEY.md §2a rows 9,11,30)."""

from meso_tpu.obs.thermo import kinetic_temperature, total_momentum, pressure, kinetic_energy

__all__ = ["kinetic_temperature", "total_momentum", "pressure", "kinetic_energy"]

"""System builders for the validation configs (BASELINE.json configs 1-5)."""

from meso_tpu.models.classic import classic_fluid

__all__ = ["classic_fluid"]

"""Utilities: phase timers, checked invariants, autotuning (SURVEY.md §5.1,
§5.2, §2b row 29)."""

from meso_tpu.utils.timer import PhaseTimer
from meso_tpu.utils.checks import check_diag

__all__ = ["PhaseTimer", "check_diag"]

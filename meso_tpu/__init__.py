"""meso_tpu — a TPU-native Dissipative Particle Dynamics (DPD) framework.

A from-scratch re-design of the capabilities of yhtang/MESO (USER-MESO, a
CUDA/LAMMPS DPD engine; see SURVEY.md) for TPU hardware: one jit-compiled
step function over fixed-shape SoA state arrays, Pallas kernels for the pair
hot path, and `shard_map` + ICI collectives for multi-chip domain
decomposition (replacing MPI halo exchange).

Reference provenance: the reference mount was empty during the survey; the
spec of record is /root/repo/SURVEY.md (esp. Appendix A physics contract)
and BASELINE.json. Citations in docstrings point at SURVEY.md sections and
the expected reference files they reconstruct (e.g. ``src/pair_dpd_meso.cu``).
"""

__version__ = "0.1.0"

from meso_tpu.core.box import Box
from meso_tpu.core.state import State
from meso_tpu.core.system import System, DPDParams

__all__ = ["Box", "State", "System", "DPDParams", "__version__"]

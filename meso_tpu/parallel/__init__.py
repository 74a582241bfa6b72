"""Multi-chip domain decomposition: shard_map + ICI collectives replacing the
reference's MPI halo exchange (SURVEY.md §2a row 5, §2b rows 27-28, §2c,
§5.8)."""

from meso_tpu.parallel.domain import (DomainConfig, build_domain,
                                      collect_state, distribute_state,
                                      make_mesh_1d, run_distributed)

__all__ = ["DomainConfig", "build_domain", "distribute_state",
           "collect_state", "make_mesh_1d", "run_distributed"]

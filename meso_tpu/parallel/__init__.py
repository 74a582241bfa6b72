"""Multi-chip domain decomposition: shard_map + ICI collectives replacing the
reference's MPI halo exchange (SURVEY.md §2a row 5, §2b rows 27-28, §2c,
§5.8). 1-D slabs, 2-D bricks, 3-D bricks, and a replica (DP) ensemble axis.
"""

from meso_tpu.parallel.domain import (DomainConfig, build_domain,
                                      collect_state, distribute_state,
                                      make_mesh_1d, run_distributed)
from meso_tpu.parallel.domain2d import (Domain2D, build_domain2d,
                                        collect_state_2d, distribute_state_2d,
                                        make_mesh_2d, run_distributed_2d)
from meso_tpu.parallel.domain3d import (Domain3D, build_domain3d,
                                        collect_state_3d, distribute_state_3d,
                                        make_mesh_3d, run_distributed_3d)
from meso_tpu.parallel.ensemble import (collect_ensemble_spatial,
                                         distribute_ensemble_spatial,
                                         make_ensemble_spatial_mesh,
                                         replicate_state,
                                         run_distributed_ensemble,
                                         run_ensemble)

__all__ = ["DomainConfig", "build_domain", "distribute_state",
           "collect_state", "make_mesh_1d", "run_distributed",
           "Domain2D", "build_domain2d", "distribute_state_2d",
           "collect_state_2d", "make_mesh_2d", "run_distributed_2d",
           "Domain3D", "build_domain3d", "distribute_state_3d",
           "collect_state_3d", "make_mesh_3d", "run_distributed_3d",
           "replicate_state", "run_ensemble", "make_ensemble_spatial_mesh",
           "distribute_ensemble_spatial", "run_distributed_ensemble",
           "collect_ensemble_spatial"]

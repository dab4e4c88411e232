"""Multi-chip / multi-host distribution: device meshes, sharded operators,
and halo-exchange collectives (the parallel layer the reference never had —
its only parallelism was OpenMP loop pragmas, see SURVEY.md §2.4)."""

from multigrid_prj_tpu.parallel.distributed import (
    make_mesh,
    maybe_initialize_distributed,
)
from multigrid_prj_tpu.parallel.sharded_amg import ShardedAMGSolver
from multigrid_prj_tpu.parallel.sharded_gmg import ShardedGMGSolver

__all__ = [
    "ShardedAMGSolver",
    "ShardedGMGSolver",
    "make_mesh",
    "maybe_initialize_distributed",
]

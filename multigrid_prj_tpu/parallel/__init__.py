"""Multi-chip / multi-host distribution: device meshes, sharded operators,
and halo-exchange collectives (the parallel layer the reference never had —
its only parallelism was OpenMP loop pragmas, see SURVEY.md §2.4)."""

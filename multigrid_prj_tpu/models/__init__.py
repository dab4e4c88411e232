"""Problem definitions: Poisson model problems (2D/3D) and the P1 FEM
front-end for imported gmsh meshes."""

from multigrid_prj_tpu.models.poisson import (
    TEST_FUNCTIONS,
    assemble_rhs,
    get_test_functions,
    grid_coords,
)

__all__ = ["TEST_FUNCTIONS", "assemble_rhs", "get_test_functions", "grid_coords"]

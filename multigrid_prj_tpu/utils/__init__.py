"""I/O, configuration, logging/metrics, and checkpointing utilities."""

from multigrid_prj_tpu.utils.io import (
    load_vector,
    save_history,
    save_matrix_coo,
    save_vector,
)

__all__ = ["load_vector", "save_history", "save_matrix_coo", "save_vector"]

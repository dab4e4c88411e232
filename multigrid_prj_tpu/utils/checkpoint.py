"""Checkpoint / resume for long solves.

The reference's closest mechanisms are the end-of-run solution dump
(``GeometricMultigrid/src/main.cpp:127-128``) and the ``CREATE_GIF`` build's
per-stage state dumps (``multigrid.hpp:233-269``) — resumable state exists in
file form but with no load path (SURVEY.md §5).  This module supplies both
directions: a compressed ``.npz`` checkpoint of the solver state (solution,
rhs, residual history, config metadata) and a loader that resumes an
interrupted outer iteration.
"""

from __future__ import annotations

import json
from typing import Any, Optional

import numpy as np


def save_checkpoint(path: str, u, b, history, config: Optional[dict] = None,
                    **arrays) -> None:
    """Write solver state as compressed npz (+ JSON-encoded config)."""
    np.savez_compressed(
        path,
        u=np.asarray(u),
        b=np.asarray(b),
        history=np.asarray(history),
        config=np.frombuffer(
            json.dumps(config or {}).encode(), dtype=np.uint8
        ),
        **{k: np.asarray(v) for k, v in arrays.items()},
    )


def load_checkpoint(path: str) -> dict[str, Any]:
    """Load a checkpoint; returns dict with u, b, history, config, extras."""
    with np.load(path) as z:
        out: dict[str, Any] = {k: z[k] for k in z.files if k != "config"}
        out["config"] = json.loads(bytes(z["config"]).decode() or "{}")
    return out


def resume_solve(solver, path: str):
    """Resume a :class:`multigrid_prj_tpu.gmg.GMGSolver` solve from ``path``.

    Continues the outer iteration from the stored ``u`` and concatenates the
    residual histories.
    """
    import jax.numpy as jnp

    state = load_checkpoint(path)
    b = jnp.asarray(state["b"])
    u0 = jnp.asarray(state["u"])
    result = solver.solve(b, u0=u0)
    prior = np.asarray(state["history"])
    merged = np.concatenate([prior[:-1], np.asarray(result.history)])
    result.history = merged
    return result

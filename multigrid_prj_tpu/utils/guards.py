"""Numerical guards: NaN/Inf detection and determinism checks.

The reference's only concurrency was OpenMP with correctness by disjoint
writes (SURVEY.md §5 "race detection / sanitizers": none).  The JAX analog
is functional, so the failure modes worth guarding are numerical: NaN/Inf
creep (e.g. a zero diagonal, an f32 overflow) and non-deterministic
reductions across shardings.  This module provides

* :func:`count_nonfinite` — a jit-safe counter usable inside compiled code;
* :func:`check_finite` — host-side validation raising :class:`ValueError`
  with the offending array name (the analog of the reference's
  ``std::invalid_argument`` bounds throws, ``CSRMatrix.cpp:5-6``);
* :func:`guard_solve_io` — decorator for solver entry points that validates
  inputs eagerly and outputs lazily (only when the result is materialized);
* determinism is covered by ``tests/test_guards.py``: the same sharded
  solve run twice must be *bitwise* identical (psum reduction order is
  fixed by XLA for a fixed program), and sharded vs replicated must agree
  to f32 roundoff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def count_nonfinite(x: jax.Array) -> jax.Array:
    """Number of NaN/Inf entries (jit-safe, usable inside compiled code)."""
    return jnp.sum(~jnp.isfinite(x))


def check_finite(x, name: str = "array") -> None:
    """Raise ``ValueError`` if ``x`` contains NaN/Inf (host-side, eager).

    Works on numpy arrays and (committed) jax arrays alike.
    """
    bad = int(count_nonfinite(jnp.asarray(x)))
    if bad:
        raise ValueError(
            f"{name} contains {bad} non-finite value(s) (NaN/Inf); "
            "refusing to run the solver on poisoned input"
        )


def guard_solve_io(fn):
    """Decorator: validate every array argument of a solve entry point.

    Checks positional/keyword array args before the call; on return, checks
    any array attributes named ``u``/``x`` on the result object so NaNs
    produced *inside* a diverging solve surface with a clear error instead
    of propagating into files/plots.
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        for i, a in enumerate(args):
            if isinstance(a, (jax.Array, np.ndarray)):
                check_finite(a, f"argument {i} of {fn.__qualname__}")
        for k, a in kwargs.items():
            if isinstance(a, (jax.Array, np.ndarray)):
                check_finite(a, f"{k}= of {fn.__qualname__}")
        out = fn(*args, **kwargs)
        for attr in ("u", "x"):
            val = getattr(out, attr, None)
            if isinstance(val, (jax.Array, np.ndarray)):
                check_finite(val, f"{fn.__qualname__} result .{attr}")
        return out

    return wrapper

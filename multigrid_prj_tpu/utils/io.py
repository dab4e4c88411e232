"""Text vector/matrix I/O in the reference's formats.

Parity with ``Utils::saveVectorOnFile`` / ``saveMatrixOnFile``
(``GeometricMultigrid/include/utilities.hpp:27-54``):

* vector file: first line ``n``, then one value per line — the format of the
  reference's ``x.mtx`` solution artifact and ``MGGS4.txt`` residual history;
* matrix file: header ``rows cols nnz``, then ``i j v`` triplet lines.
"""

from __future__ import annotations

import os

import numpy as np


def save_vector(path: str | os.PathLike, vec, fmt: str = "%.17g") -> None:
    """Write ``n`` then one value per line (``utilities.hpp:43-54``)."""
    v = np.asarray(vec).reshape(-1)
    with open(path, "w") as fh:
        fh.write(f"{v.size}\n")
        for x in v:
            fh.write((fmt % x) + "\n")


def save_history(path: str | os.PathLike, history) -> None:
    """Residual-history writer — the reference's ``MGGS4.txt`` artifact."""
    save_vector(path, history)


def load_vector(path: str | os.PathLike) -> np.ndarray:
    """Read a vector file written by :func:`save_vector` (or the reference)."""
    with open(path) as fh:
        n = int(fh.readline().split()[0])
        vals = np.loadtxt(fh, dtype=np.float64, ndmin=1)
    if vals.size != n:
        raise ValueError(f"{path}: header says {n} values, found {vals.size}")
    return vals


def save_matrix_coo(path: str | os.PathLike, rows, cols, vals, shape, fmt="%.17g"):
    """Triplet text writer: ``rows cols nnz`` header then ``i j v`` lines
    (``utilities.hpp:27-41``)."""
    rows = np.asarray(rows).reshape(-1)
    cols = np.asarray(cols).reshape(-1)
    vals = np.asarray(vals).reshape(-1)
    with open(path, "w") as fh:
        fh.write(f"{shape[0]} {shape[1]} {vals.size}\n")
        for i, j, v in zip(rows, cols, vals):
            fh.write(f"{i} {j} " + (fmt % v) + "\n")


def load_matrix_coo(path: str | os.PathLike):
    """Read a triplet text file; returns ``(rows, cols, vals, shape)``."""
    with open(path) as fh:
        r, c, nnz = (int(t) for t in fh.readline().split())
        data = np.loadtxt(fh, dtype=np.float64, ndmin=2)
    if data.shape[0] != nnz:
        raise ValueError(f"{path}: header says {nnz} entries, found {data.shape[0]}")
    return (
        data[:, 0].astype(np.int64),
        data[:, 1].astype(np.int64),
        data[:, 2],
        (r, c),
    )

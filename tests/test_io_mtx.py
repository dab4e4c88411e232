"""MatrixMarket I/O + the AMG CLI's imported-system path (BASELINE config 3:
"AMG on imported MatrixMarket system"; reference has no .mtx *system* import —
its ``x.mtx`` artifacts are plain vector files, which the loader and the
``-rhs`` flag also accept)."""

from __future__ import annotations

import numpy as np
import pytest

from multigrid_prj_tpu.utils.io import (
    load_matrix_coo,
    load_matrix_market,
    save_matrix_coo,
    save_matrix_market,
    save_vector,
)


def _fd_poisson_1d(n: int):
    """1D FD Laplacian triplets (rows, cols, vals, shape)."""
    i = np.arange(n)
    rows = np.concatenate([i, i[:-1], i[1:]])
    cols = np.concatenate([i, i[1:], i[:-1]])
    vals = np.concatenate([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)])
    return rows, cols, vals, (n, n)


def _dense(rows, cols, vals, shape):
    A = np.zeros(shape)
    np.add.at(A, (rows, cols), vals)
    return A


def test_mm_general_round_trip(tmp_path):
    rows, cols, vals, shape = _fd_poisson_1d(7)
    path = tmp_path / "a.mtx"
    save_matrix_market(path, rows, cols, vals, shape)
    assert open(path).readline().startswith("%%MatrixMarket matrix coordinate")
    r2, c2, v2, s2 = load_matrix_market(path)
    assert s2 == shape
    np.testing.assert_allclose(_dense(r2, c2, v2, s2),
                               _dense(rows, cols, vals, shape))


def test_mm_symmetric_expansion(tmp_path):
    rows, cols, vals, shape = _fd_poisson_1d(9)
    full = _dense(rows, cols, vals, shape)
    path = tmp_path / "sym.mtx"
    save_matrix_market(path, rows, cols, vals, shape, symmetric=True)
    # the file stores only one triangle...
    nnz_stored = int(open(path).readlines()[1].split()[2])
    assert nnz_stored == 9 + 8  # diagonal + one off-diagonal band
    # ...but the loader expands to the full operator
    r2, c2, v2, s2 = load_matrix_market(path)
    np.testing.assert_allclose(_dense(r2, c2, v2, s2), full)


def test_mm_skew_symmetric(tmp_path):
    path = tmp_path / "skew.mtx"
    with open(path, "w") as fh:
        fh.write("%%MatrixMarket matrix coordinate real skew-symmetric\n")
        fh.write("% comment line\n3 3 2\n2 1 5.0\n3 1 -2.0\n")
    r, c, v, s = load_matrix_market(path)
    A = _dense(r, c, v, s)
    np.testing.assert_allclose(A, -A.T)
    assert A[1, 0] == 5.0 and A[0, 1] == -5.0


def test_mm_pattern(tmp_path):
    path = tmp_path / "pat.mtx"
    with open(path, "w") as fh:
        fh.write("%%MatrixMarket matrix coordinate pattern general\n")
        fh.write("2 3 2\n1 3\n2 1\n")
    r, c, v, s = load_matrix_market(path)
    assert s == (2, 3)
    np.testing.assert_allclose(v, [1.0, 1.0])
    assert (r.tolist(), c.tolist()) == ([0, 1], [2, 0])


def test_mm_array_format(tmp_path):
    path = tmp_path / "vec.mtx"
    with open(path, "w") as fh:
        fh.write("%%MatrixMarket matrix array real general\n4 1\n")
        fh.write("1.5\n-2\n0\n7\n")
    r, c, v, s = load_matrix_market(path)
    assert s == (4, 1)
    np.testing.assert_allclose(v, [1.5, -2.0, 0.0, 7.0])
    assert c.tolist() == [0, 0, 0, 0]


def test_load_matrix_coo_autodetects_mm(tmp_path):
    rows, cols, vals, shape = _fd_poisson_1d(5)
    mm = tmp_path / "a.mtx"
    trip = tmp_path / "a.txt"
    save_matrix_market(mm, rows, cols, vals, shape)
    save_matrix_coo(trip, rows, cols, vals, shape)
    for p in (mm, trip):
        r2, c2, v2, s2 = load_matrix_coo(p)
        np.testing.assert_allclose(_dense(r2, c2, v2, s2),
                                   _dense(rows, cols, vals, shape))


def test_mm_rejects_garbage(tmp_path):
    path = tmp_path / "bad.mtx"
    path.write_text("%%MatrixMarket matrix coordinate complex general\n1 1 0\n")
    with pytest.raises(ValueError):
        load_matrix_market(path)


def test_mm_truncated_file_raises_not_hangs(tmp_path):
    """A banner-plus-comments-only file must raise, not spin at EOF
    (readline() returns '' forever, which the blank-skip loop used to
    treat as a blank line)."""
    path = tmp_path / "trunc.mtx"
    path.write_text("%%MatrixMarket matrix coordinate real general\n"
                    "% comment only, no size line\n")
    with pytest.raises(ValueError, match="missing size line"):
        load_matrix_market(path)


def test_mm_array_symmetric_rejected_explicitly(tmp_path):
    """Array-format symmetric files store a packed lower triangle; the
    loader documents the limitation in behavior (clean error), not a
    wrong-size crash."""
    path = tmp_path / "arrsym.mtx"
    path.write_text("%%MatrixMarket matrix array real symmetric\n"
                    "2 2\n1.0\n2.0\n3.0\n")
    with pytest.raises(ValueError, match="array-format"):
        load_matrix_market(path)


def test_amg_cli_on_imported_mtx_system(tmp_path, capsys):
    """End-to-end: AMG V-cycle solve on a MatrixMarket-imported 2D FD
    Poisson system (no mesh, no FEM), solution written as a vector file."""
    from multigrid_prj_tpu.cli.amg_main import main
    from multigrid_prj_tpu.utils.io import load_vector

    # 2D 5-point Laplacian on an m x m interior grid, symmetric storage
    m = 12
    n = m * m
    idx = np.arange(n).reshape(m, m)
    rows = [np.arange(n)]
    cols = [np.arange(n)]
    vals = [4.0 * np.ones(n)]
    for (sl_r, sl_c) in (((slice(1, None), slice(None)),
                          (slice(None, -1), slice(None))),
                         ((slice(None), slice(1, None)),
                          (slice(None), slice(None, -1)))):
        a, b = idx[sl_r].ravel(), idx[sl_c].ravel()
        rows += [a, b]
        cols += [b, a]
        vals += [-np.ones(a.size), -np.ones(a.size)]
    rows, cols, vals = map(np.concatenate, (rows, cols, vals))

    mtx = tmp_path / "sys.mtx"
    save_matrix_market(mtx, rows, cols, vals, (n, n), symmetric=True)
    rng = np.random.default_rng(3)
    b = rng.standard_normal(n)
    rhs_path = tmp_path / "b.mtx"
    save_vector(rhs_path, b)
    out = tmp_path / "sol.txt"

    rc = main(["-matrix", str(mtx), "-rhs", str(rhs_path), "-levels", "3",
               "-tol", "1e-8", "-o", str(out)])
    captured = capsys.readouterr().out
    assert rc == 0, captured
    assert "Matrix imported!" in captured
    x = load_vector(out)
    A = _dense(rows, cols, vals, (n, n))
    rel = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    assert rel <= 1e-7, (rel, captured)


def test_amg_cli_matrix_default_rhs(tmp_path, capsys):
    """Without -rhs the CLI solves A x = A·1 — the recovered x is ones."""
    from multigrid_prj_tpu.cli.amg_main import main
    from multigrid_prj_tpu.utils.io import load_vector

    rows, cols, vals, shape = _fd_poisson_1d(64)
    mtx = tmp_path / "sys.mtx"
    save_matrix_market(mtx, rows, cols, vals, shape)
    out = tmp_path / "x.mtx"
    rc = main(["-matrix", str(mtx), "-levels", "2", "-tol", "1e-9",
               "-o", str(out)])
    assert rc == 0, capsys.readouterr().out
    np.testing.assert_allclose(load_vector(out), np.ones(shape[0]),
                               atol=1e-6)

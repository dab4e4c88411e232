"""Native C++ library vs the pure-Python fallbacks — both paths must agree
exactly (the library is an accelerator, not a different algorithm)."""

import os

import numpy as np
import pytest

from multigrid_prj_tpu import native
from multigrid_prj_tpu.models import fem
from multigrid_prj_tpu.ops.sparse import HostCSR

REF_MESH = "/root/reference/AMG/mesh/mesh1.msh"

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native lib not built")


@needs_native
def test_coo_to_csr_matches_python():
    rng = np.random.default_rng(0)
    n, nnz = 50, 400
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz)
    vals[::7] = 0.0  # explicit zeros must be dropped
    indptr, indices, data = native.coo_to_csr(rows, cols, vals, n)
    # python path (force by building manually)
    order = np.lexsort((cols, rows))
    import scipy.sparse as sp

    S = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    S.eliminate_zeros()
    np.testing.assert_array_equal(indptr, S.indptr)
    np.testing.assert_array_equal(indices, S.indices)
    np.testing.assert_allclose(data, S.data, rtol=1e-15)


@needs_native
def test_coloring_is_proper():
    A = HostCSR.from_dense(
        (np.random.default_rng(1).random((40, 40)) < 0.15).astype(float)
        + np.eye(40)
    )
    # symmetrize adjacency
    Asym = HostCSR.from_dense(((A.to_dense() + A.to_dense().T) > 0).astype(float))
    colors, nc = native.greedy_coloring(Asym.indptr, Asym.indices, 40)
    assert nc == colors.max() + 1
    rows, cols, _ = Asym.to_coo()
    off = rows != cols
    assert (colors[rows[off]] != colors[cols[off]]).all()


@needs_native
def test_rcm_reduces_bandwidth():
    # ring + random chords
    n = 60
    rng = np.random.default_rng(2)
    rows = list(range(n)) + list(range(n))
    cols = list(range(1, n)) + [0] + list(range(n))
    vals = [1.0] * len(rows)
    A = HostCSR.from_coo(rows + cols, cols + rows, vals + vals, (n, n))
    perm = A.rcm_permutation()
    assert sorted(perm.tolist()) == list(range(n))
    B = A.permute(perm)
    def bandwidth(M):
        r, c, _ = M.to_coo()
        return int(np.abs(r - c).max())
    assert bandwidth(B) <= bandwidth(A)


@needs_native
@pytest.mark.skipif(not os.path.exists(REF_MESH), reason="reference mesh absent")
def test_native_msh_parser_matches_python():
    m_native = fem.parse_msh(REF_MESH, use_native=True)
    m_python = fem.parse_msh(REF_MESH, use_native=False)
    np.testing.assert_allclose(m_native.nodes, m_python.nodes)
    np.testing.assert_array_equal(m_native.triangles, m_python.triangles)
    np.testing.assert_array_equal(m_native.on_boundary, m_python.on_boundary)


@needs_native
def test_greedy_coarsen_matches_python(monkeypatch):
    from multigrid_prj_tpu.amg import coarsen_greedy
    from tests.test_amg import fd_poisson

    A = fd_poisson(10)
    with_native = coarsen_greedy(A, 0.2, seed=5)
    monkeypatch.setattr(native, "available", lambda: False)
    without = coarsen_greedy(A, 0.2, seed=5)
    np.testing.assert_array_equal(with_native, without)

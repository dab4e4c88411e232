"""Pallas ELL SpMV kernel vs the host CSR oracle (interpreter mode — the
compiled path runs on hardware via benchmarks/spmv_bench.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from multigrid_prj_tpu.ops.pallas_spmv import PallasELL, rcm_prepared
from multigrid_prj_tpu.ops.sparse import HostCSR


def fd_poisson(n):
    N = n * n
    rows, cols, vals = [], [], []
    for i in range(n):
        for j in range(n):
            r = i * n + j
            rows.append(r); cols.append(r); vals.append(4.0)
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < n and 0 <= jj < n:
                    rows.append(r); cols.append(ii * n + jj); vals.append(-1.0)
    return HostCSR.from_coo(rows, cols, vals, (N, N))


@pytest.mark.parametrize("n", [10, 23])
def test_spmv_matches_oracle_fd(n):
    A = fd_poisson(n)
    pA = PallasELL.build(A, dtype=jnp.float32, block_rows=1024)
    assert pA is not None
    assert pA.t_win <= 8  # tiny matrices sit whole inside one 8-tile window
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.shape[1]).astype(np.float32)
    got = np.asarray(pA.spmv(jnp.asarray(x), interpret=True), np.float64)
    want = A.spmv(x.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_spmv_matches_oracle_fem_rcm():
    from multigrid_prj_tpu.models.fem import assemble_p1, structured_unit_square_mesh

    mesh = structured_unit_square_mesh(20)
    A, _ = assemble_p1(mesh)
    pA, perm = rcm_prepared(A, dtype=jnp.float32, block_rows=1024)
    assert pA is not None and pA.t_win <= 6
    rng = np.random.default_rng(1)
    x = rng.standard_normal(A.shape[1])
    got = np.asarray(
        pA.spmv(jnp.asarray(x[perm], jnp.float32), interpret=True), np.float64
    )
    want = A.permute(perm).spmv(x[perm])
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 2e-5 * max(scale, 1.0)


def test_rectangular_prolongation_spmv():
    """P (n_fine x n_coarse) rides the same kernel: coarse numbering is
    monotone in the (banded) fine order, so P is banded too."""
    from multigrid_prj_tpu.amg import build_prolongation, coarsen_pmis

    A = fd_poisson(16)
    perm = A.rcm_permutation()
    Ap = A.permute(perm)
    labels = coarsen_pmis(Ap, 0.2, seed=1)
    P = build_prolongation(Ap, labels)
    pP = PallasELL.build(P, dtype=jnp.float32, block_rows=1024)
    assert pP is not None
    rng = np.random.default_rng(2)
    xc = rng.standard_normal(P.shape[1]).astype(np.float32)
    got = np.asarray(pP.spmv(jnp.asarray(xc), interpret=True), np.float64)
    want = P.spmv(xc.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_build_refuses_wide_band():
    """A matrix with a full-width row (no banding possible) must fall back."""
    n = 4096
    rng = np.random.default_rng(3)
    rows = np.repeat(np.arange(n), 2)
    cols = rng.integers(0, n, size=2 * n)  # scattered: RCM cannot band this
    vals = np.ones(2 * n)
    A = HostCSR.from_coo(rows, cols, vals, (n, n))
    assert PallasELL.build(A, max_t_win=4) is None


def banded(n, offs):
    rows_l, cols_l, vals_l = [], [], []
    for o in offs:
        r = np.arange(max(0, -o), min(n, n - o), dtype=np.int64)
        rows_l.append(r)
        cols_l.append(r + o)
        vals_l.append(np.full(r.size, 8.0 if o == 0 else -1.0))
    return HostCSR.from_coo(np.concatenate(rows_l), np.concatenate(cols_l),
                            np.concatenate(vals_l), (n, n))


def test_windowed_x_mode_matches_oracle():
    """x too large for VMEM -> windowed-x HBM mode (two Wq-tile blocks per
    row block), bit-compatible with the VMEM-resident kernel."""
    n = 8192
    A = banded(n, [0, -1, 1, -51, 34])
    rng = np.random.default_rng(7)
    x = rng.standard_normal(n).astype(np.float32)
    pV = PallasELL.build(A, dtype=jnp.float32, block_rows=1024)
    assert pV is not None and not pV.windowed
    # force the windowed path by shrinking the VMEM budget
    pW = PallasELL.build(A, dtype=jnp.float32, block_rows=1024,
                         max_x_vmem=4096)
    assert pW is not None and pW.windowed and pW.wq % 8 == 0
    got_v = np.asarray(pV.spmv(jnp.asarray(x), interpret=True))
    got_w = np.asarray(pW.spmv(jnp.asarray(x), interpret=True))
    want = A.spmv(x.astype(np.float64))
    np.testing.assert_allclose(got_w, want, rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(got_v, got_w)  # same arithmetic order


def test_wide_window_compact_matches_oracle():
    """Wide spans with few DISTINCT touched x-tiles (FD-at-scale band
    shapes) take the compact-window kernel."""
    n = 4096
    A = banded(n, [0, -1, 1, -1500, 1500])
    pA = PallasELL.build(A, dtype=jnp.float32, block_rows=1024)
    assert pA is not None and pA.compact and pA.t_win > 8, \
        (pA.t_win, pA.u_max)
    assert pA.u_max <= 8
    rng = np.random.default_rng(8)
    x = rng.standard_normal(n).astype(np.float32)
    got = np.asarray(pA.spmv(jnp.asarray(x), interpret=True))
    want = A.spmv(x.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # SpMM falls back per vector transparently
    X = rng.standard_normal((n, 2)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(pA.spmm(jnp.asarray(X), interpret=True)),
        A.spmm(X.astype(np.float64)), rtol=2e-5, atol=2e-5)


def test_moderate_distinct_tiles_take_compact():
    """Spans touching 9..26 distinct tiles ride the compact-window kernel
    (cap raised 8 -> 26 in r5 so the 1M-row hierarchy's Pt stays off the
    gather path)."""
    n = 4096
    # 12 scattered offsets within a 1600-column span -> ~12 distinct tiles
    A = banded(n, [0, -1, 1] + [137 * (i + 2) for i in range(9)])
    pA = PallasELL.build(A, dtype=jnp.float32, block_rows=1024)
    assert pA is not None and pA.compact and pA.u_max <= 26, \
        (pA.t_win, pA.u_max)
    rng = np.random.default_rng(12)
    x = rng.standard_normal(n).astype(np.float32)
    got = np.asarray(pA.spmv(jnp.asarray(x), interpret=True))
    want = A.spmv(x.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_wide_window_select_matches_oracle():
    """Spans touching MORE distinct tiles than the compact cap (> 26) fall
    through to the select-loop kernel (t_win up to 32)."""
    n = 4096
    # 28 scattered offsets within a ~31-tile span -> ~29 distinct tiles
    A = banded(n, [0, -1, 1] + [137 * (i + 2) for i in range(27)])
    pA = PallasELL.build(A, dtype=jnp.float32, block_rows=1024)
    assert pA is not None and not pA.compact and 26 < pA.t_win <= 32, \
        (pA.t_win, pA.u_max)
    rng = np.random.default_rng(12)
    x = rng.standard_normal(n).astype(np.float32)
    got = np.asarray(pA.spmv(jnp.asarray(x), interpret=True))
    want = A.spmv(x.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fd_poisson_large_band_compact():
    """An RCM'd 2D FD matrix at scale rides the compact kernel (u_max ~ 3),
    not the gather fallback — the AMG fine-level case of BASELINE config 3."""
    A = fd_poisson(64)  # band 64 -> t_win ~ 2... use raw ordering: band n
    pA = PallasELL.build(A, dtype=jnp.float32, block_rows=1024)
    assert pA is not None
    rng = np.random.default_rng(13)
    x = rng.standard_normal(A.shape[1]).astype(np.float32)
    got = np.asarray(pA.spmv(jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(got, A.spmv(x.astype(np.float64)),
                               rtol=2e-5, atol=2e-5)


def test_windowed_plus_wide_window():
    n = 8192
    A = banded(n, [0, -1, 1, -900, 1100])
    pA = PallasELL.build(A, dtype=jnp.float32, block_rows=1024,
                         max_x_vmem=4096)
    assert pA is not None and pA.windowed and pA.t_win > 8
    rng = np.random.default_rng(9)
    x = rng.standard_normal(n).astype(np.float32)
    got = np.asarray(pA.spmv(jnp.asarray(x), interpret=True))
    want = A.spmv(x.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # SpMM on a windowed matrix takes the per-vector fallback transparently
    X = rng.standard_normal((n, 3)).astype(np.float32)
    gotm = np.asarray(pA.spmm(jnp.asarray(X), interpret=True))
    np.testing.assert_allclose(gotm, A.spmm(X.astype(np.float64)),
                               rtol=2e-5, atol=2e-5)


def test_padded_rows_and_slots_are_zero():
    A = fd_poisson(5)  # n = 25, heavily padded to block_rows
    pA = PallasELL.build(A, dtype=jnp.float32, block_rows=1024)
    x = np.ones(A.shape[1], np.float32)
    got = np.asarray(pA.spmv(jnp.asarray(x), interpret=True))
    assert got.shape == (25,)
    want = A.spmv(np.ones(25))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_spmm_matches_oracle():
    """Multi-vector kernel (SpMM): A streams once for all nvec RHS."""
    A = fd_poisson(12)
    pA = PallasELL.build(A, dtype=jnp.float32, block_rows=1024)
    rng = np.random.default_rng(4)
    X = rng.standard_normal((A.shape[1], 5)).astype(np.float32)
    got = np.asarray(pA.spmm(jnp.asarray(X), interpret=True), np.float64)
    want = A.spmm(X.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_spmm_single_vector_matches_spmv():
    A = fd_poisson(9)
    pA = PallasELL.build(A, dtype=jnp.float32, block_rows=1024)
    rng = np.random.default_rng(5)
    x = rng.standard_normal(A.shape[1]).astype(np.float32)
    y1 = np.asarray(pA.spmv(jnp.asarray(x), interpret=True))
    y2 = np.asarray(pA.spmm(jnp.asarray(x[:, None]), interpret=True))[:, 0]
    np.testing.assert_allclose(y1, y2, rtol=1e-6, atol=1e-6)


def test_spmm_chunks_large_blocks(monkeypatch):
    """Vector blocks larger than the VMEM budget are chunked transparently."""
    import multigrid_prj_tpu.ops.pallas_spmv as mod

    A = fd_poisson(8)
    pA = PallasELL.build(A, dtype=jnp.float32, block_rows=1024)
    # shrink the budget so a 3-vector block needs two kernel launches
    monkeypatch.setattr(mod, "_MAX_X_VMEM", pA.m_pad * 4 * 2)
    rng = np.random.default_rng(6)
    X = rng.standard_normal((A.shape[1], 3)).astype(np.float32)
    got = np.asarray(pA.spmm(jnp.asarray(X), interpret=True), np.float64)
    want = A.spmm(X.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_residual_ff_matches_gather_chain():
    """Pair-mode kernel residual vs the XLA EFT chain: same two_prod /
    two_sum sequence, so agreement to ~1 ulp of the combined result; and
    both must beat the plain-f32 residual's accuracy on an ill-scaled
    system."""
    from multigrid_prj_tpu.ops.sparse_extended import (
        ELLPair, ell_residual_ff, ff_pair_from_f64,
    )

    A = fd_poisson(16)
    # scale to make f32 products lossy
    A = HostCSR.from_coo(*(list(A.to_coo())[:2] +
                           [A.to_coo()[2] * 1.000000119]), A.shape)
    pA = PallasELL.build(A, dtype=jnp.float32, block_rows=1024, pair=True)
    assert pA is not None and pA.valsT_lo is not None
    A2 = ELLPair.from_host_csr(A)
    rng = np.random.default_rng(3)
    x64 = rng.standard_normal(A.shape[0])
    b64 = A.spmv(rng.standard_normal(A.shape[0]))
    x_hi, x_lo = ff_pair_from_f64(x64)
    b_hi, b_lo = ff_pair_from_f64(b64)
    want = np.asarray(ell_residual_ff(A2, b_hi, b_lo, x_hi, x_lo))
    got = np.asarray(pA.residual_ff(b_hi, b_lo, x_hi, x_lo, interpret=True))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=3e-7 * scale, rtol=3e-6)
    # accuracy vs exact f64 residual: extended must be ~eps_ff, i.e. far
    # below the f32 floor
    r64 = b64 - A.spmv(np.asarray(x_hi, np.float64)
                       + np.asarray(x_lo, np.float64))
    err = np.abs(got - r64).max()
    assert err <= 1e-5 * np.abs(r64).max() + 1e-9, err


def test_pair_residual_compact_mode():
    """r5: the extended-precision pair residual runs on compact-window
    matrices too (the 1M-row AMG fine level — its gather ff-residual was
    the refined solve's hot spot, 2.18 -> 0.82 s measured)."""
    rng = np.random.default_rng(31)
    n = 2048
    offs = [0, -1, 1] + [137 * (i + 2) for i in range(9)]
    rows, cols, vals = [], [], []
    for o in offs:
        i = np.arange(max(0, -o), min(n, n - o))
        rows.append(i)
        cols.append(i + o)
        vals.append(rng.standard_normal(i.size))
    A = HostCSR.from_coo(np.concatenate(rows), np.concatenate(cols),
                         np.concatenate(vals), (n, n))
    pA = PallasELL.build(A, dtype=jnp.float32, block_rows=1024, pair=True)
    assert pA is not None and pA.compact
    from multigrid_prj_tpu.ops.sparse_extended import (
        ELLPair,
        ell_residual_ff,
    )

    x64 = rng.standard_normal(n)
    b64 = rng.standard_normal(n)

    def split(v):
        hi = v.astype(np.float32)
        return (jnp.asarray(hi),
                jnp.asarray((v - hi.astype(np.float64)).astype(np.float32)))

    xh, xl = split(x64)
    bh, bl = split(b64)
    got = np.asarray(pA.residual_ff(bh, bl, xh, xl, interpret=True))
    want = np.asarray(ell_residual_ff(ELLPair.from_host_csr(A),
                                      bh, bl, xh, xl))
    scale = max(1.0, np.abs(want).max())
    assert np.abs(got - want).max() <= 2e-6 * scale

"""Grid-transfer tests: prolongation is exact on (multi)linear functions,
injection matches the reference's mask-stride semantics, full weighting
preserves constants."""

import numpy as np
import jax.numpy as jnp
import pytest

from multigrid_prj_tpu.grids import build_hierarchy, coarsen_shape, max_levels
from multigrid_prj_tpu.ops.transfer import (
    prolong,
    restrict_full_weighting,
    restrict_inject,
)


def test_coarsen_shape():
    assert coarsen_shape((9, 9)) == (5, 5)
    assert coarsen_shape((8, 6)) == (4, 3)
    assert coarsen_shape((385, 385)) == (193, 193)


def test_hierarchy_h_doubles():
    levels = build_hierarchy((65, 65), 10.0, 4)
    assert [l.shape[0] for l in levels] == [65, 33, 17, 9]
    for l in range(4):
        np.testing.assert_allclose(levels[l].h, (10.0 / 64) * 2**l)
    assert max_levels((65, 65)) == 6  # 65, 33, 17, 9, 5, 3


def test_inject_is_stride2():
    r = jnp.arange(81.0).reshape(9, 9)
    rc = restrict_inject(r)
    np.testing.assert_allclose(np.asarray(rc), np.asarray(r)[::2, ::2])


@pytest.mark.parametrize("nc,nf", [(5, 9), (5, 10), (3, 5)])
def test_prolong_exact_on_linear(nc, nf):
    # Linear function sampled on the coarse grid; bilinear prolongation must
    # reproduce its fine-grid samples (interior; clamped edge for even nf).
    xc = np.linspace(0.0, 1.0, nc)
    ec = np.add.outer(2.0 * xc, -3.0 * xc) + 1.0
    ef = np.asarray(prolong(jnp.asarray(ec), (nf, nf)))
    if nf == 2 * nc - 1:
        xf = np.linspace(0.0, 1.0, nf)
        want = np.add.outer(2.0 * xf, -3.0 * xf) + 1.0
        np.testing.assert_allclose(ef, want, atol=1e-12)
    else:
        # even target: first 2*nc-1 samples are the odd-grid refinement, the
        # trailing row/col is clamped
        assert ef.shape == (nf, nf)
        np.testing.assert_allclose(ef[-1, :], ef[-2, :], atol=1e-12)


def test_prolong_matches_reference_two_pass():
    """The reference interpolates vertical midpoints then averages rows
    (``multigrid.cpp:3-27``); on an odd grid that IS bilinear interpolation."""
    rng = np.random.default_rng(0)
    ec = rng.standard_normal((5, 5))
    ef = np.asarray(prolong(jnp.asarray(ec), (9, 9)))
    # coincident nodes injected
    np.testing.assert_allclose(ef[::2, ::2], ec, atol=1e-14)
    # vertical midpoints on coarse columns
    np.testing.assert_allclose(
        ef[1::2, ::2], 0.5 * (ec[:-1, :] + ec[1:, :]), atol=1e-14
    )
    # horizontal fill from the (already filled) fine columns
    np.testing.assert_allclose(
        ef[:, 1::2], 0.5 * (ef[:, 0:-1:2] + ef[:, 2::2]), atol=1e-14
    )


def test_full_weighting_preserves_constants_interior():
    r = jnp.ones((9, 9))
    rc = np.asarray(restrict_full_weighting(r))
    np.testing.assert_allclose(rc, np.ones((5, 5)), atol=1e-14)


def test_full_weighting_adjoint_scaling():
    """<R r, e>_c == (1/4) <r, P e>_f on interior nodes (2D full weighting is
    the scaled transpose of bilinear prolongation)."""
    rng = np.random.default_rng(1)
    nf, nc = 9, 5
    r = rng.standard_normal((nf, nf))
    e = rng.standard_normal((nc, nc))
    # zero boundaries so the edge-injection rows do not enter the identity
    r[0, :] = r[-1, :] = r[:, 0] = r[:, -1] = 0.0
    e[0, :] = e[-1, :] = e[:, 0] = e[:, -1] = 0.0
    Rr = np.asarray(restrict_full_weighting(jnp.asarray(r)))
    Pe = np.asarray(prolong(jnp.asarray(e), (nf, nf)))
    lhs = float((Rr * e).sum())
    rhs = float((r * Pe).sum())
    np.testing.assert_allclose(lhs, rhs / 4.0, rtol=1e-12)

"""P3 (cubic) FEM layer: nodal basis property, exact cubic reproduction,
accuracy vs P2, AMG integration.  Supersedes the reference's unimplemented
ThirdOrderFE (AMG/include/FEM.hpp:301-326)."""

import numpy as np

from multigrid_prj_tpu.models.fem import (
    _dunavant4,
    _p3_dphi,
    _p3_phi,
    assemble_p2,
    assemble_p3,
    p2_mesh,
    p3_mesh,
    structured_unit_square_mesh,
)


def dense(A):
    out = np.zeros(A.shape)
    for i in range(A.shape[0]):
        out[i, A.indices[A.indptr[i]:A.indptr[i + 1]]] = \
            A.data[A.indptr[i]:A.indptr[i + 1]]
    return out


def test_p3_basis_is_nodal():
    """phi_a(x_b) = delta_ab at the 10 dof barycentric points."""
    pts = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
    for (i, j) in ((0, 1), (1, 2), (0, 2)):
        for t in (2 / 3, 1 / 3):  # nearer i first
            lam = [0.0, 0.0, 0.0]
            lam[i], lam[j] = t, 1 - t
            pts.append(tuple(lam))
    pts.append((1 / 3, 1 / 3, 1 / 3))
    V = _p3_phi(np.asarray(pts))
    assert np.abs(V - np.eye(10)).max() < 1e-12


def test_p3_partition_of_unity_and_gradient_consistency():
    lam, w = _dunavant4()
    assert abs(w.sum() - 1.0) < 1e-14
    phi = _p3_phi(lam)
    assert np.abs(phi.sum(axis=1) - 1.0).max() < 1e-12
    # partition of unity differentiated: the unconstrained lambda-gradient
    # of sum_a phi_a is a multiple of (1,1,1) — identical across i — which
    # sum_i grad(lambda_i) = 0 annihilates in physical space
    C = _p3_dphi(lam)
    s = C.sum(axis=1)  # (Q, 3)
    assert np.abs(s - s[:, :1]).max() < 1e-11
    # finite-difference check of dphi
    eps = 1e-7
    for i in range(3):
        lp = lam.copy(); lp[:, i] += eps
        fd = (_p3_phi(lp) - phi) / eps
        assert np.abs(fd - C[:, :, i]).max() < 1e-5


def test_p3_dof_counts():
    n = 6
    mesh = structured_unit_square_mesh(n)
    p3 = p3_mesh(mesh)
    V, F = mesh.n_nodes, mesh.n_elements
    E = (p3.n_dofs - V - F) // 2
    assert V - E + F == 1
    # boundary dofs: boundary vertices + 2 per boundary edge
    assert int(p3.dof_on_boundary.sum()) == \
        int(mesh.on_boundary.sum()) + 2 * 4 * (n - 1)


def test_p3_reproduces_cubic_exactly():
    u_exact = lambda x, y: x**3 + y**3 - 3 * x**2 * y + x * x + 2.0
    # -laplace(u) = -(6x + 6y - 6y + 2) = -(6x + 2)
    f = lambda x, y: -(6.0 * x + 2.0)
    mesh = structured_unit_square_mesh(5)
    p3 = p3_mesh(mesh)
    A, rhs = assemble_p3(p3, f=f, g=u_exact)
    x = np.linalg.solve(dense(A), rhs)
    pts = p3.dof_coords[~p3.dof_on_boundary]
    want = u_exact(pts[:, 0], pts[:, 1])
    assert np.abs(x - want).max() < 1e-9


def test_p3_fourth_order_convergence():
    """Nodal error drops ~16x when h halves (O(h^4); measured ratios 13.6
    and 15.4 on 5/9/17-node meshes)."""
    u_exact = lambda x, y: np.sin(np.pi * x) * np.sin(np.pi * y)
    f = lambda x, y: 2 * np.pi**2 * np.sin(np.pi * x) * np.sin(np.pi * y)
    g = lambda x, y: np.zeros_like(np.asarray(x, float))

    errs = []
    for n in (5, 9):
        p3 = p3_mesh(structured_unit_square_mesh(n))
        A, b = assemble_p3(p3, f=f, g=g)
        x = np.linalg.solve(dense(A), b)
        pts = p3.dof_coords[~p3.dof_on_boundary]
        errs.append(np.abs(x - u_exact(pts[:, 0], pts[:, 1])).max())
    assert errs[0] / errs[1] > 10, errs


def test_p3_amg_solve():
    """P3 system through the AMG-PCG stack.  Classical (strength-based)
    AMG is a weaker preconditioner on cubic elements — the strength graph
    misreads the sign-mixed P3 stencil (a well-known limitation) — so the
    bar here is steady PCG progress to a moderate tolerance, not the P1
    convergence rate."""
    from multigrid_prj_tpu.amg import AMGSolver

    mesh = structured_unit_square_mesh(13)
    p3 = p3_mesh(mesh)
    A, rhs = assemble_p3(p3)
    solver = AMGSolver(A, num_levels=3, rhs=rhs)
    x, iters, rel = solver.solve_pcg(rhs, tol=1e-5, maxit=400)
    r = rhs - A.spmv(np.asarray(x, np.float64))
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-4

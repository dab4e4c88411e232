"""P2 (quadratic) FEM layer: dof generation, exact quadratic reproduction,
accuracy vs P1, AMG solve integration, VTU export.

The reference's QuadraticFE cannot assemble (no basis/gradients,
AMG/include/FEM.hpp:261-327); this layer completes the capability."""

import numpy as np
import pytest

from multigrid_prj_tpu.models.fem import (
    assemble_p1,
    assemble_p2,
    export_vtu_p2,
    p2_mesh,
    p2_solution_on_dofs,
    structured_unit_square_mesh,
)


def dense(A):
    out = np.zeros(A.shape)
    for i in range(A.shape[0]):
        out[i, A.indices[A.indptr[i]:A.indptr[i + 1]]] = \
            A.data[A.indptr[i]:A.indptr[i + 1]]
    return out


def test_p2_dof_counts_euler():
    n = 7
    mesh = structured_unit_square_mesh(n)
    p2 = p2_mesh(mesh)
    V, F = mesh.n_nodes, mesh.n_elements
    E = p2.n_dofs - V
    assert V - E + F == 1  # Euler characteristic of a disc
    # boundary midpoints: one per boundary edge = 4 (n - 1)
    assert int(p2.dof_on_boundary[V:].sum()) == 4 * (n - 1)


def test_p2_reproduces_quadratic_exactly():
    """P2 elements + midpoint quadrature integrate quadratics exactly, so a
    quadratic manufactured solution is reproduced to round-off."""
    u_exact = lambda x, y: x * x + 2 * y * y - x * y + 3 * x + 1.0
    f = lambda x, y: np.full_like(np.asarray(x, float), -(2.0 + 4.0))
    mesh = structured_unit_square_mesh(6)
    p2 = p2_mesh(mesh)
    A, rhs = assemble_p2(p2, f=f, g=u_exact)
    x = np.linalg.solve(dense(A), rhs)
    pts = p2.dof_coords[~p2.dof_on_boundary]
    want = u_exact(pts[:, 0], pts[:, 1])
    assert np.abs(x - want).max() < 1e-10


def test_p2_spd_symmetric():
    mesh = structured_unit_square_mesh(5)
    A, _ = assemble_p2(p2_mesh(mesh))
    D = dense(A)
    assert np.abs(D - D.T).max() < 1e-12
    assert np.linalg.eigvalsh(D).min() > 0


def test_p2_more_accurate_than_p1():
    """Smooth non-polynomial solution: P2 nodal error far below P1 on the
    same mesh (cubic vs quadratic convergence)."""
    u_exact = lambda x, y: np.sin(np.pi * x) * np.sin(np.pi * y)
    f = lambda x, y: 2 * np.pi**2 * np.sin(np.pi * x) * np.sin(np.pi * y)
    g = lambda x, y: np.zeros_like(np.asarray(x, float))
    mesh = structured_unit_square_mesh(9)

    A1, b1 = assemble_p1(mesh, f=f, g=g)
    x1 = np.linalg.solve(dense(A1), b1)
    pts1 = mesh.nodes[~mesh.on_boundary]
    err1 = np.abs(x1 - u_exact(pts1[:, 0], pts1[:, 1])).max()

    p2 = p2_mesh(mesh)
    A2, b2 = assemble_p2(p2, f=f, g=g)
    x2 = np.linalg.solve(dense(A2), b2)
    pts2 = p2.dof_coords[~p2.dof_on_boundary]
    err2 = np.abs(x2 - u_exact(pts2[:, 0], pts2[:, 1])).max()
    assert err2 < err1 / 5, (err1, err2)


def test_p2_amg_solve():
    """The P2 system goes through the AMG solver end to end."""
    from multigrid_prj_tpu.amg import AMGSolver

    mesh = structured_unit_square_mesh(17)
    p2 = p2_mesh(mesh)
    A, rhs = assemble_p2(p2)
    solver = AMGSolver(A, num_levels=3, rhs=rhs)
    x, iters, rel = solver.solve_pcg(rhs, tol=1e-10, maxit=200)
    assert rel < 1e-10
    r = rhs - A.spmv(np.asarray(x, np.float64))
    assert np.linalg.norm(r) / np.linalg.norm(rhs) < 1e-9


def test_p2_vtu_export(tmp_path):
    mesh = structured_unit_square_mesh(4)
    p2 = p2_mesh(mesh)
    A, rhs = assemble_p2(p2)
    x = np.linalg.solve(dense(A), rhs)
    out = tmp_path / "p2.vtu"
    export_vtu_p2(str(out), p2, x)
    text = out.read_text()
    assert "22" in text and f'NumberOfPoints="{p2.n_dofs}"' in text
    u = p2_solution_on_dofs(p2, x)
    assert u.shape == (p2.n_dofs,)

"""FEM front-end tests: mesh import parity, P1 assembly correctness
(manufactured solutions), Dirichlet lifting, VTU export."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from multigrid_prj_tpu.models.fem import (
    assemble_p1,
    export_vtu,
    parse_msh,
    solution_on_mesh,
    structured_unit_square_mesh,
)

REF_MESH = "/root/reference/AMG/mesh/mesh1.msh"


def test_structured_mesh_shapes():
    m = structured_unit_square_mesh(5)
    assert m.n_nodes == 25
    assert m.n_elements == 32
    assert m.n_boundary_nodes == 16
    # every triangle has positive area
    p = m.nodes[m.triangles]
    area = 0.5 * np.abs(
        (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1])
        - (p[:, 2, 0] - p[:, 0, 0]) * (p[:, 1, 1] - p[:, 0, 1])
    )
    assert (area > 0).all()
    np.testing.assert_allclose(area.sum(), 1.0)


def test_linear_manufactured_solution_exact():
    """P1 reproduces harmonic linear fields exactly: with g = x + y and
    f = 0 the discrete interior solution equals x + y to roundoff —
    exercises assembly AND the Dirichlet lifting path end to end."""
    mesh = structured_unit_square_mesh(9)
    g = lambda x, y: x + y
    f = lambda x, y: np.zeros_like(x)
    A, rhs = assemble_p1(mesh, f=f, g=g)
    x = np.linalg.solve(A.to_dense(), rhs)
    want = (mesh.nodes[:, 0] + mesh.nodes[:, 1])[~mesh.on_boundary]
    np.testing.assert_allclose(x, want, atol=1e-12)


def test_manufactured_solution_converges():
    """u = sin(pi x) sin(pi y), f = 2 pi^2 u: P1 error shrinks ~h^2.

    (A quadratic u is reproduced *exactly* on this right-triangle mesh —
    the P1 stiffness equals the 5-point stencil — so a trig field is used.)
    """
    g = lambda x, y: np.sin(np.pi * x) * np.sin(np.pi * y)
    f = lambda x, y: 2 * np.pi**2 * np.sin(np.pi * x) * np.sin(np.pi * y)
    errs = []
    for n in (5, 9, 17):
        mesh = structured_unit_square_mesh(n)
        A, rhs = assemble_p1(mesh, f=f, g=g)
        x = np.linalg.solve(A.to_dense(), rhs)
        pts = mesh.nodes[~mesh.on_boundary]
        errs.append(np.abs(x - g(pts[:, 0], pts[:, 1])).max())
    assert errs[2] < errs[1] < errs[0]
    assert errs[1] / errs[2] > 3.0  # ~4x per refinement for O(h^2)


def test_variable_alpha_spd():
    mesh = structured_unit_square_mesh(7)
    alpha = lambda x, y: 1.0 + x + 2 * y
    A, _ = assemble_p1(mesh, alpha=alpha)
    D = A.to_dense()
    np.testing.assert_allclose(D, D.T, atol=1e-12)
    w = np.linalg.eigvalsh(D)
    assert w.min() > 0  # SPD


@pytest.mark.skipif(not os.path.exists(REF_MESH), reason="reference mesh absent")
def test_parse_reference_mesh_parity():
    """Pins the counts the reference prints for mesh1.msh
    (AMG/src/main.cpp run: 6561 nodes, 12800 elements, 30889 nnz)."""
    mesh = parse_msh(REF_MESH)
    assert mesh.n_nodes == 6561
    assert mesh.n_elements == 12800
    assert mesh.n_nodes - mesh.n_boundary_nodes == 6241
    A, rhs = assemble_p1(mesh)
    assert A.shape == (6241, 6241)
    assert A.nnz == 30889  # the reference's printed count
    assert rhs.shape == (6241,)


def test_vtu_export_well_formed(tmp_path):
    mesh = structured_unit_square_mesh(5)
    g = lambda x, y: x + y
    f = lambda x, y: np.zeros_like(x)
    A, rhs = assemble_p1(mesh, f=f, g=g)
    x = np.linalg.solve(A.to_dense(), rhs)
    path = tmp_path / "out.vtu"
    export_vtu(str(path), mesh, x, g=g)
    root = ET.parse(path).getroot()
    assert root.tag == "VTKFile"
    piece = root.find(".//Piece")
    assert piece.get("NumberOfPoints") == "25"
    assert piece.get("NumberOfCells") == "32"
    u = np.fromstring(
        root.find(".//PointData/DataArray").text.replace("\n", " "), sep=" "
    )
    full = solution_on_mesh(mesh, x, g=g)
    np.testing.assert_allclose(u, full, atol=1e-12)
    # boundary nodes carry g exactly
    np.testing.assert_allclose(
        u[mesh.on_boundary],
        g(mesh.nodes[mesh.on_boundary, 0], mesh.nodes[mesh.on_boundary, 1]),
    )

"""Aux subsystems: metrics, checkpoint/resume, visualization, web server."""

import http.client
import json
import os
import threading
import urllib.parse

import numpy as np
import pytest

import jax.numpy as jnp

from multigrid_prj_tpu.gmg import GMGSolver
from multigrid_prj_tpu.models.poisson import assemble_rhs
from multigrid_prj_tpu.utils.checkpoint import (
    load_checkpoint,
    resume_solve,
    save_checkpoint,
)
from multigrid_prj_tpu.utils.metrics import PhaseTimer, SolveMetrics


def small_problem(maxit=1000, tol=1e-11):
    s = GMGSolver(shape=(33, 33), num_levels=3, tol=tol, maxit=maxit)
    b = assemble_rhs(s.levels[0], 10.0, test=0, dtype=jnp.float64)
    return s, b


def test_solve_metrics_derivations(tmp_path):
    h = np.array([1.0, 0.1, 0.01, 0.001])
    m = SolveMetrics(history=h, wall_time_s=2.0, nnz=100, cycles=3)
    assert m.iterations == 3
    np.testing.assert_allclose(m.reduction_factors, [0.1, 0.1, 0.1])
    np.testing.assert_allclose(m.convergence_factor, 0.1, rtol=1e-12)
    assert m.nnz_per_s == 150.0
    jpath = tmp_path / "m.json"
    m.write_json(str(jpath))
    loaded = json.loads(jpath.read_text())
    assert loaded["iterations"] == 3
    cpath = tmp_path / "m.csv"
    m.write_csv(str(cpath))
    assert len(cpath.read_text().strip().split("\n")) == 5


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    assert "a" in t.phases and t.phases["a"] >= 0
    assert "a:" in t.report()


def test_checkpoint_roundtrip_and_resume(tmp_path):
    solver, b = small_problem()
    # stop early, checkpoint, resume, compare to uninterrupted solve
    early = GMGSolver(shape=(33, 33), num_levels=3, tol=1e-11, maxit=3)
    bnp = b
    partial = early.solve(bnp)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, partial.u, bnp, partial.history,
                    config={"n": 33, "levels": 3})
    state = load_checkpoint(path)
    assert state["config"]["n"] == 33
    resumed = resume_solve(solver, path)
    assert resumed.converged
    direct = solver.solve(bnp)
    du = np.abs(np.asarray(resumed.u) - np.asarray(direct.u)).max()
    assert du / np.abs(np.asarray(direct.u)).max() < 1e-9
    # merged history: partial prefix + continuation
    assert len(resumed.history) >= len(direct.history) - 1


def test_plots_and_gif(tmp_path):
    from multigrid_prj_tpu.viz.plots import (
        make_gif,
        plot_convergence,
        plot_fem_solution,
        plot_solution,
        record_cycle_stages,
        write_stage_files,
    )

    solver, b = small_problem()
    out = solver.solve(b)
    p1 = plot_solution(np.asarray(out.u), 10.0, str(tmp_path / "sol.png"))
    p2 = plot_convergence(np.asarray(out.history), str(tmp_path / "conv.png"))
    assert os.path.getsize(p1) > 1000 and os.path.getsize(p2) > 1000

    from multigrid_prj_tpu.models.fem import (
        assemble_p1,
        solution_on_mesh,
        structured_unit_square_mesh,
    )

    mesh = structured_unit_square_mesh(9)
    A, rhs = assemble_p1(mesh)
    x = np.linalg.solve(A.to_dense(), rhs)
    p3 = plot_fem_solution(mesh.nodes, mesh.triangles,
                           solution_on_mesh(mesh, x), str(tmp_path / "fem.png"))
    assert os.path.getsize(p3) > 1000

    frames = record_cycle_stages(solver, b, iterations=1)
    assert len(frames) >= 4
    d = write_stage_files(frames, str(tmp_path / "stages"))
    assert os.path.exists(os.path.join(d, "0.mtx"))
    gif = make_gif(frames[:4], str(tmp_path / "cycle.gif"), fps=2)
    assert os.path.getsize(gif) > 1000


@pytest.fixture(scope="module")
def web_server(tmp_path_factory):
    from http.server import ThreadingHTTPServer

    from multigrid_prj_tpu.web.server import Handler

    Handler.workdir = str(tmp_path_factory.mktemp("web"))
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield srv.server_address
    srv.shutdown()


def test_web_form_page(web_server):
    host, port = web_server
    conn = http.client.HTTPConnection(host, port, timeout=30)
    conn.request("GET", "/")
    r = conn.getresponse()
    body = r.read().decode()
    assert r.status == 200
    for needle in ('name="n"', 'name="smt"', "test 0", "test 1", "test 2",
                   "drawChart"):
        assert needle in body, needle


def test_web_run_and_downloads(web_server):
    host, port = web_server
    conn = http.client.HTTPConnection(host, port, timeout=300)
    # The form takes the COARSEST N; the server upscales N <- 2N - 1 per
    # level (the reference UI's home.php:93-98): 9 -> 17 -> 33 with ml=3.
    form = urllib.parse.urlencode(
        {"n": 9, "a": 10.0, "w": 10.0, "ml": 3, "test": 1, "smt": 0,
         "cycle": "sawtooth"}
    )
    conn.request("POST", "/run", body=form,
                 headers={"Content-Type": "application/x-www-form-urlencoded"})
    r = conn.getresponse()
    j = json.loads(r.read())
    assert r.status == 200 and "error" not in j, j
    assert j["converged"] and j["final_residual"] < 1e-10
    assert len(j["history"]) == j["iterations"] + 1
    conn.request("GET", "/MGGS4.txt")
    r = conn.getresponse()
    hist = r.read().decode().strip().split("\n")
    assert r.status == 200 and int(hist[0]) == len(hist) - 1
    conn.request("GET", "/x.mtx")
    r = conn.getresponse()
    assert r.status == 200 and int(r.read().split(b"\n")[0]) == 33 * 33


def test_web_rejects_bad_input(web_server):
    host, port = web_server
    conn = http.client.HTTPConnection(host, port, timeout=30)
    conn.request("POST", "/run", body="n=999999&ml=3",
                 headers={"Content-Type": "application/x-www-form-urlencoded"})
    j = json.loads(conn.getresponse().read())
    assert "error" in j and "range" in j["error"]

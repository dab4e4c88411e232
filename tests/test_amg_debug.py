"""Smoke test for the standalone AMG debug harness (cli/amg_debug.py) —
the reference's second binary (AMG/debugtest.cpp): manual multi-level
setup with diagnostics, cross-level composition check, coarse GS with
before/after residual, VTU export."""

import os

import pytest

from multigrid_prj_tpu.cli.amg_debug import main

REF_MESH = "/root/reference/AMG/mesh/mesh1.msh"


@pytest.mark.skipif(not os.path.exists(REF_MESH), reason="reference mesh absent")
def test_amg_debug_end_to_end(tmp_path, capsys):
    out = tmp_path / "dbg.vtu"
    rc = main(["-mesh", REF_MESH, "-levels", "2", "-sweeps", "30",
               "-o", str(out)])
    assert rc == 0
    text = capsys.readouterr().out
    assert "PASSED" in text          # cross-level composition invariant
    assert "coarse residual before" in text
    assert out.exists() and out.stat().st_size > 0
    # the 30 GS sweeps must reduce the coarse residual
    import re
    r0 = float(re.search(r"coarse residual before: ([\d.e+-]+)", text)[1])
    r1 = float(re.search(r"coarse residual after[^:]*: ([\d.e+-]+)", text)[1])
    assert r1 < r0

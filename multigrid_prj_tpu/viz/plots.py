"""Matplotlib visualization: solution fields, convergence history, and the
multigrid-cycle animation.

Capability parity with the reference's visualization layer:

* ``GeometricMultigrid/test/test.ipynb`` cells 4-6: 2D imshow + 3D surface
  of the solution loaded from ``x.mtx``, semilog residual-history plot ->
  :func:`plot_solution`, :func:`plot_convergence`.
* ``AMG/start.py``: 2D colormap + warped 3D render of the FEM solution ->
  :func:`plot_fem_solution` (tri-based, no pyvista dependency needed).
* ``GeometricMultigrid/test/gifMaker.py`` + the ``CREATE_GIF`` build
  (``multigrid.hpp:160-316``): per-stage frames of the evolving solution
  animated as a gif -> :func:`record_cycle_stages`, :func:`make_gif`.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib import animation  # noqa: E402


def plot_solution(u: np.ndarray, length: float, path: str, title: str = "u"):
    """2D heatmap + 3D surface side by side (notebook cells 4-5 parity)."""
    u = np.asarray(u)
    n, m = u.shape
    fig = plt.figure(figsize=(11, 4.5))
    ax = fig.add_subplot(1, 2, 1)
    im = ax.imshow(u, extent=[0, length, 0, length], origin="upper",
                   cmap="viridis")
    fig.colorbar(im, ax=ax)
    ax.set_title(f"{title} (2D)")
    ax3 = fig.add_subplot(1, 2, 2, projection="3d")
    X = np.linspace(0, length, m)
    Y = np.linspace(length, 0, n)
    XX, YY = np.meshgrid(X, Y)
    ax3.plot_surface(XX, YY, u, cmap="viridis", linewidth=0)
    ax3.set_title(f"{title} (3D)")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_convergence(history: Sequence[float], path: str):
    """Semilog residual history (notebook cell 6 / Chart.js W2 parity)."""
    h = np.asarray(history)
    fig, ax = plt.subplots(figsize=(6.5, 4))
    ax.semilogy(np.arange(len(h)), np.maximum(h, 1e-300), "o-")
    ax.set_xlabel("outer iteration")
    ax.set_ylabel("relative residual")
    ax.grid(True, which="both", alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_fem_solution(nodes: np.ndarray, triangles: np.ndarray, u: np.ndarray,
                      path: str):
    """2D tri-colormap + warped 3D trisurf (AMG/start.py parity)."""
    fig = plt.figure(figsize=(11, 4.5))
    ax = fig.add_subplot(1, 2, 1)
    t = ax.tripcolor(nodes[:, 0], nodes[:, 1], triangles, u, shading="gouraud",
                     cmap="viridis")
    fig.colorbar(t, ax=ax)
    ax.set_aspect("equal")
    ax.set_title("u (2D)")
    ax3 = fig.add_subplot(1, 2, 2, projection="3d")
    ax3.plot_trisurf(nodes[:, 0], nodes[:, 1], u, triangles=triangles,
                     cmap="viridis", linewidth=0)
    ax3.set_title("u (3D, warped)")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


# ---------------------------------------------------------------------------
# Cycle-stage recording + gif (CREATE_GIF / gifMaker.py parity)
# ---------------------------------------------------------------------------


def record_cycle_stages(solver, b, u=None, iterations: int = 3):
    """Run outer iterations eagerly, snapshotting the evolving fine-grid
    approximation after every cycle stage.

    Mirrors the ``CREATE_GIF`` build, which dumps the full-length vector
    after pre-smooths, the coarse solve, and each up-leg smoothing
    (``multigrid.hpp:233-269``).  Coarse-level errors are prolongated to the
    fine grid for display.  Returns ``[(label, array), ...]``.
    """
    import jax.numpy as jnp

    from multigrid_prj_tpu.gmg import stationary_solve
    from multigrid_prj_tpu.ops.stencil import poisson_residual
    from multigrid_prj_tpu.ops.transfer import prolong, restrict_full_weighting

    levels, alpha, sm = solver.levels, solver.alpha, solver.smoother
    if u is None:
        u = jnp.zeros_like(b)
    frames = [("initial", np.asarray(u))]

    def to_fine(e, level):
        for j in range(level - 1, -1, -1):
            e = prolong(e, levels[j].shape)
        return e

    for it in range(iterations):
        u = sm(u, b, alpha, levels[0].h, solver.pre_sweeps)
        frames.append((f"it{it}: pre-smooth", np.asarray(u)))
        r = poisson_residual(u, b, alpha, levels[0].h)
        rs = [r]
        for lev in levels[1:]:
            rs.append(restrict_full_weighting(rs[-1]))
        e = jnp.zeros_like(rs[-1])
        e, _, _ = stationary_solve(e, rs[-1], alpha, levels[-1].h, sm,
                                   solver.coarse_tol, solver.coarse_maxit)
        frames.append((f"it{it}: coarse solve",
                       np.asarray(u + to_fine(e, len(levels) - 1))))
        for j in range(len(levels) - 2, -1, -1):
            e = prolong(e, levels[j].shape)
            e = sm(e, rs[j], alpha, levels[j].h, solver.nu)
            frames.append((f"it{it}: level {j} smooth",
                           np.asarray(u + to_fine(e, j))))
        u = u + e
        frames.append((f"it{it}: corrected", np.asarray(u)))
    return frames


def write_stage_files(frames, outdir: str):
    """Dump frames as ``<k>.mtx`` vector files — the ``CREATE_GIF`` artifact
    format consumed by the reference's gifMaker.py."""
    from multigrid_prj_tpu.utils.io import save_vector

    os.makedirs(outdir, exist_ok=True)
    for k, (_label, arr) in enumerate(frames):
        save_vector(os.path.join(outdir, f"{k}.mtx"), arr.reshape(-1))
    return outdir


def make_gif(frames, path: str, length: float = 10.0, fps: int = 2,
             three_d: bool = False):
    """Animate the recorded stages (gifMaker.py parity; 2D or 3D)."""
    vmin = min(f.min() for _, f in frames)
    vmax = max(f.max() for _, f in frames)
    fig = plt.figure(figsize=(6, 5))
    if three_d:
        ax = fig.add_subplot(projection="3d")
    else:
        ax = fig.add_subplot()

    def draw(k):
        ax.clear()
        label, arr = frames[k]
        if three_d:
            n, m = arr.shape
            X, Y = np.meshgrid(np.linspace(0, length, m),
                               np.linspace(length, 0, n))
            ax.plot_surface(X, Y, arr, cmap="viridis", linewidth=0)
            ax.set_zlim(vmin, vmax)
        else:
            ax.imshow(arr, extent=[0, length, 0, length], origin="upper",
                      cmap="viridis", vmin=vmin, vmax=vmax)
        ax.set_title(label)

    anim = animation.FuncAnimation(fig, draw, frames=len(frames))
    anim.save(path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return path

"""Grid-transfer operators: restriction and prolongation.

Capability parity with the reference:

* Restriction in the reference is **injection**: every level reads the shared
  full-length residual vector through its index mask
  (``multigrid.hpp:112-114`` smooths ``A_level[j] err = res`` where ``res``
  is the finest residual accessed at the level's masked nodes), i.e.
  ``r_coarse = r_fine[::2, ::2]``.  ``restrict_inject`` reproduces that.
  ``restrict_full_weighting`` is the standard [1/4, 1/2, 1/4]-per-axis
  restriction used by the textbook V/W cycles this framework adds.
* Prolongation (``InterpolationClass::interpolate``,
  ``GeometricMultigrid/src/multigrid.cpp:3-27``): coarse values are shared
  in place (injection on coincident nodes), vertical midpoints are averaged
  (pass 1), then rows are filled horizontally (pass 2) — i.e. bilinear
  interpolation.  ``prolong`` implements exactly that as an axis-by-axis
  linear refinement (bilinear in 2D, trilinear in 3D).

TPU-native design: both directions are strided-slice / interleave array ops
that XLA lowers to contiguous VMEM copies — no index masks, no scalar loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def restrict_inject(r: jax.Array) -> jax.Array:
    """Injection: sample every other node per axis (the reference's mask read)."""
    return r[(slice(None, None, 2),) * r.ndim]


def _fw_axis(a: jax.Array, axis: int) -> jax.Array:
    """Full-weighting restriction along one axis (odd sizes only).

    Coarse interior point 2i gets ``0.25 a[2i-1] + 0.5 a[2i] + 0.25 a[2i+1]``;
    the two edge points are injected.
    """
    n = a.shape[axis]
    if n % 2 == 0:
        # Even sizes fall back to injection along this axis (mirrors the
        # reference's subset semantics for non 2^k+1 grids, domain.cpp:9-12).
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(None, None, 2)
        return a[tuple(sl)]

    def ax_slice(lo, hi, step=1):
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(lo, hi, step)
        return a[tuple(sl)]

    interior = (
        0.25 * ax_slice(1, n - 2, 2)
        + 0.5 * ax_slice(2, n - 1, 2)
        + 0.25 * ax_slice(3, n, 2)
    )
    first = ax_slice(0, 1)
    last = ax_slice(n - 1, n)
    return jnp.concatenate([first, interior, last], axis=axis)


def restrict_full_weighting(r: jax.Array) -> jax.Array:
    """Tensor-product full weighting (edge nodes injected)."""
    for ax in range(r.ndim):
        r = _fw_axis(r, ax)
    return r


def _refine_axis(a: jax.Array, axis: int, target: int) -> jax.Array:
    """Linear refinement along ``axis`` from ``n`` to ``target`` nodes.

    ``target = 2n - 1``: even outputs inject, odd outputs average neighbors —
    the reference's two-pass scheme (``multigrid.cpp:4-26``).  ``target = 2n``
    additionally clamps one extra trailing node (general-``n`` support).
    """
    n = a.shape[axis]
    if target == n:
        return a

    def ax_slice(lo, hi):
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(lo, hi)
        return a[tuple(sl)]

    if target not in (2 * n - 1, 2 * n):
        raise ValueError(f"cannot refine axis of size {n} to {target}")
    head = ax_slice(0, n - 1)
    mid = 0.5 * (head + ax_slice(1, n))
    # Interleave head/mid -> [a0, m0, a1, m1, ..., a_{n-2}, m_{n-2}]
    stacked = jnp.stack([head, mid], axis=axis + 1)
    new_shape = list(a.shape)
    new_shape[axis] = 2 * (n - 1)
    inter = stacked.reshape(new_shape)
    out = jnp.concatenate([inter, ax_slice(n - 1, n)], axis=axis)
    if target == 2 * n:
        out = jnp.concatenate([out, ax_slice(n - 1, n)], axis=axis)
    return out


def prolong(e: jax.Array, fine_shape: tuple[int, ...]) -> jax.Array:
    """Bilinear/trilinear prolongation of ``e`` to ``fine_shape``."""
    if len(fine_shape) != e.ndim:
        raise ValueError("rank mismatch")
    for ax, target in enumerate(fine_shape):
        e = _refine_axis(e, ax, int(target))
    return e

"""Float-float ("ff32") extended precision for large-grid residuals on TPU.

Why: the relative residual a plain-f32 solver can reach is floored at
``eps_f32 * kappa(A) ~ 6e-8 * (N/pi)^2`` — measured 0.38 at 8193^2, 2.6e-5
at 65^2, matching the formula.  TPUs have no hardware f64, so reaching the
BASELINE target (1e-8) needs the residual evaluated in extended precision.

How: the solution is carried as an unevaluated pair ``u = hi + lo`` and the
residual uses error-free transformations.  The stencil residual is computed
in the *scaled* form

    r = c * ((b/c) - (4 u - sum(neighbors))),   c = alpha / h^2

so every extended-precision operation is an ADDITION (Knuth two-sum — exact
regardless of FMA contraction); ``4 u`` is exact (power of two), and the one
final multiply by ``c`` happens after the cancellation is resolved, where a
plain rounding error is harmless.  ``b/c`` is itself stored as a pair so its
quantization does not floor the achievable residual.

The multigrid cycle then solves the error equation entirely in f32 (through
the Pallas kernels), and the correction is accumulated into the pair — the
classic iterative-refinement split, here TPU-native.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multigrid_prj_tpu.ops.stencil import boundary_mask


def two_sum(a, b):
    """Knuth exact addition: returns (s, err) with a + b == s + err."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def fast_two_sum(a, b):
    """Dekker exact addition, valid when |a| >= |b| (post-normalization)."""
    s = a + b
    err = b - (s - a)
    return s, err


def ff_add(x_hi, x_lo, y_hi, y_lo):
    """Pair + pair -> normalized pair (accurate to ~2 ulps of the pair)."""
    s, e = two_sum(x_hi, y_hi)
    e = e + (x_lo + y_lo)
    return fast_two_sum(s, e)


def ff_add_f(x_hi, x_lo, y):
    """Pair + float -> normalized pair."""
    s, e = two_sum(x_hi, y)
    e = e + x_lo
    return fast_two_sum(s, e)


def ff_neg(x_hi, x_lo):
    return -x_hi, -x_lo


def ff_from_div(b, c):
    """Pair representation of ``b / c`` (refined with one Newton remainder)."""
    hi = b / c
    lo = (b - hi * c) / c
    return hi, lo


def _shift2(a, axis, offset):
    sl = [slice(None)] * a.ndim
    pad = [(0, 0)] * a.ndim
    if offset == +1:
        sl[axis] = slice(1, None)
        pad[axis] = (0, 1)
    else:
        sl[axis] = slice(None, -1)
        pad[axis] = (1, 0)
    return jnp.pad(a[tuple(sl)], pad)


def ff_poisson_residual(u_hi, u_lo, d_hi, d_lo, b, alpha: float, h: float,
                        logical_shape=None):
    """Extended-precision ``r = b - A u`` for the Poisson stencil.

    ``d_hi, d_lo`` = pair for ``b / c`` (precompute with :func:`ff_from_div`).
    Returns an f32 residual whose accuracy is ~``eps_ff * kappa`` instead of
    ``eps_f32 * kappa``.
    """
    c = alpha / (h * h)
    ndim = u_hi.ndim
    # acc = 2*ndim*u (exact: power-of-two scale for 2D; 6x split for 3D)
    if ndim == 2:
        acc_hi, acc_lo = 4.0 * u_hi, 4.0 * u_lo
    else:
        acc_hi, acc_lo = ff_add(4.0 * u_hi, 4.0 * u_lo, 2.0 * u_hi, 2.0 * u_lo)
    for ax in range(ndim):
        for off in (+1, -1):
            nb_hi = _shift2(u_hi, ax, off)
            nb_lo = _shift2(u_lo, ax, off)
            acc_hi, acc_lo = ff_add(acc_hi, acc_lo, -nb_hi, -nb_lo)
    # t = d - acc  (the cancellation happens here, in extended precision)
    t_hi, t_lo = ff_add(d_hi, d_lo, -acc_hi, -acc_lo)
    r_interior = c * t_hi + c * t_lo
    # boundary rows: r = b - u
    r_boundary = (b - u_hi) - u_lo
    bm = boundary_mask(u_hi.shape, logical_shape)
    return jnp.where(bm, r_boundary, r_interior)


def ff_accumulate(u_hi, u_lo, e):
    """(u_hi, u_lo) += e, renormalized."""
    return ff_add_f(u_hi, u_lo, e)

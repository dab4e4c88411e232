"""Pallas TPU kernel for ELL sparse matrix-vector products.

The AMG solve phase's hot op is ``y = A x`` on a fixed unstructured sparsity
(the reference's CSR row scans, ``AMG/src/CSRMatrix.cpp:24-52``, driven from
the 10/200/10 GS sweeps at ``AMG/src/AMG.cpp:283-303``).  This kernel runs
the padded-ELL product at **75.9 G slots/s** on v5e (1M-row K=8 RCM band,
f32 values + int16 relative columns = 6 B/slot, differential-timed
dependent chain, block_rows=16384).  The int32-column variant measured
71-72 G slots/s = 569-648 GB/s, i.e. at the chip's single-pass streaming
ceiling (~650 GB/s measured; nominal HBM 819 GB/s); int16 columns trade
streamed bytes for a cheap widening cast for a further +7%.  The XLA
``jnp.take``-gather lowering of the same product
(``ops/sparse.py:ELLMatrix.spmv``) measures ~13x slower; numbers in
``benchmarks/spmv_bench.py``.

TPU-native design (constraints from Mosaic: the only dynamic gather that
lowers is ``take_along_axis`` on SAME-SHAPE 2D operands within a (8, 128)
lane tile):

* **slot-major ELL**: ``colsT/valsT`` stored ``(K, n)`` so one (K, 128)
  tile covers 128 consecutive rows x all their nonzero slots — rows ride
  the 128-lane axis, slots the sublane axis.
* **banded windows**: the matrix is RCM-reordered at setup, so the columns
  touched by 128 consecutive rows span a narrow window.  Per lane tile the
  setup records ``base2`` = first 128-aligned x-tile of that window; column
  ids are stored RELATIVE to it.  The window covers ``t_win`` x-tiles
  (typically 3-5 after RCM), a static kernel constant.
* **gather = per-tile select**: ``x`` lives fully in VMEM as ``(S, 128)``
  (row-major: tile s holds entries ``[128 s, 128 s + 128)``).  For each of
  the ``t_win`` window tiles the kernel broadcasts that tile's row to
  ``(K, 128)``, lane-gathers with the relative index, and selects by the
  index's tile id — turning the unstructured gather into ``t_win`` fully
  vectorized VPU ops.
* **scalar prefetch**: the per-lane-tile ``base2`` array rides the
  PrefetchScalarGridSpec so block index maps and the in-kernel dynamic
  window slices know their x-tiles before the block runs.

HBM traffic: vals + cols stream once (4+2 B per padded nnz; column ids
are int16 relative offsets), x is read once
into VMEM, y written once — the ELL speed of light.  Compute: ~4 VPU ops
per window tile per (K, 128) tile of nonzeros.

Falls back (returns ``None`` from :func:`PallasELL.build`) when the vector
does not fit VMEM (~2M rows) or the post-RCM band is too wide; callers then
keep the XLA gather path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multigrid_prj_tpu.ops.sparse import HostCSR

_LANE = 128
_MAX_X_VMEM = 8 * 1024 * 1024  # x must fit comfortably in VMEM
_MAX_T_WIN = 8  # window = one 8-sublane x slice; wider bands fall back


def _spmv_kernel(base2_ref, cols_ref, vals_ref, x_ref, o_ref, *, k, r, t_win):
    """One row block: r rows x k slots; per lane tile, window-select gather.

    ``o_ref`` is an ``(r / 128, 128)`` tile of the output in the same
    row-major 2D layout as ``x`` — lane tile ``j``'s 128 row sums land in
    output sublane ``j``.
    """
    i = pl.program_id(0)
    nlt = r // _LANE
    for j in range(nlt):
        sl = slice(j * _LANE, (j + 1) * _LANE)
        # cols are stored int16 (relative ids < 1024): 6 B/slot streamed
        # instead of 8 — measured +7% on v5e (bit-identical results)
        idx = cols_ref[:, sl].astype(jnp.int32)
        hi = jax.lax.shift_right_logical(idx, jnp.int32(7))
        lo = jax.lax.bitwise_and(idx, jnp.int32(127))
        base = base2_ref[i * nlt + j]
        # ONE dynamic sublane slice per lane tile (the window's 8 x-tiles =
        # 1024 consecutive entries); the per-window-tile sources are then
        # cheap static-row broadcasts of it.  (A dynamic slice per (j, t)
        # measured 4x slower.)
        win = x_ref[pl.ds(base, 8), :]
        g = jnp.zeros((k, _LANE), x_ref.dtype)
        for t in range(t_win):
            src = jnp.broadcast_to(win[t, :][None, :], (k, _LANE))
            g = jnp.where(hi == t, jnp.take_along_axis(src, lo, axis=1), g)
        o_ref[j, :] = jnp.sum(vals_ref[:, sl] * g, axis=0)


def _spmm_kernel(base2_ref, cols_ref, vals_ref, x_ref, o_ref, *, k, r, t_win):
    """Multi-vector variant of :func:`_spmv_kernel`: ``x_ref`` holds ``nvec``
    padded vectors as ``(nvec, S, 128)``; grid = (row blocks, vectors) with
    the vector index MINOR, so A's cols/vals block (indexed by row block
    only) stays VMEM-resident across the inner vector steps — A streams from
    HBM once per row block for the whole vector block, the bandwidth win of
    SpMM over ``nvec`` repeated SpMVs.  (Looping vectors inside the kernel
    body instead multiplies the unrolled body by ``nvec`` and blows up the
    Mosaic compile: 255 s measured vs seconds this way.)"""
    i = pl.program_id(0)
    vv = pl.program_id(1)
    nlt = r // _LANE
    for j in range(nlt):
        sl = slice(j * _LANE, (j + 1) * _LANE)
        idx = cols_ref[:, sl].astype(jnp.int32)
        hi = jax.lax.shift_right_logical(idx, jnp.int32(7))
        lo = jax.lax.bitwise_and(idx, jnp.int32(127))
        base = base2_ref[i * nlt + j]
        win = x_ref[vv, pl.ds(base, 8), :]
        g = jnp.zeros((k, _LANE), x_ref.dtype)
        for t in range(t_win):
            src = jnp.broadcast_to(win[t, :][None, :], (k, _LANE))
            g = jnp.where(hi == t, jnp.take_along_axis(src, lo, axis=1), g)
        o_ref[0, j, :] = jnp.sum(vals_ref[:, sl] * g, axis=0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PallasELL:
    """ELL matrix prepared for the Pallas SpMV kernel (slot-major, relative
    banded column ids, per-lane-tile window bases)."""

    colsT_rel: jax.Array  # (K_pad, n_pad) int16 (relative ids < 1024)
    valsT: jax.Array  # (K_pad, n_pad)
    base2: jax.Array  # (n_pad // 128,) int32 window base x-tile per lane tile
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    t_win: int = dataclasses.field(metadata=dict(static=True))
    m_pad: int = dataclasses.field(metadata=dict(static=True))
    block_rows: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    # run the kernel in interpreter mode (CPU tests of TPU code paths)
    interpret: bool = dataclasses.field(default=False,
                                        metadata=dict(static=True))

    @staticmethod
    def build(
        csr: HostCSR,
        dtype=jnp.float32,
        block_rows: int | None = None,
        max_t_win: int = _MAX_T_WIN,
        interpret: bool = False,
    ) -> Optional["PallasELL"]:
        """Prepare a CSR matrix for the kernel; ``None`` if unsupported.

        The CALLER is responsible for the matrix being banded (RCM-reorder
        first — ``HostCSR.rcm_permutation``/``permute``); this only measures
        the resulting window widths and refuses pathological ones.

        ``block_rows=None`` picks the measured-fastest default: 16384 rows
        per grid step (differential-timed ladder on v5e, 1M-row K=8 band:
        1024 -> ~8 G slots/s-equivalent pipeline underutilisation,
        8192 -> 562 GB/s, 16384 -> 648 GB/s = the chip's streaming speed
        of light), capped at the padded row count for small systems.
        """
        n, m = csr.shape
        if n == 0 or csr.nnz == 0:
            return None
        if block_rows is None:
            block_rows = min(16384, -(-n // 1024) * 1024)
        if block_rows % (8 * _LANE):
            raise ValueError("block_rows must be a multiple of 1024 "
                             "(8-sublane output tiles)")
        s_tiles = -(-m // _LANE)
        if s_tiles * _LANE * 4 > _MAX_X_VMEM:
            return None
        lengths = csr.row_lengths
        k = int(lengths.max())
        k_pad = max(8, -(-k // 8) * 8)
        n_pad = -(-n // block_rows) * block_rows
        # dense (n_pad, k_pad) cols/vals; padding slots get col = row's min
        # col (harmless relative index) and val = 0
        cols = np.zeros((n_pad, k_pad), dtype=np.int64)
        vals = np.zeros((n_pad, k_pad), dtype=np.float64)
        rows = np.repeat(np.arange(n), lengths)
        slot = np.arange(csr.nnz, dtype=np.int64) - np.repeat(
            csr.indptr[:-1], lengths
        )
        cols[rows, slot] = csr.indices
        vals[rows, slot] = csr.data
        # fill padding slots (and padding rows) with the row's first col
        first_col = np.zeros(n_pad, dtype=np.int64)
        first_col[:n] = np.where(lengths > 0, csr.indices[
            np.minimum(csr.indptr[:-1], csr.nnz - 1)], 0)
        # empty rows / padding rows inherit a neighboring row's first col so
        # they never widen their lane tile's window
        for r_ in range(1, n_pad):
            if r_ >= n or lengths[r_] == 0:
                first_col[r_] = first_col[r_ - 1]
        pad_mask = np.arange(k_pad)[None, :] >= np.concatenate(
            [lengths, np.zeros(n_pad - n, dtype=lengths.dtype)])[:, None]
        cols = np.where(pad_mask, first_col[:, None], cols)
        # per-lane-tile window base (x-tile units) and width
        n_lt = n_pad // _LANE
        tile_of = cols >> 7  # (n_pad, k_pad)
        tile_of_lt = tile_of.reshape(n_lt, _LANE, k_pad)
        lo_t = tile_of_lt.min(axis=(1, 2))
        hi_t = tile_of_lt.max(axis=(1, 2))
        # the kernel slices an 8-x-tile window per lane tile; pad x by 8
        # tiles so no base ever clamps (a clamp near the end would inflate
        # the GLOBAL static t_win and slow every block — measured 2.6x)
        s_need = s_tiles + 8
        base2 = lo_t.astype(np.int32)
        t_win = int((hi_t - base2).max()) + 1
        if t_win > min(max_t_win, 8):
            return None
        rel = cols - (base2.astype(np.int64).repeat(_LANE)[:, None] << 7)
        assert rel.min() >= 0 and rel.max() < 8 * _LANE  # always fits int16
        return PallasELL(
            colsT_rel=jnp.asarray(rel.T.astype(np.int16)),
            valsT=jnp.asarray(vals.T, dtype=dtype),
            base2=jnp.asarray(base2),
            shape=(n, m),
            t_win=t_win,
            m_pad=s_need * _LANE,
            block_rows=block_rows,
            nnz=csr.nnz,
            interpret=interpret,
        )

    @property
    def nnz_dense(self) -> int:
        """Streamed (padded) slots — the kernel's actual HBM footprint."""
        return self.valsT.size

    @property
    def x2d_rows(self) -> int:
        return self.m_pad // _LANE

    def pad_x(self, x: jax.Array) -> jax.Array:
        """Logical (m,) vector -> padded 2D VMEM layout (m_pad/128, 128)."""
        x = x.astype(self.valsT.dtype)
        xp = jnp.zeros((self.m_pad,), x.dtype).at[: self.shape[1]].set(x)
        return xp.reshape(-1, _LANE)

    def unpad_y(self, y2d: jax.Array) -> jax.Array:
        return y2d.reshape(-1)[: self.shape[0]]

    def spmv(self, x: jax.Array, *, interpret: bool | None = None) -> jax.Array:
        """``y = A x`` via the Pallas kernel.  ``x`` is the logical (m,)
        vector; padding/unpadding and the 2D VMEM view are internal.

        Chained callers should prefer :meth:`spmv2d` on the padded layout —
        the per-call pad/unpad copies here cost ~40% on top of the kernel.
        """
        return self.unpad_y(self.spmv2d(self.pad_x(x), interpret=interpret))

    def spmv2d(self, x2d: jax.Array, *,
               interpret: bool | None = None) -> jax.Array:
        """Padded-layout product: ``x2d`` is ``(m_pad/128, 128)`` (see
        :meth:`pad_x`), returns ``y2d`` of shape ``(n_pad/128, 128)`` whose
        padding rows are exact zeros."""
        interpret = self.interpret if interpret is None else interpret
        k_pad, n_pad = self.colsT_rel.shape
        r = self.block_rows
        nb = n_pad // r
        nlt = r // _LANE
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((k_pad, r), lambda i, b2: (0, i)),
                pl.BlockSpec((k_pad, r), lambda i, b2: (0, i)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nlt, _LANE), lambda i, b2: (i, 0)),
        )
        out = pl.pallas_call(
            functools.partial(
                _spmv_kernel, k=k_pad, r=r, t_win=self.t_win
            ),
            out_shape=jax.ShapeDtypeStruct((nb * nlt, _LANE),
                                           self.valsT.dtype),
            grid_spec=grid_spec,
            cost_estimate=pl.CostEstimate(
                flops=2 * k_pad * n_pad,
                bytes_accessed=6 * k_pad * n_pad + 4 * (self.m_pad + n_pad),
                transcendentals=0,
            ),
            interpret=interpret,
        )(self.base2, self.colsT_rel, self.valsT, x2d)
        return out


    # -- multi-vector (SpMM) ---------------------------------------------

    def pad_X(self, X: jax.Array) -> jax.Array:
        """Logical ``(m, nvec)`` block -> padded ``(nvec, m_pad/128, 128)``."""
        X = X.astype(self.valsT.dtype)
        nvec = X.shape[1]
        Xp = jnp.zeros((self.m_pad, nvec), X.dtype).at[: self.shape[1], :].set(X)
        return Xp.T.reshape(nvec, -1, _LANE)

    def unpad_Y(self, y3d: jax.Array) -> jax.Array:
        nvec = y3d.shape[0]
        return y3d.reshape(nvec, -1)[:, : self.shape[0]].T

    def spmm(self, X: jax.Array, *, interpret: bool | None = None) -> jax.Array:
        """Block product ``Y = A @ X`` for ``X`` of shape ``(m, nvec)``.

        A's slots stream from HBM once for the whole block (vs once per
        vector with repeated :meth:`spmv`).  Vector blocks too large for
        VMEM are processed in chunks that fit."""
        nvec = X.shape[1]
        chunk = max(1, _MAX_X_VMEM // (self.m_pad * 4))
        outs = [
            self.unpad_Y(self.spmm2d(self.pad_X(X[:, s:s + chunk]),
                                     interpret=interpret))
            for s in range(0, nvec, chunk)
        ]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)

    def spmm2d(self, x3d: jax.Array, *,
               interpret: bool | None = None) -> jax.Array:
        """Padded-layout block product: ``x3d`` is ``(nvec, m_pad/128, 128)``
        (see :meth:`pad_X`); returns ``(nvec, n_pad/128, 128)``."""
        interpret = self.interpret if interpret is None else interpret
        nvec = x3d.shape[0]
        k_pad, n_pad = self.colsT_rel.shape
        r = self.block_rows
        nb = n_pad // r
        nlt = r // _LANE
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, nvec),  # vector index minor: A block reused across it
            in_specs=[
                pl.BlockSpec((k_pad, r), lambda i, vv, b2: (0, i)),
                pl.BlockSpec((k_pad, r), lambda i, vv, b2: (0, i)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, nlt, _LANE), lambda i, vv, b2: (vv, i, 0)),
        )
        return pl.pallas_call(
            functools.partial(
                _spmm_kernel, k=k_pad, r=r, t_win=self.t_win
            ),
            out_shape=jax.ShapeDtypeStruct((nvec, nb * nlt, _LANE),
                                           self.valsT.dtype),
            grid_spec=grid_spec,
            cost_estimate=pl.CostEstimate(
                flops=2 * k_pad * n_pad * nvec,
                bytes_accessed=6 * k_pad * n_pad
                + 4 * nvec * (self.m_pad + n_pad),
                transcendentals=0,
            ),
            interpret=interpret,
        )(self.base2, self.colsT_rel, self.valsT, x3d)


def rcm_prepared(csr: HostCSR, dtype=jnp.float32, **kw):
    """Convenience: RCM-permute ``csr`` and build the kernel layout.

    Returns ``(pallas_ell | None, perm)`` — solve in the permuted frame
    (``y_perm = A_perm x_perm``), translating with ``x_perm = x[perm]``.
    """
    perm = csr.rcm_permutation()
    Ap = csr.permute(perm)
    return PallasELL.build(Ap, dtype=dtype, **kw), perm

"""
Tensor-contraction kernels (device compute path)
================================================

The entire model reduces to contractions of the precomputed tendency tensor
with the state vector ``xx = [1, x]``:

* tendencies:    f_i  = sum_{jk}  T[i,j,k] xx_j xx_k            (rank 3)
* Jacobian:      J_im = sum_{j}  JT[i,j,m] xx_j                 (rank 3)
* T^4 variants:  rank-5 analogues.

This module provides two interchangeable device implementations (both close
over the host-precomputed tensor):

* **dense**: the densified tensor is tiny for typical mode counts
  ((ndim+1)^3 f64 at ndim~40 is ~0.5 MB), so a batched ``einsum`` maps the
  whole contraction straight onto the MXU.  This replaces the reference's
  Numba scalar COO loop (ref ``qgs/functions/sparse_mul.py:14-158``),
  which is the wrong shape for a systolic array.
* **coo (gather-scatter)**: for high mode counts or the very sparse rank-5
  quartic tensors: gather the state at the nonzero coordinates, multiply,
  and scatter-add through a precomputed one-hot matrix — the scatter then
  runs as a single (B, nnz) x (nnz, n) matmul on the MXU rather than a
  serial scatter.

All functions are batched over a leading ensemble axis; vmap/jit compose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from qgs_tpu.utils.sparse import COO


def _default_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def _resolve_precision(precision):
    """Matmul precision for the contraction kernels.  The TPU default for
    f32 matmuls is a single bf16 pass — measured 2e-3 rel error on the
    MAOOAM tendencies, silently breaking the float32 tier's ~1e-6 promise.
    Default HIGHEST (bf16x6, true-f32 accurate, 4e-8 rel measured, still
    ~30M traj-steps/s); pass 'default' explicitly for raw bf16 speed
    (~3x) when tendency-level accuracy does not matter."""
    return jax.lax.Precision.HIGHEST if precision is None else precision


# ---------------------------------------------------------------------------
# Dense rank-3 kernels
# ---------------------------------------------------------------------------

def make_dense_quadratic(tensor: COO, dtype=None, precision=None):
    """Return ``f(xx) -> out`` with ``out[b,i] = sum_jk T[i,j,k] xx[b,j] xx[b,k]``."""
    dtype = dtype or _default_dtype()
    precision = _resolve_precision(precision)
    T = jnp.asarray(tensor.todense(), dtype=dtype)
    n1 = T.shape[0]
    # matricized layout for a single big matmul: (n1, n1*n1)
    T2 = T.reshape(n1, n1 * n1)

    def quad(xx):
        outer = (xx[:, :, None] * xx[:, None, :]).reshape(xx.shape[0], n1 * n1)
        return jnp.matmul(outer, T2.T, precision=precision)

    return quad


def make_dense_bilinear(jtensor: COO, dtype=None, precision=None):
    """Return ``J(xx) -> (B, n1, n1)`` with ``J[b,i,j] = sum_k JT[i,j,k] xx[b,k]``
    (reference convention: the Jacobian column is axis 1 of the jacobian
    tensor, contraction over the trailing axis, ref ``sparse_mul.py:14-45``)."""
    dtype = dtype or _default_dtype()
    precision = _resolve_precision(precision)
    JT = jnp.asarray(jtensor.todense(), dtype=dtype)
    n1 = JT.shape[0]
    # (B, n1) @ (n1, n1*n1): contract the trailing index k
    J2 = JT.transpose(2, 0, 1).reshape(n1, n1 * n1)

    def jac(xx):
        return jnp.matmul(xx, J2, precision=precision).reshape(
            xx.shape[0], n1, n1)

    return jac


# ---------------------------------------------------------------------------
# COO gather-scatter kernels (any rank)
# ---------------------------------------------------------------------------

def make_coo_contraction(tensor: COO, dtype=None, precision=None):
    """Return ``f(xx) -> out`` for a COO tensor of any rank r >= 2:
    ``out[b, i] = sum_e val[e] * prod_{axis=1..r-1} xx[b, coords[axis, e]]``.

    The scatter to the output index runs as a dense matmul with a one-hot
    (nnz, n1) matrix — MXU-friendly, deterministic summation order."""
    dtype = dtype or _default_dtype()
    precision = _resolve_precision(precision)
    coords = tensor.coords
    rank = tensor.rank
    n1 = tensor.shape[0]
    nnz = max(tensor.nnz, 1)
    if tensor.nnz == 0:
        zero = jnp.zeros((n1,), dtype=dtype)

        def empty(xx):
            return jnp.broadcast_to(zero, (xx.shape[0], n1))

        return empty

    val = jnp.asarray(tensor.data, dtype=dtype)
    idxs = [jnp.asarray(coords[axis]) for axis in range(1, rank)]
    scatter = np.zeros((nnz, n1), dtype=np.float64)
    scatter[np.arange(tensor.nnz), coords[0]] = 1.0
    S = jnp.asarray(scatter, dtype=dtype)

    def contract(xx):
        prod = val[None, :]
        for idx in idxs:
            prod = prod * xx[:, idx]
        return jnp.matmul(prod, S, precision=precision)

    return contract


def make_rowsum_contraction(tensor: COO, dtype=None):
    """Return ``f(xx) -> out`` for a COO tensor of any rank r >= 2, with the
    per-row reduction done as a VPU sum instead of a one-hot scatter matmul.

    Entries are padded into a row-grouped ``(n1, R)`` layout (R = max
    nonzeros per output row; padding slots carry value 0, contributing
    exactly 0): gather the state at each contraction index, multiply, and
    ``sum`` over the R slots.  This removes the (B, nnz) x (nnz, n1)
    scatter matmul entirely — at HIGHEST precision that matmul is ~6x
    B*nnz*n1 MACs and dominates the COO path (measured ~25 TFLOP/s of
    mostly-padding work at MAOOAM size); the row-sum does B*n1*R exact-f32
    VPU ops.  Deterministic summation order (fixed slot order per row)."""
    dtype = dtype or _default_dtype()
    coords = tensor.coords
    rank = tensor.rank
    n1 = tensor.shape[0]
    if tensor.nnz == 0:
        zero = jnp.zeros((n1,), dtype=dtype)

        def empty(xx):
            return jnp.broadcast_to(zero, (xx.shape[0], n1))

        return empty

    rows = np.asarray(coords[0])
    counts = np.bincount(rows, minlength=n1)
    R = max(int(counts.max()), 1)
    vals = np.zeros((n1, R))
    idx_slots = [np.zeros((n1, R), np.int64) for _ in range(1, rank)]
    ptr = np.zeros(n1, np.int64)
    for e in range(tensor.nnz):
        i = rows[e]
        vals[i, ptr[i]] = tensor.data[e]
        for axis in range(1, rank):
            idx_slots[axis - 1][i, ptr[i]] = coords[axis][e]
        ptr[i] += 1

    V = jnp.asarray(vals.reshape(-1), dtype=dtype)
    idx_flats = [jnp.asarray(s.reshape(-1)) for s in idx_slots]

    def contract(xx):
        prod = V[None, :]
        for idxf in idx_flats:
            prod = prod * jnp.take(xx, idxf, axis=1)
        return prod.reshape(xx.shape[0], n1, R).sum(axis=-1)

    return contract


def make_coo_jacobian(jtensor: COO, dtype=None, precision=None):
    """Return ``J(xx) -> (B, n1, n1)`` for a COO Jacobian tensor of rank r:
    ``J[b, i, j] = sum_e val[e] * prod_{axis=2..r-1} xx[b, coords[axis,e]]``
    scattered at ``(i, j) = (coords[0,e], coords[1,e])`` — the reference's
    ``sparse_mul2``/``sparse_mul4`` convention (column at axis 1, contraction
    over the trailing axes)."""
    dtype = dtype or _default_dtype()
    precision = _resolve_precision(precision)
    coords = jtensor.coords
    rank = jtensor.rank
    n1 = jtensor.shape[0]
    if jtensor.nnz == 0:
        def empty(xx):
            return jnp.zeros((xx.shape[0], n1, n1), dtype=dtype)

        return empty

    val = jnp.asarray(jtensor.data, dtype=dtype)
    idxs = [jnp.asarray(coords[axis]) for axis in range(2, rank)]
    flat_out = coords[0] * n1 + coords[1]

    if jtensor.nnz * n1 * n1 <= 2e7:
        # one-hot matmul scatter (MXU-friendly)
        scatter = np.zeros((jtensor.nnz, n1 * n1), dtype=np.float64)
        scatter[np.arange(jtensor.nnz), flat_out] = 1.0
        S = jnp.asarray(scatter, dtype=dtype)

        def jac(xx):
            prod = val[None, :]
            for idx in idxs:
                prod = prod * xx[:, idx]
            return jnp.matmul(prod, S, precision=precision).reshape(
                xx.shape[0], n1, n1)
    else:
        # large rank-5 jacobians: scatter-add (the one-hot matrix would be
        # nnz x n1^2 — hundreds of MB)
        out_idx = jnp.asarray(flat_out)

        def jac(xx):
            prod = val[None, :]
            for idx in idxs:
                prod = prod * xx[:, idx]
            flat = jnp.zeros((xx.shape[0], n1 * n1), dtype=dtype)
            flat = flat.at[:, out_idx].add(prod)
            return flat.reshape(xx.shape[0], n1, n1)

    return jac


def make_direct_tangent(jtensor: COO, dtype=None, precision=None,
                        adjoint=False, inverse=False):
    """Direct tangent-linear contraction ``hom(xx, dm) -> (B, n, n_tg)``:

        hom[b, i, t] = sum_e val_e * (prod_a xx[b, coords[a, e]])
                                   * dm[b, coords[1, e] - 1, t]

    without materializing the Jacobian.  The J-then-multiply route costs a
    batched (n, n) x (n, n_tg) matmul per member — tiny per-batch matmuls
    that waste the MXU; here the per-entry products are flattened into ONE
    (B*n_tg, nnz) x (nnz, n1) scatter matmul (measured ~3x on the on-chip
    Benettin window at MAOOAM scale).  Same index conventions as the
    double-float version (:func:`qgs_tpu.ops.twofloat.make_df_tangent_contraction`);
    ``adjoint`` transposes and ``inverse`` negates on host, exactly.
    ``dm`` carries no dummy row (its tangent is identically zero)."""
    dtype = dtype or _default_dtype()
    precision = _resolve_precision(precision)
    n1 = jtensor.shape[0]
    n = n1 - 1
    coords = [np.asarray(c) for c in jtensor.coords]
    data = np.asarray(jtensor.data)
    if inverse:
        data = -data
    if adjoint:
        coords[0], coords[1] = coords[1], coords[0]
    keep = (coords[0] != 0) & (coords[1] != 0)
    rows = coords[0][keep] - 1
    dm_idx = jnp.asarray(coords[1][keep] - 1)
    x_idxs = [jnp.asarray(c[keep]) for c in coords[2:]]
    val = jnp.asarray(data[keep], dtype=dtype)
    nnz = int(rows.size)
    if nnz == 0:
        def empty(xx, dm):
            return jnp.zeros((xx.shape[0], n, dm.shape[-1]), dtype=dtype)

        return empty

    scatter = np.zeros((nnz, n), dtype=np.float64)
    scatter[np.arange(nnz), rows] = 1.0
    S = jnp.asarray(scatter, dtype=dtype)

    def hom(xx, dm):
        """xx: (B, n1) dummy-padded state; dm: (B, n, n_tg)."""
        B, n_tg = xx.shape[0], dm.shape[-1]
        coef = val[None, :]
        for idx in x_idxs:
            coef = coef * xx[:, idx]                       # (B, nnz)
        prod = coef[:, :, None] * jnp.take(dm, dm_idx, axis=1)
        # one flat scatter matmul: (B*n_tg, nnz) @ (nnz, n)
        flat = prod.transpose(0, 2, 1).reshape(B * n_tg, nnz)
        out = jnp.matmul(flat, S, precision=precision)
        return out.reshape(B, n_tg, n).transpose(0, 2, 1)

    return hom


# ---------------------------------------------------------------------------
# Tendency-function factories
# ---------------------------------------------------------------------------

def _with_dummy(x):
    """Prepend the dummy constant 1 along the last axis."""
    ones = jnp.ones(x.shape[:-1] + (1,), dtype=x.dtype)
    return jnp.concatenate([ones, x], axis=-1)


def make_tendency_fns(tensor: COO, jtensor: COO, mode="auto", dtype=None,
                      precision=None):
    """Build the batched tendency and Jacobian functions from a tendency
    tensor and its Jacobian tensor (any rank >= 3).

    Returns ``(f_batch, jac_batch)`` with

    * ``f_batch(t, x)``: (B, ndim) -> (B, ndim)
    * ``jac_batch(t, x)``: (B, ndim) -> (B, ndim, ndim)

    ``mode``: 'dense' | 'coo' | 'rowsum' | 'auto'.
    ``precision``: matmul precision for the contraction (default HIGHEST —
    see :func:`_resolve_precision`; pass 'default' for raw-bf16 speed).
    """
    dtype = dtype or _default_dtype()
    rank = tensor.rank
    if mode == "auto":
        # cost per tendency eval: dense einsum ~ B n^3 MACs on the MXU;
        # row-grouped gather + VPU row-sum ~ B n1 R gather-bound elements
        # (R = max row nnz).  On TPU the MXU outruns the gather pipeline by
        # ~2 orders of magnitude, so the dense path takes over once
        # n1^2/R passes ~110 — measured crossover on v5e, RESOLUTION_r03:
        # n1^2/R = 91 (MAOOAM 36-dim) -> rowsum 1.7x faster; 133 (ndim
        # 104) -> dense 2.2x faster; 294 (ndim 400) -> dense 1.4x faster
        # at 53% of the exact-f32 MXU ceiling.
        rows = np.bincount(np.asarray(tensor.coords[0]),
                           minlength=tensor.shape[0])
        n1 = tensor.shape[0]
        R = max(int(rows.max()), 1)
        if (rank == 3 and jax.default_backend() == "tpu"
                and dtype == jnp.float32
                and n1 * n1 > 110 * R and n1 <= 800):
            # n1 <= 800 bounds the densified tensor at ~2 GB f32; the
            # crossover is measured for f32-HIGHEST matmuls only — f64 on
            # TPU is XLA-emulated, where O(n1^3) dense MACs would be far
            # slower than the gather path
            mode = "dense"
        else:
            mode = "rowsum" if R <= 8 * max(rows.mean(), 1) else "coo"

    if mode == "dense" and rank == 3:
        quad = make_dense_quadratic(tensor, dtype, precision)
        bil = make_dense_bilinear(jtensor, dtype, precision)
    elif mode == "rowsum":
        quad = make_rowsum_contraction(tensor, dtype)
        bil = make_coo_jacobian(jtensor, dtype, precision)
    else:
        quad = make_coo_contraction(tensor, dtype, precision)
        bil = make_coo_jacobian(jtensor, dtype, precision)

    def f_batch(t, x):
        xx = _with_dummy(x)
        return quad(xx)[:, 1:]

    def jac_batch(t, x):
        xx = _with_dummy(x)
        return bil(xx)[:, 1:, 1:]

    return f_batch, jac_batch


def single_state(f_batch):
    """Wrap a batched function into a single-state one (reference API shape)."""

    def f(t, x):
        return f_batch(t, x[None, :])[0]

    return f

"""
Two-float (double-float) arithmetic and contraction kernels
===========================================================

TPU v5e has no native float64: XLA emulates it ~60x slower than float32
(measured on the MAOOAM RK4 benchmark).  This module implements the
classical *double-float* representation — a value is an unevaluated sum
``hi + lo`` of two float32 — with error-free transformations (Knuth
two-sum, Dekker/Veltkamp split product), giving ~48-bit effective mantissa
at float32 throughput on the VPU.

The tendency contraction is laid out for this arithmetic:

* the state is gathered at the tensor's nonzero coordinates with **one-hot
  matmuls** — a matmul whose columns have a single 1 accumulates no rounding
  error, so the gather is exact and runs on the MXU;
* products and the per-row reduction run element-wise on the VPU in
  double-float arithmetic (the only place precision is actually needed).

This is the precision/speed middle point between the f32 fast path and the
emulated-f64 exact path; all three share the same host-precomputed tensor.
"""

from __future__ import annotations

from functools import partial
import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from qgs_tpu.utils.sparse import COO

_SPLIT = np.float32(4097.0)        # Veltkamp split constant for float32 (2^12 + 1)


# ---------------------------------------------------------------------------
# error-free transformations (all float32 in / float32 out)
# ---------------------------------------------------------------------------

_BARRIERS = [True]


@contextlib.contextmanager
def no_barriers():
    """Disable the EFT optimization barriers while tracing (the Pallas
    Mosaic lowering does not implement ``optimization_barrier`` and does not
    run the XLA simplifier that makes them necessary)."""
    _BARRIERS.append(False)
    try:
        yield
    finally:
        _BARRIERS.pop()


def _opaque(x):
    """Hide a value's defining expression from XLA's simplifier/fuser.

    XLA may rewrite patterns like ``(a + b) - a -> b`` or FMA-contract a
    multiply-add differently at each use site — valid for reals,
    catastrophic for error-free transformations (the rounding-error terms
    fold to zero; observed under ``jit``).  NOTE: the XLA **CPU** backend
    strips these barriers during compilation, so compiled CPU double-float
    results carry ~1e-11-per-step extra error; the TPU backend honors them."""
    if not _BARRIERS[-1]:
        return x
    return jax.lax.optimization_barrier(x)


def two_sum(a, b):
    """Knuth two-sum: s + err == a + b exactly.

    The inputs and the sum are pinned with one optimization barrier: the
    EFT uses each value at several sites, and XLA's simplifier/fuser may
    otherwise rewrite ``(a + b) - a -> b`` or materialize *different* FMA
    contractions of the same expression at different uses, breaking the
    exact-error invariant."""
    a, b = _opaque((a, b))
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b):
    """Fast two-sum, requires |a| >= |b| (same barrier rationale as
    :func:`two_sum`)."""
    a, b = _opaque((a, b))
    s = a + b
    err = b - (s - a)
    return s, err


def split(a):
    """Split a float32 into two ~12-bit-mantissa halves (hi + lo == a
    exactly).

    Implemented by masking the low 12 mantissa bits instead of the
    classical Veltkamp multiply (``t = 4097a; hi = t - (t - a)``): XLA's
    fuser may contract ``t - a`` into an FMA, which computes the
    subtraction *exactly* and silently destroys the split (observed under
    ``jit`` on both CPU and TPU).  The bitmask is exact, fusion-proof and
    cheaper."""
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFFF000), jnp.float32)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Dekker product: p + err == a * b exactly (no FMA needed)."""
    p = a * b
    ahi, alo = split(a)
    bhi, blo = split(b)
    err = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, err


# ---------------------------------------------------------------------------
# double-float ops: values are (hi, lo) pairs of float32 arrays
# ---------------------------------------------------------------------------

def df_add(x, y):
    s, e = two_sum(x[0], y[0])
    e = e + x[1] + y[1]
    return quick_two_sum(s, e)


def df_mul(x, y):
    p, e = two_prod(x[0], y[0])
    e = e + x[0] * y[1] + x[1] * y[0]
    return quick_two_sum(p, e)


def df_scale(x, c):
    """Multiply by an exactly-representable float32 scalar."""
    p, e = two_prod(x[0], c)
    e = e + x[1] * c
    return quick_two_sum(p, e)


def df_neg(x):
    return (-x[0], -x[1])


def df_from_f64(a):
    """float64 array -> (hi, lo) float32 pair."""
    hi = jnp.asarray(a, dtype=jnp.float32)
    lo = jnp.asarray(a - hi.astype(jnp.float64), dtype=jnp.float32)
    return hi, lo


def df_to_f64(x):
    return x[0].astype(jnp.float64) + x[1].astype(jnp.float64)


def df_const(value):
    """Python float -> scalar (hi, lo) pair."""
    hi = np.float32(value)
    lo = np.float32(value - np.float64(hi))
    return jnp.float32(hi), jnp.float32(lo)


# ---------------------------------------------------------------------------
# contraction layout
# ---------------------------------------------------------------------------

def _row_grouped_layout(tensor: COO, lane_pad=8):
    """Pad the COO entries into a (n1, R) row-major layout: per output row i,
    R slots of (value, j-index, k-index), zero-padded."""
    n1 = tensor.shape[0]
    rows = tensor.coords[0]
    counts = np.bincount(rows, minlength=n1)
    R = max(int(counts.max()), 1)
    R = ((R + lane_pad - 1) // lane_pad) * lane_pad
    vals = np.zeros((n1, R))
    j_idx = np.zeros((n1, R), np.int64)
    k_idx = np.zeros((n1, R), np.int64)
    ptr = np.zeros(n1, np.int64)
    for e in range(tensor.nnz):
        i = rows[e]
        vals[i, ptr[i]] = tensor.data[e]
        j_idx[i, ptr[i]] = tensor.coords[1][e]
        k_idx[i, ptr[i]] = tensor.coords[2][e]
        ptr[i] += 1
    return vals, j_idx, k_idx, R


def _one_hot_gather_matrix(idx, n1):
    """(n1, R) index array -> (n1, n1*R) one-hot gather matrix G with
    G[j, flat(i, r)] = 1 iff idx[i, r] == j.  A matmul with G is an exact
    gather (single nonzero per column -> no accumulation rounding)."""
    flat = idx.reshape(-1)
    G = np.zeros((n1, flat.size), dtype=np.float32)
    G[flat, np.arange(flat.size)] = 1.0
    return G


def make_df_quadratic(tensor: COO, gather="take"):
    """Double-float tendency contraction
    ``f(xx_hi, xx_lo) -> (out_hi, out_lo)`` over the full (dummy-padded)
    state, built on exact gathers + VPU double-float arithmetic.

    ``gather``: 'take' uses real gather ops (exact by definition);
    'matmul' uses one-hot matmuls at HIGHEST precision (the default TPU
    matmul precision is bf16, which would truncate the gathered values —
    measured to destroy the double-float accuracy entirely)."""
    n1 = tensor.shape[0]
    vals, j_idx, k_idx, R = _row_grouped_layout(tensor)
    jf = jnp.asarray(j_idx.reshape(-1))
    kf = jnp.asarray(k_idx.reshape(-1))
    Gj = jnp.asarray(_one_hot_gather_matrix(j_idx, n1))
    Gk = jnp.asarray(_one_hot_gather_matrix(k_idx, n1))
    Vhi, Vlo = df_from_f64(vals.reshape(-1))

    def quad(xx):
        """xx: (hi, lo) of shape (B, n1) -> (hi, lo) of shape (B, n1)."""
        B = xx[0].shape[0]
        if gather == "take":
            XJ = (jnp.take(xx[0], jf, axis=1), jnp.take(xx[1], jf, axis=1))
            XK = (jnp.take(xx[0], kf, axis=1), jnp.take(xx[1], kf, axis=1))
        else:
            mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
            XJ = (mm(xx[0], Gj), mm(xx[1], Gj))   # (B, n1*R)
            XK = (mm(xx[0], Gk), mm(xx[1], Gk))
        # double-float products (VPU)
        t = df_mul(df_mul((Vhi[None, :], Vlo[None, :]), XJ), XK)
        # per-row reduction over the R slots (tree of double-float adds)
        thi = t[0].reshape(B, n1, R)
        tlo = t[1].reshape(B, n1, R)
        acc = (thi, tlo)
        width = R
        while width > 1:
            half = width // 2
            acc = df_add((acc[0][..., :half], acc[1][..., :half]),
                         (acc[0][..., half:width], acc[1][..., half:width]))
            width = half
        return acc[0][..., 0], acc[1][..., 0]

    return quad


def make_df_rk4_step(tensor: COO, dt, gather="take"):
    """Fused double-float RK4 step over the batched model state
    ``y -> y_new`` with (hi, lo) pairs of shape (B, ndim)."""
    n1 = tensor.shape[0]
    quad = make_df_quadratic(tensor, gather=gather)
    dt_df = df_const(dt)
    half_dt = df_const(dt / 2.0)
    sixth_dt = df_const(dt / 6.0)

    def pad_dummy(y):
        B = y[0].shape[0]
        one = jnp.ones((B, 1), jnp.float32)
        zero = jnp.zeros((B, 1), jnp.float32)
        return (jnp.concatenate([one, y[0]], axis=1),
                jnp.concatenate([zero, y[1]], axis=1))

    def f(y):
        out = quad(pad_dummy(y))
        return out[0][:, 1:], out[1][:, 1:]

    def axpy(y, c, k):
        """y + c * k in double-float (c a scalar (hi, lo) pair)."""
        ck = df_mul(k, (jnp.full_like(k[0], c[0]), jnp.full_like(k[0], c[1])))
        return df_add(y, ck)

    def step(y):
        k1 = f(y)
        k2 = f(axpy(y, half_dt, k1))
        k3 = f(axpy(y, half_dt, k2))
        k4 = f(axpy(y, dt_df, k3))
        ksum = df_add(df_add(k1, k4),
                      df_scale(df_add(k2, k3), jnp.float32(2.0)))
        return axpy(y, sixth_dt, ksum)

    return step

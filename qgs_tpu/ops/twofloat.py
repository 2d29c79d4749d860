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


def df_div_scalar(x, c):
    """Divide a double-float by an exactly-representable float32 scalar
    (classical long-division correction: one rounded quotient + exact
    remainder via two-prod)."""
    c = jnp.float32(c)
    q = x[0] / c
    p, e = two_prod(q, jnp.broadcast_to(c, jnp.shape(q)))
    r = ((x[0] - p) - e + x[1]) / c
    return quick_two_sum(q, r)


def df_reduce_last(x):
    """Pairwise double-float sum over the trailing axis (any width).

    Odd widths carry their leftover lane to a final combine, so no
    power-of-two padding is required (the previous tree silently dropped
    lanes for widths like 24)."""
    hi, lo = x
    width = hi.shape[-1]
    carries = []
    while width > 1:
        half = width // 2
        if width % 2:
            carries.append((hi[..., -1], lo[..., -1]))
        hi, lo = df_add((hi[..., :half], lo[..., :half]),
                        (hi[..., half:2 * half], lo[..., half:2 * half]))
        width = half
    out = (hi[..., 0], lo[..., 0])
    for c in carries:
        out = df_add(out, c)
    return out


def _sloppy_add(x, y):
    """Double-float add without the trailing renormalization: the hi parts
    are combined with an exact two-sum, the error and lo parts accumulate
    into an *unnormalized* lo (|lo| may grow to a few ulp of hi).  Used for
    short reduction trees where one final renormalization suffices; halves
    the barrier/op count of :func:`df_add`."""
    s, e = two_sum(x[0], y[0])
    return s, e + x[1] + y[1]


def _sloppy_reduce_last(x):
    """Pairwise trailing-axis sum with unnormalized intermediate lo parts;
    the result IS renormalized (safe to feed into normalized df ops)."""
    hi, lo = x
    width = hi.shape[-1]
    carries = []
    while width > 1:
        half = width // 2
        if width % 2:
            carries.append((hi[..., -1], lo[..., -1]))
        hi, lo = _sloppy_add((hi[..., :half], lo[..., :half]),
                             (hi[..., half:2 * half], lo[..., half:2 * half]))
        width = half
    out = (hi[..., 0], lo[..., 0])
    for c in carries:
        out = _sloppy_add(out, c)
    return quick_two_sum(out[0], out[1])


def _sloppy_mul(x, y):
    """Double-float product without the trailing renormalization (exact
    two-prod of the hi parts + first-order cross terms)."""
    p, e = two_prod(x[0], y[0])
    return p, e + (x[0] * y[1] + x[1] * y[0])


def _presplit(hi_np):
    """Host-side bitmask split of constant float32 values (see
    :func:`split` — identical arithmetic, done once at build time)."""
    hi_np = np.asarray(hi_np, np.float32)
    s_hi = (hi_np.view(np.uint32) & np.uint32(0xFFFFF000)).view(np.float32)
    return s_hi, hi_np - s_hi


def _mul_const(vc, y, sloppy):
    """Double-float product of precomputed constants with y.

    ``vc = (vhi, vlo, vhi_split_hi, vhi_split_lo)`` — the constants'
    Veltkamp split is done on host at build time, saving one split per
    slot per evaluation (the values are the tendency-tensor entries, fixed
    for the model's lifetime)."""
    vhi, vlo, shi, slo = vc
    p = vhi * y[0]
    bhi, blo = split(y[0])
    err = ((shi * bhi - p) + shi * blo + slo * bhi) + slo * blo
    e = err + (vhi * y[1] + vlo * y[0])
    return (p, e) if sloppy else quick_two_sum(p, e)


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


def _split_grouped_layout(tensor: COO):
    """Split the COO entries into a *linear* group (j == 0 or k == 0: the
    partner index hits the dummy-1 variable, so only one state gather and
    one double-float product are needed; constant entries j == k == 0 fall
    in here too, gathering x[0] == 1 exactly) and a *bilinear* group.

    Each group is padded to its own exact per-row maximum (no power-of-two
    or lane padding: the pairwise reducers handle any width, and unused
    slots carry value 0, whose double-float products/sums are exact).

    Returns ``(lin_vals, lin_idx, Rl), (bil_vals, bil_j, bil_k, Rb)`` as
    (n1, R)-shaped arrays; R may be 0 for an empty group."""
    n1 = tensor.shape[0]
    rows, j, k = (np.asarray(c) for c in tensor.coords)
    lin_mask = (j == 0) | (k == 0)

    def _layout(mask, idx_arrays):
        r = rows[mask]
        counts = np.bincount(r, minlength=n1)
        R = int(counts.max()) if r.size else 0
        vals = np.zeros((n1, R))
        idxs = [np.zeros((n1, R), np.int64) for _ in idx_arrays]
        ptr = np.zeros(n1, np.int64)
        data = tensor.data[mask]
        cols = [a[mask] for a in idx_arrays]
        for e in range(r.size):
            i = r[e]
            vals[i, ptr[i]] = data[e]
            for out, col in zip(idxs, cols):
                out[i, ptr[i]] = col[e]
            ptr[i] += 1
        return (vals, *idxs, R)

    # linear: the active index is whichever of (j, k) is nonzero (j + k,
    # since the other is 0; constants gather index 0 -> x[0] == 1, exact)
    lin = _layout(lin_mask, [j + k])
    bil = _layout(~lin_mask, [j, k])
    return lin, bil


def _bucketed_layout(rows, data, idx_cols, n1):
    """Compact a group's entries into count-buckets.

    The flat (n1, R_max) layout wastes ~45% of its slots on zero padding
    for the MAOOAM tensor (per-row counts are skewed), and the padding
    slots cost full double-float arithmetic.  Instead, rows are bucketed
    by entry count (one bucket per distinct count — fully dense), and each
    bucket gets its own (n_rows_g, R_g) layout over *only its own
    rows*; empty rows occupy nothing.  Results are re-assembled into the
    (B, n1) output with a static column permutation (each row lives in
    exactly one bucket, so assembly is exact placement, no accumulation).

    Returns ``(buckets, perm)`` where each bucket is
    ``(row_ids, vals (N_g, R_g), [idx arrays (N_g, R_g)...])`` and
    ``perm`` maps output column i to its position in the concatenated
    bucket results (with one trailing zero column for empty rows).
    """
    counts = np.bincount(rows, minlength=n1)
    buckets = []
    if rows.size:
        # one bucket per DISTINCT count: zero padding anywhere (measured
        # faster than halving thresholds, 13.7M vs 13.0M traj-steps/s on
        # the MAOOAM kernel; per-bucket overhead is negligible at these
        # mode counts)
        thresholds = sorted(set(int(c) for c in counts if c > 0))
        by_thr = {}
        for i in np.nonzero(counts)[0]:
            tg = next(t for t in thresholds if t >= counts[i])
            by_thr.setdefault(tg, []).append(int(i))
        for R_g in sorted(by_thr):
            row_ids = np.asarray(by_thr[R_g])
            pos = {r: p for p, r in enumerate(row_ids)}
            vals = np.zeros((row_ids.size, R_g))
            idxs = [np.zeros((row_ids.size, R_g), np.int64)
                    for _ in idx_cols]
            ptr = np.zeros(row_ids.size, np.int64)
            for e in range(rows.size):
                p = pos.get(int(rows[e]))
                if p is None:
                    continue
                vals[p, ptr[p]] = data[e]
                for out, col in zip(idxs, idx_cols):
                    out[p, ptr[p]] = col[e]
                ptr[p] += 1
            buckets.append((row_ids, vals, idxs, R_g))
    n_cols = sum(b[0].size for b in buckets)
    perm = np.full(n1, n_cols, np.int64)          # default: the zero column
    off = 0
    for row_ids, *_ in buckets:
        perm[row_ids] = off + np.arange(row_ids.size)
        off += row_ids.size
    return buckets, perm


def make_df_quadratic(tensor: COO, gather="take", accumulate="auto"):
    """Double-float tendency contraction
    ``f(xx_hi, xx_lo) -> (out_hi, out_lo)`` over the full (dummy-padded)
    state, built on exact gathers + VPU double-float arithmetic.

    Entries are split into linear (one gather + one product — the partner
    index is the dummy-1 variable) and bilinear (two gathers + two
    products) groups; each group's rows are compacted into count-buckets
    (see :func:`_bucketed_layout`) and reduced per-row with a pairwise
    tree.  The hi and lo components are gathered with ONE take per index
    set from the concatenated (B, 2*n1) state (fewer gather kernels).

    ``gather``: 'take' uses real gather ops (exact by definition);
    'matmul' uses one-hot matmuls at HIGHEST precision (the default TPU
    matmul precision is bf16, which would truncate the gathered values —
    measured to destroy the double-float accuracy entirely).

    ``accumulate``: 'fast' skips the intermediate renormalizations inside
    the products and reduction trees (one renormalization per row sum;
    ~2x fewer barriers/ops, error still ~2^-45 relative for these short
    trees — measured 7e-15 vs 5e-15 rel on TPU); 'strict' renormalizes
    after every double-float op.  'auto' (default) picks 'fast' on TPU
    and 'strict' elsewhere: the XLA **CPU** backend strips the EFT
    barriers, which costs 'fast' the two-sum error terms entirely
    (~1e-8 rel measured) while 'strict' degrades only mildly."""
    n1 = tensor.shape[0]
    if accumulate == "auto":
        accumulate = "fast" if jax.default_backend() not in ("cpu",) else "strict"
    mul = _sloppy_mul if accumulate == "fast" else df_mul
    reduce_last = _sloppy_reduce_last if accumulate == "fast" else df_reduce_last

    rows, j, k = (np.asarray(c) for c in tensor.coords)
    lin_mask = (j == 0) | (k == 0)
    data = np.asarray(tensor.data)
    # linear: the active index is whichever of (j, k) is nonzero (j + k,
    # since the other is 0; constants gather index 0 -> x[0] == 1, exact)
    lin_buckets, lin_perm = _bucketed_layout(
        rows[lin_mask], data[lin_mask], [(j + k)[lin_mask]], n1)
    bil_buckets, bil_perm = _bucketed_layout(
        rows[~lin_mask], data[~lin_mask],
        [j[~lin_mask], k[~lin_mask]], n1)

    def _prep(buckets):
        """Device constants per bucket: packed take indices (hi block then
        lo block), one-hot matrices, double-float value pairs."""
        prepped = []
        for row_ids, vals, idxs, R_g in buckets:
            flat = [a.reshape(-1) for a in idxs]
            packed = [jnp.asarray(np.concatenate([a, a + n1])) for a in flat]
            onehot = ([jnp.asarray(_one_hot_gather_matrix(a, n1))
                       for a in idxs] if gather == "matmul" else None)
            flat_vals = vals.reshape(-1)
            vhi_np = np.asarray(flat_vals, np.float32)
            shi_np, slo_np = _presplit(vhi_np)
            vc = tuple(jnp.asarray(a, jnp.float32)[None, :] for a in
                       (vhi_np, flat_vals - vhi_np.astype(np.float64),
                        shi_np, slo_np))
            prepped.append((row_ids.size, R_g, packed, onehot, vc))
        return prepped

    lin_prep = _prep(lin_buckets)
    bil_prep = _prep(bil_buckets)
    lin_perm_d = jnp.asarray(lin_perm)
    bil_perm_d = jnp.asarray(bil_perm)

    def quad(xx):
        """xx: (hi, lo) of shape (B, n1) -> (hi, lo) of shape (B, n1)."""
        B = xx[0].shape[0]
        cat = jnp.concatenate([xx[0], xx[1]], axis=1)       # (B, 2*n1)

        def gath(packed_idx, G):
            if gather == "take":
                g = jnp.take(cat, packed_idx, axis=1)
                half = packed_idx.shape[0] // 2
                return g[:, :half], g[:, half:]
            mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
            return mm(xx[0], G), mm(xx[1], G)

        def assemble(prepped, perm_d, n_bilinear_idx):
            """Run every bucket, concatenate, permute into (B, n1)."""
            if not prepped:
                return None
            parts_hi, parts_lo = [], []
            for N_g, R_g, packed, onehot, V in prepped:
                sloppy = accumulate == "fast"
                if n_bilinear_idx == 1:
                    X = gath(packed[0], onehot and onehot[0])
                    t = _mul_const(V, X, sloppy)
                else:
                    XJ = gath(packed[0], onehot and onehot[0])
                    XK = gath(packed[1], onehot and onehot[1])
                    t = mul(_mul_const(V, XJ, sloppy), XK)
                s = reduce_last((t[0].reshape(B, N_g, R_g),
                                 t[1].reshape(B, N_g, R_g)))
                parts_hi.append(s[0])
                parts_lo.append(s[1])
            z = jnp.zeros((B, 1), jnp.float32)
            hi = jnp.concatenate(parts_hi + [z], axis=1)
            lo = jnp.concatenate(parts_lo + [z], axis=1)
            # exact placement: each output row lives in exactly one bucket
            return (jnp.take(hi, perm_d, axis=1),
                    jnp.take(lo, perm_d, axis=1))

        out_l = assemble(lin_prep, lin_perm_d, 1)
        out_b = assemble(bil_prep, bil_perm_d, 2)
        if out_l is None and out_b is None:
            z = jnp.zeros((B, n1), jnp.float32)
            return z, z
        if out_l is None:
            return out_b
        if out_b is None:
            return out_l
        return df_add(out_l, out_b)

    return quad


def _df_rk4_core(tensor: COO, gather, accumulate):
    """Shared internals of the fused double-float RK4 step: returns
    ``step(y, dt_df, half_dt, sixth_dt)`` taking the timestep constants as
    (hi, lo) scalar pairs."""
    quad = make_df_quadratic(tensor, gather=gather, accumulate=accumulate)

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

    def step(y, dt_df, half_dt, sixth_dt):
        k1 = f(y)
        k2 = f(axpy(y, half_dt, k1))
        k3 = f(axpy(y, half_dt, k2))
        k4 = f(axpy(y, dt_df, k3))
        ksum = df_add(df_add(k1, k4),
                      df_scale(df_add(k2, k3), jnp.float32(2.0)))
        return axpy(y, sixth_dt, ksum)

    return step


def make_df_rk4_step(tensor: COO, dt, gather="take", accumulate="auto"):
    """Fused double-float RK4 step over the batched model state
    ``y -> y_new`` with (hi, lo) pairs of shape (B, ndim); ``dt`` is baked
    in at build time (constants computed exactly on host)."""
    step = _df_rk4_core(tensor, gather, accumulate)
    dt_df = df_const(dt)
    half_dt = df_const(dt / 2.0)
    sixth_dt = df_const(dt / 6.0)
    return lambda y: step(y, dt_df, half_dt, sixth_dt)


def make_df_tangent_contraction(jtensor: COO, adjoint=False, inverse=False,
                                accumulate="auto"):
    """Double-float tangent-linear contraction
    ``hom(xx_df, dm_df) -> df (B, n, n_tg)`` with

        hom[b, i, t] = sum_e val_e * (prod_a xx[b, coords[a, e]])
                                   * dm[b, coords[1, e] - 1, t]

    scattered at output row ``coords[0, e] - 1`` — the double-float analogue
    of the Jacobian-tensor tangent system (ref
    ``qgs/integrators/integrate.py:227-231``: ``Df = sparse_mul2(...)`` then
    ``J @ dx`` / ``J^T @ dx`` for the adjoint, ``-J`` for the inverse).
    Instead of materializing the dense Jacobian, the product is contracted
    directly in COO form with the same bucketed-gather layout as the
    quadratic kernel.

    ``xx_df`` is the dummy-padded state (B, n1); ``dm_df`` the tangent block
    (B, n, n_tg) WITHOUT the dummy row (its tangent is identically zero, so
    entries gathering/scattering index 0 are dropped on host).

    ``adjoint`` transposes the Jacobian by swapping the scatter/gather mode
    indices on host; ``inverse`` negates the values on host — both exact,
    zero runtime cost.  Works for any tensor rank >= 3 (the rank-5 T4 /
    dynamic-T Jacobians gather the state at each trailing coordinate)."""
    n1 = jtensor.shape[0]
    n = n1 - 1
    if accumulate == "auto":
        accumulate = "fast" if jax.default_backend() not in ("cpu",) else "strict"
    sloppy = accumulate == "fast"
    mul = _sloppy_mul if sloppy else df_mul
    reduce_last = _sloppy_reduce_last if sloppy else df_reduce_last

    coords = [np.asarray(c) for c in jtensor.coords]
    data = np.asarray(jtensor.data)
    if inverse:
        data = -data
    if adjoint:
        coords[0], coords[1] = coords[1], coords[0]
    # output row 0 (dummy) is discarded and the dummy's tangent row is 0
    keep = (coords[0] != 0) & (coords[1] != 0)
    rows = coords[0][keep] - 1
    dm_idx = coords[1][keep] - 1
    x_cols = [c[keep] for c in coords[2:]]
    vals = data[keep]

    buckets, perm = _bucketed_layout(rows, vals, [dm_idx] + x_cols, n)

    prepped = []
    for row_ids, bvals, idxs, R_g in buckets:
        dm_flat = idxs[0].reshape(-1)
        packed_dm = jnp.asarray(np.concatenate([dm_flat, dm_flat + n]))
        packed_xs = [jnp.asarray(np.concatenate([a.reshape(-1),
                                                 a.reshape(-1) + n1]))
                     for a in idxs[1:]]
        flat_vals = bvals.reshape(-1)
        vhi_np = np.asarray(flat_vals, np.float32)
        shi_np, slo_np = _presplit(vhi_np)
        vc = tuple(jnp.asarray(a, jnp.float32)[None, :] for a in
                   (vhi_np, flat_vals - vhi_np.astype(np.float64),
                    shi_np, slo_np))
        prepped.append((row_ids.size, R_g, packed_dm, packed_xs, vc))
    perm_d = jnp.asarray(perm)

    def hom(xx, dm):
        """xx: df (B, n1); dm: df (B, n, n_tg) -> df (B, n, n_tg)."""
        B = xx[0].shape[0]
        n_tg = dm[0].shape[-1]
        cat_x = jnp.concatenate([xx[0], xx[1]], axis=1)        # (B, 2*n1)
        cat_dm = jnp.concatenate([dm[0], dm[1]], axis=1)       # (B, 2*n, t)

        parts_hi, parts_lo = [], []
        for N_g, R_g, packed_dm, packed_xs, V in prepped:
            # coefficient: val * prod_a xx[k_a]  (df, (B, N_g*R_g))
            if packed_xs:
                g = jnp.take(cat_x, packed_xs[0], axis=1)
                half = packed_xs[0].shape[0] // 2
                t = _mul_const(V, (g[:, :half], g[:, half:]), sloppy)
                for pk in packed_xs[1:]:
                    g = jnp.take(cat_x, pk, axis=1)
                    half = pk.shape[0] // 2
                    t = mul(t, (g[:, :half], g[:, half:]))
            else:
                t = (jnp.broadcast_to(V[0], (B, V[0].shape[1])),
                     jnp.broadcast_to(V[1], (B, V[1].shape[1])))
            # tangent gather: (B, N_g*R_g, n_tg)
            gdm = jnp.take(cat_dm, packed_dm, axis=1)
            half = packed_dm.shape[0] // 2
            dmg = (gdm[:, :half], gdm[:, half:])
            tt = mul((t[0][..., None], t[1][..., None]), dmg)
            # reduce the R_g slots per output row
            s = reduce_last((
                tt[0].reshape(B, N_g, R_g, n_tg).swapaxes(-1, -2),
                tt[1].reshape(B, N_g, R_g, n_tg).swapaxes(-1, -2)))
            parts_hi.append(s[0])
            parts_lo.append(s[1])
        z = jnp.zeros((B, 1, n_tg), jnp.float32)
        hi = jnp.concatenate(parts_hi + [z], axis=1)
        lo = jnp.concatenate(parts_lo + [z], axis=1)
        return (jnp.take(hi, perm_d, axis=1), jnp.take(lo, perm_d, axis=1))

    return hom


def df_matmul(A, B, sloppy=True):
    """Dense double-float matmul ``(…, m, k) @ (…, k, n) -> (…, m, n)``.

    Expands the k products (df Dekker multiplies) and reduces them with the
    pairwise double-float tree — O(m·k·n) VPU work with an (…, m, n, k)
    temporary.  Built for the small (B, n, n) blocks of the Lyapunov
    machinery, not for large matrices."""
    mul = _sloppy_mul if sloppy else df_mul
    reduce_last = _sloppy_reduce_last if sloppy else df_reduce_last
    Ah, Al = A[0][..., :, :, None], A[1][..., :, :, None]   # (…, m, k, 1)
    Bh, Bl = B[0][..., None, :, :], B[1][..., None, :, :]   # (…, 1, k, n)
    Ph, Pl = mul((Ah, Al), (Bh, Bl))                        # (…, m, k, n)
    return reduce_last((jnp.swapaxes(Ph, -1, -2),
                        jnp.swapaxes(Pl, -1, -2)))


def _df_t(A):
    return (jnp.swapaxes(A[0], -1, -2), jnp.swapaxes(A[1], -1, -2))


def cholqr_df(M):
    """Mixed-precision CholeskyQR of a double-float matrix stack
    ``M (…, n, k)``: returns ``(Q_df, R64)`` with Q orthonormal to ~1e-14
    and R (upper, float64 values) accurate to ~1e-14 relative — WITHOUT any
    emulated-f64 arithmetic.  On v5e the emulated-f64 Householder QR this
    replaces costs ~68 ms per MAOOAM Benettin window; this runs as df VPU
    matmuls + f32 cholesky/triangular-solves.

    Scheme: the Gram matrix G = M^T M is computed in double-float; its f32
    Cholesky factor L is corrected to first order with
    dL = L Phi(L^{-1} E L^{-T}), E = G - L L^T (Phi = strict lower + half
    diagonal), giving R to ~eps32^2 — the Benettin exponents' source.
    Q solves Q R = M by an f32 triangular solve plus ONE double-float
    residual correction (dQ = (M - Q0 R) R^{-1}, the residual computed in
    df, the correction solve in f32 — relative error eps32 of an
    eps32-sized quantity): Q = M R^{-1} to ~eps32^2, which preserves the
    *flag* (nested column spans) of the full double-float M — the quantity
    the Benettin telescope is first-order sensitive to (feeding forward
    the flag of M_hi alone costs ~1e-7 exponent error, measured) — and
    makes Q orthonormal to ~eps32^2 automatically (Q^T Q = R^{-T} G R^{-1}
    with R^T R = G to eps32^2).
    Requires cond(M)^2 < 1/eps32 (QR-cadence windows satisfy this by
    construction — cond grows like exp(spread * dt) per window)."""
    # sloppy accumulation on TPU (barriers honored); strict on CPU, whose
    # backend strips the EFT barriers (see make_df_quadratic)
    sloppy = jax.default_backend() not in ("cpu",)
    Mh, Ml = M
    z = jnp.zeros_like
    G = df_matmul(_df_t(M), M, sloppy=sloppy)
    L = jnp.linalg.cholesky(G[0])
    # E = G - L L^T in df (the L products are exact Dekker two-prods)
    LLt = df_matmul((L, z(L)), (jnp.swapaxes(L, -1, -2), z(L)),
                    sloppy=sloppy)
    E = df_add(G, df_neg(LLt))
    Eh = E[0] + E[1]                        # |E| ~ eps32 |G|: f32 suffices
    X = jax.scipy.linalg.solve_triangular(L, Eh, lower=True)
    X = jnp.swapaxes(jax.scipy.linalg.solve_triangular(
        L, jnp.swapaxes(X, -1, -2), lower=True), -1, -2)
    k = L.shape[-1]
    eye = jnp.eye(k, dtype=L.dtype)
    Phi = jnp.tril(X, -1) + 0.5 * X * eye
    dL = jnp.matmul(L, Phi, precision=jax.lax.Precision.HIGHEST)
    R64 = (jnp.swapaxes(L, -1, -2).astype(jnp.float64)
           + jnp.swapaxes(dL, -1, -2).astype(jnp.float64))
    R_df = (jnp.swapaxes(L, -1, -2), jnp.swapaxes(dL, -1, -2))
    # Q R = M: f32 solve + one df residual correction
    Q0 = jnp.swapaxes(jax.scipy.linalg.solve_triangular(
        L, jnp.swapaxes(Mh, -1, -2), lower=True), -1, -2)
    D = df_add(M, df_neg(df_matmul((Q0, z(Q0)), R_df, sloppy=sloppy)))
    Dh = D[0] + D[1]                        # |D| ~ eps32 |M|
    dQ = jnp.swapaxes(jax.scipy.linalg.solve_triangular(
        L, jnp.swapaxes(Dh, -1, -2), lower=True), -1, -2)
    Q = quick_two_sum(Q0, dQ)
    return Q, R64


def _df_tgls_rk4_core(tensor: COO, jtensor: COO, adjoint, inverse,
                      gather, accumulate):
    """Shared internals of the fused double-float TGLS RK4 step: returns
    ``step((y, dm), dt_df, half_dt, sixth_dt)`` propagating the coupled
    (trajectory, tangent/fundamental-matrix) system in double-float
    (ref ``qgs/integrators/integrate.py:556-614``)."""
    quad = make_df_quadratic(tensor, gather=gather, accumulate=accumulate)
    tang = make_df_tangent_contraction(jtensor, adjoint=adjoint,
                                       inverse=inverse, accumulate=accumulate)

    def pad_dummy(y):
        B = y[0].shape[0]
        one = jnp.ones((B, 1), jnp.float32)
        zero = jnp.zeros((B, 1), jnp.float32)
        return (jnp.concatenate([one, y[0]], axis=1),
                jnp.concatenate([zero, y[1]], axis=1))

    def rhs(y, dm):
        xx = pad_dummy(y)
        out = quad(xx)
        return (out[0][:, 1:], out[1][:, 1:]), tang(xx, dm)

    def axpy(y, c, k):
        ck = df_mul(k, (jnp.full_like(k[0], c[0]), jnp.full_like(k[0], c[1])))
        return df_add(y, ck)

    def step(carry, dt_df, half_dt, sixth_dt):
        y, dm = carry
        k1, m1 = rhs(y, dm)
        k2, m2 = rhs(axpy(y, half_dt, k1), axpy(dm, half_dt, m1))
        k3, m3 = rhs(axpy(y, half_dt, k2), axpy(dm, half_dt, m2))
        k4, m4 = rhs(axpy(y, dt_df, k3), axpy(dm, dt_df, m3))
        two = jnp.float32(2.0)
        ks = df_add(df_add(k1, k4), df_scale(df_add(k2, k3), two))
        ms = df_add(df_add(m1, m4), df_scale(df_add(m2, m3), two))
        return axpy(y, sixth_dt, ks), axpy(dm, sixth_dt, ms)

    return step


def make_df_tgls_rk4_step(tensor: COO, jtensor: COO, dt, adjoint=False,
                          inverse=False, gather="take", accumulate="auto"):
    """Fused double-float TGLS RK4 step ``(y, dm) -> (y', dm')`` with (hi,
    lo) pairs of shape (B, ndim) / (B, ndim, n_tg); ``dt`` baked in (its
    double-float split computed exactly on host).  The model is autonomous
    (every qgs tendency ignores t), so no time argument is carried."""
    step = _df_tgls_rk4_core(tensor, jtensor, adjoint, inverse, gather,
                             accumulate)
    dt_df = df_const(dt)
    half_dt = df_const(dt / 2.0)
    sixth_dt = df_const(dt / 6.0)
    return lambda carry: step(carry, dt_df, half_dt, sixth_dt)


def make_df_tgls_rk4_step_dynamic(tensor: COO, jtensor: COO, adjoint=False,
                                  inverse=False, gather="take",
                                  accumulate="auto"):
    """Fused double-float TGLS RK4 step ``step(carry, tt, dt) -> carry`` with
    the timestep as a traced float64 scalar — the signature used by
    :func:`qgs_tpu.integrators.rk._scan_chunks`."""
    step = _df_tgls_rk4_core(tensor, jtensor, adjoint, inverse, gather,
                             accumulate)

    def dyn_step(carry, tt, dt):
        del tt
        dt64 = jnp.asarray(dt, jnp.float64)
        hi = dt64.astype(jnp.float32)
        dt_df = (hi, (dt64 - hi.astype(jnp.float64)).astype(jnp.float32))
        half_dt = (jnp.float32(0.5) * dt_df[0], jnp.float32(0.5) * dt_df[1])
        sixth_dt = df_div_scalar(dt_df, 6.0)
        return step(carry, dt_df, half_dt, sixth_dt)

    return dyn_step


def make_df_rk4_step_dynamic(tensor: COO, gather="take", accumulate="auto"):
    """Fused double-float RK4 step ``step(y, tt, dt) -> y_new`` taking the
    timestep as a traced float64 scalar — the signature used by the generic
    scan machinery (:func:`qgs_tpu.integrators.rk._scan_chunks`), so the
    final (possibly shorter) grid step and backward integration work.  The
    model is autonomous, ``tt`` is unused."""
    step = _df_rk4_core(tensor, gather, accumulate)

    def dyn_step(y, tt, dt):
        del tt
        dt64 = jnp.asarray(dt, jnp.float64)
        hi = dt64.astype(jnp.float32)
        dt_df = (hi, (dt64 - hi.astype(jnp.float64)).astype(jnp.float32))
        half_dt = (jnp.float32(0.5) * dt_df[0], jnp.float32(0.5) * dt_df[1])
        sixth_dt = df_div_scalar(dt_df, 6.0)
        return step(y, dt_df, half_dt, sixth_dt)

    return dyn_step

"""
Pallas TPU kernels
==================

Hand-fused TPU kernels for the hot path: the batched double-float RK4
integration loop.

The XLA-composed double-float step (:mod:`qgs_tpu.ops.twofloat`) is
HBM-bandwidth bound — every stage's (B, nnz)-sized intermediates round-trip
through HBM.  This kernel keeps a batch block of the model state resident
in VMEM and runs *many* RK4 steps per grid invocation: HBM traffic reduces
to the initial and final states, and the step becomes pure VPU/MXU work.

Layout inside the kernel (all float32):

* state block ``y_hi, y_lo``: (B_blk, n) in VMEM;
* tensor in a *lane-blocked slot-major* layout: N = n1 rounded up to the
  128-lane width, slot r of output row i lives at flat column ``r*N + i``.
  One-hot gather matrices ``Gj, Gk`` (n1, R*N) turn state gathers into
  full-precision MXU matmuls (single nonzero per column -> exact), and the
  per-row sum over the R slots is a pairwise tree of *lane-aligned static
  slice* adds — Mosaic cannot shape-cast (B, n1*R) -> (B, n1, R) when the
  trailing dim is not the lane width, so no reshape may appear here;
* double-float arithmetic (Knuth two-sum / Dekker product) on the VPU.

Numerics are validated in interpreter mode against the XLA-composed path
(:mod:`qgs_tpu.ops.twofloat`), and the Mosaic path compiles and runs on
TPU with this image's remote-compile helper (the ``pallas_call`` must be
traced with x64 scoped off — see the inline comment in
:func:`make_pallas_df_rk4` — or the helper rejects any gridded kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_TPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_TPU = False

from qgs_tpu.utils.sparse import COO
from qgs_tpu.ops.twofloat import (
    quick_two_sum, df_add, df_mul, _one_hot_gather_matrix, no_barriers,
)


def _df_dot_exact(x, G):
    """Exact one-hot gather as a highest-precision matmul."""
    return jax.lax.dot_general(x, G, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _lane_blocked_layout(tensor: COO, lane=128):
    """Slot-major lane-padded COO layout for the Pallas kernels.

    ``N`` = n1 rounded up to ``lane``; the r-th entry of output row i is
    stored at flat column ``r*N + i``.  Padding slots carry value 0 and
    gather index 0 (x[0] == 1, so value 0 kills them exactly).

    Returns ``(vals (R, N) float64, j_idx (R, N), k_idx (R, N), R, N)``.
    """
    n1 = tensor.shape[0]
    N = ((n1 + lane - 1) // lane) * lane
    rows = np.asarray(tensor.coords[0])
    counts = np.bincount(rows, minlength=n1)
    R = max(int(counts.max()), 1)
    vals = np.zeros((R, N))
    j_idx = np.zeros((R, N), np.int64)
    k_idx = np.zeros((R, N), np.int64)
    ptr = np.zeros(n1, np.int64)
    for e in range(tensor.nnz):
        i = rows[e]
        r = ptr[i]
        vals[r, i] = tensor.data[e]
        j_idx[r, i] = tensor.coords[1][e]
        k_idx[r, i] = tensor.coords[2][e]
        ptr[i] += 1
    return vals, j_idx, k_idx, R, N


def _slot_tree_reduce(blocks, add):
    """Pairwise-tree reduction of a list of equal-shaped slot blocks with
    the same first-half/second-half pairing as ``df_reduce_last`` (odd
    leftovers carried to a final combine)."""
    carries = []
    while len(blocks) > 1:
        half = len(blocks) // 2
        if len(blocks) % 2:
            carries.append(blocks[-1])
        blocks = [add(blocks[i], blocks[half + i]) for i in range(half)]
    out = blocks[0]
    for c in carries:
        out = add(out, c)
    return out


def make_pallas_df_rk4(tensor: COO, dt, n_steps, batch_block=256,
                       interpret=False):
    """Build a fused Pallas runner ``run(y_hi, y_lo) -> (y_hi, y_lo)``
    advancing the batched state by ``n_steps`` double-float RK4 steps.

    ``batch_block``: trajectories per grid program (VMEM-resident).
    """
    n1 = tensor.shape[0]
    n = n1 - 1
    vals, j_idx, k_idx, R, N = _lane_blocked_layout(tensor)
    Gj = jnp.asarray(_one_hot_gather_matrix(j_idx, n1))      # (n1, R*N)
    Gk = jnp.asarray(_one_hot_gather_matrix(k_idx, n1))
    vhi = np.asarray(vals.reshape(-1), np.float32)
    vlo = np.asarray(vals.reshape(-1) - vhi.astype(np.float64), np.float32)
    Vhi = jnp.asarray(vhi)
    Vlo = jnp.asarray(vlo)

    def _const_pair(v):
        hi = np.float32(v)
        lo = np.float32(v - np.float64(hi))
        return float(hi), float(lo)       # python floats -> kernel literals

    dt_df = _const_pair(dt)
    half_dt = _const_pair(dt / 2.0)
    sixth_dt = _const_pair(dt / 6.0)

    def kernel(yhi_ref, ylo_ref, gj_ref, gk_ref, vhi_ref, vlo_ref,
               out_hi_ref, out_lo_ref):
        B = yhi_ref.shape[0]
        GjV = gj_ref[:]
        GkV = gk_ref[:]
        V = (vhi_ref[:][None, :], vlo_ref[:][None, :])

        def pad(y):
            one = jnp.ones((B, 1), jnp.float32)
            zero = jnp.zeros((B, 1), jnp.float32)
            return (jnp.concatenate([one, y[0]], axis=1),
                    jnp.concatenate([zero, y[1]], axis=1))

        def f(y):
            xx = pad(y)
            XJ = (_df_dot_exact(xx[0], GjV), _df_dot_exact(xx[1], GjV))
            XK = (_df_dot_exact(xx[0], GkV), _df_dot_exact(xx[1], GkV))
            t = df_mul(df_mul(V, XJ), XK)
            # sum the R slots with lane-aligned static slices (no reshape:
            # Mosaic cannot shape-cast when the trailing dim != lane width)
            blocks = [(t[0][:, r * N:(r + 1) * N], t[1][:, r * N:(r + 1) * N])
                      for r in range(R)]
            acc = _slot_tree_reduce(blocks, df_add)
            return acc[0][:, 1:n1], acc[1][:, 1:n1]

        def axpy(y, c, k):
            ck = df_mul(k, (jnp.full_like(k[0], c[0]), jnp.full_like(k[0], c[1])))
            return df_add(y, ck)

        def step(y):
            k1 = f(y)
            k2 = f(axpy(y, half_dt, k1))
            k3 = f(axpy(y, half_dt, k2))
            k4 = f(axpy(y, dt_df, k3))
            s23 = df_add(k2, k3)
            # x2 exactly, then renormalize — bit-identical to
            # twofloat.df_scale(s23, 2) so both paths agree step-for-step
            s23 = quick_two_sum(s23[0] * 2.0, s23[1] * 2.0)
            ksum = df_add(df_add(k1, k4), s23)
            return axpy(y, sixth_dt, ksum)

        def body(i, y):
            return step(y)

        y = (yhi_ref[:], ylo_ref[:])
        y = jax.lax.fori_loop(0, n_steps, body, y)
        out_hi_ref[:] = y[0]
        out_lo_ref[:] = y[1]

    def run(y_hi, y_lo):
        B = y_hi.shape[0]
        assert B % batch_block == 0, "batch must be divisible by batch_block"
        grid = (B // batch_block,)

        # x64 must be scoped OFF around the trace: with jax_enable_x64 the
        # grid/index-map scalars trace as i64, which this image's Mosaic
        # compile helper rejects (HTTP 500 for ANY gridded kernel); the
        # kernel itself is pure f32 so the scope changes nothing else.
        with no_barriers(), jax.enable_x64(False):
            state_spec = pl.BlockSpec((batch_block, n), lambda i: (i, 0))
            const_spec2 = pl.BlockSpec(Gj.shape, lambda i: (0, 0))
            const_spec1 = pl.BlockSpec(Vhi.shape, lambda i: (0,))
            out = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[state_spec, state_spec, const_spec2, const_spec2,
                          const_spec1, const_spec1],
                out_specs=[state_spec, state_spec],
                out_shape=[jax.ShapeDtypeStruct((B, n), jnp.float32),
                           jax.ShapeDtypeStruct((B, n), jnp.float32)],
                interpret=interpret,
            )(y_hi, y_lo, Gj, Gk, Vhi, Vlo)
        return out[0], out[1]

    return run


def make_pallas_rk4_f32(tensor: COO, dt, n_steps, batch_block=512,
                        interpret=False):
    """Fused single-precision RK4 runner ``run(y) -> y`` advancing the
    batched f32 state by ``n_steps`` steps inside one Pallas kernel.

    Same design as :func:`make_pallas_df_rk4` without the double-float
    arithmetic: the state block stays VMEM-resident across all steps,
    gathers run as exact one-hot HIGHEST-precision matmuls on the MXU
    (the TPU-default bf16 matmul would truncate the gathered state), and
    HBM traffic is only the initial and final states.  Production
    alternative to the XLA-composed COO path of
    :mod:`qgs_tpu.ops.contraction` (ref semantics:
    ``qgs/functions/sparse_mul.py:49`` + ``qgs/integrators/integrate.py:214``).
    """
    n1 = tensor.shape[0]
    n = n1 - 1
    vals, j_idx, k_idx, R, N = _lane_blocked_layout(tensor)
    Gj = jnp.asarray(_one_hot_gather_matrix(j_idx, n1))      # (n1, R*N)
    Gk = jnp.asarray(_one_hot_gather_matrix(k_idx, n1))
    V = jnp.asarray(vals.reshape(-1), jnp.float32)

    dt_f = float(np.float32(dt))
    half_dt = float(np.float32(dt / 2.0))
    sixth_dt = float(np.float32(dt / 6.0))

    def kernel(y_ref, gj_ref, gk_ref, v_ref, out_ref):
        B = y_ref.shape[0]
        GjV = gj_ref[:]
        GkV = gk_ref[:]
        Vv = v_ref[:][None, :]

        def f(y):
            xx = jnp.concatenate([jnp.ones((B, 1), jnp.float32), y], axis=1)
            XJ = _df_dot_exact(xx, GjV)
            XK = _df_dot_exact(xx, GkV)
            t = Vv * XJ * XK
            blocks = [t[:, r * N:(r + 1) * N] for r in range(R)]
            acc = _slot_tree_reduce(blocks, lambda a, b: a + b)
            return acc[:, 1:n1]

        def step(y):
            k1 = f(y)
            k2 = f(y + half_dt * k1)
            k3 = f(y + half_dt * k2)
            k4 = f(y + dt_f * k3)
            return y + sixth_dt * (k1 + 2.0 * (k2 + k3) + k4)

        y = y_ref[:]
        y = jax.lax.fori_loop(0, n_steps, lambda i, y: step(y), y)
        out_ref[:] = y

    def run(y):
        B = y.shape[0]
        assert B % batch_block == 0, "batch must be divisible by batch_block"
        grid = (B // batch_block,)

        # see make_pallas_df_rk4: x64 scoped OFF or Mosaic rejects the grid
        with no_barriers(), jax.enable_x64(False):
            state_spec = pl.BlockSpec((batch_block, n), lambda i: (i, 0))
            const_spec2 = pl.BlockSpec(Gj.shape, lambda i: (0, 0))
            const_spec1 = pl.BlockSpec(V.shape, lambda i: (0,))
            out = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[state_spec, const_spec2, const_spec2, const_spec1],
                out_specs=state_spec,
                out_shape=jax.ShapeDtypeStruct((B, n), jnp.float32),
                interpret=interpret,
            )(y, Gj, Gk, V)
        return out

    return run

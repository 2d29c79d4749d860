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
* tensor as a row-grouped padded layout (n1, R) of values (hi, lo) plus
  one-hot gather matrices ``Gj, Gk`` (n1, n1*R) — gathers run as
  full-precision MXU matmuls (single nonzero per column -> exact);
* double-float arithmetic (Knuth two-sum / Dekker product) on the VPU.

Status: numerics are validated in interpreter mode (bit-identical to the
XLA-composed path).  On this image the Mosaic compile paths are broken at
the infrastructure level (the remote-compile helper returns HTTP 500 for
*any* kernel, including a trivial copy; local AOT compile hits a libtpu
version mismatch), so the XLA-composed :mod:`qgs_tpu.ops.twofloat` path is
the production route until the toolchain is fixed.
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
    two_sum, quick_two_sum, two_prod, df_add, df_mul, df_const, df_from_f64,
    df_reduce_last, _row_grouped_layout, _one_hot_gather_matrix, no_barriers,
)


def _df_dot_exact(x, G):
    """Exact one-hot gather as a highest-precision matmul."""
    return jax.lax.dot_general(x, G, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def make_pallas_df_rk4(tensor: COO, dt, n_steps, batch_block=256,
                       interpret=False):
    """Build a fused Pallas runner ``run(y_hi, y_lo) -> (y_hi, y_lo)``
    advancing the batched state by ``n_steps`` double-float RK4 steps.

    ``batch_block``: trajectories per grid program (VMEM-resident).
    """
    n1 = tensor.shape[0]
    n = n1 - 1
    vals, j_idx, k_idx, R = _row_grouped_layout(tensor)
    Gj = jnp.asarray(_one_hot_gather_matrix(j_idx, n1))      # (n1, n1*R)
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
            acc = df_reduce_last((t[0].reshape(B, n1, R),
                                  t[1].reshape(B, n1, R)))
            return acc[0][:, 1:], acc[1][:, 1:]

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

        state_spec = pl.BlockSpec((batch_block, n), lambda i: (i, 0))
        const_spec2 = pl.BlockSpec(Gj.shape, lambda i: (0, 0))
        const_spec1 = pl.BlockSpec(Vhi.shape, lambda i: (0,))

        with no_barriers():
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

"""
Mode-space (tensor-parallel) sharded tendency evaluation
========================================================

For high-resolution truncations, the contraction's reduction axis (the
flattened (j, k) mode-pair axis of the matricized tendency tensor) is
sharded across a ``'model'`` mesh axis: each device contracts its slice of
the tensor with the (model-replicated) state and the partial results are
all-reduced over ICI with one ``psum`` per tendency evaluation.  Combined
with an ``'ensemble'`` axis this gives the 2-D mesh layout

    state  (B, n)        sharded  P('ensemble', None)
    tensor (n^2, n)      sharded  P('model', None)   [reduction axis]
    output (B, n)        sharded  P('ensemble', None), psum over 'model'

which is the qgs analogue of data x tensor parallelism (see SURVEY.md §2,
"Parallelism strategies").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from qgs_tpu.utils.sparse import COO

MODEL_AXIS = "model"
ENSEMBLE_AXIS = "ensemble"


def make_sharded_tendency(tensor: COO, mesh: Mesh, dtype=None,
                          overlap_chunks=1):
    """Build a batched tendency function whose reduction axis is sharded
    over the mesh's ``'model'`` axis and whose batch axis is sharded over
    ``'ensemble'``.

    Returns ``f(t, x)`` mapping (B, ndim) -> (B, ndim), to be called inside
    ``jax.jit`` with ``x`` sharded ``P('ensemble', None)``.

    ``overlap_chunks > 1`` splits the local batch into that many chunks
    with one ``psum`` per chunk: chunk k+1's partial contraction is
    independent of chunk k's all-reduce, so the XLA scheduler can overlap
    the ICI collective with MXU compute (total collective bytes are
    unchanged — the batch axis is split, not the reduction axis).  This is
    the collective/compute-overlap engineering BASELINE.md calls for; on a
    single chip or a virtual CPU mesh both variants are bitwise-identical
    programs modulo scheduling.
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    n1 = tensor.shape[0]
    # matricize so that row (j, k) column i holds T[i, j, k]
    T = tensor.todense().transpose(1, 2, 0).reshape(n1 * n1, n1)

    n_model = mesh.shape[MODEL_AXIS]
    # pad the reduction axis to a multiple of the model-axis size
    red = n1 * n1
    red_pad = ((red + n_model - 1) // n_model) * n_model
    T_pad = np.zeros((red_pad, n1), dtype=np.dtype(dtype))
    T_pad[:red] = T
    # place the tensor slices directly with their P('model', None) layout —
    # required for correctness in multi-process runs (an uncommitted local
    # array cannot be auto-resharded onto a multi-host mesh) and avoids a
    # layout round-trip in the single-process case too.
    T_dev = jax.make_array_from_callback(
        T_pad.shape, NamedSharding(mesh, P(MODEL_AXIS, None)),
        lambda idx: T_pad[idx])

    @partial_shard_map(mesh)
    def _tendency_core(T_local, xx):
        # T_local: (red_pad / n_model, n1) — this device's tensor slice
        # xx:      (B / n_ens, n1)        — this device's ensemble slice
        B = xx.shape[0]
        outer = (xx[:, :, None] * xx[:, None, :]).reshape(B, red)
        outer_pad = jnp.pad(outer, ((0, 0), (0, red_pad - red)))
        lo = jax.lax.axis_index(MODEL_AXIS).astype(jnp.int32) * T_local.shape[0]
        local = jax.lax.dynamic_slice(outer_pad, (jnp.int32(0), lo),
                                      (B, T_local.shape[0]))
        # HIGHEST: the TPU f32 matmul default is one bf16 pass (~2e-3 rel)
        if overlap_chunks > 1:
            if B % overlap_chunks != 0:
                raise ValueError(
                    f"overlap_chunks={overlap_chunks} must divide the "
                    f"per-device batch ({B}) — refusing to silently fall "
                    f"back to the unchunked program")
            c = B // overlap_chunks
            parts = [jax.lax.psum(
                jnp.matmul(local[k * c:(k + 1) * c], T_local,
                           precision=jax.lax.Precision.HIGHEST),
                MODEL_AXIS) for k in range(overlap_chunks)]
            return jnp.concatenate(parts, axis=0)
        partial = jnp.matmul(local, T_local,
                             precision=jax.lax.Precision.HIGHEST)
        return jax.lax.psum(partial, MODEL_AXIS)

    def f(t, x):
        ones = jnp.ones(x.shape[:-1] + (1,), dtype=x.dtype)
        xx = jnp.concatenate([ones, x], axis=-1)
        return _tendency_core(T_dev, xx)[:, 1:]

    return f


def partial_shard_map(mesh):
    """Decorator: shard_map with the (model, ensemble) specs used above."""

    def wrap(fn):
        return shard_map(
            fn, mesh=mesh,
            in_specs=(P(MODEL_AXIS, None), P(ENSEMBLE_AXIS, None)),
            out_specs=P(ENSEMBLE_AXIS, None),
        )

    return wrap

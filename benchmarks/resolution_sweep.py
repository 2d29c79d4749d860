#!/usr/bin/env python
"""Mode-count (resolution) throughput sweep: RK4 ensemble throughput and
mode-updates/s as the spectral truncation grows.

The per-step tendency contraction is O(B * nnz) work in COO form and
O(B * ndim^2) as the dense matricized einsum; this sweep reports both the
trajectory-step rate and the *mode-updates/s* (steps/s x ensemble x ndim) —
the north-star per-chip metric from BASELINE.json — across truncations
from the standard MAOOAM 2,2/2,4 up to 6,6/6,6.

Run (TPU): ``timeout 1800 python benchmarks/resolution_sweep.py``
Env knobs: QGS_RES_ENSEMBLE (default 4096), QGS_RES_STEPS (default 500),
QGS_RES_DTYPE in {float32, twofloat} (default float32).
"""

import sys as _sys
import pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import json
import os
import time

import numpy as np


def build(na, no):
    from qgs_tpu.params.params import QgParams
    from qgs_tpu.models.tendencies import create_tendencies

    pars = QgParams()
    pars.set_atmospheric_channel_fourier_modes(*na)
    pars.set_oceanic_basin_fourier_modes(*no)
    pars.set_params({'kd': 0.0290, 'kdp': 0.0290, 'n': 1.5, 'r': 1.e-7,
                     'h': 136.5, 'd': 1.1e-7})
    pars.atemperature_params.set_params({'eps': 0.7, 'T0': 289.3,
                                         'hlambda': 15.06})
    pars.gotemperature_params.set_params({'gamma': 5.6e8, 'T0': 301.46})
    pars.atemperature_params.set_insolation(103.3333, 0)
    pars.gotemperature_params.set_insolation(310., 0)
    f, Df, tensor = create_tendencies(pars, return_qgtensor=True)
    return pars, tensor


def main():
    import jax
    import jax.numpy as jnp

    B = int(os.environ.get("QGS_RES_ENSEMBLE", 4096))
    STEPS = int(os.environ.get("QGS_RES_STEPS", 500))
    DTYPE = os.environ.get("QGS_RES_DTYPE", "float32")

    results = []
    for na, no in [((2, 2), (2, 4)), ((4, 4), (4, 4)), ((6, 6), (6, 6))]:
        pars, tensor = build(na, no)
        ndim = pars.ndim
        y0_np = np.random.default_rng(0).random((B, ndim)) * 0.01

        if DTYPE == "twofloat":
            from qgs_tpu.ops.twofloat import make_df_rk4_step, df_from_f64
            step = make_df_rk4_step(tensor.tensor, 0.1)
            run = jax.jit(lambda y: jax.lax.fori_loop(
                0, STEPS, lambda i, y: step(y), y))
            y0 = df_from_f64(jnp.asarray(y0_np))
            first = lambda y: y[0]
        else:
            from qgs_tpu.integrators.rk import make_rk_step, rk4_tableau
            from qgs_tpu.ops.contraction import make_tendency_fns
            f_b, _ = make_tendency_fns(tensor.tensor, tensor.jacobian_tensor,
                                       dtype=jnp.float32)
            a, b, c = rk4_tableau()
            stp = make_rk_step(f_b, a, b, c)
            dt32 = jnp.asarray(0.1, jnp.float32)
            run = jax.jit(lambda y: jax.lax.fori_loop(
                0, STEPS, lambda i, y: stp(y, dt32 * 0, dt32), y))
            y0 = jnp.asarray(y0_np, jnp.float32)
            first = lambda y: y

        y = run(y0)
        first(y).block_until_ready()
        t0 = time.perf_counter()
        y = run(y0)
        first(y).block_until_ready()
        el = time.perf_counter() - t0
        steps_s = STEPS * B / el
        results.append({
            "config": f"atm{na[0]}x{na[1]}+oc{no[0]}x{no[1]}",
            "ndim": ndim,
            "nnz": int(tensor.tensor.nnz),
            "traj_steps_per_s": steps_s,
            "mode_updates_per_s": steps_s * ndim,
        })
        print(f"{results[-1]['config']:>14s}  ndim={ndim:3d} nnz={tensor.tensor.nnz:5d}"
              f"  {steps_s:>12,.0f} traj-steps/s"
              f"  {steps_s * ndim:>14,.0f} mode-updates/s", flush=True)

    print(json.dumps({"metric": f"maooam_resolution_sweep_{DTYPE}",
                      "ensemble": B, "results": results}))


if __name__ == "__main__":
    main()

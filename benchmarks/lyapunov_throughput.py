#!/usr/bin/env python
"""Lyapunov-toolbox throughput: batched Benettin BLV on the MAOOAM model.

The reference computes Lyapunov vectors one trajectory per OS process with
per-step Python/Numba QR (ref ``qgs/toolbox/lyapunov.py:396-513``); here
the whole ensemble propagates its fundamental matrices in one batched
``lax.scan`` and ``jnp.linalg.qr`` re-orthonormalizes all members at once
on device.

Tiers:

* ``f32``      — everything in float32 (the raw-throughput tier; exponents
                 carry ~1e-7-per-window arithmetic noise).
* ``twofloat`` — tangent propagation in double-float (2x float32) with
                 per-window float64 QR: ~f64 exponent accuracy at a
                 fraction of emulated-f64 cost (the reference's other HOT
                 path, ref ``qgs/integrators/integrate.py:227-231``).
* ``float64``  — XLA-emulated f64 oracle (small ensemble).

Also reports the twofloat-vs-f64 exponent agreement on identical ICs over
a short span (where chaotic divergence between tiers stays bounded) — the
accuracy claim behind the twofloat tier.

Run (TPU): ``timeout 3600 python benchmarks/lyapunov_throughput.py``
Env knobs: QGS_LYAP_ENSEMBLE (default 256), QGS_LYAP_WINDOWS (default 200),
QGS_LYAP_TIERS (comma list, default "f32,twofloat,float64"),
QGS_LYAP_ACCURACY=0 to skip the accuracy cross-check.
"""

import sys as _sys
import pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import json
import os
import time

import numpy as np


def build():
    from qgs_tpu.params.params import QgParams
    from qgs_tpu.models.tendencies import create_tendencies

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
    f, Df, tensor = create_tendencies(pars, return_qgtensor=True)
    return pars, f, Df, tensor


def main():
    import jax
    import jax.numpy as jnp

    from qgs_tpu.integrators.rk import integrate_runge_kutta
    from qgs_tpu.ops.contraction import make_tendency_fns
    from qgs_tpu.toolbox.lyapunov import compute_backward_lyapunovs

    B = int(os.environ.get("QGS_LYAP_ENSEMBLE", 256))
    n_windows = int(os.environ.get("QGS_LYAP_WINDOWS", 200))
    tiers = os.environ.get("QGS_LYAP_TIERS", "f32,twofloat,float64").split(",")
    dt, mdt = 0.1, 0.1

    pars, f, Df, tensor = build()
    tensors = (tensor.tensor, tensor.jacobian_tensor)

    rng = np.random.default_rng(0)
    ic64 = rng.random((B, pars.ndim)) * 0.01
    _, ic64 = integrate_runge_kutta(f.batched, 0., 100., dt, ic64,
                                    write_steps=0)
    ic64 = np.asarray(ic64)

    f32b, j32b = make_tendency_fns(tensor.tensor, tensor.jacobian_tensor,
                                   dtype=jnp.float32)
    t_end = n_windows * dt

    def run_tier(tier, B_t, windows):
        span = (0., dt, dt + windows * dt, dt, mdt)
        if tier == "f32":
            args = dict(f=f32b, fjac=j32b,
                        ic=np.asarray(ic64[:B_t], np.float32),
                        tensors=tensors)
        elif tier == "twofloat":
            args = dict(f=f.batched, fjac=Df.batched, ic=ic64[:B_t],
                        precision="twofloat", tensors=tensors)
        else:
            args = dict(f=f.batched, fjac=Df.batched, ic=ic64[:B_t],
                        tensors=tensors)

        def run():
            out = compute_backward_lyapunovs(
                args["f"], args["fjac"], *span, args["ic"], write_steps=0,
                precision=args.get("precision"), tensors=args.get("tensors"))
            jax.block_until_ready(out[1])
            return out

        run()                               # compile + warmup
        best, out = None, None
        for _ in range(3):
            t0 = time.perf_counter()
            out = run()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        return best, out

    results = {}
    for tier in tiers:
        B_t = min(B, 16) if tier == "float64" else B
        windows = min(n_windows, 50) if tier == "float64" else n_windows
        elapsed, out = run_tier(tier, B_t, windows)
        windows_s = windows * B_t / elapsed
        m = np.asarray(out[2], np.float64)
        lead = m.reshape(B_t, pars.ndim)[:, 0].mean()
        results[tier] = {
            "qr_windows_per_s_x_ensemble": windows_s,
            "tangent_substeps_per_s_x_ensemble": windows_s * round(dt / mdt),
            "ensemble": B_t, "windows": windows,
            "elapsed_s_best_of_3": elapsed,
            "mean_leading_exponent": float(lead),
        }
        print(f"{tier:>9}: B={B_t:4d} x {windows} windows: "
              f"{windows_s:12,.0f} QR-windows/s x ensemble "
              f"({elapsed:.2f}s)", flush=True)

    # Ginelli CLV tier (forward Benettin + backward triangular-solve pass)
    if os.environ.get("QGS_LYAP_CLV", "1") != "0":
        from qgs_tpu.toolbox.lyapunov import compute_clvs_ginelli

        B_c = min(B, 64)
        w_c = min(n_windows, 100)
        span = (0., 5 * dt, 5 * dt + w_c * dt, 5 * dt + (w_c + 20) * dt,
                dt, mdt)

        def run_clv():
            out = compute_clvs_ginelli(
                f32b, j32b, *span, np.asarray(ic64[:B_c], np.float32),
                write_steps=0, tensors=tensors)
            jax.block_until_ready(out[3])
            return out

        run_clv()
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = run_clv()
            best = min(best or 9e9, time.perf_counter() - t0)
        results["clv_ginelli_f32"] = {
            "qr_windows_per_s_x_ensemble": w_c * B_c / best,
            "ensemble": B_c, "windows": w_c,
            "elapsed_s_best_of_3": best,
        }
        print(f"{'clv(gin)':>9}: B={B_c:4d} x {w_c} windows: "
              f"{w_c * B_c / best:12,.0f} QR-windows/s x ensemble "
              f"({best:.2f}s)", flush=True)

    accuracy = None
    if os.environ.get("QGS_LYAP_ACCURACY", "1") != "0":
        # identical-IC agreement over a short span (chaotic divergence
        # between tiers stays bounded): df must track f64 far tighter
        # than f32
        B_a = min(B, 4)
        span = (0., 10., 40., dt, mdt)
        _, _, e64, _ = compute_backward_lyapunovs(
            f.batched, Df.batched, *span, ic64[:B_a], write_steps=1)
        _, _, edf, _ = compute_backward_lyapunovs(
            f.batched, Df.batched, *span, ic64[:B_a], write_steps=1,
            precision="twofloat", tensors=tensors)
        _, _, e32, _ = compute_backward_lyapunovs(
            f32b, j32b, *span, np.asarray(ic64[:B_a], np.float32),
            write_steps=1)
        m64 = np.asarray(e64).mean(-1)
        err_df = float(np.abs(m64 - np.asarray(edf).mean(-1)).max())
        err_32 = float(np.abs(m64 - np.asarray(e32, np.float64).mean(-1)).max())
        accuracy = {"span_time_units": 40, "ensemble": B_a,
                    "max_mean_exp_err_twofloat_vs_f64": err_df,
                    "max_mean_exp_err_f32_vs_f64": err_32}
        print(f"accuracy (40 tu, identical ICs): twofloat-f64 {err_df:.2e}, "
              f"f32-f64 {err_32:.2e}", flush=True)

    print(json.dumps({
        "metric": "maooam_blv_qr_window_throughput",
        "ndim": pars.ndim, "dt": dt, "mdt": mdt,
        "platform": jax.devices()[0].platform,
        "tiers": results, "accuracy": accuracy,
    }))


if __name__ == "__main__":
    main()

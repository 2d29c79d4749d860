#!/usr/bin/env python
"""Headline benchmark: MAOOAM (36-var coupled ocean-atmosphere) ensemble RK4
throughput on the available accelerator, versus the reference-design CPU
baseline measured on this host.

Prints exactly ONE JSON line to stdout:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Baseline protocol: the reference implementation (Climdyn/qgs) runs one Numba
trajectory per CPU process (cpu_count processes).  Numba is not installed in
this image, so the baseline is the framework's own native C++ kernel
(qgs_tpu/native: the bit-exact reference-semantics COO contraction + RK4
loop, compiled -O3) measured per-core and scaled by cpu_count — a faithful
stand-in for a Numba-jitted scalar loop.  Falls back to the vectorized-NumPy
path x5 if no compiler is available.
"""

import json
import os
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


NUMBA_ADVANTAGE = 5.0          # conservative single-core Numba vs NumPy factor
ENSEMBLE = int(os.environ.get("QGS_BENCH_ENSEMBLE", 4096))
# 1000 steps per timed call: the remote-TPU dispatch latency (~25 ms/call
# through the axon tunnel) distorts shorter runs; production integrations
# are millions of steps, so steady-state throughput is the honest metric
STEPS = int(os.environ.get("QGS_BENCH_STEPS", 1000))
DTYPE = os.environ.get("QGS_BENCH_DTYPE", "twofloat")


def build_system():
    from qgs_tpu.params.params import QgParams
    from qgs_tpu.models.tendencies import create_tendencies

    pars = QgParams()
    pars.set_atmospheric_channel_fourier_modes(2, 2)
    pars.set_oceanic_basin_fourier_modes(2, 4)
    pars.set_params({'kd': 0.0290, 'kdp': 0.0290, 'n': 1.5, 'r': 1.e-7,
                     'h': 136.5, 'd': 1.1e-7})
    pars.atemperature_params.set_params({'eps': 0.7, 'T0': 289.3, 'hlambda': 15.06})
    pars.gotemperature_params.set_params({'gamma': 5.6e8, 'T0': 301.46})
    pars.atemperature_params.set_insolation(103.3333, 0)
    pars.gotemperature_params.set_insolation(310., 0)
    f, Df, tensor = create_tendencies(pars, return_qgtensor=True)
    return pars, f, Df, tensor


def measure_baseline(tensor, ndim, n_steps=1500):
    """Single-core native (or NumPy-fallback) RK4 steps/s, reference
    semantics.  Returns (steps_per_s, scale_factor_to_apply)."""
    from qgs_tpu import native

    if native.available():
        y = np.random.default_rng(0).random(ndim) * 0.01
        # generous warmup + many repeats with max(): the 2-core host is
        # shared and contention only ever slows a run down, so the max is a
        # stable estimator of the baseline's true speed (observed spread
        # without this: 348k-515k steps/s run-to-run)
        native.rk4_integrate(tensor.tensor, y, 0.1, 20000)    # warmup
        best = 0.0
        for _ in range(8):
            t0 = time.perf_counter()
            native.rk4_integrate(tensor.tensor, y, 0.1, 20000)
            best = max(best, 20000 / (time.perf_counter() - t0))
        return best, 1.0

    from qgs_tpu.models.numpy_backend import make_numpy_tendencies_fast

    fn, _ = make_numpy_tendencies_fast(tensor.tensor, tensor.jacobian_tensor)
    a = np.zeros((4, 4)); a[1, 0] = a[2, 1] = 0.5; a[3, 2] = 1.
    b = np.array([1 / 6, 1 / 3, 1 / 3, 1 / 6])
    y = np.random.default_rng(0).random(ndim) * 0.01
    dt = 0.1

    def rkstep(y):
        k = []
        for i in range(4):
            ys = y
            for l in range(i):
                if a[i, l]:
                    ys = ys + dt * a[i, l] * k[l]
            k.append(fn(0., ys))
        return y + dt * (b[0] * k[0] + b[1] * k[1] + b[2] * k[2] + b[3] * k[3])

    for _ in range(50):
        y = rkstep(y)
    # best of 3 repeats — the shared-host CPU timing is noisy
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            y = rkstep(y)
        t1 = time.perf_counter()
        best = max(best, n_steps / (t1 - t0))
    return best, NUMBA_ADVANTAGE


def measure_device(tensor, ndim, dtype):
    import jax
    import jax.numpy as jnp
    from qgs_tpu.integrators.rk import make_rk_step, rk4_tableau
    from qgs_tpu.parallel.mesh import ensemble_mesh, shard_ensemble

    y0_np = np.random.default_rng(0).random((ENSEMBLE, ndim)) * 0.01

    if dtype == "twofloat":
        # double-float (2x f32) tier: ~48-bit mantissa at near-f32 speed —
        # the fidelity + throughput middle point (see qgs_tpu/ops/twofloat.py)
        from qgs_tpu.ops.twofloat import make_df_rk4_step, df_from_f64

        step = make_df_rk4_step(tensor.tensor, 0.1)

        @jax.jit
        def run(y):
            return jax.lax.fori_loop(0, STEPS, lambda i, y: step(y), y)

        y0 = df_from_f64(jnp.asarray(y0_np))
        y = run(y0)
        y[0].block_until_ready()
        t0 = time.perf_counter()
        y = run(y)
        y[0].block_until_ready()
        t1 = time.perf_counter()
        if not bool(np.isfinite(np.asarray(y[0][:1])).all()):
            raise RuntimeError("non-finite state after benchmark run")
        return STEPS * ENSEMBLE / (t1 - t0)

    from qgs_tpu.ops.contraction import make_tendency_fns

    f_batched, _ = make_tendency_fns(tensor.tensor, tensor.jacobian_tensor,
                                     dtype=dtype)
    a, b, c = rk4_tableau()
    step = make_rk_step(f_batched, a, b, c)

    @jax.jit
    def run(y):
        def body(i, y):
            return step(y, jnp.asarray(0.0, y.dtype), jnp.asarray(0.1, y.dtype))

        return jax.lax.fori_loop(0, STEPS, body, y)

    y0 = jnp.asarray(y0_np, dtype=dtype)
    mesh = ensemble_mesh()
    if mesh.devices.size > 1:
        y0, _ = shard_ensemble(y0, mesh)

    log(f"compiling device scan (devices={jax.devices()}) ...")
    y = run(y0)
    y.block_until_ready()
    t0 = time.perf_counter()
    y = run(y)
    y.block_until_ready()
    t1 = time.perf_counter()
    if not bool(np.isfinite(np.asarray(y[:1])).all()):
        raise RuntimeError("non-finite state after benchmark run")
    return STEPS * ENSEMBLE / (t1 - t0)


def main():
    import jax
    import jax.numpy as jnp

    dtype = {"float64": jnp.float64, "float32": jnp.float32}.get(DTYPE, "twofloat")

    log("building MAOOAM system ...")
    pars, f, Df, tensor = build_system()
    log(f"ndim={pars.ndim}, tensor nnz={tensor.tensor.nnz}")

    base_core, factor = measure_baseline(tensor, pars.ndim)
    n_cores = os.cpu_count() or 1
    baseline = base_core * n_cores * factor
    kind = "native-C++" if factor == 1.0 else f"numpy x{factor} numba-est"
    log(f"baseline ({kind}): {base_core:,.0f} RK4 steps/s/core x {n_cores} "
        f"cores = {baseline:,.0f} traj-steps/s")

    value = measure_device(tensor, pars.ndim, dtype)
    log(f"device ensemble throughput ({DTYPE}, B={ENSEMBLE}): {value:,.0f} traj-steps/s")

    print(json.dumps({
        "metric": f"maooam_rk4_ensemble_throughput_{DTYPE}",
        "value": value,
        "unit": "traj-steps/s",
        "vs_baseline": value / baseline,
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Twofloat batch-scaling benchmark: throughput vs ensemble size.

B=4096 is the measured VMEM knee of the double-float kernels on v5e —
without chunking, larger batches REGRESS (the df gather intermediates
spill to HBM).  The integrators now split batches into
``QGS_DF_BATCH_CHUNK``-sized chunks evaluated sequentially inside the time
step (``qgs_tpu/integrators/rk.py:_chunk_df_apply``), so throughput must
be MONOTONE in B, staying within ~10% of the per-chunk peak at 4x the
knee (VERDICT r04 #5 "done" criterion).  This artifact measures both
variants at B = 2048..16384.

Run (TPU): ``timeout 5400 python benchmarks/batch_knee.py``
Env: QGS_KNEE_OUT (JSON path), QGS_KNEE_STEPS (default 400),
QGS_KNEE_CHUNKED_ONLY=1 to skip the unchunked comparison rows.
"""

import sys as _sys
import pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import json
import os
import time

import numpy as np

STEPS = int(os.environ.get("QGS_KNEE_STEPS", 400))
BATCHES = (2048, 4096, 8192, 16384)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from qgs_tpu.params.params import QgParams
    from qgs_tpu.models.tendencies import create_tendencies
    from qgs_tpu.ops.twofloat import df_from_f64, make_df_rk4_step_dynamic
    from qgs_tpu.integrators.rk import _chunk_df_apply

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
    ndim = pars.ndim

    step = make_df_rk4_step_dynamic(tensor.tensor)
    apply_raw = step.apply
    ops = step.operands
    dt0 = jnp.asarray(0.0, jnp.float64)
    dt = jnp.asarray(0.1, jnp.float64)

    variants = {"chunked": _chunk_df_apply(apply_raw)}
    if os.environ.get("QGS_KNEE_CHUNKED_ONLY") != "1":
        variants["unchunked"] = apply_raw

    runners = {}
    for name, ap in variants.items():
        def run_impl(ops, y, ap=ap):
            return jax.lax.fori_loop(
                0, STEPS, lambda i, y: ap(ops, y, dt0, dt), y)
        runners[name] = jax.jit(run_impl)

    rng = np.random.default_rng(0)
    points = []
    for B in BATCHES:
        y0 = df_from_f64(jnp.asarray(rng.random((B, ndim)) * 0.01))
        for name, run in runners.items():
            y = run(ops, y0)
            jax.block_until_ready(y)
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                y = run(ops, y)
                jax.block_until_ready(y)
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
            if not np.isfinite(np.asarray(y[0])).all():
                raise RuntimeError("non-finite state")
            steps_s = STEPS * B / best
            points.append({"variant": name, "ensemble": B, "steps": STEPS,
                           "traj_steps_per_s": steps_s,
                           "s_per_run": round(best, 4)})
            print(f"  {name:9s} B={B:6d}: {steps_s:14,.0f} traj-steps/s",
                  flush=True)

    by = {(p["variant"], p["ensemble"]): p["traj_steps_per_s"]
          for p in points}
    checks = {}
    if ("chunked", 16384) in by:
        peak = max(v for (n, b), v in by.items() if n == "chunked")
        checks["monotone_chunked"] = all(
            by[("chunked", BATCHES[i + 1])] >= by[("chunked", BATCHES[i])]
            * 0.97 for i in range(len(BATCHES) - 1))
        checks["b16384_within_10pct_of_peak"] = (
            by[("chunked", 16384)] >= 0.9 * peak)
    doc = {"metric": "df_batch_knee", "ndim": ndim,
           "platform": jax.devices()[0].platform,
           "chunk": int(os.environ.get("QGS_DF_BATCH_CHUNK", "4096")),
           "points": points, "checks": checks}
    out = os.environ.get("QGS_KNEE_OUT")
    if out:
        with open(out, "w") as fh:
            json.dump(doc, fh, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: MAOOAM (36-var coupled ocean-atmosphere) ensemble RK4
throughput on the available accelerator, versus the reference-design CPU
baseline measured on this host.

Prints exactly ONE JSON line to stdout with the headline metric plus the
full precision/perf story:

    {"metric": ..., "value": ..., "unit": "traj-steps/s", "vs_baseline": ...,
     "tiers": {"float32": {...}, "twofloat": {...}, "float64": {...}},
     "mode_updates_per_s_per_chip": ..., "achieved_tflops_f32": ...,
     "mfu_vs_bf16_peak": ..., ...}

Tiers (all vs the same baseline):
  float32   — count-bucketed gather/row-sum kernel (the round-4 auto
              mode: padding-free, fused VMEM-resident reductions)
  twofloat  — double-float (2x f32) fused RK4 step, ~48-bit mantissa
  float64   — XLA-emulated f64 (v5e has no native f64) — fidelity oracle

FLOP accounting: the bucketed kernel's algorithmic work is ~3 flops per
nonzero per stage (no scatter matmul), i.e. 4 x 3 x nnz per traj-step —
it is gather-bound, so MXU-peak MFU is not a meaningful ceiling for it
(the dense-path rows of RESOLUTION_r04.json carry the MXU MFU story).

Baseline protocol: the reference implementation (Climdyn/qgs) runs one Numba
trajectory per CPU process (cpu_count processes).  Numba is not installed in
this image, so the baseline is the framework's own native C++ kernel
(qgs_tpu/native: the bit-exact reference-semantics COO contraction + RK4
loop, compiled -O3) measured per-core and scaled by cpu_count — a faithful
stand-in for a Numba-jitted scalar loop.  Falls back to the vectorized-NumPy
path x5 if no compiler is available.

Env knobs: QGS_BENCH_DTYPE in {twofloat, float32, float64} runs ONLY that
tier (and makes it the headline); unset runs all three.  QGS_BENCH_ENSEMBLE
/ QGS_BENCH_STEPS override the per-tier defaults.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def log(*args):
    print(*args, file=sys.stderr, flush=True)


NUMBA_ADVANTAGE = 5.0          # conservative single-core Numba vs NumPy factor
ENSEMBLE = int(os.environ.get("QGS_BENCH_ENSEMBLE", 4096))
# 1000 steps per timed call: the remote-TPU dispatch latency (~25 ms/call
# through the axon tunnel) distorts shorter runs; production integrations
# are millions of steps, so steady-state throughput is the honest metric
STEPS = int(os.environ.get("QGS_BENCH_STEPS", 1000))
# best-of-N timed device runs per tier: the axon tunnel/shared worker adds
# occasional multi-x slowdowns to individual runs (observed 14.6M vs 27.0M
# same-day on identical code), so a single sample is not a measurement;
# min/median over N runs are both reported
REPEATS = int(os.environ.get("QGS_BENCH_REPEATS", 3))
DTYPE = os.environ.get("QGS_BENCH_DTYPE")          # None = all tiers
HEADLINE = DTYPE or "twofloat"

# Frozen baseline protocol: ``vs_baseline`` divides by this FIXED figure so
# the ratio is comparable across rounds.  Provenance: best observed
# native-C++ single-core rate on this host (504k reference-semantics RK4
# steps/s/core, round-1 capture; round-2's shared-host capture measured
# 316k/core — contention only ever slows the baseline down, so the best
# observation is the honest per-core speed) x 2 cores = the reference
# design's full-host ensemble throughput (one Numba-equivalent process per
# core, ref ``qgs/integrators/integrator.py:77-82``).  The per-round
# re-measured figure is reported alongside as ``baseline_measured``.
BASELINE_FROZEN = 1.008e6


def _tier_sizes(tier):
    """(ensemble, steps) for a tier — f64 is ~60x slower (XLA-emulated), so
    it gets a proportionally smaller measurement unless explicitly sized.
    Both compute tiers run their measured-best operating point, B=16384
    (round-5 sweeps on v5e, production batch chunking active past each
    tier's VMEM knee): f32 29.4M @ B=4096, 34.8M @ 16384, 25.9M @ 32768
    unchunked (33.5M chunked); twofloat 13.64M @ 4096, 13.78M @ 16384
    (4 chunks of the 4096 knee), 13.39M @ 32768."""
    ens = ENSEMBLE
    steps = STEPS
    if tier == "float64":
        if "QGS_BENCH_ENSEMBLE" not in os.environ:
            ens = min(ens, 256)
        if "QGS_BENCH_STEPS" not in os.environ:
            steps = min(steps, 50)
    elif tier in ("float32", "twofloat"):
        if "QGS_BENCH_ENSEMBLE" not in os.environ:
            ens = max(ens, 16384)
        # the remote-dispatch overhead (~50 ms/run through the axon
        # tunnel) is not TPU throughput; 5000-step runs amortize it to
        # <1% (production integrations are millions of steps)
        if "QGS_BENCH_STEPS" not in os.environ:
            steps = max(steps, 5000)
    return ens, steps


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


def _build_tier(tensor, ndim, tier, ens, steps):
    """Build one tier's compiled runner; returns ``(run, y0, check)``."""
    import jax
    import jax.numpy as jnp
    from qgs_tpu.integrators.rk import make_rk_step, rk4_tableau
    from qgs_tpu.parallel.mesh import ensemble_mesh, shard_ensemble

    y0_np = np.random.default_rng(0).random((ens, ndim)) * 0.01

    if tier in ("pallas_f32", "pallas_df"):
        # opt-in fused-kernel tiers (QGS_BENCH_DTYPE=pallas_*): measured
        # SLOWER than the XLA-composed paths at MAOOAM scale (see CLAUDE.md
        # "Pallas status") — kept benchmarkable for larger mode counts.
        from qgs_tpu.ops.pallas_kernels import (make_pallas_df_rk4,
                                                make_pallas_rk4_f32)
        from qgs_tpu.ops.twofloat import df_from_f64

        if tier == "pallas_f32":
            run = make_pallas_rk4_f32(tensor.tensor, 0.1, steps,
                                      batch_block=512)
            y0 = jnp.asarray(y0_np, jnp.float32)
        else:
            runner = make_pallas_df_rk4(tensor.tensor, 0.1, steps,
                                        batch_block=256)
            run = lambda y: runner(*y)
            y0 = df_from_f64(jnp.asarray(y0_np))
        return run, y0, lambda y: True

    if tier == "twofloat":
        # double-float (2x f32) tier: ~48-bit mantissa at near-f32 speed —
        # the fidelity + throughput middle point (see qgs_tpu/ops/twofloat.py).
        # Past-the-knee batches go through the production df batch chunking
        # (QGS_DF_BATCH_CHUNK, per device) exactly as the integrators do.
        from qgs_tpu.ops.twofloat import make_df_rk4_step, df_from_f64
        from qgs_tpu.integrators.rk import _chunk_batched, _df_batch_chunk

        mesh = ensemble_mesh()
        step = _chunk_batched(make_df_rk4_step(tensor.tensor, 0.1),
                              _df_batch_chunk,
                              batch_devices=max(mesh.devices.size, 1))

        @jax.jit
        def run(y):
            return jax.lax.fori_loop(0, steps, lambda i, y: step(y), y)

        y0 = df_from_f64(jnp.asarray(y0_np))
        return run, y0, lambda y: bool(np.isfinite(np.asarray(y[0][:1])).all())

    from qgs_tpu.ops.contraction import make_tendency_fns

    dtype = {"float64": jnp.float64, "float32": jnp.float32}[tier]
    f_batched, _ = make_tendency_fns(tensor.tensor, tensor.jacobian_tensor,
                                     dtype=dtype)
    a, b, c = rk4_tableau()
    from qgs_tpu.integrators.rk import _chunk_plain_step
    mesh = ensemble_mesh()
    # past-the-knee batches go through the production batch chunking
    # (QGS_F32_BATCH_CHUNK, per device) exactly as the integrators do
    step = _chunk_plain_step(make_rk_step(f_batched, a, b, c),
                             batch_devices=max(mesh.devices.size, 1))

    @jax.jit
    def run(y):
        def body(i, y):
            return step(y, jnp.asarray(0.0, y.dtype), jnp.asarray(0.1, y.dtype))

        return jax.lax.fori_loop(0, steps, body, y)

    y0 = jnp.asarray(y0_np, dtype=dtype)
    if mesh.devices.size > 1:
        y0, _ = shard_ensemble(y0, mesh)
    return run, y0, lambda y: bool(np.isfinite(np.asarray(y[:1])).all())


def measure_device(tensor, ndim, tier):
    """One tier's steady-state ensemble throughput: best-of-N timed runs
    (chained — the state stays on the model's neighborhood) after a
    compile+warmup call.  Returns ``(times, ens, steps)``."""
    import jax

    ens, steps = _tier_sizes(tier)
    run, y0, check = _build_tier(tensor, ndim, tier, ens, steps)

    log(f"compiling {tier} ...")
    y = run(y0)
    jax.block_until_ready(y)
    times = []
    for _ in range(max(REPEATS, 1)):
        t0 = time.perf_counter()
        y = run(y)
        jax.block_until_ready(y)
        times.append(time.perf_counter() - t0)
    if not check(y):
        raise RuntimeError("non-finite state after benchmark run")
    return times, ens, steps


def main():
    import jax

    # persistent compilation cache: makes re-runs of this benchmark (and the
    # driver's capture) immune to the ~3-minute cold remote-compile tunnel
    try:
        cache_dir = os.path.join(REPO, ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as err:                       # cache is best-effort
        log(f"persistent compilation cache unavailable: {err}")

    tiers = [DTYPE] if DTYPE else ["float32", "twofloat", "float64"]

    log("building MAOOAM system ...")
    pars, f, Df, tensor = build_system()
    nnz = tensor.tensor.nnz
    n1 = pars.ndim + 1
    log(f"ndim={pars.ndim}, tensor nnz={nnz}")

    base_core, factor = measure_baseline(tensor, pars.ndim)
    n_cores = os.cpu_count() or 1
    baseline_measured = base_core * n_cores * factor
    baseline = BASELINE_FROZEN
    kind = "native-C++" if factor == 1.0 else f"numpy x{factor} numba-est"
    log(f"baseline ({kind}): measured {base_core:,.0f} RK4 steps/s/core x "
        f"{n_cores} cores = {baseline_measured:,.0f} traj-steps/s; "
        f"frozen denominator = {baseline:,.0f}")

    n_chips = jax.device_count()
    tier_results = {}
    for tier in tiers:
        times, ens, steps = measure_device(tensor, pars.ndim, tier)
        value = steps * ens / min(times)              # best of N
        median = steps * ens / float(np.median(times))
        tier_results[tier] = {
            "traj_steps_per_s": value,
            "traj_steps_per_s_median": median,
            "run_times_s": [round(t, 4) for t in times],
            "vs_baseline": value / baseline,
            "mode_updates_per_s_per_chip": value * pars.ndim / n_chips,
            "ensemble": ens,
            "steps": steps,
        }
        log(f"{tier}: {value:,.0f} traj-steps/s best-of-{len(times)} "
            f"(median {median:,.0f}; {value / baseline:.1f}x frozen "
            f"baseline, B={ens})")

    if "float64" in tier_results:
        # steer f64 users toward the designed answer: v5e has no native
        # f64 (XLA emulates it ~60x slower), while the double-float tier
        # matches f64 trajectories to ~1e-13 at near-f32 throughput and
        # now supports every explicit tableau and the rank-5 T4 models
        note = ("float64 on TPU v5e is XLA-emulated (~60x slower than "
                "f32); precision='twofloat' gives ~1e-13 trajectory "
                "accuracy at ~30x the f64 throughput — prefer it unless "
                "bit-exact IEEE f64 is required")
        tier_results["float64"]["note"] = note
        log(f"note: {note}")

    headline = tier_results[HEADLINE if HEADLINE in tier_results else tiers[0]]

    # FLOP accounting: the production f32 kernel since round 4 is the
    # count-bucketed gather/row-sum — its ALGORITHMIC work is ~3 flops per
    # nonzero per stage (two multiplies + one add), with NO scatter matmul
    # (the old 4*(2*nnz*n1 + 3*nnz) figure counted one-hot-matmul MACs the
    # kernel no longer performs — it would overstate achieved FLOPs ~n1x).
    # The kernel is gather-bound, so MXU-peak MFU is not a meaningful
    # ceiling for it; see RESOLUTION_r04.json dense rows for MXU MFU.
    flops_per_traj_step = 4 * 3 * nnz
    f32 = tier_results.get("float32")
    achieved_tflops = (f32["traj_steps_per_s"] * flops_per_traj_step / n_chips
                       / 1e12) if f32 else None
    platform = jax.devices()[0].platform
    report = {
        "metric": f"maooam_rk4_ensemble_throughput_{HEADLINE}",
        "value": headline["traj_steps_per_s"],
        "unit": "traj-steps/s",
        "vs_baseline": headline["vs_baseline"],
        "baseline_traj_steps_per_s": baseline,
        "baseline_protocol": "frozen (see bench.py BASELINE_FROZEN)",
        "baseline_measured_traj_steps_per_s": baseline_measured,
        "bench_repeats": REPEATS,
        "tiers": tier_results,
        "mode_updates_per_s_per_chip": headline["mode_updates_per_s_per_chip"],
        "n_chips": n_chips,
        "platform": platform,
        "flops_per_traj_step_f32": flops_per_traj_step,
        "flop_accounting": ("algorithmic COO flops (4 stages x 3*nnz); the "
                            "bucketed gather kernel runs no matmuls, so "
                            "MXU-peak MFU does not apply — see "
                            "RESOLUTION_r04.json dense rows for MXU MFU"),
        "achieved_algorithmic_tflops_f32": achieved_tflops,
    }

    print(json.dumps(report))


if __name__ == "__main__":
    main()

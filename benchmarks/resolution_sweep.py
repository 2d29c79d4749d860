#!/usr/bin/env python
"""Mode-count (resolution) throughput + utilization sweep.

Measures the RK4 ensemble hot loop across spectral truncations from the
standard MAOOAM 2,2/2,4 (ndim 36) up to 8,8/8,8 (ndim 400) and an
atmosphere-only 10,10 (ndim 420), for each device path of the contraction
kernel (``qgs_tpu/ops/contraction.py``):

* ``coo``    — the round-3 flat row-grouped gather layout (kept for the
  comparison row; its (B, n1*R) intermediates are what bucketing fixed).
* ``coo_fm`` — feature-major gather variant of ``coo`` (measured
  identical: the gather plateau is layout-insensitive).
* ``coo_b``  — the count-bucketed padding-free kernel, the production
  auto mode (6.3-8.1x over ``coo`` at ndim 104-420, r04).
* ``dense``  — the matricized dense einsum ((B, n1^2) x (n1^2, n1) matmul
  at HIGHEST precision), with the tensor as a device ARGUMENT.  Work is
  O(n1^3) — pure MXU; FLOP utilization is reported as MFU vs both the
  bf16 peak (197 TFLOP/s on v5e) and the exact-f32 ceiling (197/6:
  HIGHEST-precision f32 = 6 bf16 MXU passes).
* ``pallas`` — the fused Pallas RK4 kernel (``ops/pallas_kernels.py``),
  retired as north star in r03 (see CLAUDE.md "Pallas status"); opt-in.

The quartic tiers run the rank-5 T^4 radiation tensor (ndim 38, 2,2/2,4,
symbolic-quadrature IPs): ``t4`` (auto = bucketed + pair-factored),
``t4_pairsum`` / ``t4_rowsum`` comparison rows, and ``t4_twofloat``
(the rank-general double-float kernel).  ``recompile_check`` times a
same-shape/new-parameters dispatch; ``gather_bm``/``gather_fm`` are
pure-gather microbenchmarks at the rowsum access pattern.

Writes the results JSON to ``QGS_RES_OUT`` (default: stdout only), appending
each point as it lands so partial sweeps survive a timeout.

Run (TPU): ``timeout 5400 python benchmarks/resolution_sweep.py``
Env knobs: QGS_RES_CONFIGS (comma list of config keys), QGS_RES_PATHS
(comma list in {coo,dense,pallas}), QGS_RES_T4=0 to skip the quartic tier,
QGS_RES_REPEATS (default 3), QGS_RES_OUT (output JSON path).
"""

import sys as _sys
import pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import json
import os
import time

import numpy as np

V5E_PEAK_BF16_TFLOPS = 197.0
EXACT_F32_PASSES = 6
HBM_GBPS = 819.0                      # v5e HBM bandwidth

REPEATS = int(os.environ.get("QGS_RES_REPEATS", 3))

# (key, atm blocks, ocean blocks) — ndim grows 36 -> 754 (round 4 extends
# past the former ndim-420 ceiling: the tendency tensor is now a device
# ARGUMENT, so the dense path no longer hits the remote-compile request
# size limit, VERDICT r03 #1)
CONFIGS = {
    "2x2_2x4": ((2, 2), (2, 4)),
    "4x4_4x4": ((4, 4), (4, 4)),
    "6x6_6x6": ((6, 6), (6, 6)),
    "8x8_8x8": ((8, 8), (8, 8)),
    "atm10x10": ((10, 10), None),
    "atm12x12": ((12, 12), None),      # ndim 600
    "atm14x13": ((14, 13), None),      # ndim 754
}

# per-ndim sizing: (B_coo, B_dense, B_pallas, pallas_block, steps_coo,
# steps_dense) — dense flops/step = 8 B n1^3, so B shrinks with ndim to
# keep runs O(10 s); every new shape costs a ~3-min remote compile
def sizing(ndim):
    if ndim <= 120:
        return 4096, 2048, 2048, 256, 1000, 500
    if ndim <= 260:
        return 4096, 256, 1024, 128, 500, 100
    # the rowsum path materializes (B, n1*R) gather intermediates — at
    # ndim 420 / R~1000, B=4096 would need ~21 GB of HBM (device fault,
    # observed); cap the batch instead
    if ndim <= 500:
        return 1024, 128, None, None, 300, 30
    # dense MFU needs the matmul's M dimension (the batch) at or above the
    # 128-row MXU tile — B=48 measured 35-40% MFU at ndim 600-754, vs
    # 54.5% at ndim 420 with B=128
    return 256, 128, None, None, 200, 10


def build(na, no):
    from qgs_tpu.params.params import QgParams
    from qgs_tpu.models.tendencies import create_tendencies

    pars = QgParams()
    pars.set_atmospheric_channel_fourier_modes(*na)
    if no is not None:
        pars.set_oceanic_basin_fourier_modes(*no)
        pars.set_params({'kd': 0.0290, 'kdp': 0.0290, 'n': 1.5, 'r': 1.e-7,
                         'h': 136.5, 'd': 1.1e-7})
        pars.atemperature_params.set_params({'eps': 0.7, 'T0': 289.3,
                                             'hlambda': 15.06})
        pars.gotemperature_params.set_params({'gamma': 5.6e8, 'T0': 301.46})
        pars.atemperature_params.set_insolation(103.3333, 0)
        pars.gotemperature_params.set_insolation(310., 0)
    else:
        pars.set_params({'kd': 0.1, 'kdp': 0.01, 'n': 1.5})
        pars.atemperature_params.set_thetas(0.1, 0)
    f, Df, tensor = create_tendencies(pars, return_qgtensor=True)
    return pars, tensor


def build_t4():
    from qgs_tpu.params.params import QgParams
    from qgs_tpu.inner_products.symbolic import (
        AtmosphericSymbolicInnerProducts, OceanicSymbolicInnerProducts)
    from qgs_tpu.tensors.qgtensor import QgsTensorT4

    pars = QgParams({'rr': 287.e0, 'sb': 5.6e-8}, T4=True)
    pars.set_params({'kd': 0.04, 'kdp': 0.04, 'n': 1.5})
    pars.set_atmospheric_channel_fourier_modes(2, 2, mode='symbolic')
    pars.set_oceanic_basin_fourier_modes(2, 4, mode='symbolic')
    aip = AtmosphericSymbolicInnerProducts(pars, quadrature=True)
    oip = OceanicSymbolicInnerProducts(pars, quadrature=True)
    tensor = QgsTensorT4(pars, aip, oip)
    return pars, tensor


def time_loop(run, y0, repeats=REPEATS):
    """Times best-of-N chained runs; also sanity-checks the final state
    (finite, and actually different from the input — guards against a
    wedged executable returning instantly with untouched buffers)."""
    import jax

    t0 = time.perf_counter()
    y = run(y0)
    jax.block_until_ready(y)
    time_loop.last_warmup_s = time.perf_counter() - t0
    times = []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        y = run(y)
        jax.block_until_ready(y)
        times.append(time.perf_counter() - t0)
    yf = np.asarray(y)
    if not np.isfinite(yf).all():
        raise RuntimeError("non-finite state after benchmark run")
    if np.array_equal(yf, np.asarray(y0)):
        raise RuntimeError("state unchanged after benchmark run")
    return times


_RUNNER_CACHE = {}


def run_dt(ndim):
    """Benchmark step size: throughput is dt-independent, but the run must
    stay finite — the small-scale modes of high truncations make dt=0.1
    RK4-unstable from ndim ~500 (observed: non-finite states at ndim 600)."""
    return 0.1 if ndim <= 500 else 0.005


def make_xla_runner(tensor, mode, dtype, steps, dt=0.1):
    """Compiled fori-loop RK4 runner with the tendency tensor threaded as a
    jit ARGUMENT (cached per structural key: a same-shape model with new
    parameter values reuses the executable — the recompile_check section
    measures exactly this)."""
    import jax
    import jax.numpy as jnp
    from qgs_tpu.integrators.rk import make_rk_step, rk4_tableau
    from qgs_tpu.ops.contraction import make_tendency_fns

    f_b, _ = make_tendency_fns(tensor.tensor, tensor.jacobian_tensor,
                               mode=mode, dtype=dtype)
    a, b, c = rk4_tableau()
    apply = f_b.apply
    dt = jnp.asarray(dt, dtype)

    ck = (f_b.key, steps, float(dt))
    jitted = _RUNNER_CACHE.get(ck)
    if jitted is None:
        def run_impl(ops, y):
            stp = make_rk_step(lambda t, x: apply(ops, t, x), a, b, c)
            return jax.lax.fori_loop(0, steps,
                                     lambda i, y: stp(y, dt * 0, dt), y)

        jitted = jax.jit(run_impl)
        _RUNNER_CACHE[ck] = jitted

    ops = f_b.operands
    return lambda y: jitted(ops, y)


def coo_stats(tensor):
    """Padded-slot statistics of the auto (rowsum) layout, for the
    bandwidth-roofline accounting."""
    rows = np.bincount(np.asarray(tensor.tensor.coords[0]),
                       minlength=tensor.tensor.shape[0])
    R = int(rows.max())
    n1 = tensor.tensor.shape[0]
    return {"nnz": int(tensor.tensor.nnz), "max_row_nnz": R,
            "mean_row_nnz": float(rows.mean()), "padded_slots": n1 * R}


def bucketed_stats(tensor):
    """Slot/gather statistics of the count-bucketed layout, parsed from
    the kernel's structural key: per (group d_eff, (N_g, R_g)) bucket,
    each slot costs d_eff gathers + d_eff multiplies; pair-factored
    kernels add 2 gathers + 1 multiply per pair per evaluation."""
    import jax.numpy as jnp
    from qgs_tpu.ops.contraction import make_bucketed_contraction

    c = make_bucketed_contraction(tensor.tensor, dtype=jnp.float32)
    kind, n1, n_pairs, desc, _ = c.key
    slots = sum(N * R for _, bdesc in desc for (N, R) in bdesc)
    gathers = sum(d_eff * N * R for d_eff, bdesc in desc
                  for (N, R) in bdesc) + 2 * n_pairs
    n_buckets = sum(len(bdesc) for _, bdesc in desc)
    # operand stream: V (4 B/slot) + d_eff int32 index lanes per slot
    operand_bytes = sum((1 + d_eff) * 4 * N * R for d_eff, bdesc in desc
                       for (N, R) in bdesc)
    return {"bucketed_slots": int(slots),
            "bucketed_gather_ops": int(gathers),
            "bucketed_n_buckets": int(n_buckets),
            "bucketed_operand_bytes": int(operand_bytes),
            "bucketed_n_pairs": int(n_pairs)}


def point(config, path, ndim, stats, B, steps, times, platform, extra=None):
    el = min(times)
    steps_s = steps * B / el
    rec = {"config": config, "path": path, "ndim": ndim, **stats,
           "ensemble": B, "steps": steps,
           "run_times_s": [round(t, 4) for t in times],
           "traj_steps_per_s": steps_s,
           "mode_updates_per_s": steps_s * ndim}
    if extra:
        rec.update(extra)
    if path == "dense":
        n1 = ndim + 1
        flops = 8.0 * n1 ** 3            # 4 stages x 2 n1^3 MACs... per traj-step
        achieved = steps_s * flops / 1e12
        rec["useful_flops_per_traj_step"] = flops
        rec["achieved_tflops"] = achieved
        if platform == "tpu":
            rec["mfu_vs_bf16_peak"] = achieved / V5E_PEAK_BF16_TFLOPS
            rec["mfu_vs_exact_f32_ceiling"] = achieved / (
                V5E_PEAK_BF16_TFLOPS / EXACT_F32_PASSES)
    if path in ("coo", "coo_fm", "t4_rowsum", "t4_pairsum"):
        # flat rowsum layouts materialize (B, n1*R) gather intermediates —
        # a genuine HBM stream (the measured 200-245 GB/s sits below the
        # roofline, consistent with this model): ~3 padded slots of 4 bytes
        # per output element per stage
        slots = stats.get("padded_slots", stats["nnz"])
        traffic = 4 * 3 * slots * 4.0    # bytes per traj-step per member
        rec["algorithmic_flops_per_traj_step"] = 4 * 3 * stats["nnz"]
        rec["gather_traffic_bytes_per_traj_step"] = traffic
        if platform == "tpu":
            rec["achieved_gather_gbps"] = steps_s * traffic / 1e9
            rec["hbm_roofline_gbps"] = HBM_GBPS
    if path in ("coo_b", "t4"):
        # bucketed/pair-factored kernels: per-bucket gather->mul->reduce
        # chains FUSE, so their gathers read a VMEM-staged state — charging
        # them as HBM bytes produced the r04 readings of >2x the HBM
        # roofline (RESOLUTION_r04 coo_b rows; VERDICT r04 Weak #3).  The
        # honest split:
        #   * gather-ISSUE work:  d_eff gathers per slot (the candidate
        #     limiter; compare achieved_gather_gops against the measured
        #     gather_bm/gather_fm issue ceiling, which is ~layout- and
        #     size-insensitive);
        #   * HBM traffic BOUNDS: at least one state read + operand stream
        #     + one output write per evaluation (lower), at most one state
        #     staging per bucket fusion (upper).  achieved_hbm_gbps_upper
        #     <= roofline by construction; when even the upper bound sits
        #     far below the roofline, the kernel is NOT bandwidth-bound.
        bs = {k: v for k, v in stats.items() if k.startswith("bucketed_")}
        if bs:
            g_ops = 4.0 * bs["bucketed_gather_ops"]        # per traj-step
            rec["gather_ops_per_traj_step"] = g_ops
            rec["vpu_mults_per_traj_step"] = g_ops         # one mul/gather
            state_bytes = 4.0 * (ndim + 1) * 4             # per member/stage
            out_bytes = 4.0 * (ndim + 1) * 4
            opb = 4.0 * bs["bucketed_operand_bytes"] / B   # amortized over B
            lower = state_bytes + out_bytes + opb
            upper = (state_bytes * bs["bucketed_n_buckets"]
                     + out_bytes * bs["bucketed_n_buckets"] + opb)
            rec["hbm_bytes_per_traj_step_lower"] = lower
            rec["hbm_bytes_per_traj_step_upper"] = upper
            if platform == "tpu":
                rec["achieved_gather_gops"] = steps_s * g_ops / 1e9
                rec["achieved_hbm_gbps_lower"] = steps_s * lower / 1e9
                rec["achieved_hbm_gbps_upper"] = steps_s * upper / 1e9
                rec["hbm_roofline_gbps"] = HBM_GBPS
    return rec


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

    cfg_keys = os.environ.get("QGS_RES_CONFIGS",
                              ",".join(CONFIGS)).split(",")
    paths = os.environ.get("QGS_RES_PATHS",
                           "coo,coo_fm,coo_b,dense").split(",")
    out_path = os.environ.get("QGS_RES_OUT")
    platform = jax.devices()[0].platform

    results = []

    def flush():
        doc = {"metric": "resolution_sweep", "platform": platform,
               "repeats": REPEATS, "points": results}
        if out_path:
            with open(out_path, "w") as fh:
                json.dump(doc, fh, indent=1)
        return doc

    for key in cfg_keys:
        na, no = CONFIGS[key]
        t0 = time.time()
        pars, tensor = build(na, no)
        ndim = pars.ndim
        stats = {**coo_stats(tensor), **bucketed_stats(tensor)}
        B_coo, B_dense, B_pal, blk, st_coo, st_dense = sizing(ndim)
        print(f"[{key}] ndim={ndim} nnz={stats['nnz']} "
              f"(built in {time.time()-t0:.0f}s)", flush=True)
        rng = np.random.default_rng(0)

        # batch is NOT the high-ndim limiter for the bucketed kernel:
        # B=2048 at ndim 600/754 measured 14.1k/7.6k traj-steps/s vs
        # B=256's 18.2k/9.8k (r05) — per-member efficiency FALLS with
        # batch there, so all gather rows share sizing()'s batch
        for pkey, mode in (("coo", "rowsum"), ("coo_fm", "rowsum_fm"),
                           ("coo_b", "bucketed")):
            if pkey not in paths:
                continue
            try:
                run = make_xla_runner(tensor, mode, jnp.float32, st_coo,
                                      dt=run_dt(ndim))
                y0 = jnp.asarray(rng.random((B_coo, ndim)) * 0.01,
                                 jnp.float32)
                times = time_loop(run, y0)
                results.append(point(
                    key, pkey, ndim, stats, B_coo, st_coo, times, platform,
                    extra={"first_dispatch_s":
                           round(time_loop.last_warmup_s, 2)}))
                print(f"  {pkey:<6}: "
                      f"{results[-1]['traj_steps_per_s']:14,.0f} "
                      f"traj-steps/s", flush=True)
            except Exception as err:
                results.append({"config": key, "path": pkey, "ndim": ndim,
                                "error": str(err)[:300]})
                print(f"  {pkey:<6}: FAILED ({str(err)[:120]})", flush=True)
            flush()

        if "dense" in paths:
            try:
                run = make_xla_runner(tensor, "dense", jnp.float32,
                                      st_dense, dt=run_dt(ndim))
                y0 = jnp.asarray(rng.random((B_dense, ndim)) * 0.01,
                                 jnp.float32)
                times = time_loop(run, y0)
                results.append(point(
                    key, "dense", ndim, stats, B_dense, st_dense, times,
                    platform,
                    extra={"first_dispatch_s":
                           round(time_loop.last_warmup_s, 2)}))
                p = results[-1]
                mfu = p.get("mfu_vs_exact_f32_ceiling")
                print(f"  dense : {p['traj_steps_per_s']:14,.0f} traj-steps/s"
                      + (f"  ({p['achieved_tflops']:.1f} TF, "
                         f"{mfu:.1%} of exact-f32 ceiling)" if mfu else ""),
                      flush=True)
            except Exception as err:
                results.append({"config": key, "path": "dense", "ndim": ndim,
                                "error": str(err)[:300]})
                print(f"  dense : FAILED ({str(err)[:120]})", flush=True)
            flush()

        if "pallas" in paths and B_pal is not None and platform == "tpu":
            from qgs_tpu.ops.pallas_kernels import make_pallas_rk4_f32
            try:
                run = make_pallas_rk4_f32(tensor.tensor, 0.1, st_dense,
                                          batch_block=blk)
                y0 = jnp.asarray(rng.random((B_pal, ndim)) * 0.01,
                                 jnp.float32)
                times = time_loop(run, y0)
                results.append(point(key, "pallas", ndim, stats, B_pal,
                                     st_dense, times, platform))
                print(f"  pallas: {results[-1]['traj_steps_per_s']:14,.0f} "
                      f"traj-steps/s", flush=True)
            except Exception as err:        # VMEM exhaustion at high ndim
                results.append({"config": key, "path": "pallas",
                                "ndim": ndim, "error": str(err)[:300]})
                print(f"  pallas: FAILED ({str(err)[:120]})", flush=True)
            flush()

    if os.environ.get("QGS_RES_T4", "1") != "0":
        try:
            t0 = time.time()
            pars, tensor = build_t4()
            stats = {**coo_stats(tensor), **bucketed_stats(tensor)}
            stats["rank"] = int(tensor.tensor.rank)
            from qgs_tpu.ops.contraction import make_pairsum_contraction
            stats["n_pairs"] = int(make_pairsum_contraction(
                tensor.tensor).operands["pair_a"].shape[0])
            print(f"[t4] ndim={pars.ndim} rank-5 nnz={stats['nnz']} "
                  f"n_pairs={stats['n_pairs']} "
                  f"(built in {time.time()-t0:.0f}s)", flush=True)
            rng = np.random.default_rng(0)
            y0 = jnp.asarray(rng.random((4096, pars.ndim)) * 0.01,
                             jnp.float32)
            # 'auto' now selects the pair-factored kernel for rank 5
            # (VERDICT r03 #6); 't4_rowsum' is the round-3 kernel for the
            # speedup column
            for pkey, mode in (("t4", "auto"), ("t4_pairsum", "pairsum"),
                               ("t4_rowsum", "rowsum")):
                try:
                    run = make_xla_runner(tensor, mode, jnp.float32, 1000)
                    times = time_loop(run, y0)
                    results.append(point("t4_2x2_2x4", pkey, pars.ndim,
                                         stats, 4096, 1000, times, platform))
                    print(f"  {pkey:<10}: "
                          f"{results[-1]['traj_steps_per_s']:14,.0f} "
                          f"traj-steps/s", flush=True)
                except Exception as err:
                    results.append({"config": "t4_2x2_2x4", "path": pkey,
                                    "error": str(err)[:300]})
                    print(f"  {pkey:<10}: FAILED ({str(err)[:120]})",
                          flush=True)
                flush()

            # twofloat tier on the quartic tendencies (rank-general df
            # kernel, VERDICT r03 Missing #3)
            try:
                from qgs_tpu.ops.twofloat import (df_from_f64,
                                                  make_df_rk4_step)
                step = make_df_rk4_step(tensor.tensor, 0.1)
                steps_df = 500

                @jax.jit
                def run_df(y):
                    return jax.lax.fori_loop(0, steps_df,
                                             lambda i, y: step(y), y)

                B_df = 2048
                y0df = df_from_f64(jnp.asarray(
                    rng.random((B_df, pars.ndim)) * 0.01))
                yd = run_df(y0df)
                jax.block_until_ready(yd)
                times = []
                for _ in range(REPEATS):
                    t1 = time.perf_counter()
                    yd = run_df(yd)
                    jax.block_until_ready(yd)
                    times.append(time.perf_counter() - t1)
                if not np.isfinite(np.asarray(yd[0])).all():
                    raise RuntimeError("non-finite state")
                results.append(point("t4_2x2_2x4", "t4_twofloat", pars.ndim,
                                     stats, B_df, steps_df, times, platform))
                print(f"  t4_twofloat: "
                      f"{results[-1]['traj_steps_per_s']:14,.0f} "
                      f"traj-steps/s", flush=True)
            except Exception as err:
                results.append({"config": "t4_2x2_2x4", "path": "t4_twofloat",
                                "error": str(err)[:300]})
                print(f"  t4_twofloat: FAILED ({str(err)[:120]})", flush=True)
        except Exception as err:
            results.append({"config": "t4_2x2_2x4", "path": "t4",
                            "error": str(err)[:300]})
            print(f"  t4    : FAILED ({str(err)[:120]})", flush=True)
        flush()

    if os.environ.get("QGS_RES_RECOMPILE", "1") != "0":
        # same-shape / new-parameters dispatch: with the tensor as a device
        # argument, the second model must reuse the first's compiled scan
        # (VERDICT r03 #1 "Done =" criterion) — formerly a fresh ~3-min
        # remote compile per parameter set
        try:
            from qgs_tpu.ops.contraction import make_tendency_fns
            na, no = CONFIGS["6x6_6x6"]
            timing = {}
            runs = []
            for tag, kd in (("first_model", 0.0290), ("second_model", 0.0350)):
                t0 = time.time()
                pars, tensor = build(na, no)        # rebuild (fresh params)
                if kd != 0.0290:
                    # perturb a physics parameter; same sparsity layout
                    pars.set_params({'kd': kd, 'kdp': kd})
                    from qgs_tpu.models.tendencies import create_tendencies
                    _, _, tensor = create_tendencies(pars,
                                                     return_qgtensor=True)
                build_s = time.time() - t0
                run = make_xla_runner(tensor, "dense", jnp.float32, 50)
                y0 = jnp.asarray(np.random.default_rng(0)
                                 .random((64, pars.ndim)) * 0.01, jnp.float32)
                t0 = time.time()
                jax.block_until_ready(run(y0))
                timing[tag] = {"host_build_s": round(build_s, 2),
                               "first_dispatch_s": round(time.time() - t0, 3)}
                runs.append(np.asarray(run(y0)))
            timing["results_differ"] = bool(
                not np.allclose(runs[0], runs[1]))
            results.append({"config": "6x6_6x6", "path": "recompile_check",
                            "ndim": pars.ndim, **timing})
            print(f"  recompile_check: first {timing['first_model']}, "
                  f"second {timing['second_model']}", flush=True)
        except Exception as err:
            results.append({"config": "6x6_6x6", "path": "recompile_check",
                            "error": str(err)[:300]})
            print(f"  recompile_check: FAILED ({str(err)[:120]})", flush=True)
        flush()

    if os.environ.get("QGS_RES_GATHER", "1") != "0" and platform == "tpu":
        # pure-gather microbenchmark at the rowsum access pattern: is the
        # ~245 GB/s plateau the device's random-gather ceiling, or the
        # batch-major layout's (VERDICT r03 #2)?
        try:
            for n1, R, B in ((105, 84, 4096), (229, 196, 4096)):
                rng = np.random.default_rng(1)
                idx = jnp.asarray(rng.integers(0, n1, n1 * R), jnp.int32)
                x_bm = jnp.asarray(rng.random((B, n1)), jnp.float32)

                @jax.jit
                def g_bm(x, idx=idx):
                    # 200 chained gathers, each consuming the previous
                    # result's column means (defeats CSE/caching)
                    def body(i, x):
                        g = jnp.take(x, idx, axis=1)
                        corr = g.reshape(B, n1, -1).mean(-1).mean(0)
                        return x + 1e-12 * corr[None, :]
                    return jax.lax.fori_loop(0, 200, body, x)

                @jax.jit
                def g_fm(x, idx=idx):
                    def body(i, x):
                        g = jnp.take(x, idx, axis=0)
                        corr = g.reshape(n1, -1, B).mean(1).mean(-1)
                        return x + 1e-12 * corr[:, None]
                    return jax.lax.fori_loop(0, 200, body, x)

                for name, fn, x0 in (("gather_bm", g_bm, x_bm),
                                     ("gather_fm", g_fm, x_bm.T)):
                    jax.block_until_ready(fn(x0))
                    t0 = time.perf_counter()
                    jax.block_until_ready(fn(x0))
                    el = time.perf_counter() - t0
                    gbps = 200 * B * n1 * R * 4 / el / 1e9
                    results.append({"config": f"micro_n{n1}", "path": name,
                                    "n1": n1, "R": R, "ensemble": B,
                                    "achieved_gather_gbps": gbps,
                                    "hbm_roofline_gbps": HBM_GBPS})
                    print(f"  {name} n1={n1}: {gbps:8,.0f} GB/s", flush=True)
        except Exception as err:
            results.append({"config": "micro", "path": "gather_micro",
                            "error": str(err)[:300]})
            print(f"  gather_micro: FAILED ({str(err)[:120]})", flush=True)
        flush()

    if os.environ.get("QGS_RES_VPU", "1") != "0" and platform == "tpu":
        # elementwise-FMA microbenchmark: the VPU arithmetic ceiling at the
        # bucketed kernel's working-set sizes.  Limiter attribution for the
        # coo_b rows: compare achieved_gather_gops against the gather
        # micro's ops/s (= its GB/s / 4) and vpu_mults_per_traj_step
        # against this FMA rate — whichever ceiling the kernel sits near
        # is the limiter; HBM is ruled in/out by achieved_hbm_gbps_upper
        # vs the roofline.
        try:
            for B_m, S_m in ((4096, 4096), (4096, 16384)):
                x_m = jnp.asarray(np.random.default_rng(2)
                                  .random((B_m, S_m)), jnp.float32)
                am = jnp.float32(1.0000001)
                bm = jnp.float32(1e-9)

                @jax.jit
                def fma(x):
                    return jax.lax.fori_loop(
                        0, 200, lambda i, x: x * am + bm, x)

                jax.block_until_ready(fma(x_m))
                t0 = time.perf_counter()
                jax.block_until_ready(fma(x_m))
                el = time.perf_counter() - t0
                gflops = 200.0 * 2 * B_m * S_m / el / 1e9
                results.append({"config": f"micro_fma_{B_m}x{S_m}",
                                "path": "vpu_fma",
                                "achieved_vpu_gflops": gflops})
                print(f"  vpu_fma {B_m}x{S_m}: {gflops:8,.0f} GFLOP/s",
                      flush=True)
        except Exception as err:
            results.append({"config": "micro", "path": "vpu_fma",
                            "error": str(err)[:300]})
            print(f"  vpu_fma: FAILED ({str(err)[:120]})", flush=True)
        flush()

    print(json.dumps(flush()))


if __name__ == "__main__":
    main()

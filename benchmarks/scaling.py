#!/usr/bin/env python
"""Ensemble-sharding scaling-efficiency report.

Measures the MAOOAM ensemble RK4 throughput at 1, 2, 4, ... devices of the
available mesh (weak scaling: fixed per-device ensemble) and reports the
parallel efficiency — the BASELINE.json scaling gate.  On this image the
real hardware is a single chip, so the multi-device points run on the
virtual host-platform mesh (`JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=N`); the sharding program
is identical on a real pod slice.
"""

import sys as _sys
import pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from qgs_tpu.params.params import QgParams
    from qgs_tpu.models.tendencies import create_tendencies
    from qgs_tpu.integrators.rk import make_rk_step, rk4_tableau
    from qgs_tpu.utils.profiling import ThroughputMeter

    pars = QgParams()
    pars.set_atmospheric_channel_fourier_modes(2, 2)
    pars.set_oceanic_basin_fourier_modes(2, 4)
    f, Df = create_tendencies(pars)
    a, b, c = rk4_tableau()
    step = make_rk_step(f.batched, a, b, c)

    PER_DEVICE = 512
    STEPS = 100
    devices = jax.devices()
    results = {}

    n_dev = 1
    while n_dev <= len(devices):
        B = PER_DEVICE * n_dev
        mesh = Mesh(np.array(devices[:n_dev]), ("ensemble",))
        sharding = NamedSharding(mesh, P("ensemble"))
        y0 = jax.device_put(
            np.random.default_rng(0).random((B, pars.ndim)) * 0.01, sharding)

        @jax.jit
        def run(y):
            return jax.lax.fori_loop(
                0, STEPS,
                lambda i, y: step(y, jnp.asarray(0.0, y.dtype),
                                  jnp.asarray(0.1, y.dtype)), y)

        y = run(y0)
        y.block_until_ready()
        meter = ThroughputMeter(pars.ndim, ensemble=B)
        with meter:
            y = run(y)
            y.block_until_ready()
        meter.add_steps(STEPS)
        results[n_dev] = meter.traj_steps_per_s
        n_dev *= 2

    import os

    base = results[1]
    platform = jax.devices()[0].platform
    n_cores = os.cpu_count() or 1
    print(f"{'devices':>8} {'traj-steps/s':>15} {'efficiency':>11}")
    for n_dev, rate in results.items():
        eff = rate / (base * n_dev)
        print(f"{n_dev:>8} {rate:>15,.0f} {eff:>10.1%}")
    if platform == "cpu":
        print(f"\nNOTE: virtual host-platform devices share {n_cores} physical "
              f"core(s); weak-scaling efficiency beyond {n_cores} devices is "
              f"bounded by the silicon, not the sharding program. "
              f"Efficiency vs the {n_cores}-core ideal at {max(results)} devices: "
              f"{results[max(results)] / (base * min(n_cores, max(results))):.1%}.")


if __name__ == "__main__":
    main()

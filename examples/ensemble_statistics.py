#!/usr/bin/env python
"""Sharded ensemble integration + ensemble-mean observables."""

import sys as _sys
import pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))


import numpy as np

from qgs_tpu.params.params import QgParams
from qgs_tpu.models.tendencies import create_tendencies
from qgs_tpu.integrators.integrator import RungeKuttaIntegrator
from qgs_tpu.integrators.statistics import TrajectoriesStatistics

pars = QgParams({'phi0_npi': np.deg2rad(50.) / np.pi, 'hd': 0.1})
pars.set_atmospheric_channel_fourier_modes(2, 2)
pars.ground_params.set_orography(0.2, 1)
pars.atemperature_params.set_thetas(0.2, 0)
f, Df = create_tendencies(pars)

# Ensembles are batched arrays sharded across the device mesh -- the
# TPU-native replacement of the reference's one-OS-process-per-trajectory
# pools.  Nothing here changes between 1 chip and a pod slice.
integrator = RungeKuttaIntegrator(number_of_dimensions=pars.ndim)
integrator.set_func(f)

# initialize() spins ONE long transient, perturbs the converged state into
# 32 members, and reconverges them briefly -- much cheaper than 32 long
# transients.  compute_stats averages arbitrary observables over the
# ensemble in chunked batches (num=2 splits the members into 2 batches).
stats = TrajectoriesStatistics()
stats.set_integrator(integrator)
# one long transient + perturbed reconvergence for the rest of the ensemble
stats.initialize(2000., 0.1, number_of_trajectories=32, reconvergence_time=100.)

stats.set_func_list([
    lambda traj: traj,                       # ensemble-mean trajectory
    lambda traj: traj ** 2,                  # second moment
])
stats.compute_stats(0., 200., 0.1, write_steps=10, num=2)
mean_traj, second_moment = stats.get_stats()
variance = second_moment - mean_traj ** 2
print("ensemble variance of psi_a_1 over time:")
print(np.array2string(variance[0], precision=5))

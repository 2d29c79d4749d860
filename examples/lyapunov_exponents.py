#!/usr/bin/env python
"""Lyapunov spectrum and covariant vectors of the RP atmosphere."""

import sys as _sys
import pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))


import numpy as np

from qgs_tpu.params.params import QgParams
from qgs_tpu.models.tendencies import create_tendencies
from qgs_tpu.integrators.integrator import RungeKuttaIntegrator
from qgs_tpu.toolbox.lyapunov import LyapunovsEstimator, CovariantLyapunovsEstimator

pars = QgParams({'phi0_npi': np.deg2rad(50.) / np.pi, 'hd': 0.1})
pars.set_atmospheric_channel_fourier_modes(2, 2)
pars.ground_params.set_orography(0.2, 1)
pars.atemperature_params.set_thetas(0.2, 0)
f, Df = create_tendencies(pars)

integrator = RungeKuttaIntegrator()
integrator.set_func(f)
rng = np.random.default_rng(1)
integrator.integrate(0., 2.e4, 0.1, ic=rng.random(pars.ndim) * 0.1, write_steps=0)
_, ic = integrator.get_trajectories()

est = LyapunovsEstimator()
est.set_func(f, Df)
est.compute_lyapunovs(0., 1000., 5000., 0.1, 0.1, ic, write_steps=10)
t, traj, exps, vecs = est.get_lyapunovs()
spectrum = exps.mean(axis=-1)
print("Backward Lyapunov spectrum (per time unit):")
print(np.array2string(np.sort(spectrum)[::-1], precision=4))
print("Kaplan-Yorke dimension estimate:",
      (np.cumsum(np.sort(spectrum)[::-1]) > 0).sum())

cest = CovariantLyapunovsEstimator()
cest.set_func(f, Df)
cest.compute_clvs(0., 500., 1500., 2000., 0.1, 0.1, ic, write_steps=10)
_, _, cexps, cvecs = cest.get_clvs()
print("CLV mean exponents:", np.array2string(cexps.mean(axis=-1), precision=4))

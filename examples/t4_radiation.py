#!/usr/bin/env python
"""Full quartic T^4 longwave radiation scheme (implies dynamic 0-th order
temperatures): the quartic inner products are computed on the sorted-index
simplex and the tendency tensor is rank 5."""

import sys as _sys
import pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))


import numpy as np

from qgs_tpu.params.params import QgParams
from qgs_tpu.models.tendencies import create_tendencies
from qgs_tpu.integrators.rk import integrate_runge_kutta

# T4=True activates the full quartic Stefan-Boltzmann T^4 law without
# linearization (implies dynamic 0-th order temperatures).  The quartic
# coefficient families are computed once on the sorted-index simplex and
# scattered to all index permutations; on device the rank-5 tensor stays
# in COO form (a dense (ndim+1)^5 array would not fit at scale).
pars = QgParams({'rr': 287.e0, 'sb': 5.6e-8}, T4=True)
pars.set_params({'kd': 0.04, 'kdp': 0.04, 'n': 1.5})
pars.set_atmospheric_channel_fourier_modes(2, 2, mode='symbolic')
pars.set_oceanic_basin_fourier_modes(2, 4, mode='symbolic')

f, Df, tensor = create_tendencies(pars, return_qgtensor=True)
print("T4 tensor rank:", tensor.tensor.rank, " nnz:", tensor.tensor.nnz)

rng = np.random.default_rng(0)
x0 = rng.random(pars.ndim) * 0.01
vr = pars.variables_range
x0[vr[0]] = 0.1
x0[vr[2]] = 0.12

t, y = integrate_runge_kutta(f.batched, 0., 50., 0.01, x0, write_steps=0)
print("state after 5000 steps finite:", bool(np.isfinite(np.asarray(y)).all()))

#!/usr/bin/env python
"""Dynamic 0-th order temperature scheme: T_a0 and T_o0 become prognostic
variables and the tendency tensor becomes rank-5 (linear radiation terms)."""

import sys as _sys
import pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))


import numpy as np

from qgs_tpu.params.params import QgParams
from qgs_tpu.models.tendencies import create_tendencies
from qgs_tpu.integrators.rk import integrate_runge_kutta

# With dynamic_T=True the reference temperatures T_a0 / T_o0 stop being
# fixed parameters and become prognostic 0-th order variables; the
# radiation terms then mix up to four state variables and the tendency
# tensor becomes rank 5 (kept sparse -- only the (i,0,0,0,m) pattern
# exists).  Quartic inner products require the symbolic basis mode.
pars = QgParams({'rr': 287.e0, 'sb': 5.6e-8}, dynamic_T=True)
pars.set_params({'kd': 0.04, 'kdp': 0.04, 'n': 1.5})
pars.set_atmospheric_channel_fourier_modes(2, 2, mode='symbolic')
pars.set_oceanic_basin_fourier_modes(2, 4, mode='symbolic')

print("variables:", pars.ndim, "->", pars.var_string[:3], "...",
      pars.var_string[-3:])

f, Df, tensor = create_tendencies(pars, return_qgtensor=True)
print("tensor rank:", tensor.tensor.rank, " nnz:", tensor.tensor.nnz)

# Start the 0-th order temperatures near their expected nondimensional
# magnitudes and integrate; variables_range gives each block's index span.
rng = np.random.default_rng(0)
x0 = rng.random(pars.ndim) * 0.01
vr = pars.variables_range
x0[vr[0]] = 0.1      # T_a0 starting value (nondimensional)
x0[vr[2]] = 0.12     # T_o0

t, y = integrate_runge_kutta(f.batched, 0., 100., 0.01, x0, write_steps=100)
print("T_a0 series:", np.array2string(np.asarray(y)[vr[0], :8], precision=5))
print("final state finite:", bool(np.isfinite(np.asarray(y)).all()))

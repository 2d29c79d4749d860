"""
Trajectory ensemble statistics
==============================

Chunked ensemble averaging of user functions over trajectories
(ref ``qgs/integrators/statistics.py:7-77``): the ensemble of initial
conditions is split into ``num`` batches, each integrated (sharded across
the device mesh) and reduced with the user observables.
"""

from __future__ import annotations

import numpy as np


class TrajectoriesStatistics:
    """Ensemble-mean observables over batches of trajectories."""

    def __init__(self):
        self.ic = None
        self.integrator = None
        self.func_list = []
        self.mean_func = []

    def set_integrator(self, integrator):
        self.integrator = integrator

    def set_func_list(self, func_list):
        """Observables ``f(traj) -> array`` applied to (n_traj, ndim, n_rec)."""
        self.func_list = list(func_list)

    def set_ic(self, ic):
        self.ic = np.atleast_2d(np.asarray(ic))

    def get_ic(self):
        return self.ic

    def initialize(self, convergence_time, dt, pert_size=0.01,
                   reconvergence_time=None, number_of_trajectories=1, ic=None):
        """Spin the ensemble onto the attractor via the integrator."""
        self.integrator.initialize(convergence_time, dt, pert_size=pert_size,
                                   reconvergence_time=reconvergence_time,
                                   number_of_trajectories=number_of_trajectories,
                                   ic=ic,
                                   reconverge=reconvergence_time is not None)
        self.ic = self.integrator.ic

    def compute_stats(self, t0, t, dt, ic=None, forward=True, write_steps=1, num=1):
        """Integrate the ensemble in ``num`` chunks and average each
        observable over the trajectories of each chunk, then over chunks."""
        if ic is not None:
            self.set_ic(ic)
        n_traj = self.ic.shape[0]
        bounds = np.array_split(np.arange(n_traj), num)

        chunks = None
        for i, idx in enumerate(bounds):
            self.integrator.integrate(t0, t, dt, ic=self.ic[idx],
                                      forward=forward, write_steps=write_steps)
            _, traj = self.integrator.get_trajectories()
            if traj.ndim == 2:
                traj = traj[None]
            vals = [np.mean(f(traj), axis=0) for f in self.func_list]
            if chunks is None:
                chunks = [[v] for v in vals]
            else:
                for store, v in zip(chunks, vals):
                    store.append(v)

        self.mean_func = np.array([np.mean(np.stack(c), axis=0) for c in chunks])
        return self.mean_func

    def get_stats(self):
        return self.mean_func

"""
Multi-diagnostics
=================

Grid-composited dashboards of several diagnostics sharing one dataset, with
joint plot / movie (ref ``qgs/diagnostics/multi.py:19-1003``), and a
broadcasting list wrapper.
"""

from __future__ import annotations

import numpy as np

from qgs_tpu.diagnostics.base import Diagnostic, FieldDiagnostic, ProfileDiagnostic


class MultiDiagnostic:
    """Hold several diagnostics on an (nrows x ncols) figure grid with
    shared trajectory data."""

    def __init__(self, nrows, ncols):
        self._nrows = nrows
        self._ncols = ncols
        self._diagnostics = []
        self._positions = []
        self._plot_kwargs = []
        self._time = None
        self._data = None

    def add_diagnostic(self, diagnostic, position=None, diagnostic_kwargs=None,
                       plot_kwargs=None):
        """Register a diagnostic at a (row, col) grid position."""
        if position is None:
            position = divmod(len(self._diagnostics), self._ncols)
        self._diagnostics.append(diagnostic)
        self._positions.append(position)
        self._plot_kwargs.append(plot_kwargs or {})
        if self._data is not None:
            diagnostic.set_data(self._time, self._data)

    @property
    def diagnostics(self):
        return self._diagnostics

    def set_data(self, time, data):
        self._time = time
        self._data = data
        for d in self._diagnostics:
            d.set_data(time, data)

    def __call__(self, time, data):
        self.set_data(time, data)
        return [d.diagnostic for d in self._diagnostics]

    def plot(self, time_index=0, figsize=(16, 9)):
        """Plot every diagnostic on its grid cell."""
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=figsize)
        axes = []
        for diag, pos, pk in zip(self._diagnostics, self._positions,
                                 self._plot_kwargs):
            ax = fig.add_subplot(self._nrows, self._ncols,
                                 pos[0] * self._ncols + pos[1] + 1)
            if isinstance(diag, FieldDiagnostic):
                diag.plot(time_index=time_index, ax=ax, plot_kwargs=pk)
            elif isinstance(diag, ProfileDiagnostic):
                diag.plot(time_index=time_index, ax=ax, plot_kwargs=pk)
            else:
                diag.plot(ax=ax, plot_kwargs=pk)
            axes.append(ax)
        fig.tight_layout()
        return fig, axes

    def movie(self, output='html', filename='', writer='ffmpeg', fps=15,
              figsize=(16, 9)):
        """Joint animation of all field diagnostics."""
        import matplotlib.pyplot as plt
        from matplotlib.animation import FuncAnimation

        fields = [d for d in self._diagnostics if isinstance(d, FieldDiagnostic)]
        n_frames = min(d.diagnostic.shape[0] for d in fields) if fields else 0

        fig, axes = self.plot(time_index=0, figsize=figsize)

        def update(frame):
            for ax in axes:
                ax.clear()
            for diag, ax, pk in zip(self._diagnostics, axes, self._plot_kwargs):
                if isinstance(diag, FieldDiagnostic):
                    diag.plot(time_index=frame, ax=ax, color_bar=False,
                              plot_kwargs=pk)
            return axes

        anim = FuncAnimation(fig, update, frames=n_frames, blit=False)
        if output == 'html':
            html = anim.to_html5_video()
            plt.close(fig)
            return html
        if output == 'save':
            anim.save(filename, writer=writer, fps=fps)
            plt.close(fig)
            return filename
        return anim

    def animate(self, **kwargs):
        try:
            import ipywidgets as widgets
        except ImportError:
            return self.movie(**kwargs)

        fields = [d for d in self._diagnostics if isinstance(d, FieldDiagnostic)]
        n_frames = min(d.diagnostic.shape[0] for d in fields) if fields else 1

        def show(frame):
            self.plot(time_index=frame)

        return widgets.interactive(show, frame=widgets.IntSlider(
            min=0, max=n_frames - 1, step=1, value=0))


class FieldsDiagnosticsList:
    """Broadcast one dataset to a list of diagnostics."""

    def __init__(self, diagnostics=None):
        self._diagnostics = list(diagnostics) if diagnostics else []

    def append(self, diagnostic):
        self._diagnostics.append(diagnostic)

    def __getitem__(self, i):
        return self._diagnostics[i]

    def __len__(self):
        return len(self._diagnostics)

    def set_data(self, time, data):
        for d in self._diagnostics:
            d.set_data(time, data)

    def __call__(self, time, data):
        self.set_data(time, data)
        return [d.diagnostic for d in self._diagnostics]

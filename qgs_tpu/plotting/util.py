"""Plotting utilities (ref ``qgs/plotting/util.py:12-43``)."""

from __future__ import annotations

import numpy as np


def std_plot(x, mean, std, ax=None, **kwargs):
    """Plot a mean curve with a +/- 1 std shaded band."""
    import matplotlib.pyplot as plt

    if ax is None:
        fig = plt.figure()
        ax = fig.add_subplot(1, 1, 1)
    line, = ax.plot(x, mean, **kwargs)
    color = line.get_color()
    ax.fill_between(x, mean - std, mean + std, color=color, alpha=0.2)
    return ax

"""LMCC-curve comparison plots (reference: drawUnweight.py / drawWeight.py —
overlays of per-method NormalizedLMCC curves per real dataset)."""

from __future__ import annotations

import os
from typing import Dict, Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def read_lmcc_file(path: str) -> np.ndarray:
    """Read a NormalizedLMCC file; the trailing two lines are score mean/std."""
    vals = [float(x) for x in open(path).read().split()]
    return np.asarray(vals[:-2] if len(vals) > 2 else vals)


def plot_lmcc_curves(
    curves: Dict[str, str],
    out_path: str,
    title: str = "",
    weighted: bool = False,
):
    """curves: {method label: NormalizedLMCC file path}.  X axis is the removed
    fraction (unit cost) or cumulative cost (weighted variant)."""
    fig, ax = plt.subplots(figsize=(5, 4))
    for label, path in curves.items():
        y = read_lmcc_file(path)
        x = np.arange(len(y)) / max(len(y) - 1, 1)
        ax.plot(x, y, label=label, linewidth=1.2)
    ax.set_xlabel("removed cost fraction" if weighted else "removed node fraction")
    ax.set_ylabel("normalized LMCC")
    if title:
        ax.set_title(title)
    ax.legend(fontsize=8)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1.02)
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=150)
    plt.close(fig)

"""Shared tidy-frame plotting helpers for the BO post-hoc tools.

Both :mod:`collate` and :mod:`classify_posthoc` reduce an experiment
results tree to one *long-format* DataFrame — one row per
``(benchmark, dataset, method, source, trial)`` — and every figure below
is a groupby over that frame.  (The reference tools walk nested dicts of
per-cell tuples instead; this module is a from-scratch design around
pandas groupby, not a port.)

Figure files are named ``<benchmark>_<dataset>_<...>.png`` so downstream
expectations about the output directory hold.
"""
from __future__ import annotations

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

CELL = ['benchmark', 'dataset']
SERIES = ['method', 'source']


def _series_label(key) -> str:
    parts = [str(p) for p in (key if isinstance(key, tuple) else (key,)) if p]
    if len(parts) >= 2:
        return f'{parts[0]} ({parts[1]})'
    return parts[0] if parts else ''


def _each_cell(frame: pd.DataFrame):
    for (bench, dset), cell in frame.groupby(CELL, sort=True):
        fig, ax = plt.subplots()
        ax.set_title(f'{bench}/{dset}')
        yield (bench, dset), cell, fig, ax
        plt.close(fig)


def _series_in(cell: pd.DataFrame):
    keys = [k for k in SERIES if k in cell.columns]
    return cell.groupby(keys, sort=True) if keys else [('', cell)]


def trial_lines(frame: pd.DataFrame, quantity: str, outdir,
                x: str = 'trial', name: str | None = None):
    """One figure per (benchmark, dataset): ``quantity`` against ``x`` with
    a line per method/source series.  ``name`` overrides the
    ``<quantity>`` part of the filename."""
    if quantity not in frame.columns:
        return
    name = name or quantity
    for (bench, dset), cell, fig, ax in _each_cell(frame):
        drew = False
        for key, series in _series_in(cell):
            s = series.dropna(subset=[quantity])
            if s.empty:
                continue
            s = s.sort_values(x)
            ax.plot(s[x], s[quantity], label=_series_label(key))
            drew = True
        ax.set_xlabel(x.capitalize())
        ax.set_ylabel(quantity)
        if drew:
            ax.legend()
        fig.savefig(f'{outdir}/{bench}_{dset}_{name}.png')


def scatter_with_r(frame: pd.DataFrame, x: str, y: str, outdir):
    """Per-cell scatter of ``y`` vs ``x`` with the Pearson r in the title."""
    if x not in frame.columns or y not in frame.columns:
        return
    for (bench, dset), cell, fig, ax in _each_cell(frame):
        pts = cell.dropna(subset=[x, y])
        for key, series in _series_in(pts):
            ax.scatter(series[x], series[y], label=_series_label(key))
        if len(pts) >= 2:
            r = np.corrcoef(pts[x].astype(float), pts[y].astype(float))[0, 1]
            ax.set_title(f'{bench}/{dset} R2: {round(float(r), 2)}')
        ax.set_xlabel(x.capitalize())
        ax.set_ylabel(y)
        if len(pts):
            ax.legend()
        fig.savefig(f'{outdir}/{bench}_{dset}_{x}_{y}.png')


def series_bars(frame: pd.DataFrame, quantity: str, outdir,
                statistic: str = 'max', suffix: str | None = None):
    """Per-cell bar chart: one bar per method/source series, showing the
    ``statistic`` ('max'/'median'/...) of ``quantity`` over its trials."""
    if quantity not in frame.columns:
        return
    suffix = f'_{statistic}_bar' if suffix is None else suffix
    for (bench, dset), cell, fig, ax in _each_cell(frame):
        labels, values = [], []
        for key, series in _series_in(cell):
            col = series[quantity].dropna()
            if col.empty:
                continue
            labels.append(_series_label(key))
            values.append(getattr(col, statistic)())
        for label, v in zip(labels, values):
            ax.bar(label, v, label=label)
        ax.set_xlabel('Method')
        ax.set_ylabel(quantity)
        ax.set_xticks([])
        if labels:
            ax.legend(loc='center right')
        fig.savefig(f'{outdir}/{bench}_{dset}_{quantity}{suffix}.png')


def bars_at_best(frame: pd.DataFrame, select_by: str, show: str, outdir):
    """Per-cell bar chart of ``show`` taken at each series' best
    (``select_by``-maximising) trial."""
    if select_by not in frame.columns or show not in frame.columns:
        return
    for (bench, dset), cell, fig, ax in _each_cell(frame):
        drew = False
        for key, series in _series_in(cell):
            s = series.dropna(subset=[select_by, show])
            if s.empty:
                continue
            row = s.loc[s[select_by].idxmax()]
            label = _series_label(key)
            ax.bar(label, row[show], label=label)
            drew = True
        ax.set_xlabel('Method')
        ax.set_ylabel(show)
        ax.set_xticks([])
        if drew:
            ax.legend(loc='center right')
        fig.savefig(f'{outdir}/{bench}_{dset}_{show}_bar.png')

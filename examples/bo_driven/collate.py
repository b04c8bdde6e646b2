"""Collate results across one or more experiment output directories.

Covers the reference collate tool's outputs (per-trial line plots, max /
median bar plots, UE-time-at-best-sensitivity bars, and a console summary
— reference ``examples/bo_driven/collate.py``) with a different
architecture: the whole tree is flattened into ONE long-format DataFrame
(one row per benchmark × dataset × method × source × trial) and every
summary/figure is a pandas groupby over it (:mod:`plotting`).
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))
from pathlib import Path

import click
import pandas as pd

import plotting

# metric preference chain for the headline "UE distance" quantity
_METRIC_FALLBACK = ['wasserstein_distance', 'jensen_shannon_distance',
                    'sensitivity', 'percentile_score', 'score_dist']


def load_results_frame(inputs):
    """Flatten ``<input>/<benchmark>/<dataset>/<method>/bo_trial_*`` trees
    into one long DataFrame.  Returns ``(frame, missing)`` where missing
    lists (source, benchmark, dataset, method) cells with no finished
    trial."""
    from nnueehcs_tpu.utility import find_latest_finished_trial
    frames, missing = [], []
    for input_dir in map(Path, inputs):
        source = input_dir.name
        for method_dir in sorted(input_dir.glob('*/*/*')):
            if not method_dir.is_dir():
                continue
            bench, dset, method = method_dir.parts[-3:]
            trial_num, trial_dir = find_latest_finished_trial(method_dir)
            if trial_dir is None:
                missing.append((source, bench, dset, method))
                continue
            df = pd.read_csv(Path(trial_dir) / 'trial_results.csv')
            df['source'] = source
            df['benchmark'] = bench
            df['dataset'] = dset
            df['method'] = method
            df['latest_trial_dir'] = str(trial_dir)
            frames.append(df)
    frame = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        columns=['source', 'benchmark', 'dataset', 'method', 'trial'])
    return frame, missing


def headline_metric(frame: pd.DataFrame) -> str | None:
    """First preference-chain metric with any finite value in ``frame``
    (applied per cell/series, so mixed-method trees all get summarised)."""
    for name in _METRIC_FALLBACK:
        if name in frame.columns and frame[name].notna().any():
            return name
    return None


def summarize(frame: pd.DataFrame, missing) -> pd.DataFrame:
    """Console summary: per cell/series, the headline metric's best trial,
    best value and median (the fallback chain is resolved per series, so a
    method reporting only e.g. percentile_score still appears)."""
    rows = []
    if len(frame):
        for key, g in frame.groupby(
                ['benchmark', 'dataset', 'method', 'source'], sort=True):
            metric = headline_metric(g)
            if metric is None:
                continue
            col = g.dropna(subset=[metric])
            best = col.loc[col[metric].idxmax()]
            rows.append({
                'benchmark': key[0], 'dataset': key[1], 'method': key[2],
                'source': key[3], 'trials': len(g), 'metric': metric,
                'best_trial': int(best.get('trial', -1)),
                'best_value': round(float(best[metric]), 2),
                'median_value': round(float(col[metric].median()), 2),
            })
    summary = pd.DataFrame(rows)
    if len(summary):
        print(summary.to_string(index=False))
    for source, bench, dset, method in missing:
        print(f'{bench}/{dset}/{method} [{source}]: no finished trial')
    return summary


@click.command()
@click.option('--input', 'inputs', type=click.Path(exists=True),
              multiple=True,
              help='Path to directory containing experiment results')
@click.option('--output', type=click.Path(), help='Path to output directory')
def main(inputs, output):
    output = Path(output)
    output.mkdir(parents=True, exist_ok=True)

    frame, missing = load_results_frame(inputs)
    summary = summarize(frame, missing)
    if len(summary):
        summary.to_csv(output / 'summary.csv', index=False)

    plotting.trial_lines(frame, 'sensitivity', output)
    plotting.series_bars(frame, 'sensitivity', output)
    plotting.series_bars(frame, 'sensitivity', output, statistic='median')
    plotting.trial_lines(frame, 'ue_time', output)
    plotting.trial_lines(frame, 'ue_throughput', output)
    plotting.bars_at_best(frame, select_by='sensitivity', show='ue_time',
                          outdir=output)
    # the headline metric may differ from sensitivity (BO-time metrics)
    metric = headline_metric(frame)
    if metric and metric != 'sensitivity':
        plotting.trial_lines(frame, metric, output)
        plotting.series_bars(frame, metric, output)


if __name__ == '__main__':
    main()

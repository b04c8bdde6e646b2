#!/usr/bin/env python
"""Summarise a completed BO cell for docs/EXPERIMENTS.md.

Aggregates the per-trial ``trial_results.csv`` rows of one
(benchmark x dataset x method) cell — either a results-tree method dir
(``.../results/<bench>/<dset>/<method>``, one row per ``bo_trial_*``) or a
banked artifacts CSV — and prints the quantities the EXPERIMENTS.md cell
tables record (success count, train-time stats, UE throughput range,
best percentile_score, observed Pareto candidates).

Usage:  python cell_summary.py <method_dir_or_csv> [...]
"""
import sys
from pathlib import Path

import pandas as pd


def load_cell(path):
    p = Path(path)
    if p.is_file():
        return pd.read_csv(p)
    # trial_results.csv is CUMULATIVE (each bo_trial_N dir holds the full
    # history through trial N, reference convention) — read the latest
    trials = sorted(p.glob('bo_trial_*/trial_results.csv'),
                    key=lambda q: int(q.parent.name.rsplit('_', 1)[1]))
    if not trials:
        raise SystemExit(f'no trial_results.csv under {p}')
    return pd.read_csv(trials[-1])


def fmt_thr(v):
    return f'{v / 1e6:.1f} M/s' if v == v else 'n/a'


def summarise(path):
    df = load_cell(path)
    ok = df[~df['failed'].astype(bool)] if 'failed' in df else df
    print(f'== {path}')
    print(f'trials: {len(ok)}/{len(df)} successful')
    if 'train_time' in ok and ok['train_time'].notna().any():
        tt = ok['train_time'].astype(float)
        print(f'train_time s: mean {tt.mean():.1f}, median {tt.median():.1f},'
              f' max {tt.max():.1f}  (total {tt.sum() / 3600:.2f} h)')
    if 'ue_time' in ok and ok['ue_time'].notna().any():
        print(f"ue_time s: mean {ok['ue_time'].astype(float).mean():.3f}")
    thr = ok.get('uncertainty_estimating_throughput')
    if thr is not None and thr.notna().any():
        thr = thr.astype(float)
        print(f'UE throughput: {fmt_thr(thr.min())} - {fmt_thr(thr.max())}'
              f' (mean {fmt_thr(thr.mean())})')
    ps = ok.get('percentile_score')
    if ps is not None and ps.notna().any():
        ps = ps.astype(float)
        best = ok.loc[ps.idxmin()]
        hypers = [c for c in ok.columns if c in
                  ('num_models', 'num_samples', 'dropout_percent',
                   'num_anchors', 'bandwidth', 'rtol', 'k', 'min_variance',
                   'learning_rate', 'batch_size', 'weight_decay')]
        hv = ', '.join(f'{h}={best[h]}' for h in hypers
                       if pd.notna(best.get(h)))
        print(f'best percentile_score: {ps.min():.6g} (trial '
              f'{int(best["trial"])}: {hv})')
        # observed-Pareto candidates: minimal score for maximal throughput
        if thr is not None:
            cand = ok.assign(_s=ps, _t=thr).sort_values('_s')
            front, tmax = [], -1.0
            for _, r in cand.iterrows():
                if r['_t'] > tmax:
                    front.append((int(r['trial']), float(r['_s']),
                                  float(r['_t'])))
                    tmax = r['_t']
            fr = ', '.join(f'trial {t}: ({s:.4g}, {fmt_thr(x)})'
                           for t, s, x in front[:4])
            print(f'observed Pareto (score asc): {fr}')
    fails = df[df['failed'].astype(bool)] if 'failed' in df else df.iloc[:0]
    for _, r in fails.iterrows():
        print(f'  FAILED trial {int(r["trial"])}: '
              f'{str(r.get("error_message"))[:100]}')
    print()


if __name__ == '__main__':
    for a in sys.argv[1:]:
        summarise(a)

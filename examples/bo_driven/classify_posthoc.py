"""Post-hoc ID/OOD classification over every saved BO-trial model.

Covers the reference tool's outputs (per-trial sensitivity lines and the
sensitivity-vs-UE-distance scatter — reference
``examples/bo_driven/classify_posthoc.py``) with the same tidy-frame
architecture as :mod:`collate`: every (trial, model) classification
becomes one row of a long DataFrame, and figures are groupbys over it
(:mod:`plotting`).
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))
from pathlib import Path

import click
import numpy as np
import pandas as pd
import yaml

from nnueehcs_tpu.classification import PercentileBasedIdOodClassifier
from nnueehcs_tpu.data_utils import (get_dataset_from_config,
                                     prepare_dataset_for_use)
from nnueehcs_tpu.training import load_model
from nnueehcs_tpu.utility import find_latest_finished_trial

import plotting

_KEEP = ('sensitivity', 'specificity', 'fpr', 'fnr')


def load_cell_datasets(ds_cfg, dataset_name):
    """Scaled (ID, OOD) pair for one dataset split; OOD is scaled by the
    ID statistics first (the reference's ordering contract)."""
    ds_id = get_dataset_from_config(ds_cfg, dataset_name + '_id')
    ds_ood = get_dataset_from_config(ds_cfg, dataset_name + '_ood')
    ds_ood = prepare_dataset_for_use(ds_ood, {'scaling': True},
                                     scaling_dset=ds_id)
    ds_id = prepare_dataset_for_use(ds_id, {'scaling': True})
    return ds_id, ds_ood


def classify_trial_models(method_dir: Path, ds_id, ds_ood, threshold,
                          ue_dist_column: str):
    """One classification row per saved bo_trial_N model under
    ``method_dir``; the trial's BO-time UE-distance column is joined in
    for the correlation scatter."""
    latest, trial_dir = find_latest_finished_trial(method_dir)
    if trial_dir is None:
        return None
    bo_metrics = pd.read_csv(Path(trial_dir) / 'trial_results.csv')
    bo_metrics = bo_metrics.set_index('trial') \
        if 'trial' in bo_metrics.columns else bo_metrics

    classifier = PercentileBasedIdOodClassifier(threshold)
    id_data = (np.asarray(ds_id.input), np.asarray(ds_id.output))
    ood_data = (np.asarray(ds_ood.input), np.asarray(ds_ood.output))

    rows = []
    for trial in range(latest + 1):
        model_file = method_dir / f'bo_trial_{trial}' / 'model.pth'
        if not model_file.exists():
            continue
        model = load_model(str(model_file)).eval()
        scores = classifier.evaluate(model, id_data, ood_data)
        row = {'trial': trial}
        row.update({k: scores[k] for k in _KEEP if k in scores})
        try:
            row['ue_dist'] = float(bo_metrics.loc[trial, ue_dist_column])
        except (KeyError, ValueError, TypeError):
            row['ue_dist'] = float('nan')
        print(trial, row)
        rows.append(row)
    return pd.DataFrame(rows) if rows else None


@click.command()
@click.option('--input', type=click.Path(exists=True),
              help='Path to directory containing experiment results')
@click.option('--config', type=str, help='Path to config file')
@click.option('--output', type=click.Path(), help='Path to output directory')
@click.option('--percentile', '-p', type=float, default=0.8,
              help='Percentile score threshold for ID/OOD split.')
@click.option('--platform', default=None,
              help="Pin the JAX platform (e.g. 'cpu')")
@click.option('--ue_dist_column', default='percentile_score',
              help='trial_results.csv column to correlate sensitivity with')
@click.option('--benchmarks', default=None,
              help='Comma-separated benchmark allowlist (classify a subset '
                   'of a large tree, e.g. to split the pass across hosts)')
@click.option('--methods', default=None,
              help='Comma-separated UQ-method allowlist (a mixed tree holds '
                   'config_kde and config_full cells; each pass must pair '
                   'methods with the config they trained under)')
def main(input, config, output, percentile, ue_dist_column, platform,
         benchmarks, methods):
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)
    indir = Path(input)
    output = Path(output)
    output.mkdir(parents=True, exist_ok=True)
    with open(config) as f:
        config = yaml.safe_load(f)

    allow = set(benchmarks.split(',')) if benchmarks else None
    allow_methods = set(methods.split(',')) if methods else None
    frames = []
    dataset_cache = {}
    for method_dir in sorted(indir.glob('*/*/*')):
        if not method_dir.is_dir():
            continue
        bench, dset, method = method_dir.parts[-3:]
        if bench not in config['benchmarks']:
            continue
        if allow is not None and bench not in allow:
            continue
        if allow_methods is not None and method not in allow_methods:
            continue
        # per-cell banking: each (benchmark, dataset, method) classification
        # lands in its own CSV as soon as it finishes, so an interrupted
        # pass resumes instead of redoing hundreds of model loads
        cell_csv = output / f'cell_{bench}_{dset}_{method}.csv'
        if cell_csv.exists():
            print(f'resuming: {cell_csv} exists, skipping {bench}/{dset}/'
                  f'{method}')
            frames.append(pd.read_csv(cell_csv))
            continue
        if (bench, dset) not in dataset_cache:
            ds_cfg = config['benchmarks'][bench]['datasets']
            dataset_cache[(bench, dset)] = load_cell_datasets(ds_cfg, dset)
        ds_id, ds_ood = dataset_cache[(bench, dset)]
        df = classify_trial_models(method_dir, ds_id, ds_ood, percentile,
                                   ue_dist_column)
        if df is None:
            continue
        df['benchmark'] = bench
        df['dataset'] = dset
        df['method'] = method
        df.to_csv(cell_csv, index=False)
        frames.append(df)

    if not frames:
        print('no finished trials found')
        return
    frame = pd.concat(frames, ignore_index=True)
    frame.to_csv(output / 'classification.csv', index=False)
    # filename keeps the reference's x-axis component
    # (``<bench>_<dset>_trial_sensitivity.png``) so it never collides with
    # collate's BO-metric sensitivity plot in a shared output directory
    plotting.trial_lines(frame, 'sensitivity', output,
                         name='trial_sensitivity')
    plotting.scatter_with_r(frame, x='ue_dist', y='sensitivity',
                            outdir=output)


if __name__ == '__main__':
    main()

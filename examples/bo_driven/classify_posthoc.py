"""Post-hoc ID/OOD classification over every saved BO-trial model, with
sensitivity-vs-trial and sensitivity-vs-UE-distance plots
(reference ``examples/bo_driven/classify_posthoc.py``)."""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))
import re
from pathlib import Path

import click
import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import yaml

from nnueehcs_tpu.classification import PercentileBasedIdOodClassifier
from nnueehcs_tpu.data_utils import (get_dataset_from_config,
                                     prepare_dataset_for_use)
from nnueehcs_tpu.training import load_model


def get_final_bo_trial(result_files_or_dir):
    """Latest finished trial via the shared results-tree helper."""
    from nnueehcs_tpu.utility import find_latest_finished_trial
    if isinstance(result_files_or_dir, (list, tuple)):
        if not result_files_or_dir:
            return None, None
        method_dir = Path(result_files_or_dir[0]).parent
    else:
        method_dir = Path(result_files_or_dir)
    return find_latest_finished_trial(method_dir)


def get_dataset(dataset_cfg, dataset_name, is_ood=False):
    suffix = '_ood' if is_ood else '_id'
    return get_dataset_from_config(dataset_cfg, dataset_name + suffix)


def do_classification(model, id_dset, ood_dset, threshold):
    classifier = PercentileBasedIdOodClassifier(threshold)
    res = classifier.evaluate(model,
                              (np.asarray(id_dset.input),
                               np.asarray(id_dset.output)),
                              (np.asarray(ood_dset.input),
                               np.asarray(ood_dset.output)))
    # keep only scalar metrics for the results table
    return {k: v for k, v in res.items()
            if k in ('sensitivity', 'specificity', 'fpr', 'fnr')}


def pearson_r(x, y):
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    xc = x - x.mean()
    yc = y - y.mean()
    denom = np.sqrt((xc * xc).sum() * (yc * yc).sum())
    return float((xc * yc).sum() / denom) if denom else float('nan')


def plot_quantity(results, quantity, output, x_axis='trial', scatter=False):
    for bench, datasets in results.items():
        for dataset, methods in datasets.items():
            fig, ax = plt.subplots()
            ax.set_title(f'{bench}/{dataset}')
            for method, tresults in methods.items():
                if x_axis not in tresults.columns:
                    tresults = tresults.reset_index()
                if scatter:
                    r2 = round(pearson_r(tresults[x_axis],
                                         tresults[quantity]), 2)
                    ax.scatter(tresults[x_axis], tresults[quantity],
                               label=method)
                    ax.set_title(f'{bench}/{dataset} R2: {r2}')
                else:
                    ax.plot(tresults[x_axis], tresults[quantity],
                            label=method)
                ax.set_xlabel(x_axis.capitalize())
                ax.set_ylabel(quantity)
            ax.legend()
            fig.savefig(f'{output}/{bench}_{dataset}_{x_axis}_{quantity}.png')
            plt.close(fig)


@click.command()
@click.option('--input', type=click.Path(exists=True),
              help='Path to directory containing experiment results')
@click.option('--config', type=str, help='Path to config file')
@click.option('--output', type=click.Path(), help='Path to output directory')
@click.option('--percentile', '-p', type=float, default=0.8,
              help='Percentile score threshold for ID/OOD split.')
@click.option('--ue_dist_column', default='percentile_score',
              help='trial_results.csv column to correlate sensitivity with')
def main(input, config, output, percentile, ue_dist_column):
    indir = Path(input)
    output = Path(output)
    output.mkdir(parents=True, exist_ok=True)

    with open(config) as f:
        config = yaml.safe_load(f)

    results = {}
    for benchdir in indir.iterdir():
        if not benchdir.is_dir() or benchdir.name not in config['benchmarks']:
            continue
        results[benchdir.name] = {}
        for datasetdir in benchdir.iterdir():
            if not datasetdir.is_dir():
                continue
            benchmark, dataset = benchdir.name, datasetdir.name
            ds_cfg = config['benchmarks'][benchmark]['datasets']
            ds_id = get_dataset(ds_cfg, dataset)
            ds_ood = get_dataset(ds_cfg, dataset, is_ood=True)
            ds_ood = prepare_dataset_for_use(ds_ood, {'scaling': True},
                                             scaling_dset=ds_id)
            ds_id = prepare_dataset_for_use(ds_id, {'scaling': True})
            results[benchdir.name][datasetdir.name] = {}
            for methoddir in datasetdir.iterdir():
                if not methoddir.is_dir():
                    continue
                trial_num, trial_file = get_final_bo_trial(methoddir)
                if trial_file is None:
                    continue
                tresults_csv = pd.read_csv(f'{trial_file}/trial_results.csv')
                rows = {}
                for trial in range(trial_num + 1):
                    model_file = methoddir / f'bo_trial_{trial}' / 'model.pth'
                    if not model_file.exists():
                        continue
                    model = load_model(str(model_file))
                    model.eval()
                    tres = do_classification(model, ds_id, ds_ood, percentile)
                    tres['trial'] = trial
                    match = tresults_csv.query('trial == @trial')
                    if len(match) and ue_dist_column in match.columns:
                        tres['ue_dist'] = match[ue_dist_column].values[0]
                    else:
                        tres['ue_dist'] = float('nan')
                    print(trial, tres)
                    rows[trial] = tres
                if rows:
                    df = pd.DataFrame.from_dict(rows, orient='index')
                    df.index.name = 'trial_idx'
                    results[benchdir.name][datasetdir.name][methoddir.name] = df

    plot_quantity(results, 'sensitivity', output)
    plot_quantity(results, 'sensitivity', output, x_axis='ue_dist',
                  scatter=True)


if __name__ == '__main__':
    main()

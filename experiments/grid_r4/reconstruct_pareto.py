"""Reconstruct the Pareto-optimal trial models of a banked cell.

Two host re-provisions (r3, r4-s1) destroyed live results trees before
``evaluate_metrics`` could run over them.  The banked restart contract
(``experiments/full_cell/artifacts/<bench>_<method>_<dset>/``) preserves
``trial_results.csv`` — every BO-drawn hyperparameter of every trial —
and training is deterministic given hyperparameters (``Trainer`` seeds
from config ``seed`` default 42, `nnueehcs_tpu/training/trainer.py:127`;
trial number never enters the seed).  So the Pareto-optimal models can
be reconstructed exactly by retraining just those trials, at a small
fraction of the cost of re-running the whole 50-trial cell — and more
faithfully: a full rerun is a *new* BO trajectory, while this retrains
the *original* Pareto trials' hyperparameters.

Emits a minimal results tree compatible with
``examples/metric_evaluation/evaluate_metrics.py`` (reference contract:
``/root/reference/examples/metric_evaluation/evaluate_metrics.py``):

    <tree>/<bench>/<dset>/<method>/bo_trial_<max>/trial_results.csv
    <tree>/<bench>/<dset>/<method>/bo_trial_<p>/model.pth   (per Pareto p)

Usage:
    python reconstruct_pareto.py --cell bench:method:dset \
        --config examples/bo_driven/config_full.yaml [--platform cpu]
"""
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / 'examples' / 'metric_evaluation'))

import click
import numpy as np
import pandas as pd
import yaml


def _param_names_and_casts(config, method):
    """(name -> cast) for every BO-drawn parameter of this cell."""
    space = (list(config['uq_methods'][method].get('parameter_space', []))
             + list(config['training']['parameter_space']))
    casts = {}
    for p in space:
        if p['type'] == 'fixed':
            casts[p['name']] = (type(p['value']), p['value'])
        elif p['type'] == 'choice':
            casts[p['name']] = (type(p['values'][0]), None)
        else:
            lo, hi = p['bounds']
            is_int = isinstance(lo, int) and isinstance(hi, int)
            casts[p['name']] = (int if is_int else float, None)
    return casts


def _trial_params(row, casts):
    params = {}
    for name, (cast, fixed_default) in casts.items():
        if name in row.index and not pd.isna(row[name]):
            v = row[name]
            params[name] = (int(round(float(v))) if cast is int
                            else cast(v))
        elif fixed_default is not None:
            params[name] = fixed_default
        else:
            raise ValueError(f'parameter {name} absent from trial row '
                             f'and has no fixed default')
    return params


@click.command()
@click.option('--cell', required=True, help='bench:method:dset')
@click.option('--config', 'config_file', required=True,
              type=click.Path(exists=True))
@click.option('--artifacts', default='experiments/full_cell/artifacts',
              type=click.Path(exists=True))
@click.option('--tree', default='experiments/grid_r4/posthoc_tree',
              help='output results tree (evaluate_metrics --results_dir)')
@click.option('--banked', default=None,
              help='banked dir name override (legacy pre-r3 binomial_options '
                   'cells are banked without the benchmark prefix)')
@click.option('--platform', default=None)
def main(cell, config_file, artifacts, tree, banked, platform):
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)

    bench, method, dset = cell.split(':')
    banked = REPO / artifacts / (banked or f'{bench}_{method}_{dset}')
    banked_csv = banked / 'trial_results.csv'
    if not banked_csv.exists():
        raise SystemExit(f'no banked trial_results.csv at {banked_csv}')

    with open(REPO / config_file) as f:
        config = yaml.safe_load(f)

    cell_dir = Path(tree) / bench / dset / method
    cell_dir.mkdir(parents=True, exist_ok=True)

    res = pd.read_csv(banked_csv)
    max_trial = int(res['trial'].max())
    anchor_dir = cell_dir / f'bo_trial_{max_trial}'
    anchor_dir.mkdir(exist_ok=True)
    shutil.copy2(banked_csv, anchor_dir / 'trial_results.csv')

    # Pareto selection: byte-identical logic to the post-hoc evaluator so
    # the reconstructed set is exactly the set evaluate_metrics will ask for
    from evaluate_metrics import find_pareto_optimal_runs, get_evaluators
    from nnueehcs_tpu.utility import ResultsComposite

    composite = ResultsComposite(str(Path(tree)))
    inst = composite.get_results_instance(bench, dset, method,
                                          f'bo_trial_{max_trial}')
    train_eval_metrics = [
        ev.metrics[0]
        for ev in get_evaluators(config['bo_config']['evaluation_metric'])]
    pareto = find_pareto_optimal_runs(inst, train_eval_metrics)
    trials = sorted({int(r['trial']) for r in pareto})
    print(f'{cell}: reconstructing {len(trials)} Pareto trials {trials}')

    from nnueehcs_tpu.driver import (build_model, get_trainer,
                                     enable_compilation_cache)
    from nnueehcs_tpu.data_utils import get_dataset, prepare_dataset_for_use
    from nnueehcs_tpu.training import DataLoader

    enable_compilation_cache()
    casts = _param_names_and_casts(config, method)
    training_cfg = dict(config['training'])
    training_cfg.pop('parameter_space', None)
    model_cfg = config['benchmarks'][bench]['model']
    dataset_cfg = config['benchmarks'][bench]['datasets']

    rows = {int(r['trial']): r for _, r in res.iterrows()}
    for t in trials:
        out_dir = cell_dir / f'bo_trial_{t}'
        if (out_dir / 'model.pth').exists():
            print(f'bo_trial_{t}: model.pth already present, skipping')
            continue
        params = _trial_params(rows[t], casts)
        uq_config = {k: dict(v) for k, v in config['uq_methods'].items()}
        uq_config[method].pop('parameter_space', None)
        uq_config[method].pop('eval_precision', None)
        tcfg = dict(training_cfg)
        tcfg['learning_rate'] = params.pop('learning_rate')
        tcfg['batch_size'] = params.pop('batch_size')
        tcfg['weight_decay'] = params.pop('weight_decay', 0.0)
        uq_config[method].update(params)
        print(f'bo_trial_{t}: params {params}, lr={tcfg["learning_rate"]} '
              f'bs={tcfg["batch_size"]}')

        # identical construction path to the BO loop
        # (nnueehcs_tpu/driver.py run_bo_experiment)
        dset_obj = get_dataset(dataset_cfg, dset)
        dset_obj = prepare_dataset_for_use(dset_obj, tcfg)
        model = build_model(model_cfg, uq_config, method, tcfg)
        model.to(dset_obj.dtype)
        trainer = get_trainer(dict(config['trainer']), bench, model, method,
                              dset, version=f'bo_trial_{t}', log_dir=tree)
        train_dl = DataLoader(dset_obj, batch_size=tcfg['batch_size'],
                              shuffle=True, drop_last=True)
        test_dl = DataLoader(dset_obj, batch_size=tcfg['batch_size'],
                             shuffle=False)
        t0 = time.time()
        trainer.fit(model, train_dl, test_dl)
        print(f'bo_trial_{t}: trained in {time.time() - t0:.1f}s '
              f'-> {trainer.logger.log_dir}/model.pth')
        got = Path(trainer.logger.log_dir) / 'model.pth'
        if Path(trainer.logger.log_dir).resolve() != out_dir.resolve():
            raise SystemExit(f'trainer logdir {trainer.logger.log_dir} != '
                             f'expected {out_dir}')
        if not got.exists():
            raise SystemExit(f'training finished but {got} missing')
    print(f'RECONSTRUCT_DONE {cell}')


if __name__ == '__main__':
    main()

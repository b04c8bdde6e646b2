"""Post-hoc application of the full metric list to saved BO-trial models.

Walks the results tree, selects the Pareto-optimal (or all) runs per
(benchmark, dataset, method) using the BO objectives recorded in
``trial_results.csv``, reloads each ``model.pth`` bundle and re-evaluates
``evaluation.metrics`` from the config; emits a tidy CSV
``[benchmark, dataset, method, trial, metric, objective, value]`` —
the same contract as the reference
(``/root/reference/examples/metric_evaluation/evaluate_metrics.py``).
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))
from pathlib import Path

import click
import numpy as np
import pandas as pd
import yaml

from nnueehcs_tpu.evaluation import get_evaluator
from nnueehcs_tpu.utility import ResultsComposite, ResultsInstance
from nnueehcs_tpu.data_utils import get_dataset, prepare_dataset_for_use
from nnueehcs_tpu.training import load_model


def get_evaluators(metrics):
    return [get_evaluator(metric) for metric in metrics]


def get_latest_finished_trial(composite, benchmark, dataset_name, method):
    """Latest trial with results; returns None when no trial has finished
    (e.g. a cell that crashed before its first trial_results.csv)."""
    from nnueehcs_tpu.utility import find_latest_finished_trial
    method_dir = Path(composite.results_dir) / benchmark / dataset_name / method
    num, trial_dir = find_latest_finished_trial(method_dir)
    if trial_dir is None:
        return None
    return composite.get_results_instance(benchmark, dataset_name, method,
                                          trial_dir.name)


def get_benchmark_dataset_pairs(composite, benchmark=None, dataset=None):
    pairs = []
    benchmarks = [benchmark] if benchmark \
        else list(composite.get_benchmark_names())
    for bench in benchmarks:
        datasets = [dataset] if dataset \
            else list(composite.get_dataset_names(bench))
        for ds in datasets:
            if list(composite.get_method_names(bench, ds)):
                pairs.append((bench, ds))
            else:
                print(f'Warning: Skipping {bench}/{ds} - no methods found')
    return pairs


def prepare_datasets(dataset_cfg, dataset_name, training_cfg):
    dataset_id = get_dataset(dataset_cfg, dataset_name)
    dataset_ood = get_dataset(dataset_cfg, dataset_name, is_ood=True)
    dataset_ood = prepare_dataset_for_use(dataset_ood, training_cfg,
                                          scaling_dset=dataset_id)
    dataset_id = prepare_dataset_for_use(dataset_id, training_cfg)
    return dataset_id, dataset_ood


def evaluate_model_metrics(model, dataset_id, dataset_ood, evaluators):
    results = []
    for metric in evaluators.metrics:
        print(f'Evaluating with {metric.get_name()}')
        result = metric.evaluate(model,
                                 (np.asarray(dataset_id.input),
                                  np.asarray(dataset_id.output)),
                                 (np.asarray(dataset_ood.input),
                                  np.asarray(dataset_ood.output)))
        for objective_name, objective_value in result.items():
            results.append([metric.get_name(), objective_name,
                            objective_value])
    return results


def find_all_training_runs(results_instance: ResultsInstance):
    res = pd.read_csv(results_instance.get_trial_results_file())
    return [row for _, row in res.iterrows()]


def is_pareto_efficient(costs):
    is_efficient = np.ones(costs.shape[0], dtype=bool)
    for i, c in enumerate(costs):
        if is_efficient[i]:
            is_efficient[is_efficient] = (
                np.any(costs[is_efficient] < c, axis=1)
                | np.all(costs[is_efficient] == c, axis=1))
    return is_efficient


def find_pareto_optimal_runs(results_instance: ResultsInstance,
                             train_eval_metrics):
    res = pd.read_csv(results_instance.get_trial_results_file())

    # Failed trials are recorded as NaN-metric rows (driver failure
    # contract). NaNs compare False on both sides of the Pareto test, so a
    # single failure row would mark EVERY row non-efficient (the reference's
    # is_pareto_efficient at evaluate_metrics.py:148-164 has the same
    # behaviour); drop them before selecting runs.
    if 'failed' in res.columns:
        res = res[res['failed'] != True]  # noqa: E712 (column may be object-typed)
    for metric in train_eval_metrics:
        name = metric.get_metrics()[0]
        if name in res.columns:
            res = res[res[name].notna()]
    res = res.reset_index(drop=True)
    if len(res) == 0:
        print('Found 0 Pareto-optimal runs out of 0 successful runs')
        return []

    if len(train_eval_metrics) == 1:
        metric = train_eval_metrics[0]
        name = metric.get_metrics()[0]
        if metric.get_objectives()[0]['type'] == 'maximize':
            best = res[name].max()
        else:
            best = res[name].min()
        return [row for _, row in res[res[name] == best].iterrows()]

    metric_names, directions = [], []
    for metric in train_eval_metrics:
        metric_names.append(metric.get_metrics()[0])
        directions.append(
            1 if metric.get_objectives()[0]['type'] == 'maximize' else -1)

    costs = np.zeros((len(res), len(metric_names)))
    for i, name in enumerate(metric_names):
        costs[:, i] = res[name].values * -directions[i]

    mask = is_pareto_efficient(costs)
    pareto_runs = [row for i, (_, row) in enumerate(res.iterrows())
                   if mask[i]]
    print(f'Found {len(pareto_runs)} Pareto-optimal runs out of '
          f'{len(res)} total runs')
    return pareto_runs


def process_benchmark_dataset(composite, config, benchmark, dataset,
                              evaluators, method=None, evaluate_all=False):
    print(f'\nProcessing benchmark {benchmark}, dataset {dataset}')
    dataset_cfg = config['benchmarks'][benchmark]['datasets']
    training_cfg = config['training']
    train_eval_metrics = [
        ev.metrics[0]
        for ev in get_evaluators(config['bo_config']['evaluation_metric'])]
    print(f'Using training evaluation metrics: '
          f'{[m.get_name() for m in train_eval_metrics]}')

    dataset_id, dataset_ood = prepare_datasets(dataset_cfg, dataset,
                                               training_cfg)

    results = []
    all_methods = list(composite.get_method_names(benchmark, dataset))
    if method:
        # an explicit --method that isn't in the tree must NOT fall back
        # to the other methods: the caller names the output file after the
        # requested cell, so evaluating whatever is present would bank a
        # mislabeled artifact (observed with post-re-provision trees)
        if method not in all_methods:
            print(f"ERROR: Method '{method}' not found for "
                  f'{benchmark}/{dataset}. Available methods: {all_methods}')
            return results
        methods = [method]
    else:
        methods = all_methods

    for current_method in methods:
        print(f'\nEvaluating method: {current_method}')
        inst = get_latest_finished_trial(composite, benchmark, dataset,
                                         current_method)
        if inst is None:
            print(f'Warning: no finished trials for {benchmark}/{dataset}/'
                  f'{current_method}; skipping')
            continue
        runs = find_all_training_runs(inst) if evaluate_all \
            else find_pareto_optimal_runs(inst, train_eval_metrics)

        for run in runs:
            trial = Path(run['log_path']).stem
            print(f'Evaluating trial: {trial}')
            # per-trial fault isolation: a missing/corrupt checkpoint (e.g.
            # a trial dir pruned for disk space) must not take down every
            # other method of this (benchmark, dataset) task — record a
            # FAILED row for the trial and keep going (same contract as the
            # driver's per-task FAILED rows, reference workflow semantics)
            try:
                trial_inst = composite.get_results_instance(
                    benchmark, dataset, current_method, trial)
                model = load_model(trial_inst.get_model_file())
                model.to(np.asarray(dataset_id.input).dtype)
                model.eval()
                metric_results = evaluate_model_metrics(
                    model, dataset_id, dataset_ood, evaluators)
            except Exception as e:
                msg = str(e)
                # A dead device backend (chip tunnel down / chip held by
                # another process) fails every remaining trial the same
                # way, and each re-attempted backend init blocks for many
                # minutes — abort the task instead so the fan-out driver
                # records it and a later --skip-completed pass retries.
                if ('Unable to initialize backend' in msg
                        or 'UNAVAILABLE' in msg):
                    raise
                print(f'FAILED {benchmark}/{dataset}/{current_method}/'
                      f'{trial}: {e}')
                results.append([benchmark, dataset, current_method, trial,
                                'FAILED', 'FAILED', msg])
                continue
            for metric_name, objective_name, value in metric_results:
                results.append([benchmark, dataset, current_method, trial,
                                metric_name, objective_name, value])
    return results


@click.command('Post-hoc application of metrics to results')
@click.option('--results_dir', type=click.Path(exists=True),
              help='The directory containing the results')
@click.option('--config_file', type=click.Path(exists=True),
              help='The config file containing the metrics to evaluate')
@click.option('--benchmark', type=str, required=False,
              help='The benchmark to evaluate (optional)')
@click.option('--dataset', type=str, required=False,
              help='The dataset to evaluate (optional)')
@click.option('--method', type=str, required=False,
              help='The UE method to evaluate (optional)')
@click.option('--output', type=str, default='evaluated_metrics.csv',
              help='The output file name')
@click.option('--evaluate_all', is_flag=True,
              help='Evaluate all models instead of just the best one')
@click.option('--platform', default=None,
              help="Pin the JAX platform (e.g. 'cpu'); needed where site "
                   "hooks pre-register an accelerator and ignore "
                   "JAX_PLATFORMS")
def evaluate_metrics(results_dir, config_file, benchmark, dataset, method,
                     output, evaluate_all, platform):
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)
    composite = ResultsComposite(results_dir)
    with open(config_file) as f:
        config = yaml.safe_load(f)

    evaluators = get_evaluator(config['evaluation']['metrics'])
    pairs = get_benchmark_dataset_pairs(composite, benchmark, dataset)
    if not pairs:
        raise ValueError('No valid benchmark-dataset pairs found to evaluate')

    columns = ['benchmark', 'dataset', 'method', 'trial', 'metric',
               'objective', 'value']
    rows = []
    for current_benchmark, current_dataset in pairs:
        rows.extend(process_benchmark_dataset(
            composite, config, current_benchmark, current_dataset,
            evaluators, method, evaluate_all))

    if not rows:
        # nothing evaluable (e.g. explicit --method absent from the tree):
        # exit nonzero with no output file rather than banking an empty CSV
        raise SystemExit(f'no results evaluated; not writing {output}')
    pd.DataFrame(rows, columns=columns).to_csv(output, index=False)
    print(f'\nResults saved to {output}')


if __name__ == '__main__':
    evaluate_metrics()

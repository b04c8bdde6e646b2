"""Generate the benchmark datasets (and optionally the experiment config).

The reference experiments read surrogate datasets from cluster filesystems;
this script synthesises standalone equivalents (see
``nnueehcs_tpu/datagen.py``) and can emit a ready-to-run
``config.yaml`` with the same schema as the reference's
(``/root/reference/examples/bo_driven/config.yaml``).

Usage::

    python examples/data/generate_data.py --data-dir examples/data \
        --write-config examples/bo_driven/config.yaml
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))
import os

import click
import yaml

from nnueehcs_tpu.datagen import generate_benchmark_files

ARCH_INPUTS = {'binomial_options': 5, 'minibude': 6, 'ailerons': 40,
               'airfoil': 5, 'puma': 8}

DATASET_FORMATS = {
    'binomial_options': ('hdf5', {'group_name': 'BinomialOptionsKernel',
                                  'input_dataset': 'input',
                                  'output_dataset': 'output'}),
    'minibude': ('hdf5', {'group_name': 'BUDEKernel',
                          'input_dataset': 'input',
                          'output_dataset': 'output'}),
    'ailerons': ('arff', {}),
    'airfoil': ('character_delimited', {'delimiter': r'\s+'}),
    'puma': ('character_delimited', {'delimiter': r'\s+'}),
}

SPLITS = {
    'tails_id': '[0, 70]',
    'tails_ood': '[70, 100]',
    'gaps_id': '[0, 30], [60, 100]',
    'gaps_ood': '[30, 60]',
}


def mlp_architecture(num_inputs, width=128, hidden_layers=6):
    arch = [{'Linear': {'args': [num_inputs, width]}},
            {'BatchNorm1d': {'args': [width]}},
            {'ReLU': {'inplace': True}}]
    for _ in range(hidden_layers - 1):
        arch += [{'Linear': {'args': [width, width]}},
                 {'BatchNorm1d': {'args': [width]}},
                 {'ReLU': {'inplace': True}}]
    arch.append({'Linear': {'args': [width, 1]}})
    return arch


def build_config(paths: dict) -> dict:
    benchmarks = {}
    for name, path in paths.items():
        fmt, extra = DATASET_FORMATS[name]
        datasets = {}
        for split, percentiles in SPLITS.items():
            entry = {'format': fmt, 'path': path, 'percentiles': percentiles,
                     'dtype': 'float32'}
            entry.update(extra)
            datasets[split] = entry
        benchmarks[name] = {
            'model': {'architecture': mlp_architecture(ARCH_INPUTS[name])},
            'datasets': datasets,
        }

    return {
        'trainer': {
            'accelerator': 'auto',
            # serialize the best model once at fit end: the BO restart
            # contract re-runs incomplete trials from scratch, so
            # per-improvement checkpoints buy nothing and cost 13x trial
            # wall-clock on tunneled hosts (measured)
            'defer_checkpoint': True,
            'max_epochs': 300,
            'limit_train_batches': 1000,
            'limit_val_batches': 100,
            'log_every_n_steps': 5,
            'num_sanity_val_steps': 0,
            'gradient_clip_val': 5,
        },
        'training': {
            'loss': 'l1_loss',
            'parameter_space': [
                {'name': 'learning_rate', 'type': 'fixed', 'value': 0.00005},
                {'name': 'weight_decay', 'type': 'fixed', 'value': 0},
                {'name': 'batch_size', 'type': 'fixed', 'value': 128},
            ],
            'validation_split': 0.2,
            'scaling': True,
        },
        'benchmarks': benchmarks,
        'uq_methods': {
            'ensemble': {'parameter_space': [
                {'name': 'num_models', 'type': 'range', 'bounds': [2, 32]},
            ]},
            'delta_uq': {'parameter_space': [
                {'name': 'num_anchors', 'type': 'range', 'bounds': [5, 500]},
                {'name': 'anchored_batch_size', 'type': 'range',
                 'bounds': [64, 131072], 'log_scale': True},
                {'name': 'estimator', 'type': 'fixed', 'value': 'std'},
            ]},
            'pager': {'parameter_space': [
                {'name': 'num_anchors', 'type': 'range', 'bounds': [5, 300]},
                {'name': 'anchored_batch_size', 'type': 'range',
                 'bounds': [64, 131072], 'log_scale': True},
                {'name': 'estimator', 'type': 'fixed', 'value': 'std'},
            ]},
            'mc_dropout': {'parameter_space': [
                {'name': 'num_samples', 'type': 'range', 'bounds': [5, 32]},
                {'name': 'dropout_percent', 'type': 'range',
                 'bounds': [0.05, 0.3]},
            ]},
            'kde': {'parameter_space': [
                {'name': 'bandwidth', 'type': 'choice',
                 'values': ['scott', 'silverman']},
                {'name': 'rtol', 'type': 'range', 'bounds': [500, 50000]},
            ]},
            'knn_kde': {'parameter_space': [
                {'name': 'k', 'type': 'range', 'bounds': [1, 800]},
            ]},
            # beyond-reference: heteroscedastic mean-variance estimation
            'mve': {'parameter_space': [
                {'name': 'min_variance', 'type': 'range',
                 'bounds': [1e-7, 1e-3], 'log_scale': True},
            ]},
        },
        'bo_config': {
            'trials': 50,
            'max_failures': 10,
            'evaluation_metric': [
                {'name': 'percentile_score', 'percentile': 95},
                {'name': 'uncertainty_estimating_throughput'},
            ],
        },
        'evaluation': {
            'metrics': [
                {'name': 'tnr_at_tpr', 'target_tpr': 0.95, 'reversed': False},
                {'name': 'percentile_classification', 'threshold': 0.90,
                 'reversed': False},
                {'name': 'percentile_classification', 'threshold': 0.90,
                 'reversed': True},
                {'name': 'percentile_classification', 'threshold': 0.80,
                 'reversed': True},
                {'name': 'percentile_classification', 'threshold': 0.80,
                 'reversed': False},
                {'name': 'runtime'},
                {'name': 'uncertainty_estimating_runtime'},
                {'name': 'base_model_throughput'},
                {'name': 'auroc'},
                {'name': 'uncertainty_estimating_throughput'},
                {'name': 'max_memory_usage'},
            ],
        },
        'workflow_config': {
            'max_concurrent_tasks': 2,
            'retries': 20,
        },
    }


def build_kde_config(paths: dict) -> dict:
    """KDE/kNN-KDE experiment variant (reference ``config_kde.yaml``:
    short training, no scaling, density-method search spaces only)."""
    cfg = build_config(paths)
    cfg['trainer']['max_epochs'] = 3
    cfg['training']['scaling'] = False
    cfg['uq_methods'] = {k: v for k, v in cfg['uq_methods'].items()
                         if k in ('kde', 'knn_kde')}
    return cfg


@click.command()
@click.option('--data-dir', default='examples/data',
              help='Directory to write benchmark files into')
@click.option('--write-config', default=None, type=click.Path(),
              help='Optional path to emit a ready-to-run config.yaml')
@click.option('--write-kde-config', default=None, type=click.Path(),
              help='Optional path to emit the KDE-variant config')
@click.option('--size', default=None, type=int,
              help='Override row count for every benchmark')
@click.option('--steps', default=64, type=int,
              help='Binomial-tree depth for the options kernel')
def main(data_dir, write_config, write_kde_config, size, steps):
    sizes = {}
    if size:
        sizes = {name: size for name in ARCH_INPUTS}
    paths = generate_benchmark_files(data_dir, sizes=sizes, steps=steps)
    for name, path in paths.items():
        print(f'{name}: {path}')
    for target, builder in ((write_config, build_config),
                            (write_kde_config, build_kde_config)):
        if target:
            cfg = builder(paths)
            os.makedirs(os.path.dirname(target) or '.', exist_ok=True)
            with open(target, 'w') as f:
                yaml.safe_dump(cfg, f, sort_keys=False)
            print(f'config: {target}')


if __name__ == '__main__':
    main()

"""Every UQ method through the full BO driver loop (1 trial each, tiny
data): catches method-specific wiring issues in build → train → hook →
checkpoint → reload → timed-evaluate."""
import os

import numpy as np
import pandas as pd
import pytest

from nnueehcs_tpu.datagen import generate_minibude, write_hdf5
from nnueehcs_tpu.driver import run_bo_experiment

METHOD_SPACES = {
    'ensemble': [{'name': 'num_models', 'type': 'range', 'bounds': [2, 3]}],
    'mc_dropout': [
        {'name': 'num_samples', 'type': 'range', 'bounds': [3, 5]},
        {'name': 'dropout_percent', 'type': 'range', 'bounds': [0.1, 0.2]}],
    'delta_uq': [
        {'name': 'num_anchors', 'type': 'range', 'bounds': [3, 5]},
        {'name': 'estimator', 'type': 'fixed', 'value': 'std'}],
    'pager': [
        {'name': 'num_anchors', 'type': 'range', 'bounds': [3, 5]},
        {'name': 'estimator', 'type': 'fixed', 'value': 'std'}],
    'kde': [{'name': 'rtol', 'type': 'range', 'bounds': [500, 50000]}],
    'knn_kde': [{'name': 'k', 'type': 'range', 'bounds': [2, 10]}],
    'mve': [{'name': 'min_variance', 'type': 'range',
             'bounds': [1e-7, 1e-4], 'log_scale': True}],
}


@pytest.fixture(scope='module')
def base_config(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('data')
    ipt, opt = generate_minibude(700)
    path = str(tmp / 'bude.h5')
    write_hdf5(path, ipt, opt, 'BUDEKernel')

    arch = [{'Linear': {'args': [6, 8]}}, {'ReLU': {}},
            {'Linear': {'args': [8, 8]}}, {'ReLU': {}},
            {'Linear': {'args': [8, 1]}}]
    datasets = {}
    for split, percs in [('tails_id', '[0, 70]'), ('tails_ood', '[70, 100]')]:
        datasets[split] = {'format': 'hdf5', 'path': path,
                           'group_name': 'BUDEKernel',
                           'input_dataset': 'input',
                           'output_dataset': 'output',
                           'percentiles': percs, 'dtype': 'float32'}
    return {
        'trainer': {'accelerator': 'cpu', 'max_epochs': 1,
                    'log_every_n_steps': 5, 'gradient_clip_val': 5},
        'training': {
            'loss': 'l1_loss', 'scaling': True, 'validation_split': 0.2,
            'parameter_space': [
                {'name': 'learning_rate', 'type': 'fixed', 'value': 1e-3},
                {'name': 'weight_decay', 'type': 'fixed', 'value': 0},
                {'name': 'batch_size', 'type': 'fixed', 'value': 64},
            ]},
        'benchmarks': {'minibude': {'model': {'architecture': arch},
                                    'datasets': datasets}},
        'bo_config': {'trials': 1, 'max_failures': 0,
                      'evaluation_metric': [
                          {'name': 'percentile_score', 'percentile': 95},
                          {'name': 'uncertainty_estimating_throughput'},
                      ]},
    }


@pytest.mark.parametrize('method', sorted(METHOD_SPACES))
def test_method_through_driver(base_config, tmp_path, method):
    cfg = dict(base_config)
    cfg['uq_methods'] = {method: {'parameter_space': METHOD_SPACES[method]}}
    out = str(tmp_path / 'results')
    results = run_bo_experiment('minibude', method, cfg, 'tails', out,
                                restart=False)
    assert len(results) == 1
    row = results[0]
    assert row['failed'] is False, row.get('error_message')
    assert np.isfinite(row['percentile_score'])
    assert row['uncertainty_estimating_throughput'] > 0
    tdir = os.path.join(out, 'minibude', 'tails', method, 'bo_trial_0')
    df = pd.read_csv(os.path.join(tdir, 'trial_results.csv'))
    assert len(df) == 1

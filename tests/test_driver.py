"""Integration tests for the BO experiment driver: full loop, on-disk
contract, and restart resume (reference contract:
``examples/bo_driven/bo.py``)."""
import os

import numpy as np
import pandas as pd
import pytest

from nnueehcs_tpu.datagen import generate_minibude, write_hdf5
from nnueehcs_tpu.driver import run_bo_experiment, OutputManager, get_restart
from nnueehcs_tpu.utility import ResultsComposite


@pytest.fixture(scope='module')
def mini_config(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('data')
    ipt, opt = generate_minibude(1200)
    path = str(tmp / 'bude.h5')
    write_hdf5(path, ipt, opt, 'BUDEKernel')

    arch = [{'Linear': {'args': [6, 16]}},
            {'ReLU': {}},
            {'Linear': {'args': [16, 1]}}]
    datasets = {}
    for split, percs in [('tails_id', '[0, 70]'), ('tails_ood', '[70, 100]'),
                         ('gaps_id', '[0, 30], [60, 100]'),
                         ('gaps_ood', '[30, 60]')]:
        datasets[split] = {'format': 'hdf5', 'path': path,
                           'group_name': 'BUDEKernel',
                           'input_dataset': 'input',
                           'output_dataset': 'output',
                           'percentiles': percs, 'dtype': 'float32'}
    return {
        'trainer': {'accelerator': 'cpu', 'max_epochs': 2,
                    'log_every_n_steps': 5, 'gradient_clip_val': 5},
        'training': {
            'loss': 'l1_loss', 'scaling': True, 'validation_split': 0.2,
            'parameter_space': [
                {'name': 'learning_rate', 'type': 'fixed', 'value': 1e-3},
                {'name': 'weight_decay', 'type': 'fixed', 'value': 0},
                {'name': 'batch_size', 'type': 'fixed', 'value': 128},
            ]},
        'benchmarks': {'minibude': {'model': {'architecture': arch},
                                    'datasets': datasets}},
        'uq_methods': {'ensemble': {'parameter_space': [
            {'name': 'num_models', 'type': 'range', 'bounds': [2, 4]},
        ]}},
        'bo_config': {'trials': 2, 'max_failures': 1,
                      'evaluation_metric': [
                          {'name': 'percentile_score', 'percentile': 95},
                          {'name': 'uncertainty_estimating_throughput'},
                      ]},
    }


def test_bo_loop_and_restart(mini_config, tmp_path):
    out = str(tmp_path / 'results')
    results = run_bo_experiment('minibude', 'ensemble', mini_config, 'tails',
                                out)
    assert len(results) == 2

    base = os.path.join(out, 'minibude', 'tails', 'ensemble')
    for trial in (0, 1):
        tdir = os.path.join(base, f'bo_trial_{trial}')
        for fname in ('ax_client.json', 'ax_client_optimization_step.json',
                      'trial_results.csv', 'model.pth', 'metrics.csv'):
            assert os.path.exists(os.path.join(tdir, fname)), (trial, fname)

    df = pd.read_csv(os.path.join(base, 'bo_trial_1', 'trial_results.csv'))
    assert len(df) == 2
    for col in ('num_models', 'learning_rate', 'batch_size', 'weight_decay',
                'ue_time', 'percentile_score',
                'uncertainty_estimating_throughput', 'id_ue', 'ood_ue',
                'id_loss', 'ood_loss', 'ue_throughput', 'train_time',
                'log_path', 'failed', 'error_message'):
        assert col in df.columns, col
    assert not df['failed'].any()
    assert (df['uncertainty_estimating_throughput'] > 0).all()
    # multi-objective run emits the pareto export
    assert os.path.exists(os.path.join(base, 'bo_trial_1',
                                       'pareto_parameters.json'))

    # results tree sees it
    comp = ResultsComposite(out)
    assert comp.get_num_trials('minibude', 'tails', 'ensemble') == 2

    # ---- restart resumes at the next trial index
    idx, client, tresults = get_restart(out, 'minibude', 'tails', 'ensemble')
    assert idx == 2
    assert len(client.trials) == 2
    assert len(tresults) == 2

    cfg = dict(mini_config)
    cfg['bo_config'] = dict(cfg['bo_config'], trials=3)
    results2 = run_bo_experiment('minibude', 'ensemble', cfg, 'tails', out,
                                 restart=True)
    assert os.path.exists(os.path.join(base, 'bo_trial_2',
                                       'trial_results.csv'))
    assert len(results2) >= 3


def test_eval_precision_knob(mini_config, tmp_path, monkeypatch):
    """``uq_methods.<m>.eval_precision`` runs the timed-eval/UE passes in
    the requested precision (training stays f32): the knob is popped
    before the builder sees it and applied to the reloaded model."""
    import copy
    from nnueehcs_tpu.models.base import WrappedModelBase
    cfg = copy.deepcopy(mini_config)
    cfg['uq_methods']['ensemble']['eval_precision'] = 'bf16-mixed'
    cfg['bo_config'] = dict(cfg['bo_config'], trials=1)
    seen = []
    orig = WrappedModelBase.set_precision

    def spy(self, p):
        seen.append(p)
        return orig(self, p)

    monkeypatch.setattr(WrappedModelBase, 'set_precision', spy)
    out = str(tmp_path / 'results')
    results = run_bo_experiment('minibude', 'ensemble', cfg, 'tails', out)
    assert len(results) == 1
    assert 'bf16-mixed' in seen
    df = pd.read_csv(os.path.join(out, 'minibude', 'tails', 'ensemble',
                                  'bo_trial_0', 'trial_results.csv'))
    assert not df['failed'].any()
    assert (df['uncertainty_estimating_throughput'] > 0).all()


def test_restart_index_scan(tmp_path):
    base = tmp_path / 'b' / 'd' / 'm'
    for i, complete in [(0, True), (1, True), (2, False)]:
        d = base / f'bo_trial_{i}'
        d.mkdir(parents=True)
        if complete:
            for f in ('ax_client.json', 'ax_client_optimization_step.json',
                      'trial_results.csv'):
                (d / f).write_text('{}')
    mgr = OutputManager(str(base / 'bo_trial_0'), 'b',
                        append_benchmark_name=False)
    assert mgr.get_restart_index() == 2


def test_register_custom_uq_method():
    from nnueehcs_tpu.driver import (register_uq_method,
                                     get_model_builder_class,
                                     UQ_METHOD_REGISTRY)
    from nnueehcs_tpu.model_builder import MLPModelBuilder

    class MyBuilder(MLPModelBuilder):
        def __init__(self, base_descr, descr=None, **kw):
            super().__init__(base_descr, **kw)

    register_uq_method('my_method', MyBuilder)
    try:
        assert get_model_builder_class('my_method') is MyBuilder
        with pytest.raises(ValueError):
            get_model_builder_class('nope')
    finally:
        UQ_METHOD_REGISTRY.pop('my_method', None)


def test_restart_of_complete_run_is_noop(mini_config, tmp_path):
    """A restarted run counts its restored successes toward the quota
    (deliberate divergence from the reference, which zeroes the counter
    after restart — ``bo.py:352`` — so a 45/50 restart could never
    finish).  Restarting an already-complete run must add no trials."""
    out = str(tmp_path / 'results')
    results = run_bo_experiment('minibude', 'ensemble', mini_config, 'tails',
                                out)
    n_done = len(results)
    assert n_done == mini_config['bo_config']['trials']

    results2 = run_bo_experiment('minibude', 'ensemble', mini_config, 'tails',
                                 out, restart=True)
    assert len(results2) == n_done
    base = os.path.join(out, 'minibude', 'tails', 'ensemble')
    assert not os.path.exists(os.path.join(base, f'bo_trial_{n_done}'))

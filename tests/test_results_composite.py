"""Results-tree tests (modelled on the reference's
``tests/test_results_composite.py``)."""
import os

import pandas as pd
import pytest

from nnueehcs_tpu.utility import ResultsInstance, ResultsComposite


@pytest.fixture
def results_tree(tmp_path):
    layout = {
        'bench_a': {'tails': ['ensemble', 'kde'], 'gaps': ['ensemble']},
        'bench_b': {'tails': ['mc_dropout']},
    }
    for bench, datasets in layout.items():
        for dset, methods in datasets.items():
            for method in methods:
                for trial in range(2):
                    d = tmp_path / bench / dset / method / f'bo_trial_{trial}'
                    d.mkdir(parents=True)
                    pd.DataFrame({'trial': [trial],
                                  'wasserstein_distance': [0.5 + trial],
                                  'failed': [False]}).to_csv(
                        d / 'trial_results.csv', index=False)
    return str(tmp_path)


def test_instance_path_parsing(results_tree):
    inst = ResultsInstance(os.path.join(
        results_tree, 'bench_a', 'tails', 'ensemble', 'bo_trial_1'))
    assert inst.get_benchmark_name() == 'bench_a'
    assert inst.get_dataset_name() == 'tails'
    assert inst.get_method_name() == 'ensemble'
    assert inst.get_trial_name() == 'bo_trial_1'
    assert inst.get_trial_number() == 1
    assert inst.is_finished()


def test_instance_bad_trial_name(results_tree):
    inst = ResultsInstance(os.path.join(
        results_tree, 'bench_a', 'tails', 'ensemble', 'not_a_trial'))
    with pytest.raises(ValueError):
        inst.get_trial_number()


def test_instance_filemap(results_tree):
    inst = ResultsInstance('/x/y/z/bo_trial_0')
    assert inst.get_model_file().endswith('model.pth')
    assert inst.get_trial_results_file().endswith('trial_results.csv')
    assert inst.get_training_metrics_file().endswith('metrics.csv')
    assert inst.get_optimization_step_file().endswith(
        'ax_client_optimization_step.json')


def test_composite_enumeration(results_tree):
    comp = ResultsComposite(results_tree)
    assert comp.get_num_benchmarks() == 2
    assert sorted(comp.get_benchmark_names()) == ['bench_a', 'bench_b']
    assert comp.get_num_datasets('bench_a') == 2
    assert comp.get_num_methods('bench_a', 'tails') == 2
    assert comp.get_num_trials('bench_a', 'tails', 'ensemble') == 2
    assert len(list(comp.get_results())) == 8


def test_composite_filters(results_tree):
    comp = ResultsComposite(results_tree)
    by_bench = comp.filter_by_benchmark('bench_b')
    assert len(by_bench) == 2
    assert all(k[0] == 'bench_b' for k in by_bench)
    by_method = comp.filter_by_method('kde')
    assert len(by_method) == 2
    by_trial = comp.filter_by_trial('bo_trial_0')
    assert len(by_trial) == 4


def test_filter_by_metric(results_tree):
    comp = ResultsComposite(results_tree)
    metrics = comp.filter_by_metric('wasserstein_distance')
    assert len(metrics) == 8
    key = ('bench_a', 'tails', 'ensemble', 'bo_trial_1')
    assert metrics[key].iloc[0] == pytest.approx(1.5)

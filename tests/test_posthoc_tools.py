"""Post-hoc tool behaviours that the big-tree runs rely on: the classify
pass banks one CSV per (benchmark, dataset, method) cell and resumes from
them instead of redoing hundreds of model loads."""
import importlib.util
import sys
from pathlib import Path

import pandas as pd
import yaml

REPO = Path(__file__).resolve().parents[1]
TOOL_DIR = REPO / 'examples' / 'bo_driven'


def _load_classify():
    if str(TOOL_DIR) not in sys.path:
        sys.path.insert(0, str(TOOL_DIR))   # for its `import plotting`
    spec = importlib.util.spec_from_file_location(
        'classify_posthoc_mod', TOOL_DIR / 'classify_posthoc.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_classify_posthoc_resumes_from_banked_cells(tmp_path):
    from click.testing import CliRunner
    mod = _load_classify()

    (tmp_path / 'results' / 'b1' / 'tails' / 'ensemble').mkdir(parents=True)
    out = tmp_path / 'out'
    out.mkdir()
    banked = pd.DataFrame({
        'trial': [0, 1], 'sensitivity': [0.4, 0.6],
        'specificity': [0.8, 0.8], 'fpr': [0.2, 0.2], 'fnr': [0.6, 0.4],
        'ue_dist': [0.1, 0.2], 'benchmark': ['b1', 'b1'],
        'dataset': ['tails', 'tails'], 'method': ['ensemble', 'ensemble']})
    banked.to_csv(out / 'cell_b1_tails_ensemble.csv', index=False)

    # no model.pth anywhere: the banked cell must short-circuit before any
    # dataset build or model load
    cfg = tmp_path / 'cfg.yaml'
    cfg.write_text(yaml.safe_dump({'benchmarks': {'b1': {'datasets': {}}}}))

    res = CliRunner().invoke(mod.main, [
        '--input', str(tmp_path / 'results'), '--config', str(cfg),
        '--output', str(out), '-p', '0.8'])
    assert res.exit_code == 0, res.output
    assert 'resuming' in res.output
    final = pd.read_csv(out / 'classification.csv')
    assert len(final) == 2
    assert set(final['method']) == {'ensemble'}


def test_classify_posthoc_benchmark_filter(tmp_path):
    from click.testing import CliRunner
    mod = _load_classify()

    for bench in ('b1', 'b2'):
        (tmp_path / 'results' / bench / 'tails' / 'ensemble').mkdir(
            parents=True)
    out = tmp_path / 'out'
    out.mkdir()
    # bank only b1; filtering to b1 must never touch b2 (whose dataset
    # config is invalid and would raise)
    pd.DataFrame({
        'trial': [0], 'sensitivity': [0.5], 'specificity': [0.8],
        'fpr': [0.2], 'fnr': [0.5], 'ue_dist': [0.3], 'benchmark': ['b1'],
        'dataset': ['tails'], 'method': ['ensemble'],
    }).to_csv(out / 'cell_b1_tails_ensemble.csv', index=False)
    cfg = tmp_path / 'cfg.yaml'
    cfg.write_text(yaml.safe_dump(
        {'benchmarks': {'b1': {'datasets': {}}, 'b2': {'datasets': {}}}}))

    res = CliRunner().invoke(mod.main, [
        '--input', str(tmp_path / 'results'), '--config', str(cfg),
        '--output', str(out), '--benchmarks', 'b1'])
    assert res.exit_code == 0, res.output
    final = pd.read_csv(out / 'classification.csv')
    assert set(final['benchmark']) == {'b1'}


def _load_evaluate_metrics():
    me_dir = REPO / 'examples' / 'metric_evaluation'
    spec = importlib.util.spec_from_file_location(
        'evaluate_metrics_mod', me_dir / 'evaluate_metrics.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _StubMetric:
    def __init__(self, name, direction):
        self._name, self._dir = name, direction

    def get_metrics(self):
        return [self._name]

    def get_objectives(self):
        return [{'name': self._name, 'type': self._dir}]


class _StubInstance:
    def __init__(self, path):
        self._path = path

    def get_trial_results_file(self):
        return str(self._path)


def test_pareto_selection_ignores_failed_nan_rows(tmp_path):
    """A failed trial's NaN metric row must not poison the Pareto mask
    (NaN compares False both ways, which would mark EVERY row
    non-efficient — observed live on the delta_uq partial cell)."""
    mod = _load_evaluate_metrics()
    csv = tmp_path / 'trial_results.csv'
    pd.DataFrame({
        'trial': [0, 1, 2, 3],
        'log_path': [f'r/bo_trial_{i}' for i in range(4)],
        'percentile_score': [float('nan'), 0.5, 0.3, 0.4],
        'uncertainty_estimating_throughput': [float('nan'), 10.0, 5.0, 20.0],
        'failed': [True, False, False, False],
    }).to_csv(csv, index=False)

    metrics = [_StubMetric('percentile_score', 'minimize'),
               _StubMetric('uncertainty_estimating_throughput', 'maximize')]
    runs = mod.find_pareto_optimal_runs(_StubInstance(csv), metrics)
    trials = sorted(r['trial'] for r in runs)
    # trial 2 (best score) and trial 3 (best throughput) are the front;
    # trial 1 is dominated by 3, trial 0 failed
    assert trials == [2, 3]


def test_pareto_selection_all_failed_returns_empty(tmp_path):
    mod = _load_evaluate_metrics()
    csv = tmp_path / 'trial_results.csv'
    pd.DataFrame({
        'trial': [0],
        'log_path': ['r/bo_trial_0'],
        'percentile_score': [float('nan')],
        'uncertainty_estimating_throughput': [float('nan')],
        'failed': [True],
    }).to_csv(csv, index=False)
    metrics = [_StubMetric('percentile_score', 'minimize'),
               _StubMetric('uncertainty_estimating_throughput', 'maximize')]
    assert mod.find_pareto_optimal_runs(_StubInstance(csv), metrics) == []

"""L5 orchestration: the process-pool workflow driver fans the grid out as
restartable ``bo.py`` subprocesses (the Parsl/SLURM replacement — reference
``examples/bo_driven/workflow_driver.py``), and ``--sbatch`` emits one
script per cell."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

REPO = Path(__file__).resolve().parents[1]
DRIVER = REPO / 'examples' / 'bo_driven' / 'workflow_driver.py'


@pytest.fixture(scope='module')
def grid_config(tmp_path_factory):
    from nnueehcs_tpu.datagen import generate_minibude, write_hdf5
    tmp = tmp_path_factory.mktemp('wf')
    ipt, opt = generate_minibude(800)
    path = str(tmp / 'bude.h5')
    write_hdf5(path, ipt, opt, 'BUDEKernel')
    arch = [{'Linear': {'args': [6, 8]}}, {'ReLU': {}},
            {'Linear': {'args': [8, 1]}}]
    datasets = {s: {'format': 'hdf5', 'path': path, 'group_name': 'BUDEKernel',
                    'input_dataset': 'input', 'output_dataset': 'output',
                    'percentiles': p, 'dtype': 'float32'}
                for s, p in [('tails_id', '[0, 70]'),
                             ('tails_ood', '[70, 100]'),
                             ('gaps_id', '[0, 30], [60, 100]'),
                             ('gaps_ood', '[30, 60]')]}
    cfg = {
        'trainer': {'accelerator': 'cpu', 'max_epochs': 1,
                    'gradient_clip_val': 5},
        'training': {'loss': 'l1_loss', 'scaling': True,
                     'validation_split': 0.2,
                     'parameter_space': [
                         {'name': 'learning_rate', 'type': 'fixed',
                          'value': 1e-3},
                         {'name': 'weight_decay', 'type': 'fixed', 'value': 0},
                         {'name': 'batch_size', 'type': 'fixed',
                          'value': 128}]},
        'benchmarks': {'minibude': {'model': {'architecture': arch},
                                    'datasets': datasets}},
        'uq_methods': {'ensemble': {'parameter_space': [
            {'name': 'num_models', 'type': 'range', 'bounds': [2, 3]}]}},
        'bo_config': {'trials': 1, 'max_failures': 1, 'evaluation_metric': [
            {'name': 'percentile_score', 'percentile': 95},
            {'name': 'uncertainty_estimating_throughput'}]},
        'evaluation': {'metrics': [
            {'name': 'percentile_classification', 'threshold': 0.9,
             'reversed': False},
            {'name': 'auroc'},
        ]},
        'workflow_config': {'max_concurrent_tasks': 2, 'retries': 1},
        'bo_slurm_config': {'partition': 'pbatch', 'walltime': '1:00:00'},
    }
    cfg_path = tmp / 'config.yaml'
    cfg_path.write_text(yaml.safe_dump(cfg))
    return str(cfg_path), tmp


@pytest.mark.slow
def test_workflow_driver_runs_grid(grid_config):
    cfg_path, tmp = grid_config
    out = str(tmp / 'results')
    rundir = str(tmp / 'rundir')
    proc = subprocess.run(
        [sys.executable, str(DRIVER), '--config', cfg_path, '--output', out,
         '--rundir', rundir, '--platform', 'cpu'],
        capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    # both dataset-split cells completed with the full on-disk contract
    for dset in ('tails', 'gaps'):
        tdir = Path(out) / 'minibude' / dset / 'ensemble' / 'bo_trial_0'
        for fname in ('trial_results.csv', 'ax_client.json', 'model.pth'):
            assert (tdir / fname).exists(), (dset, fname)
        log = Path(rundir) / f'minibude_ensemble_{dset}.out'
        assert log.exists()


def test_workflow_driver_sbatch_emission(grid_config):
    cfg_path, tmp = grid_config
    rundir = str(tmp / 'sbatch_rundir')
    proc = subprocess.run(
        [sys.executable, str(DRIVER), '--config', cfg_path,
         '--output', str(tmp / 'r2'), '--rundir', rundir, '--sbatch'],
        capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    scripts = sorted(Path(rundir).glob('*.sbatch'))
    assert len(scripts) == 2   # 1 benchmark × 1 method × 2 splits
    body = scripts[0].read_text()
    assert '#SBATCH --partition=pbatch' in body
    assert '--restart' in body


@pytest.mark.slow
def test_mesh_workflow_driver_concurrent_slices(grid_config):
    """Concurrent cells on disjoint slices of the virtual 8-device CPU
    mesh (the TPU-native replacement for one-GPU-per-SLURM-task)."""
    cfg_path, tmp = grid_config
    out = str(tmp / 'mesh_results')
    driver = REPO / 'examples' / 'bo_driven' / 'mesh_workflow_driver.py'
    # platform/device-count must be pinned via the driver's own flags: the
    # site hook registers the accelerator plugin in every subprocess and
    # the JAX_PLATFORMS env var is ignored (this test silently ran its
    # "mesh" single-device on the real chip before the flags existed)
    proc = subprocess.run(
        [sys.executable, str(driver), '--config', cfg_path, '--output', out,
         '--slices', '2', '--retries', '0',
         '--platform', 'cpu', '--cpu_devices', '8'],
        capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert '8 devices -> 2 slices of 4' in proc.stdout, proc.stdout
    for dset in ('tails', 'gaps'):
        tdir = Path(out) / 'minibude' / dset / 'ensemble' / 'bo_trial_0'
        assert (tdir / 'trial_results.csv').exists(), dset


def test_metric_eval_driver_benchmark_filter(tmp_path, monkeypatch):
    """--benchmarks restricts the fan-out so a mixed-config results tree
    (e.g. minibude cells trained under config_kde's scaling: false) can be
    evaluated in per-config passes."""
    import importlib.util
    from click.testing import CliRunner

    for bench in ('minibude', 'binomial_options'):
        for dset in ('tails', 'gaps'):
            (tmp_path / bench / dset / 'kde').mkdir(parents=True)

    spec = importlib.util.spec_from_file_location(
        'me_driver', REPO / 'examples' / 'metric_evaluation'
        / 'metric_eval_driver.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    ran = []
    monkeypatch.setattr(
        mod, 'run_evaluate_metrics',
        lambda results_dir, config_file, b, d, o, rundir, platform=None:
            (ran.append((b, d)), (b, d, o, 1))[1])
    cfg = tmp_path / 'cfg.yaml'
    cfg.write_text('{}')
    res = CliRunner().invoke(mod.main, [
        '--results_dir', str(tmp_path), '--config_file', str(cfg),
        '--output', str(tmp_path / 'out.csv'),
        '--rundir', str(tmp_path / 'rundir'),
        '--benchmarks', 'minibude'])
    assert res.exit_code == 0, res.output
    assert sorted(ran) == [('minibude', 'gaps'), ('minibude', 'tails')]


@pytest.mark.slow
def test_metric_eval_driver_combines(grid_config):
    """E6: per-(benchmark, dataset) metric-eval fan-out with subprocess
    isolation, --skip-completed resume, and the combined tidy CSV."""
    import pandas as pd
    cfg_path, tmp = grid_config
    out = str(tmp / 'me_results')
    # one finished cell to evaluate
    bo = REPO / 'examples' / 'bo_driven' / 'bo.py'
    proc = subprocess.run(
        [sys.executable, str(bo), '--benchmark', 'minibude', '--uq_method',
         'ensemble', '--config', cfg_path, '--dataset', 'tails',
         '--output', out, '--platform', 'cpu'],
        capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stdout + proc.stderr

    driver = REPO / 'examples' / 'metric_evaluation' / 'metric_eval_driver.py'
    rundir = str(tmp / 'me_rundir')
    combined = str(tmp / 'combined.csv')
    proc = subprocess.run(
        [sys.executable, str(driver), '--results_dir', out,
         '--config_file', cfg_path, '--output', combined,
         '--rundir', rundir, '--max_tasks', '1', '--platform', 'cpu'],
        capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    df = pd.read_csv(combined)
    assert set(df.columns) == {'benchmark', 'dataset', 'method', 'trial',
                               'metric', 'objective', 'value'}
    assert (df['method'] == 'ensemble').any()
    assert 'auroc' in set(df['metric'])

    # --skip-completed resumes without re-running
    proc = subprocess.run(
        [sys.executable, str(driver), '--results_dir', out,
         '--config_file', cfg_path, '--output', combined,
         '--rundir', rundir, '--max_tasks', '1', '--skip-completed',
         '--platform', 'cpu'],
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert 'Skipping completed' in proc.stdout

"""Fan out post-hoc metric evaluation over the (benchmark × dataset) grid.

Parsl/SLURM replacement (reference
``examples/metric_evaluation/metric_eval_driver.py``): one subprocess per
(benchmark, dataset) cell running ``evaluate_metrics.py``, with
``--max_tasks`` concurrency, ``--skip-completed`` resume, and a final
combine step that concatenates per-task CSVs (FAILED placeholder rows for
dead tasks).
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))
import os
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor

import click
import pandas as pd

from nnueehcs_tpu.utility import ResultsComposite


def run_evaluate_metrics(results_dir, config_file, benchmark, dataset,
                         outfile, rundir, platform=None):
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          'evaluate_metrics.py')
    cmd = [sys.executable, script, '--results_dir', results_dir,
           '--config_file', config_file, '--benchmark', benchmark,
           '--dataset', dataset, '--output', outfile]
    if platform:
        cmd += ['--platform', platform]
    os.makedirs(rundir, exist_ok=True)
    log = os.path.join(rundir, f'{benchmark}_{dataset}')
    with open(f'{log}.out', 'w') as out, open(f'{log}.err', 'w') as err:
        rc = subprocess.run(cmd, stdout=out, stderr=err).returncode
    return benchmark, dataset, outfile, rc


def combine_results(task_results, output):
    frames = []
    columns = ['benchmark', 'dataset', 'method', 'trial', 'metric',
               'objective', 'value']
    for benchmark, dataset, outfile, rc in task_results:
        if rc == 0 and os.path.exists(outfile):
            frames.append(pd.read_csv(outfile))
        else:
            frames.append(pd.DataFrame(
                [[benchmark, dataset, 'FAILED', 'FAILED', 'ERROR', 'ERROR',
                  float('nan')]], columns=columns))
    pd.concat(frames, ignore_index=True).to_csv(output, index=False)
    print(f'Combined results saved to {output}')


@click.command()
@click.option('--results_dir', type=click.Path(exists=True), required=True)
@click.option('--config_file', type=click.Path(exists=True), required=True)
@click.option('--output', default='evaluated_metrics_combined.csv')
@click.option('--rundir', default='./metric_eval_rundir')
@click.option('--local', is_flag=True, default=True,
              help='Run locally (always true in this build)')
@click.option('--max_tasks', default=2, type=int)
@click.option('--skip-completed', 'skip_completed', is_flag=True,
              default=False)
@click.option('--platform', default=None,
              help="Pin the fanned-out tasks' JAX platform (e.g. 'cpu')")
@click.option('--benchmarks', default=None,
              help='Comma-separated benchmark allowlist. Use when one '
                   'results tree mixes cells from different configs (e.g. '
                   'config_kde trains unscaled): fan each subset out with '
                   'the config it was trained under.')
def main(results_dir, config_file, output, rundir, local, max_tasks,
         skip_completed, platform, benchmarks):
    composite = ResultsComposite(results_dir)
    allow = set(benchmarks.split(',')) if benchmarks else None
    pairs = []
    for bench in composite.get_benchmark_names():
        if allow is not None and bench not in allow:
            continue
        for dset in composite.get_dataset_names(bench):
            pairs.append((bench, dset))

    os.makedirs(rundir, exist_ok=True)
    tasks = []
    for bench, dset in pairs:
        outfile = os.path.join(rundir, f'metrics_{bench}_{dset}.csv')
        if skip_completed and os.path.exists(outfile):
            print(f'Skipping completed {bench}/{dset}')
            tasks.append((bench, dset, outfile, 0))
            continue
        tasks.append((bench, dset, outfile, None))

    to_run = [t for t in tasks if t[3] is None]
    print(f'Running {len(to_run)} tasks with {max_tasks} workers')
    results = [t for t in tasks if t[3] == 0]
    with ThreadPoolExecutor(max_workers=max_tasks) as pool:
        futures = [pool.submit(run_evaluate_metrics, results_dir, config_file,
                               b, d, o, rundir, platform)
                   for b, d, o, _ in to_run]
        for fut in futures:
            results.append(fut.result())

    combine_results(results, output)


if __name__ == '__main__':
    main()

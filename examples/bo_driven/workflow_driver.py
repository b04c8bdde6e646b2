"""Fan the (benchmark × uq_method × dataset-split) grid out as concurrent
restartable tasks.

The reference used Parsl + SLURM with ``retries=20`` per task (reference
``examples/bo_driven/workflow_driver.py``).  Here each cell runs as a
subprocess driving ``bo.py --restart``; failures are retried up to
``retries`` times, resuming from the per-trial checkpoints.  Two execution
modes:

- local process pool (default) — ``max_concurrent_tasks`` simultaneous cells,
- ``--sbatch`` — emit one sbatch script per cell using the
  ``bo_slurm_config`` block, for SLURM clusters.
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from itertools import product

import click
import yaml


def get_config(config_filename):
    with open(config_filename) as f:
        return yaml.safe_load(f)


def run_bo_task(config_path, benchmark, uq_method, dataset, output,
                rundir, retries, platform=None):
    env = dict(os.environ)
    for var in ('SLURM_CPU_BIND', 'SLURM_CPU_BIND_LIST', 'SLURM_CPUS_ON_NODE',
                'SLURM_CPUS_PER_TASK', 'SLURM_CPU_BIND_TYPE', 'SLURM_JOB_NAME'):
        env.pop(var, None)
    bo_script = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'bo.py')
    cmd = [sys.executable, bo_script,
           '--benchmark', benchmark, '--config', config_path,
           '--uq_method', uq_method, '--dataset', dataset,
           '--output', output, '--restart']
    if platform:
        cmd += ['--platform', platform]
    os.makedirs(rundir, exist_ok=True)
    log_base = os.path.join(rundir, f'{benchmark}_{uq_method}_{dataset}')
    for attempt in range(retries + 1):
        with open(f'{log_base}.out', 'a') as out, \
                open(f'{log_base}.err', 'a') as err:
            out.write(f'--- attempt {attempt}: {" ".join(cmd)}\n')
            out.flush()
            rc = subprocess.run(cmd, stdout=out, stderr=err, env=env).returncode
        if rc == 0:
            return (benchmark, uq_method, dataset, 0)
        # Exponential backoff between retries (30 s … 10 min): the dominant
        # real failure mode is a temporarily unreachable device (chip held
        # by a dying process / tunnel hiccup), where an immediate relaunch
        # just re-blocks on backend init. Parsl's retry loop got the same
        # effect from SLURM queue latency.
        if attempt < retries:
            backoff = min(30 * 2 ** attempt, 600)
            print(f'Task {benchmark}/{uq_method}/{dataset} failed '
                  f'(attempt {attempt}, rc={rc}); retrying with --restart '
                  f'in {backoff}s')
            time.sleep(backoff)
        else:
            print(f'Task {benchmark}/{uq_method}/{dataset} failed '
                  f'(attempt {attempt}, rc={rc}); retries exhausted')
    return (benchmark, uq_method, dataset, rc)


def emit_sbatch_scripts(config_data, config_path, total, output, rundir):
    slurm = dict(config_data.get('bo_slurm_config', {}))
    os.makedirs(rundir, exist_ok=True)
    scripts = []
    for bench, uq_method, dset in total:
        name = f'{bench}_{uq_method}_{dset}'
        path = os.path.join(rundir, f'{name}.sbatch')
        with open(path, 'w') as f:
            f.write('#!/bin/bash\n')
            if 'partition' in slurm:
                f.write(f'#SBATCH --partition={slurm["partition"]}\n')
            if 'account' in slurm:
                f.write(f'#SBATCH --account={slurm["account"]}\n')
            if 'walltime' in slurm:
                f.write(f'#SBATCH --time={slurm["walltime"]}\n')
            f.write(f'#SBATCH --nodes={slurm.get("nodes", 1)}\n')
            f.write(f'#SBATCH --ntasks-per-node='
                    f'{slurm.get("ntasks_per_node", 1)}\n')
            f.write(f'#SBATCH --job-name={name}\n')
            bo_script = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), 'bo.py')
            f.write(f'{sys.executable} {bo_script} --benchmark {bench} '
                    f'--config {config_path} --uq_method {uq_method} '
                    f'--dataset {dset} --output {output} --restart\n')
        scripts.append(path)
    return scripts


@click.command()
@click.option('--config', default='./config.yaml',
              help='Path to the config file', required=False)
@click.option('--output', default='workflow_output',
              help='Path to the output directory.', required=False)
@click.option('--parsl_rundir', '--rundir', 'rundir', default='./rundir',
              help='Path to the task log/run directory', required=False)
@click.option('--max_tasks', default=None, type=int,
              help='Max concurrent tasks (default from workflow_config)')
@click.option('--sbatch', is_flag=True, default=False,
              help='Emit sbatch scripts instead of running locally')
@click.option('--platform', default=None,
              help="Pin the tasks' JAX platform (e.g. 'cpu')")
@click.option('--cells', default=None,
              help='Comma-separated benchmark:uq_method:dataset triples; '
                   'runs exactly these cells in the given order instead of '
                   'the full benchmarks × uq_methods × splits product')
def main(config, output, rundir, max_tasks, sbatch, platform, cells):
    config_data = get_config(config)
    benches = list(config_data['benchmarks'].keys())
    uq_methods = list(config_data['uq_methods'].keys())
    dsets = ['tails', 'gaps']
    if cells:
        total = []
        for spec in cells.split(','):
            parts = spec.strip().split(':')
            if len(parts) != 3:
                raise click.BadParameter(
                    f'cell {spec!r} is not benchmark:uq_method:dataset')
            b, m, d = parts
            if b not in benches:
                raise click.BadParameter(
                    f'unknown benchmark {b!r} (config has {benches})')
            if m not in uq_methods:
                raise click.BadParameter(
                    f'unknown uq_method {m!r} (config has {uq_methods})')
            if d not in dsets:
                raise click.BadParameter(f'unknown dataset split {d!r}')
            total.append((b, m, d))
    else:
        total = list(product(benches, uq_methods, dsets))

    wf_cfg = config_data.get('workflow_config', {})
    retries = wf_cfg.get('retries', 20)
    workers = max_tasks or wf_cfg.get('max_concurrent_tasks', 2)

    if sbatch:
        scripts = emit_sbatch_scripts(config_data, config, total, output,
                                      rundir)
        for s in scripts:
            print(f'sbatch {s}')
        return

    print(f'Running {len(total)} tasks with {workers} workers, '
          f'{retries} retries each')
    results = []
    with ThreadPoolExecutor(max_workers=workers) as pool:
        futures = [pool.submit(run_bo_task, config, b, m, d, output,
                               rundir, retries, platform)
                   for b, m, d in total]
        for fut in futures:
            results.append(fut.result())

    failed = [r for r in results if r[3] != 0]
    for b, m, d, rc in results:
        print(f'{b}/{m}/{d}: {"OK" if rc == 0 else f"FAILED rc={rc}"}')
    if failed:
        sys.exit(1)


if __name__ == '__main__':
    main()

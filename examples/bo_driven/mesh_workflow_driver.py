"""Concurrent BO trials across mesh slices — the TPU-native replacement for
the reference's one-GPU-per-SLURM-task fan-out.

One process owns the whole chip mesh; each (benchmark × uq_method ×
dataset-split) cell is dispatched to a disjoint slice of devices and runs
its full restartable BO loop there.  JAX releases the GIL during compiled
execution, so slices genuinely overlap.

    python mesh_workflow_driver.py --config config.yaml \
        --output results --slices 4
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))
import os
import queue
import traceback
from concurrent.futures import ThreadPoolExecutor
from itertools import product

import click
import yaml


@click.command()
@click.option('--config', default='./config.yaml')
@click.option('--output', default='workflow_output')
@click.option('--slices', default=None, type=int,
              help='Number of mesh slices (= concurrent cells). '
                   'Defaults to the device count.')
@click.option('--retries', default=3, type=int)
@click.option('--cells', default=None,
              help='Comma-separated bench:method:dataset filter (same '
                   'syntax as workflow_driver); default = the full '
                   'benchmarks x uq_methods x splits product')
@click.option('--platform', default=None,
              help="Pin the JAX platform (e.g. 'cpu'). Must be used "
                   'in-process: site hooks can pre-register an accelerator '
                   'and ignore the JAX_PLATFORMS env var')
@click.option('--cpu_devices', default=None, type=int,
              help='Force N virtual host CPU devices (the '
                   'xla_force_host_platform_device_count flag, applied '
                   'before the backend initialises) — with --platform cpu '
                   'this validates multi-chip slice leasing without N '
                   'real chips')
def main(config, output, slices, retries, cells, platform, cpu_devices):
    if cpu_devices:
        os.environ['XLA_FLAGS'] = (
            os.environ.get('XLA_FLAGS', '')
            + f' --xla_force_host_platform_device_count={cpu_devices}')
    import jax
    if platform:
        jax.config.update('jax_platforms', platform)
    from nnueehcs_tpu.driver import run_bo_experiment

    with open(config) as f:
        config_data = yaml.safe_load(f)

    devices = jax.devices()
    n_slices = slices or len(devices)
    n_slices = min(n_slices, len(devices))
    per_slice = len(devices) // n_slices
    device_slices = [devices[i * per_slice:(i + 1) * per_slice]
                     for i in range(n_slices)]
    print(f'{len(devices)} devices -> {n_slices} slices of {per_slice}')

    if cells:
        cell_list = [tuple(c.split(':')) for c in cells.split(',')]
        for b, m, d in cell_list:
            if b not in config_data['benchmarks'] or \
                    m not in config_data['uq_methods'] or \
                    d not in ('tails', 'gaps'):
                raise click.BadParameter(
                    f'unknown cell {b}:{m}:{d} (order is '
                    f'bench:method:dataset)')
        cells = cell_list
    else:
        benches = list(config_data['benchmarks'].keys())
        uq_methods = list(config_data['uq_methods'].keys())
        cells = list(product(benches, uq_methods, ['tails', 'gaps']))

    # slices are leased from a pool, not assigned by submission index —
    # otherwise a fast cell's worker could start the next queued cell on a
    # slice another cell is still using
    free_slices = queue.Queue()
    for i in range(n_slices):
        free_slices.put(i)

    def run_cell(bench, method, dset):
        slice_idx = free_slices.get()
        devs = device_slices[slice_idx]
        try:
            for attempt in range(retries + 1):
                try:
                    run_bo_experiment(bench, method, config_data, dset,
                                      output, restart=True, devices=devs)
                    return (bench, method, dset, 'OK')
                except Exception as e:
                    print(f'{bench}/{method}/{dset} attempt {attempt} '
                          f'failed: {e}')
                    traceback.print_exc()
            return (bench, method, dset, 'FAILED')
        finally:
            free_slices.put(slice_idx)

    results = []
    with ThreadPoolExecutor(max_workers=n_slices) as pool:
        futures = [pool.submit(run_cell, bench, method, dset)
                   for bench, method, dset in cells]
        for fut in futures:
            results.append(fut.result())

    for bench, method, dset, status in results:
        print(f'{bench}/{method}/{dset}: {status}')
    if any(r[3] != 'OK' for r in results):
        _sys.exit(1)


if __name__ == '__main__':
    main()

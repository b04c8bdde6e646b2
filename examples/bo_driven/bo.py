"""BO-driven UQ hyperparameter search — one (benchmark × uq_method ×
dataset-split) cell.

Thin CLI over :func:`nnueehcs_tpu.driver.run_bo_experiment`; same flags as
the reference driver (``/root/reference/examples/bo_driven/bo.py:306-313``)::

    python bo.py --benchmark minibude --uq_method ensemble \
        --config config.yaml --dataset tails --output results [--restart]
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))
import os

import click
import yaml

from nnueehcs_tpu.driver import run_bo_experiment


@click.command()
@click.option('--benchmark')
@click.option('--uq_method')
@click.option('--config', default='config.yaml')
@click.option('--dataset', type=click.Choice(['tails', 'gaps']))
@click.option('--output', type=click.Path(), help='Name of output directory')
@click.option('--restart', is_flag=True, default=False,
              help='Restart from a previous run found in output directory')
@click.option('--platform', default=None,
              help="Pin the JAX platform (e.g. 'cpu'); needed where site "
                   "hooks pre-register an accelerator and ignore "
                   "JAX_PLATFORMS")
def main(benchmark, uq_method, config, dataset, output, restart, platform):
    # defuse inherited SLURM CPU-bind state when fanned out from a scheduler
    for var in ('SLURM_CPU_BIND', 'SLURM_CPU_BIND_LIST', 'SLURM_CPUS_ON_NODE',
                'SLURM_CPUS_PER_TASK', 'SLURM_CPU_BIND_TYPE', 'SLURM_JOB_NAME'):
        os.environ.pop(var, None)
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)
    with open(config) as f:
        config_data = yaml.safe_load(f)
    run_bo_experiment(benchmark, uq_method, config_data, dataset, output,
                      restart=restart)


if __name__ == '__main__':
    main()

"""Test environment: force CPU with 8 virtual devices so mesh/sharding tests
run anywhere.

Note: this environment pre-imports jax at interpreter startup (site hook)
with JAX_PLATFORMS pinned to the TPU plugin, so setting env vars here is too
late for the platform choice — update jax.config directly.  XLA_FLAGS is
still read lazily at first backend initialisation, so the virtual-device
flag works as long as no jax computation ran before this conftest.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        '--runslow', action='store_true', default=False,
        help='also run tests marked slow (multi-minute subprocess grids, '
             'interpret-mode Pallas sweeps, BO convergence runs)')


def pytest_configure(config):
    config.addinivalue_line(
        'markers',
        'slow: long-running test, skipped by default; run with --runslow '
        'or an explicit -m expression')


def pytest_collection_modifyitems(config, items):
    # an explicit -m expression governs selection; otherwise slow tests are
    # skipped so the default `pytest -q` profile stays under ~5 minutes
    if config.getoption('--runslow') or config.getoption('markexpr'):
        return
    skip = pytest.mark.skip(reason='slow: use --runslow (or -m slow)')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip)

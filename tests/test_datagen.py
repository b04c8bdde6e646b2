"""Benchmark data-generation tests: the binomial-tree pricer against the
Black-Scholes closed form (convergence in the step limit), file writers
round-tripping through the dataset readers."""
import numpy as np

from nnueehcs_tpu.datagen import (binomial_option_price,
                                  generate_binomial_options,
                                  generate_benchmark_files)
from nnueehcs_tpu.data_utils import get_dataset_from_config


def black_scholes_call(s, k, r, v, t):
    from scipy.stats import norm
    d1 = (np.log(s / k) + (r + v * v / 2) * t) / (v * np.sqrt(t))
    d2 = d1 - v * np.sqrt(t)
    return s * norm.cdf(d1) - k * np.exp(-r * t) * norm.cdf(d2)


def test_binomial_converges_to_black_scholes():
    s = np.array([20.0, 15.0, 25.0])
    k = np.array([18.0, 20.0, 20.0])
    r = np.array([0.03, 0.02, 0.05])
    v = np.array([0.08, 0.10, 0.06])
    t = np.array([2.0, 5.0, 1.0])
    bs = black_scholes_call(s, k, r, v, t)
    crr = binomial_option_price(s, k, r, v, t, steps=512)
    assert np.allclose(crr, bs, rtol=2e-3)


def test_binomial_no_arbitrage_bounds():
    ipt, opt = generate_binomial_options(2000, seed=1)
    s, k, r, _, t = ipt.T
    price = opt[:, 0]
    intrinsic = np.maximum(s - k * np.exp(-r * t), 0)
    assert np.all(price >= intrinsic - 1e-3)   # >= discounted intrinsic
    assert np.all(price <= s + 1e-5)           # <= spot


def test_generated_files_round_trip(tmp_path):
    paths = generate_benchmark_files(str(tmp_path), sizes={
        'binomial_options': 500, 'minibude': 400, 'ailerons': 300,
        'airfoil': 200, 'puma': 200})
    configs = {
        'binomial_options': {'format': 'hdf5',
                             'path': paths['binomial_options'],
                             'group_name': 'BinomialOptionsKernel',
                             'input_dataset': 'input',
                             'output_dataset': 'output'},
        'minibude': {'format': 'hdf5', 'path': paths['minibude'],
                     'group_name': 'BUDEKernel', 'input_dataset': 'input',
                     'output_dataset': 'output'},
        'ailerons': {'format': 'arff', 'path': paths['ailerons']},
        'airfoil': {'format': 'character_delimited',
                    'path': paths['airfoil'], 'delimiter': r'\s+'},
        'puma': {'format': 'character_delimited', 'path': paths['puma'],
                 'delimiter': r'\s+'},
    }
    dims = {'binomial_options': 5, 'minibude': 6, 'ailerons': 40,
            'airfoil': 5, 'puma': 8}
    for name, cfg in configs.items():
        ds = get_dataset_from_config(configs, name)
        assert len(ds) > 0, name
        assert np.asarray(ds.input).shape[1] == dims[name], name
        assert np.asarray(ds.output).shape[1] == 1, name

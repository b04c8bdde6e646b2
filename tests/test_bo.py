"""BO-engine tests: search-space mapping, client trial lifecycle,
save/restore round trip, GP-EI convergence on a toy function, Pareto
extraction."""
import numpy as np
import pytest

from nnueehcs_tpu.bo import (AxClient, BOClient, ObjectiveProperties,
                             ParameterSpace, GaussianProcess)

PARAMS = [
    {'name': 'lr', 'type': 'range', 'bounds': [1e-4, 1e-1], 'log_scale': True},
    {'name': 'width', 'type': 'range', 'bounds': [2, 64]},
    {'name': 'activation', 'type': 'choice', 'values': ['relu', 'tanh']},
    {'name': 'loss', 'type': 'fixed', 'value': 'l1_loss'},
]


def test_space_round_trip():
    space = ParameterSpace(PARAMS)
    assert space.dim == 3
    p = space.from_unit(np.array([0.5, 0.5, 0.2]))
    assert p['loss'] == 'l1_loss'
    assert isinstance(p['width'], int)
    assert 2 <= p['width'] <= 64
    assert p['activation'] == 'relu'
    u = space.to_unit(p)
    p2 = space.from_unit(u)
    assert p2['width'] == p['width']
    assert p2['activation'] == p['activation']
    assert p2['lr'] == pytest.approx(p['lr'], rel=1e-6)


def test_space_log_scale_geometric_midpoint():
    space = ParameterSpace([{'name': 'x', 'type': 'range',
                             'bounds': [1.0, 10000.0], 'log_scale': True}])
    p = space.from_unit(np.array([0.5]))
    assert p['x'] == pytest.approx(100.0, rel=1e-6)


def test_client_lifecycle(tmp_path):
    client = AxClient()
    client.create_experiment(name='t', parameters=PARAMS,
                             objectives={'score': ObjectiveProperties(minimize=True)},
                             tracking_metric_names=['score'])
    params, idx = client.get_next_trial()
    assert idx == 0
    assert set(params) == {'lr', 'width', 'activation', 'loss'}
    client.complete_trial(trial_index=idx, raw_data={'score': (1.5, 0.0)})
    _, idx1 = client.get_next_trial()
    client.log_trial_failure(trial_index=idx1)
    assert client.trials[0]['status'] == 'completed'
    assert client.trials[1]['status'] == 'failed'

    path = tmp_path / 'ax_client.json'
    client.save_to_json_file(str(path))
    restored = AxClient.load_from_json_file(str(path))
    assert restored.trials == client.trials
    _, idx2 = restored.get_next_trial()
    assert idx2 == 2


def test_bo_minimizes_toy_function():
    """GP-EI should clearly beat the Sobol phase on a smooth bowl."""
    space = [{'name': 'x', 'type': 'range', 'bounds': [-5.0, 5.0]},
             {'name': 'y', 'type': 'range', 'bounds': [-5.0, 5.0]}]
    client = BOClient(seed=3)
    client.create_experiment(name='bowl', parameters=space,
                             objectives={'f': ObjectiveProperties(minimize=True)})

    def f(p):
        return (p['x'] - 1.2) ** 2 + (p['y'] + 0.7) ** 2

    values = []
    for _ in range(25):
        params, idx = client.get_next_trial()
        values.append(f(params))
        client.complete_trial(trial_index=idx, raw_data={'f': (values[-1], 0.0)})

    init = client.num_init_trials
    assert min(values[init:]) < min(values[:init])
    assert min(values) < 0.5


def test_multi_objective_pareto():
    space = [{'name': 'x', 'type': 'range', 'bounds': [0.0, 1.0]}]
    client = BOClient(seed=1)
    client.create_experiment(
        name='mo', parameters=space,
        objectives={'a': ObjectiveProperties(minimize=True),
                    'b': ObjectiveProperties(minimize=False)})
    for _ in range(12):
        params, idx = client.get_next_trial()
        # a = x (min), b = x (max) -> conflict; pareto front is everything
        client.complete_trial(trial_index=idx,
                              raw_data={'a': (params['x'], 0),
                                        'b': (params['x'], 0)})
    pareto = client.get_pareto_optimal_parameters()
    assert len(pareto) == 12
    # dominated case: a = x, b = -x (both better at x=0)
    client2 = BOClient(seed=1)
    client2.create_experiment(
        name='mo2', parameters=space,
        objectives={'a': ObjectiveProperties(minimize=True),
                    'b': ObjectiveProperties(minimize=True)})
    xs = []
    for _ in range(10):
        params, idx = client2.get_next_trial()
        xs.append(params['x'])
        client2.complete_trial(trial_index=idx,
                               raw_data={'a': (params['x'], 0),
                                         'b': (params['x'], 0)})
    pareto2 = client2.get_pareto_optimal_parameters()
    # only trials tied at the minimum x survive (ties are mutually
    # non-dominating, so duplicates of the optimum all stay on the front)
    best_x = min(xs)
    assert len(pareto2) >= 1
    for _, (params, _) in pareto2.items():
        assert params['x'] == pytest.approx(best_x)


def test_failed_trials_excluded_from_model():
    space = [{'name': 'x', 'type': 'range', 'bounds': [0.0, 1.0]}]
    client = BOClient()
    client.create_experiment(name='f', parameters=space,
                             objectives={'y': ObjectiveProperties(minimize=True)})
    for i in range(8):
        params, idx = client.get_next_trial()
        if i % 2:
            client.log_trial_failure(trial_index=idx)
        else:
            client.complete_trial(trial_index=idx, raw_data={'y': (params['x'], 0)})
    # must still be able to suggest
    params, _ = client.get_next_trial()
    assert 0.0 <= params['x'] <= 1.0


def test_gp_fits_and_predicts():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(20, 2))
    y = np.sin(3 * x[:, 0]) + x[:, 1] ** 2
    gp = GaussianProcess(x, y)
    mean, var = gp.posterior(x)
    # posterior at training points should be close to targets
    assert np.abs(mean - y).mean() < 0.1
    assert np.all(var >= 0)

"""Property-based tests (hypothesis): invariants that must hold for any
input, not just the fixtures."""
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from nnueehcs_tpu.evaluation import wasserstein_1d, auroc_score
from nnueehcs_tpu.classification import PercentileBasedIdOodClassifier
from nnueehcs_tpu.bo.space import ParameterSpace

finite_floats = st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False)


@settings(max_examples=50, deadline=None)
@given(st.lists(finite_floats, min_size=2, max_size=50),
       st.lists(finite_floats, min_size=2, max_size=50))
def test_wasserstein_is_a_metric(a, b):
    a, b = np.asarray(a), np.asarray(b)
    d_ab = wasserstein_1d(a, b)
    assert d_ab >= 0
    assert wasserstein_1d(b, a) == pytest.approx(d_ab, rel=1e-9, abs=1e-12)
    assert wasserstein_1d(a, a) == pytest.approx(0.0, abs=1e-9)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 1), min_size=4, max_size=100),
       st.data())
def test_auroc_bounds_and_flip(labels, data):
    if len(set(labels)) < 2:
        labels = labels[:-1] + [1 - labels[-1]]
    scores = data.draw(st.lists(finite_floats, min_size=len(labels),
                                max_size=len(labels)))
    y = np.asarray(labels)
    s = np.asarray(scores)
    a = auroc_score(y, s)
    assert 0.0 <= a <= 1.0
    # negating the scores reflects the AUROC around 0.5
    assert auroc_score(y, -s) == pytest.approx(1.0 - a, abs=1e-9)


@settings(max_examples=50, deadline=None)
@given(st.floats(0.01, 0.99),
       st.lists(finite_floats, min_size=3, max_size=60),
       st.lists(finite_floats, min_size=3, max_size=60))
def test_classifier_rates_are_consistent(p, id_scores, ood_scores):
    res = PercentileBasedIdOodClassifier(p)._evaluate_scores(
        np.asarray(id_scores), np.asarray(ood_scores))
    for k, v in res.items():
        assert 0.0 <= v <= 1.0, (k, v)
    # sensitivity + fnr and specificity + fpr partition their populations
    assert res['sensitivity'] + res['fnr'] == pytest.approx(1.0, abs=1e-9)
    assert res['specificity'] + res['fpr'] == pytest.approx(1.0, abs=1e-9)


@settings(max_examples=50, deadline=None)
@given(st.data())
def test_parameter_space_round_trip(data):
    space = ParameterSpace([
        {'name': 'a', 'type': 'range', 'bounds': [-3.0, 7.0]},
        {'name': 'b', 'type': 'range', 'bounds': [1.0, 10000.0],
         'log_scale': True},
        {'name': 'c', 'type': 'range', 'bounds': [2, 32]},
        {'name': 'd', 'type': 'choice', 'values': ['x', 'y', 'z']},
    ])
    u = np.asarray(data.draw(st.lists(
        st.floats(0.0, 1.0, allow_nan=False), min_size=4, max_size=4)))
    params = space.from_unit(u)
    assert -3.0 <= params['a'] <= 7.0
    assert 1.0 <= params['b'] <= 10000.0
    assert isinstance(params['c'], int) and 2 <= params['c'] <= 32
    assert params['d'] in ('x', 'y', 'z')
    # round trip is idempotent
    params2 = space.from_unit(space.to_unit(params))
    assert params2['c'] == params['c']
    assert params2['d'] == params['d']
    assert params2['a'] == pytest.approx(params['a'], rel=1e-6, abs=1e-9)
    assert params2['b'] == pytest.approx(params['b'], rel=1e-6)

"""Classifier tests (modelled on the reference's
``tests/test_classification.py`` exact-value case)."""
import numpy as np
import pytest

from nnueehcs_tpu.classification import (PercentileBasedIdOodClassifier,
                                         ReversedPercentileBasedIdOodClassifier)


class Model:
    def __init__(self):
        pass

    def eval(self):
        return self

    def __call__(self, x, return_ue=False):
        x = np.asarray(x)
        if return_ue:
            return np.random.randn(*x.shape), x
        return np.random.randn(*x.shape)


def test_exact_half_split():
    scores = np.arange(100.0)
    clf = PercentileBasedIdOodClassifier(0.5)
    model = Model()
    res = clf.evaluate(model, (scores, scores), (scores, scores))
    assert res['sensitivity'] == pytest.approx(0.5, abs=0.01)
    assert res['specificity'] == pytest.approx(0.5, abs=0.01)
    assert res['fpr'] == pytest.approx(0.5, abs=0.01)
    assert res['fnr'] == pytest.approx(0.5, abs=0.01)
    assert 'id_preds' in res and 'ood_scores' in res


def test_percentile_validation():
    with pytest.raises(ValueError):
        PercentileBasedIdOodClassifier(1.5)


def test_identical_scores_edge_case():
    clf = PercentileBasedIdOodClassifier(0.9)
    res = clf._evaluate_scores(np.ones(10), np.ones(10) * 2)
    # threshold collapses to the identical ID value; all OOD above it
    assert res['sensitivity'] == 1.0
    assert res['specificity'] == 1.0


def test_reversed_classifier():
    id_scores = np.arange(100.0) + 100      # ID scores high
    ood_scores = np.arange(100.0)           # OOD scores low
    clf = ReversedPercentileBasedIdOodClassifier(0.95)
    res = clf._evaluate_scores(id_scores, ood_scores)
    assert res['sensitivity'] == 1.0


def test_guarded_denominators():
    clf = PercentileBasedIdOodClassifier(0.5)
    assert clf._sensitivity(0, 0) == 0.0
    assert clf._specificity(0, 0) == 0.0
    assert clf._fpr(0, 0) == 0.0
    assert clf._fnr(0, 0) == 0.0

"""Evaluation-stack tests: metric schemas, the UE container, golden edge
values for TNR@TPR and percentile classifiers, and parity of the native
metric math against scipy/sklearn (modelled on the reference's
``tests/test_evaluation.py`` with the same DummyModel mock pattern)."""
import numpy as np
import pytest

from nnueehcs_tpu.evaluation import (
    UncertaintyEstimate, WassersteinEvaluation, EuclideanEvaluation,
    JensenShannonEvaluation, MeanScoreEvaluation, MaxScoreEvaluation,
    PercentileScoreEvaluation, TNRatTPX, AUROC, PercentileBasedClassifier,
    MetricEvaluator, get_evaluator, get_uncertainty_evaluator,
    wasserstein_1d, jensen_shannon_distance, auroc_score,
    BaseModelRuntimeEvaluation, UncertaintyEstimatingThroughputEvaluation)


class DummyModel:
    """Returns canned scores, choosing ID vs OOD by input identity —
    the reference's pattern for testing metrics without training."""

    def __init__(self, id_input, id_scores, ood_scores):
        self.id_input = np.asarray(id_input)
        self.id_scores = np.asarray(id_scores)
        self.ood_scores = np.asarray(ood_scores)

    def eval(self):
        return self

    def __call__(self, x, return_ue=False):
        x = np.asarray(x)
        if x.shape == self.id_input.shape and np.array_equal(x, self.id_input):
            scores = self.id_scores
            preds = np.zeros((len(scores), 1))
        elif x.shape[0] == len(self.id_scores) + len(self.ood_scores):
            scores = np.concatenate([self.id_scores, self.ood_scores])
            preds = np.zeros((len(scores), 1))
        else:
            scores = self.ood_scores
            preds = np.zeros((len(scores), 1))
        if return_ue:
            return preds, scores
        return preds


@pytest.fixture
def separated_model():
    id_input = np.random.randn(100, 3)
    return (DummyModel(id_input, np.random.uniform(0, 1, 100),
                       np.random.uniform(10, 11, 100)),
            id_input)


@pytest.fixture
def data_pair(separated_model):
    model, id_input = separated_model
    ood_input = np.random.randn(100, 3) + 50
    id_data = (id_input, np.zeros((100, 1)))
    ood_data = (ood_input, np.zeros((100, 1)))
    return model, id_data, ood_data


# ---------------------------------------------------------------- container
def test_ue_from_numpy():
    ue = UncertaintyEstimate(np.ones(10))
    assert ue.dimensions == 1
    assert ue.flatten().shape == (10,)
    assert ue.mean() == 1.0


def test_ue_from_jax():
    import jax.numpy as jnp
    ue = UncertaintyEstimate(jnp.ones((5, 1)))
    assert ue.dimensions == 1
    assert isinstance(ue.data, np.ndarray)


def test_ue_tuple():
    ue = UncertaintyEstimate((np.ones(4), np.zeros(4)))
    assert ue.dimensions == 2
    assert ue.mean() == 0.5
    with pytest.raises(ValueError):
        ue.flatten()


def test_ue_empty_raises():
    with pytest.raises(ValueError):
        UncertaintyEstimate(np.array([]))
    with pytest.raises(ValueError):
        UncertaintyEstimate((np.ones(3), np.array([])))


def test_ue_mismatched_tuple_raises():
    with pytest.raises(ValueError):
        UncertaintyEstimate((np.ones(3), np.ones(4)))


def test_ue_nan_propagates():
    ue = UncertaintyEstimate(np.array([1.0, np.nan]))
    assert np.isnan(ue.mean())


def test_ue_unsupported_type():
    with pytest.raises(TypeError):
        UncertaintyEstimate('not an array')


# ------------------------------------------------------------ native math
def test_wasserstein_matches_scipy():
    from scipy.stats import wasserstein_distance
    rng = np.random.default_rng(0)
    a = rng.normal(size=500)
    b = rng.normal(loc=2.0, size=300)
    assert wasserstein_1d(a, b) == pytest.approx(wasserstein_distance(a, b),
                                                 rel=1e-9)


def test_wasserstein_identical_zero():
    a = np.arange(100.0)
    assert wasserstein_1d(a, a) == pytest.approx(0.0)


def test_wasserstein_disjoint_positive():
    assert wasserstein_1d(np.zeros(10), np.ones(10)) == pytest.approx(1.0)


def test_jsd_matches_scipy():
    from scipy.spatial.distance import jensenshannon
    rng = np.random.default_rng(1)
    p = rng.uniform(0.1, 1, 50)
    q = rng.uniform(0.1, 1, 50)
    assert jensen_shannon_distance(p, q) == pytest.approx(
        jensenshannon(p / p.sum(), q / q.sum()), rel=1e-6)


def test_auroc_matches_sklearn():
    from sklearn.metrics import roc_auc_score
    rng = np.random.default_rng(2)
    y_true = rng.integers(0, 2, 300)
    y_score = rng.normal(size=300) + y_true        # correlated with ties? add some
    y_score = np.round(y_score, 1)                 # induce ties
    assert auroc_score(y_true, y_score) == pytest.approx(
        roc_auc_score(y_true, y_score), rel=1e-9)


# ------------------------------------------------------------- UQ metrics
def test_distance_metrics_schema(data_pair):
    model, id_data, ood_data = data_pair
    for metric in [WassersteinEvaluation(), JensenShannonEvaluation(),
                   MeanScoreEvaluation(), MaxScoreEvaluation(),
                   PercentileScoreEvaluation(95)]:
        result = metric.evaluate(model, id_data, ood_data)
        assert isinstance(result, dict)
        for v in result.values():
            assert isinstance(v, float)
        objectives = metric.get_objectives()
        assert all({'name', 'type'} <= set(o) for o in objectives)
        assert all(o['type'] in ('maximize', 'minimize') for o in objectives)


def test_wasserstein_separated(data_pair):
    model, id_data, ood_data = data_pair
    res = WassersteinEvaluation().evaluate(model, id_data, ood_data)
    assert res['wasserstein_distance'] > 5.0


def test_euclidean():
    id_ue = UncertaintyEstimate(np.zeros((10, 2)))
    ood_ue = UncertaintyEstimate(np.ones((10, 2)) * 3)
    res = EuclideanEvaluation()._evaluate_uncertainties(id_ue, ood_ue)
    assert res['euclidean_distance'] == pytest.approx(np.sqrt(18))


def test_percentile_score_validation():
    with pytest.raises(ValueError):
        PercentileScoreEvaluation(percentile=150)


# -------------------------------------------------------------- TNR@TPR
def test_tnr_perfect_separation(data_pair):
    model, id_data, ood_data = data_pair
    res = TNRatTPX(0.95).evaluate(model, id_data, ood_data)
    assert res['tnr_at_tpr95'] == 1.0


def test_tnr_complete_overlap():
    scores = np.arange(100.0)
    model = DummyModel(np.random.randn(100, 3), scores, scores)
    id_data = (model.id_input, None)
    ood_data = (np.random.randn(100, 3) + 9, None)
    res = TNRatTPX(0.95).evaluate(model, id_data, ood_data)
    assert res['tnr_at_tpr95'] <= 0.06


def test_tnr_ctor_validation():
    with pytest.raises(ValueError):
        TNRatTPX(1.5)
    with pytest.raises(ValueError):
        TNRatTPX(-0.1)


def test_tnr_matches_loop_reference():
    """Vectorised sweep must equal the reference's python threshold loop."""
    rng = np.random.default_rng(3)
    id_scores = rng.normal(size=60)
    ood_scores = rng.normal(loc=0.8, size=70)

    def loop_tnr(target, reversed=False):
        thresholds = np.unique(np.concatenate([id_scores, ood_scores]))
        best = 0.0
        for t in thresholds:
            if reversed:
                tp = (id_scores > t).sum()
                tn = (ood_scores <= t).sum()
            else:
                tp = (ood_scores > t).sum()
                tn = (id_scores <= t).sum()
            tpr = tp / len(ood_scores)
            tnr = tn / len(id_scores)
            if tpr >= target and tnr > best:
                best = tnr
        return best

    for target in (0.5, 0.8, 0.95):
        for rev in (False, True):
            m = TNRatTPX(target, reversed=rev)
            got = m._evaluate_scores(id_scores, ood_scores)[str(m)]
            assert got == pytest.approx(loop_tnr(target, rev))


# ----------------------------------------------------------------- AUROC
def test_auroc_separated(data_pair):
    model, id_data, ood_data = data_pair
    res = AUROC().evaluate(model, id_data, ood_data)
    assert res['auroc'] == pytest.approx(1.0)


# ------------------------------------------- percentile classifier metric
def test_percentile_classifier_edges(data_pair):
    model, id_data, ood_data = data_pair
    res = PercentileBasedClassifier(0.95).evaluate(model, id_data, ood_data)
    assert res['sensitivity'] == 1.0
    assert res['specificity'] == pytest.approx(0.95)


def test_percentile_classifier_overlap():
    scores = np.arange(100.0)
    model = DummyModel(np.random.randn(100, 3), scores, scores)
    id_data = (model.id_input, None)
    ood_data = (np.random.randn(100, 3) + 9, None)
    res = PercentileBasedClassifier(0.95).evaluate(model, id_data, ood_data)
    assert res['sensitivity'] == pytest.approx(0.05)


def test_reversed_equals_normal_on_negated_scores():
    """The reversed classifier (lower score ⇒ OOD) must agree with the
    normal classifier applied to negated scores (up to threshold ties).

    Note: the reference repo's own ``test_reversed_percentile_classifier``
    asserts a different relationship and *fails against the reference
    implementation* (verified by running the reference suite); this test
    pins the actual code behaviour instead.
    """
    from nnueehcs_tpu.classification import (
        PercentileBasedIdOodClassifier, ReversedPercentileBasedIdOodClassifier)
    rng = np.random.default_rng(4)
    id_scores = rng.normal(size=2000)
    ood_scores = rng.normal(loc=1.0, size=2000)
    rev = ReversedPercentileBasedIdOodClassifier(0.9)._evaluate_scores(
        id_scores, ood_scores)
    neg = PercentileBasedIdOodClassifier(0.9)._evaluate_scores(
        -id_scores, -ood_scores)
    for k in ('sensitivity', 'specificity', 'fpr', 'fnr'):
        assert rev[k] == pytest.approx(neg[k], abs=0.01)


# ----------------------------------------------------------- aggregation
def test_metric_evaluator_merges(data_pair):
    model, id_data, ood_data = data_pair
    ev = MetricEvaluator([WassersteinEvaluation(), AUROC()])
    res = ev.evaluate(model, id_data, ood_data)
    assert 'wasserstein_distance' in res and 'auroc' in res
    objs = ev.get_training_objectives()
    assert len(objs) == 2
    assert ev.get_all_metrics() == ['wasserstein_distance', 'auroc']


def test_tnr_instance_names():
    ev = MetricEvaluator([TNRatTPX(0.95)])
    assert ev.get_training_objectives() == [{'name': 'tnr_at_tpr',
                                             'type': 'maximize'}]
    assert TNRatTPX(0.95).get_name() == 'tnr_at_tpr95'


# --------------------------------------------------------------- factories
def test_get_evaluator_posthoc_dialect():
    cfg = [
        {'name': 'tnr_at_tpr', 'target_tpr': 0.95, 'reversed': False},
        {'name': 'percentile_classification', 'threshold': 0.90},
        {'name': 'runtime'},
        {'name': 'uncertainty_estimating_runtime'},
        {'name': 'base_model_throughput'},
        {'name': 'auroc'},
        {'name': 'uncertainty_estimating_throughput'},
        {'name': 'max_memory_usage'},
        {'name': 'wasserstein'},
        {'name': 'mean_score'},
        {'name': 'percentile_score', 'percentile': 95},
    ]
    ev = get_evaluator(cfg)
    assert len(ev.metrics) == len(cfg)


def test_get_uncertainty_evaluator_dialects():
    ev = get_uncertainty_evaluator('wasserstein_distance')
    assert isinstance(ev.metrics[0], WassersteinEvaluation)
    ev = get_uncertainty_evaluator({'name': 'tnr_at_tpr', 'target_tpr': 0.9})
    assert isinstance(ev.metrics[0], TNRatTPX)
    ev = get_uncertainty_evaluator(['mean_score',
                                    {'name': 'percentile_score',
                                     'percentile': 95}])
    assert len(ev.metrics) == 2
    with pytest.raises(ValueError):
        get_uncertainty_evaluator('no_such_metric')


# ---------------------------------------------------------- cost metrics
def test_runtime_metric_runs(data_pair):
    model, id_data, ood_data = data_pair
    res = BaseModelRuntimeEvaluation(num_trials=3, num_warmup=1).evaluate(
        model, id_data, ood_data)
    assert res['runtime'] >= 0
    assert 'runtime_std' in res


def test_throughput_metric_runs(data_pair):
    model, id_data, ood_data = data_pair
    m = UncertaintyEstimatingThroughputEvaluation(num_trials=3, num_warmup=1)
    res = m.evaluate(model, id_data, ood_data)
    assert res['uncertainty_estimating_throughput'] > 0


# ---------------------------------------------------- numerical stability
def test_extreme_scale_stability():
    big = UncertaintyEstimate(np.full(50, 1e10))
    small = UncertaintyEstimate(np.full(50, 1e-10))
    res = WassersteinEvaluation()._evaluate_uncertainties(big, small)
    assert np.isfinite(res['wasserstein_distance'])


# ---------------------------------------------------------------- calibration
def test_calibration_perfectly_calibrated():
    """A model whose UE equals the true noise std should score ~0 error."""
    from nnueehcs_tpu.evaluation import CalibrationEvaluation

    rng = np.random.default_rng(0)
    n = 20000
    sigma = 0.5
    y = rng.normal(scale=sigma, size=(n, 1))

    class CalibratedModel:
        def eval(self):
            return self

        def __call__(self, x, return_ue=False):
            preds = np.zeros((n, 1))
            return (preds, np.full((n, 1), sigma)) if return_ue else preds

    m = CalibratedModel()
    res = CalibrationEvaluation().evaluate(m, (np.zeros((n, 1)), y),
                                           (np.zeros((n, 1)), y))
    assert res['calibration_error'] < 0.02
    assert res['coverage_68'] == pytest.approx(0.683, abs=0.02)
    assert res['coverage_95'] == pytest.approx(0.95, abs=0.01)

    class OverconfidentModel(CalibratedModel):
        def __call__(self, x, return_ue=False):
            preds = np.zeros((n, 1))
            return (preds, np.full((n, 1), sigma / 5)) if return_ue else preds

    res_over = CalibrationEvaluation().evaluate(
        OverconfidentModel(), (np.zeros((n, 1)), y), (np.zeros((n, 1)), y))
    assert res_over['calibration_error'] > 0.3


def test_calibration_in_factories():
    from nnueehcs_tpu.evaluation import CalibrationEvaluation
    ev = get_evaluator([{'name': 'calibration'}])
    assert isinstance(ev.metrics[0], CalibrationEvaluation)
    ev2 = get_uncertainty_evaluator('calibration')
    assert isinstance(ev2.metrics[0], CalibrationEvaluation)


def test_jsd_multidim_tuple_path():
    """Tuple (multi-channel) UEs: JSD averages per-row distances and
    Wasserstein averages per-channel distances (reference
    evaluation.py:184-187, 252-266)."""
    rng = np.random.default_rng(7)
    id_ue = UncertaintyEstimate((np.abs(rng.normal(size=(50, 4))) + 0.1,
                                 np.abs(rng.normal(size=(50, 4))) + 0.1))
    ood_ue = UncertaintyEstimate((np.abs(rng.normal(size=(50, 4))) + 0.5,
                                  np.abs(rng.normal(size=(50, 4))) + 0.5))
    res = WassersteinEvaluation()._evaluate_uncertainties(id_ue, ood_ue)
    assert np.isfinite(res['wasserstein_distance'])
    with pytest.raises(ValueError):
        WassersteinEvaluation()._evaluate_uncertainties(
            id_ue, UncertaintyEstimate(np.ones(50)))

    # 2-D single-array data takes the per-row jensenshannon path
    p1 = np.abs(rng.normal(size=(10, 6))) + 0.1
    p2 = np.abs(rng.normal(size=(10, 6))) + 0.1
    je = JensenShannonEvaluation()
    val = je._average_js_distance(p1, p2)
    from scipy.spatial.distance import jensenshannon
    ref = np.mean([jensenshannon(p1[i], p2[i]) for i in range(10)])
    assert val == pytest.approx(ref, rel=1e-6)


def test_ue_runtime_metric_honors_config():
    """Compat fix: the reference builds uncertainty_estimating_runtime
    without consulting trials/warmup config (reference
    ``evaluation.py:751-752``); we honor them."""
    from nnueehcs_tpu.evaluation import _create_single_evaluator
    m = _create_single_evaluator({'name': 'uncertainty_estimating_runtime',
                                  'trials': 3, 'warmup': 1})
    assert m.num_trials == 3
    assert m.num_warmup == 1
    # defaults unchanged
    m = _create_single_evaluator({'name': 'uncertainty_estimating_runtime'})
    assert m.num_trials == 20
    assert m.num_warmup == 5


def test_max_memory_usage_measures_the_pass():
    """Per-pass memory must scale with the evaluated batch (the reference
    resets CUDA peak stats per pass, ``evaluation.py:383-412``); a
    lifetime-peak reading would make consecutive different-size passes
    report identical numbers."""
    import jax
    from nnueehcs_tpu.evaluation import MaxMemoryUsageEvaluation
    from nnueehcs_tpu.model_builder import EnsembleModelBuilder

    descr = [{'Linear': {'args': [8, 64]}}, {'ReLU': {}},
             {'Linear': {'args': [64, 1]}}]
    model = EnsembleModelBuilder(descr, {'num_models': 4}).build()
    model.init(jax.random.PRNGKey(0), (8,))

    def data(n):
        x = np.random.randn(n, 8).astype(np.float32)
        return (x, np.zeros((n, 1), np.float32))

    metric = MaxMemoryUsageEvaluation()
    # big batch FIRST: under lifetime-peak semantics the later small batch
    # would report the large pass's peak
    big = metric.evaluate(model, data(4000), data(4000))['max_memory_usage']
    small = metric.evaluate(model, data(100), data(100))['max_memory_usage']
    assert big > 0 and small > 0
    assert small < big


def test_max_memory_counts_density_corpus():
    """The KDE fit corpus is a program *argument* (eval buffer), so the
    per-pass memory analysis must grow with the corpus — a closure-captured
    corpus would be invisible to it (and bloat every compile as an HLO
    constant)."""
    import jax
    from nnueehcs_tpu.evaluation import MaxMemoryUsageEvaluation
    from nnueehcs_tpu.model_builder import KNNKDEModelBuilder

    descr = [{'Linear': {'args': [8, 16]}}, {'ReLU': {}},
             {'Linear': {'args': [16, 1]}}]

    def scored_model(corpus_rows):
        m = KNNKDEModelBuilder(descr, {'k': 5}).build()
        m.init(jax.random.PRNGKey(0), (8,))
        m.fit_kde(np.random.randn(corpus_rows, 8).astype(np.float32))
        return m

    def data(n):
        return (np.random.randn(n, 8).astype(np.float32),
                np.zeros((n, 1), np.float32))

    metric = MaxMemoryUsageEvaluation()
    small = metric.evaluate(scored_model(1000), data(100),
                            data(100))['max_memory_usage']
    big = metric.evaluate(scored_model(200_000), data(100),
                          data(100))['max_memory_usage']
    # 200k×8 f32 corpus alone is ~6.1 MB; it must show up in the pass size
    assert big - small > 4.0, (small, big)

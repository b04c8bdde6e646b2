"""Direct A/B parity against the reference implementation.

When the reference checkout is present (mounted read-only at
``/root/reference``), run the same inputs through the reference's
``data_utils`` / ``classification`` / ``evaluation`` modules (importable
without pytorch-lightning) and through ours, and compare numerics.
These tests skip cleanly when the reference isn't available — the
framework itself never depends on it.
"""
import io
import sys

import numpy as np
import pytest

REF_PATH = '/root/reference'


def _reference_available():
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    try:
        import nnueehcs.data_utils   # noqa: F401
        import nnueehcs.classification  # noqa: F401
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _reference_available(),
                                reason='reference checkout not importable')


@pytest.fixture
def csv_file(tmp_path):
    rng = np.random.default_rng(0)
    data = np.column_stack([rng.normal(size=(300, 4)),
                            rng.normal(size=300) * 7])
    path = tmp_path / 'data.csv'
    np.savetxt(path, data, delimiter=',', fmt='%.8f')
    return str(path), data


@pytest.mark.parametrize('percentiles', ['[0, 70]', '[70, 100]',
                                         '[0, 30], [60, 100]', '[30, 60]'])
def test_percentile_partition_parity(csv_file, percentiles):
    path, _ = csv_file
    import nnueehcs.data_utils as ref_du
    import nnueehcs_tpu.data_utils as our_du

    ref = ref_du.CharacterDelimitedDataset(path, ',', percentiles=percentiles)
    ours = our_du.CharacterDelimitedDataset(path, ',', percentiles=percentiles)
    assert len(ref) == len(ours)
    assert np.allclose(ref.input.numpy(), np.asarray(ours.input), atol=1e-7)
    assert np.allclose(ref.output.numpy(), np.asarray(ours.output), atol=1e-7)


def test_scaling_parity(csv_file):
    path, _ = csv_file
    import nnueehcs.data_utils as ref_du
    import nnueehcs_tpu.data_utils as our_du

    ref_id = ref_du.CharacterDelimitedDataset(path, ',', percentiles='[0, 70]')
    ref_ood = ref_du.CharacterDelimitedDataset(path, ',', percentiles='[70, 100]')
    ref_ood = ref_du.prepare_dataset_for_use(ref_ood, {'scaling': True},
                                             scaling_dset=ref_id)
    ref_id = ref_du.prepare_dataset_for_use(ref_id, {'scaling': True})

    our_id = our_du.CharacterDelimitedDataset(path, ',', percentiles='[0, 70]')
    our_ood = our_du.CharacterDelimitedDataset(path, ',', percentiles='[70, 100]')
    our_ood = our_du.prepare_dataset_for_use(our_ood, {'scaling': True},
                                             scaling_dset=our_id)
    our_id = our_du.prepare_dataset_for_use(our_id, {'scaling': True})

    assert np.allclose(ref_id.input.numpy(), np.asarray(our_id.input), atol=1e-6)
    assert np.allclose(ref_ood.output.numpy(), np.asarray(our_ood.output),
                       atol=1e-6)


def test_classifier_parity():
    import torch
    import nnueehcs.classification as ref_cls
    import nnueehcs_tpu.classification as our_cls

    rng = np.random.default_rng(1)
    id_scores = rng.normal(size=500)
    ood_scores = rng.normal(loc=0.7, size=400)
    for p in (0.5, 0.8, 0.9, 0.95):
        ref = ref_cls.PercentileBasedIdOodClassifier(p)._evaluate_scores(
            torch.tensor(id_scores), torch.tensor(ood_scores))
        ours = our_cls.PercentileBasedIdOodClassifier(p)._evaluate_scores(
            id_scores, ood_scores)
        for k in ('sensitivity', 'specificity', 'fpr', 'fnr'):
            assert ours[k] == pytest.approx(ref[k], abs=1e-10), (p, k)

        ref_r = ref_cls.ReversedPercentileBasedIdOodClassifier(p)._evaluate_scores(
            torch.tensor(id_scores), torch.tensor(ood_scores))
        ours_r = our_cls.ReversedPercentileBasedIdOodClassifier(p)._evaluate_scores(
            id_scores, ood_scores)
        for k in ('sensitivity', 'specificity', 'fpr', 'fnr'):
            assert ours_r[k] == pytest.approx(ref_r[k], abs=1e-10), (p, k)


def test_tnr_at_tpr_parity():
    import torch
    import nnueehcs.evaluation as ref_ev
    import nnueehcs_tpu.evaluation as our_ev

    rng = np.random.default_rng(2)
    id_scores = rng.normal(size=120)
    ood_scores = rng.normal(loc=0.6, size=150)
    for target in (0.5, 0.8, 0.95):
        for rev in (False, True):
            ref = ref_ev.TNRatTPX(target, rev)._evaluate_scores(
                torch.tensor(id_scores), torch.tensor(ood_scores))
            ours = our_ev.TNRatTPX(target, rev)._evaluate_scores(
                id_scores, ood_scores)
            key = f'tnr_at_tpr{int(100 * target)}'
            assert ours[key] == pytest.approx(ref[key], abs=1e-12), (target, rev)


def test_uncertainty_estimate_parity():
    import nnueehcs.evaluation as ref_ev
    import nnueehcs_tpu.evaluation as our_ev

    data = np.random.default_rng(3).normal(size=(50, 2))
    ref_ue = ref_ev.UncertaintyEstimate(data)
    our_ue = our_ev.UncertaintyEstimate(data)
    assert ref_ue.dimensions == our_ue.dimensions == 1
    assert our_ue.mean() == pytest.approx(ref_ue.mean())

    tup = (data[:, 0], data[:, 1])
    assert our_ev.UncertaintyEstimate(tup).mean() == pytest.approx(
        ref_ev.UncertaintyEstimate(tup).mean())


def test_distance_metric_parity():
    import nnueehcs.evaluation as ref_ev
    import nnueehcs_tpu.evaluation as our_ev

    rng = np.random.default_rng(4)
    id_ue_data = np.abs(rng.normal(size=400))
    ood_ue_data = np.abs(rng.normal(loc=1.5, size=400))

    for ref_cls_, our_cls_, tol in [
            (ref_ev.WassersteinEvaluation, our_ev.WassersteinEvaluation, 1e-9),
            (ref_ev.JensenShannonEvaluation, our_ev.JensenShannonEvaluation, 1e-5)]:
        ref_res = ref_cls_()._evaluate_uncertainties(
            ref_ev.UncertaintyEstimate(id_ue_data),
            ref_ev.UncertaintyEstimate(ood_ue_data))
        our_res = our_cls_()._evaluate_uncertainties(
            our_ev.UncertaintyEstimate(id_ue_data),
            our_ev.UncertaintyEstimate(ood_ue_data))
        (k, ref_v), = ref_res.items()
        assert our_res[k] == pytest.approx(ref_v, rel=tol)


def test_results_tree_parity(tmp_path):
    import pandas as pd
    import nnueehcs.utility as ref_ut
    import nnueehcs_tpu.utility as our_ut

    d = tmp_path / 'b1' / 'tails' / 'ensemble' / 'bo_trial_3'
    d.mkdir(parents=True)
    pd.DataFrame({'trial': [3], 'm': [0.5]}).to_csv(d / 'trial_results.csv',
                                                    index=False)
    ref_inst = ref_ut.ResultsInstance(str(d))
    our_inst = our_ut.ResultsInstance(str(d))
    assert ref_inst.get_benchmark_name() == our_inst.get_benchmark_name()
    assert ref_inst.get_trial_number() == our_inst.get_trial_number() == 3
    assert ref_inst.is_finished() == our_inst.is_finished() is True

    ref_comp = ref_ut.ResultsComposite(str(tmp_path))
    our_comp = our_ut.ResultsComposite(str(tmp_path))
    assert list(ref_comp.get_benchmark_names()) == \
        list(our_comp.get_benchmark_names())
    assert ref_comp.get_num_trials('b1', 'tails', 'ensemble') == \
        our_comp.get_num_trials('b1', 'tails', 'ensemble') == 1

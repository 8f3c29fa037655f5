"""Golden tests: the vectorized segment metrics must match the reference's
per-impression loop semantics (sklearn per row + hand formulas from
reference: src/ebrec/evaluation/metrics/_ranking.py)."""
import numpy as np
import pytest
from sklearn.metrics import log_loss, roc_auc_score

from ebnerd_tpu.data.ragged import Ragged
from ebnerd_tpu.evaluation import ranking
from ebnerd_tpu.evaluation.protocols import (
    AccuracyScore,
    AucScore,
    F1Score,
    LogLossScore,
    MetricEvaluator,
    MrrScore,
    NdcgScore,
    RootMeanSquaredError,
)


def _random_impressions(rng, n=200, kmin=2, kmax=25):
    labels, scores = [], []
    for _ in range(n):
        k = rng.integers(kmin, kmax + 1)
        npos = rng.integers(1, k)  # at least 1 pos and 1 neg
        y = np.zeros(k, np.int8)
        y[rng.choice(k, size=npos, replace=False)] = 1
        s = rng.random(k)
        if rng.random() < 0.3:  # inject ties
            s = np.round(s, 1)
        labels.append(y)
        scores.append(s.astype(np.float32))
    return labels, scores


@pytest.fixture()
def impressions():
    rng = np.random.default_rng(11)
    labels, scores = _random_impressions(rng)
    return (
        labels,
        scores,
        Ragged.from_lists(labels, dtype=np.float64),
        Ragged.from_lists(scores, dtype=np.float64),
    )


def test_auc_matches_sklearn_per_row(impressions):
    labels, scores, rl, rs = impressions
    ours = ranking.per_impression_auc(rl, rs)
    ref = np.array([roc_auc_score(y, s) for y, s in zip(labels, scores)])
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_auc_single_class_impressions_nan_policy():
    """Documented deviation (trainer.py fit): impressions with no positive
    or no negative yield NaN (undefined AUC) and the trainer's nanmean
    skips them; the reference's sklearn-backed AucScore would raise
    instead (metrics_protocols.py:77-86)."""
    labels = [np.array([1, 0, 0]), np.array([1, 1]), np.array([0, 0, 0])]
    scores = [np.array([0.9, 0.1, 0.2]), np.array([0.5, 0.4]), np.array([0.3, 0.2, 0.1])]
    rl = Ragged.from_lists(labels, dtype=np.float64)
    rs = Ragged.from_lists(scores, dtype=np.float64)
    per = ranking.per_impression_auc(rl, rs)
    assert per[0] == 1.0
    assert np.isnan(per[1]) and np.isnan(per[2])  # all-pos / all-neg rows
    # the trainer's monitored value = mean over defined impressions only
    assert float(np.nanmean(per)) == 1.0
    # sanity: sklearn (the reference path) also treats these as undefined
    # (NaN + UndefinedMetricWarning on this version; older versions raise
    # ValueError, which would abort the reference's AucScore mid-training)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        try:
            ref = roc_auc_score(labels[1], scores[1])
            assert np.isnan(ref)
        except ValueError:
            pass


def _mrr_reference(y_true, y_score):
    # reference: mrr_score, metrics/_ranking.py:126-155. The reference's
    # unstable argsort has unspecified tie order; we pin stable-descending
    # (ties keep original order) in both impl and test.
    order = np.argsort(-np.asarray(y_score, np.float64), kind="stable")
    y_true = np.take(y_true, order)
    rr_score = y_true / (np.arange(len(y_true)) + 1)
    return np.sum(rr_score) / np.sum(y_true)


def _dcg_reference(y_true, y_score, k):
    # reference: dcg_score, metrics/_ranking.py:53-89
    k = min(np.shape(y_true)[-1], k)
    order = np.argsort(-np.asarray(y_score, np.float64), kind="stable")
    y_true = np.take(y_true, order[:k])
    gains = 2**y_true - 1
    discounts = np.log2(np.arange(len(y_true)) + 2)
    return np.sum(gains / discounts)


def _ndcg_reference(y_true, y_score, k):
    best = _dcg_reference(y_true, y_true, k)
    actual = _dcg_reference(y_true, y_score, k)
    return actual / best


def test_mrr_matches_reference_formula(impressions):
    labels, scores, rl, rs = impressions
    ours = ranking.per_impression_mrr(rl, rs)
    ref = np.array([_mrr_reference(y, s) for y, s in zip(labels, scores)])
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


@pytest.mark.parametrize("k", [5, 10])
def test_ndcg_matches_reference_formula(impressions, k):
    labels, scores, rl, rs = impressions
    ours = ranking.per_impression_ndcg(rl, rs, k)
    ref = np.array([_ndcg_reference(y, s, k) for y, s in zip(labels, scores)])
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_logloss_matches_sklearn(impressions):
    labels, scores, rl, rs = impressions
    ours = ranking.per_impression_logloss(rl, rs)
    # float64: sklearn>=1.7 clips at finfo(dtype).eps, which for float32
    # inputs would override the reference's 1e-15 clip (metrics_protocols.py:89-105)
    ref = np.array(
        [log_loss(y, np.clip(np.asarray(s, np.float64), 1e-15, 1 - 1e-15), labels=[0, 1])
         for y, s in zip(labels, scores)]
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-9)


def test_degenerate_rows_are_nan():
    rl = Ragged.from_lists([[1, 1], [0, 0], [1, 0]], dtype=np.float64)
    rs = Ragged.from_lists([[0.5, 0.1], [0.2, 0.9], [0.8, 0.3]], dtype=np.float64)
    auc = ranking.per_impression_auc(rl, rs)
    assert np.isnan(auc[0]) and np.isnan(auc[1]) and auc[2] == 1.0


def test_metric_evaluator_end_to_end(impressions):
    labels, scores, _, _ = impressions
    ev = MetricEvaluator(
        labels=labels,
        predictions=scores,
        metric_functions=[
            AucScore(), MrrScore(), NdcgScore(5), NdcgScore(10),
            LogLossScore(), AccuracyScore(), F1Score(), RootMeanSquaredError(),
        ],
    ).evaluate()
    assert set(ev.evaluations) == {
        "auc", "mrr", "ndcg@5", "ndcg@10", "logloss", "accuracy", "f1", "rmse"
    }
    assert 0.0 <= ev.evaluations["auc"] <= 1.0
    ref_auc = np.mean([roc_auc_score(y, s) for y, s in zip(labels, scores)])
    np.testing.assert_allclose(ev.evaluations["auc"], ref_auc, rtol=1e-10)


def test_metric_evaluator_rejects_non_metric():
    with pytest.raises(AttributeError):
        MetricEvaluator(labels=[[1, 0]], predictions=[[0.5, 0.2]],
                        metric_functions=["not-a-metric"])

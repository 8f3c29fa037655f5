"""Beyond-accuracy metrics — golden values from the reference docstrings
(reference: src/ebrec/evaluation/beyond_accuracy.py and
metrics/_beyond_accuracy.py examples), plus fast-path vs generic-path
equivalence checks."""
import numpy as np
import pytest

from ebnerd_tpu.evaluation.beyond_accuracy import (
    Coverage,
    Distribution,
    IntralistDiversity,
    Novelty,
    Sentiment,
    Serendipity,
    cosine_distances,
    coverage_count,
    coverage_fraction,
    index_of_dispersion,
    intralist_diversity,
    novelty,
    serendipity,
)
from ebnerd_tpu.evaluation.utils import (
    compute_combinations,
    compute_item_popularity_scores,
    compute_normalized_distribution,
    scale_range,
)

VEC_DICT = {
    "item1": {"vector": [0.1, 0.2]},
    "item2": {"vector": [0.2, 0.3]},
    "item3": {"vector": [0.3, 0.4]},
    "item4": {"vector": [0.4, 0.5]},
}


def test_intralist_diversity_low_level():
    R1 = np.array([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6], [0.7, 0.8, 0.9]])
    assert intralist_diversity(R1) == pytest.approx(0.022588438516842262)
    assert intralist_diversity(np.array([[0.1, 0.2], [0.1, 0.2]])) == pytest.approx(0.0, abs=1e-12)
    assert np.isnan(intralist_diversity(np.array([[0.1, 0.2]])))


def test_serendipity_low_level():
    R1 = np.array([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]])
    H1 = np.array([[0.7, 0.8, 0.9], [0.1, 0.2, 0.3]])
    assert serendipity(R1, H1) == pytest.approx(0.016941328887631724)


def test_fast_path_matches_generic_path():
    rng = np.random.default_rng(0)
    V = rng.standard_normal((40, 8))
    fast = intralist_diversity(V)
    generic = intralist_diversity(V, pairwise_distance_function=cosine_distances)
    assert fast == pytest.approx(generic)
    H = rng.standard_normal((17, 8))
    assert serendipity(V, H) == pytest.approx(
        serendipity(V, H, pairwise_distance_function=cosine_distances)
    )


def test_coverage_and_novelty_low_level():
    assert coverage_count(np.array([1, 2, 3, 4, 5, 5, 6])) == 6
    assert coverage_fraction(
        np.array([1, 2, 3, 4, 5, 5, 6]), np.arange(1, 11)
    ) == pytest.approx(0.6)
    assert novelty([0.1, 0.2, 0.3, 0.4, 0.5]) == pytest.approx(1.9405499757656586)
    assert novelty([0.9, 0.9, 0.9, 1.0, 0.5]) == pytest.approx(0.29120185606703)


def test_index_of_dispersion():
    cat = [[1] * 25, [2] * 42, [3] * 13, [4] * 8, [5] * 13]
    flat = [i for sub in cat for i in sub]
    assert index_of_dispersion(flat) == pytest.approx(0.9079992157631604)
    assert np.isnan(index_of_dispersion([7]))
    assert index_of_dispersion([7, 7, 7]) == 0


def test_intralist_diversity_class():
    div = IntralistDiversity()
    R = np.array([["item1", "item2"], ["item2", "item3"], ["item3", "item4"]])
    np.testing.assert_allclose(
        div(R, VEC_DICT, "vector"), [0.00772212, 0.00153965, 0.00048792], atol=1e-7
    )
    lo, hi = div._candidate_diversity(list(VEC_DICT), 2, VEC_DICT, "vector")
    assert lo == pytest.approx(0.0004879239129211843)
    assert hi == pytest.approx(0.02219758592259058)


def test_distribution_class():
    dist = Distribution()
    R = np.array([["item1", "item2"], ["item2", "item3"]])
    d = {
        "item1": {"g": "Action", "sg": ["Action", "Thriller"]},
        "item2": {"g": "Action", "sg": ["Action", "Comedy"]},
        "item3": {"g": "Comedy", "sg": ["Comedy"]},
    }
    assert dist(R, d, "g") == pytest.approx({"Action": 0.75, "Comedy": 0.25})
    sg = dist(R, d, "sg")
    assert sg["Action"] == pytest.approx(3 / 7)
    assert sg["Thriller"] == pytest.approx(1 / 7)
    assert sg["Comedy"] == pytest.approx(3 / 7)


def test_coverage_class():
    cov = Coverage()
    R = np.array([["item1", "item2"], ["item2", "item3"], ["item4", "item3"]])
    C = np.array(["item1", "item2", "item3", "item4", "item5", "item6"])
    c, f = cov(R, C)
    assert c == 4 and f == pytest.approx(2 / 3)
    c2, f2 = cov(R)
    assert c2 == 4 and f2 == -np.inf


def test_sentiment_class():
    sent = Sentiment()
    R = np.array([["item1", "item2"], ["item2", "item3"], ["item2", "item5"]])
    d = {
        "item1": {"s": 1.00},
        "item2": {"s": 0.50},
        "item3": {"s": 0.25},
        "item4": {"s": 0.00},
    }
    np.testing.assert_allclose(sent(R, d, "s"), [0.75, 0.375, 0.5])
    assert sent._candidate_sentiment(list(d), 1, d, "s") == (1.0, 0.0)


def test_serendipity_class():
    ser = Serendipity()
    R = [np.array(["item1", "item2"]), np.array(["item3", "item4"])]
    H = [np.array(["itemA", "itemB"]), np.array(["itemC", "itemD"])]
    d = dict(VEC_DICT)
    d.update({
        "itemA": {"vector": [0.5, 0.6]},
        "itemB": {"vector": [0.6, 0.7]},
        "itemC": {"vector": [0.7, 0.8]},
        "itemD": {"vector": [0.8, 0.9]},
    })
    np.testing.assert_allclose(
        ser(R, H, d, "vector"), [0.01734935, 0.00215212], atol=1e-7
    )
    with pytest.raises(ValueError, match="do not match"):
        ser(R, H[:1], d, "vector")


def test_novelty_class():
    nov = Novelty()
    R = [np.array(["item1", "item2"]), np.array(["item3", "item4"])]
    d = {
        "item1": {"popularity": 0.05},
        "item2": {"popularity": 0.1},
        "item3": {"popularity": 0.2},
        "item4": {"popularity": 0.3},
        "item5": {"popularity": 0.4},
    }
    np.testing.assert_allclose(nov(R, d, "popularity"), [3.82192809, 2.02944684])
    lo, hi = nov._candidate_novelty(list(d), 2, d, "popularity")
    assert lo == pytest.approx(1.5294468445267841)
    assert hi == pytest.approx(3.8219280948873626)


def test_missing_lookup_key_raises():
    with pytest.raises(ValueError, match="not present"):
        Sentiment()(np.array([["item1"]]), {"item1": {"other": 1}}, "s")


def test_eval_utils():
    assert compute_combinations(6, 2) == 15
    pop = compute_item_popularity_scores([
        np.array(["a", "b", "c"]), np.array(["a", "c"]), np.array(["a", "d"]),
    ])
    assert pop == pytest.approx({"a": 1.0, "b": 1 / 3, "c": 2 / 3, "d": 1 / 3})
    d = compute_normalized_distribution(np.array(["a", "b", "c", "c"]))
    assert d == pytest.approx({"a": 0.25, "b": 0.25, "c": 0.5})
    np.testing.assert_allclose(scale_range(np.array([1.0, 2.0, 3.0])), [0, 0.5, 1])


def test_cosine_distances_matches_sklearn():
    sk = pytest.importorskip("sklearn.metrics.pairwise")
    rng = np.random.default_rng(1)
    X, Y = rng.standard_normal((10, 5)), rng.standard_normal((7, 5))
    np.testing.assert_allclose(
        cosine_distances(X, Y), sk.cosine_distances(X, Y), atol=1e-12
    )

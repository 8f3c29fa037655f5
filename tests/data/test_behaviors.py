"""Golden tests for the behaviors transforms, matched against the reference
doctest specifications in /root/reference/src/ebrec/utils/_behaviors.py."""
import numpy as np
import pytest

from ebnerd_tpu import constants as c
from ebnerd_tpu.data.behaviors import (
    add_prediction_scores,
    create_binary_labels_column,
    create_user_id_to_int_mapping,
    down_sample_on_users,
    ebnerd_from_path,
    filter_minimum_negative_samples,
    remove_positives_from_inview,
    sample_article_ids,
    sampling_strategy_wu2019,
    truncate_history,
    unique_article_ids_in_behaviors,
)
from ebnerd_tpu.data.ragged import Ragged
from ebnerd_tpu.data.table import Table

INVIEW = c.DEFAULT_INVIEW_ARTICLES_COL
CLICKED = c.DEFAULT_CLICKED_ARTICLES_COL
LABELS = c.DEFAULT_LABELS_COL


def _df(inview, clicked, **extra):
    cols = {
        INVIEW: Ragged.from_lists(inview, dtype=np.int64),
        CLICKED: Ragged.from_lists(clicked, dtype=np.int64),
    }
    cols.update({k: np.asarray(v) for k, v in extra.items()})
    return Table(cols)


def test_binary_labels_reference_doctest():
    # reference doctest _behaviors.py:40-84
    df = _df([[1, 2, 3], [4, 5, 6], [7, 8]], [[2, 3, 4], [3, 5], None])
    out = create_binary_labels_column(df)
    assert out[LABELS].to_lists() == [[0, 1, 1], [0, 1, 0], [0, 0]]


def test_binary_labels_shuffle_preserves_sums():
    df = _df([[1, 2, 3], [4, 5, 6], [7, 8]], [[2, 3, 4], [3, 5], None])
    out = create_binary_labels_column(df, shuffle=True, seed=123)
    sums = [sum(r) for r in out[LABELS].to_lists()]
    assert sums == [2, 1, 0]
    # shuffled inview is a permutation per row
    for got, orig in zip(out[INVIEW].to_lists(), [[1, 2, 3], [4, 5, 6], [7, 8]]):
        assert sorted(got) == sorted(orig)
    # labels still align with inview membership
    relabeled = create_binary_labels_column(
        Table({INVIEW: out[INVIEW], CLICKED: df[CLICKED]})
    )
    assert relabeled[LABELS].to_lists() == out[LABELS].to_lists()


def test_remove_positives_reference_doctest():
    # reference doctest _behaviors.py:393-414
    df = _df([[1, 2, 3], [1, 2, 3], [1, 2, 3]], [[1, 2], [1], [3]], user_id=[1, 1, 2])
    out = remove_positives_from_inview(df)
    assert out[INVIEW].to_lists() == [[3], [2, 3], [1, 2]]


def test_truncate_history_reference_doctest():
    # reference doctest _behaviors.py:617-652 (with string ids -> use ints)
    df = Table({"id": np.array([1, 2, 3]),
                "history": Ragged.from_lists([[1, 2, 3], [4, 5, 6, 7], [8, 9]])})
    out = truncate_history(df, "history", 3)
    assert out["history"].to_lists() == [[1, 2, 3], [5, 6, 7], [8, 9]]
    padded = truncate_history(df, "history", 3, padding_value=0)
    assert padded["history"].to_lists() == [[1, 2, 3], [5, 6, 7], [0, 8, 9]]


def test_wu2019_structure():
    # reference doctest _behaviors.py:470-555: explode on clicked, positive at tail
    df = _df(
        [[1, 2, 3], [1, 2, 3, 4], [1, 2, 3], [1]],
        [[1, 2], [1, 3], [1], [1]],
        impression_id=[0, 1, 2, 3],
        user_id=[1, 1, 2, 3],
    )
    out = sampling_strategy_wu2019(df, npratio=1, shuffle=False, with_replacement=True, seed=123)
    assert len(out) == 6  # one row per positive
    assert np.asarray(out["impression_id"]).tolist() == [0, 0, 1, 1, 2, 3]
    inview = out[INVIEW].to_lists()
    clicked = out[CLICKED].to_lists()
    assert all(len(r) == 2 for r in inview)
    # positive at the tail
    for iv, cl in zip(inview, clicked):
        assert iv[-1] == cl[0]
    # negatives drawn from the negative pool of each impression (0 = pad when empty)
    pools = {0: {3}, 1: {2, 4}, 2: {2, 3}, 3: {0}}
    for imp, iv in zip(np.asarray(out["impression_id"]).tolist(), inview):
        assert set(iv[:-1]) <= pools[imp]
    # empty negative pool row padded with 0
    assert inview[5][0] == 0


def test_wu2019_npratio2():
    df = _df(
        [[1, 2, 3], [1, 2, 3, 4], [1, 2, 3], [1]],
        [[1, 2], [1, 3], [1], [1]],
        impression_id=[0, 1, 2, 3],
    )
    out = sampling_strategy_wu2019(df, npratio=2, shuffle=False, with_replacement=True, seed=1)
    assert all(len(r) == 3 for r in out[INVIEW].to_lists())
    assert out[INVIEW].to_lists()[5][:2] == [0, 0]


def test_wu2019_shuffle_keeps_positive_membership():
    df = _df(
        [[1, 2, 3, 4, 5]] * 4,
        [[1], [2], [3], [4]],
        impression_id=[0, 1, 2, 3],
    )
    out = sampling_strategy_wu2019(df, npratio=4, shuffle=True, with_replacement=True, seed=5)
    for iv, cl in zip(out[INVIEW].to_lists(), out[CLICKED].to_lists()):
        assert cl[0] in iv
        assert len(iv) == 5


def test_sample_article_ids_without_replacement_raises():
    df = _df([[1, 2, 3], [1]], [[1], [1]])
    with pytest.raises(ValueError):
        sample_article_ids(df, n=2, with_replacement=False)


def test_sample_article_ids_without_replacement():
    df = _df([[1, 2, 3], [4, 5, 6]], [[1], [4]])
    out = sample_article_ids(df, n=2, with_replacement=False, seed=42)
    for row, pool in zip(out[INVIEW].to_lists(), [[1, 2, 3], [4, 5, 6]]):
        assert len(row) == 2 and len(set(row)) == 2 and set(row) <= set(pool)


def test_filter_minimum_negative_samples():
    # reference doctest _behaviors.py:127-158
    df = _df([[1, 2, 3], [1], [1, 2, 3]], [[1], [1], [1, 2]])
    out = filter_minimum_negative_samples(df, n=1)
    assert out[INVIEW].to_lists() == [[1, 2, 3], [1, 2, 3]]
    assert len(filter_minimum_negative_samples(df, n=2)) == 1
    assert len(filter_minimum_negative_samples(df, n=None)) == 3


def test_add_prediction_scores():
    df = _df([[1, 2, 3], [4, 5]], [[1], [4]])
    out = add_prediction_scores(df, np.array([0.1, 0.2, 0.3, 0.4, 0.5]))
    got = out["scores"].to_lists()
    assert [len(r) for r in got] == [3, 2]
    np.testing.assert_allclose(got[0], [0.1, 0.2, 0.3], rtol=1e-6)


def test_unique_article_ids_in_behaviors():
    df = _df([[2, 3], [1, 4]], [[], [2]], article_id=[1, 9])
    got = unique_article_ids_in_behaviors(df)
    assert got.tolist() == [1, 2, 3, 4, 9]


def test_user_id_mapping_and_downsample():
    df = _df([[1]] * 5, [[1]] * 5, user_id=[5, 3, 5, 5, 3])
    mapping = create_user_id_to_int_mapping(df)
    assert mapping == {3: 0, 5: 1}
    out = down_sample_on_users(df, n=1, seed=0)
    users = np.asarray(out["user_id"]).tolist()
    assert sorted(users) == [3, 5]


def test_ebnerd_from_path(ebnerd_fixture):
    df = ebnerd_from_path(ebnerd_fixture, history_size=10, padding=0)
    assert len(df) == 400
    hist = df[c.DEFAULT_HISTORY_ARTICLE_ID_COL]
    assert set(hist.lengths.tolist()) == {10}  # padded to exactly history_size
    assert df[INVIEW].lengths.min() >= 2


def test_join_missing_user_gets_empty_history(ebnerd_fixture):
    from ebnerd_tpu.data.behaviors import join_history
    from ebnerd_tpu.data.table import read_parquet

    history = read_parquet(ebnerd_fixture / "history.parquet",
                           columns=[c.DEFAULT_USER_COL, c.DEFAULT_HISTORY_ARTICLE_ID_COL])
    behaviors = read_parquet(ebnerd_fixture / "behaviors.parquet")
    # corrupt one user id so it cannot join
    users = np.asarray(behaviors[c.DEFAULT_USER_COL]).copy()
    users[0] = 1  # not a fixture user
    behaviors = behaviors.with_columns(**{c.DEFAULT_USER_COL: users})
    joined = join_history(behaviors, history)
    assert joined[c.DEFAULT_HISTORY_ARTICLE_ID_COL].lengths[0] == 0
    assert joined[c.DEFAULT_HISTORY_ARTICLE_ID_COL].lengths[1:].min() > 0

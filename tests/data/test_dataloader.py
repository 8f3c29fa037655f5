"""Input-pipeline invariants, modeled on the reference dataloader tests
(reference: test/dataloader/test_newsrec.py — batch arity, dtypes, and the
eval-unfold invariant len(labels) == sum inview lengths, which here becomes
sum(cand_mask) == inview.total)."""
import numpy as np
import pytest

from ebnerd_tpu import constants as c
from ebnerd_tpu.data.behaviors import (
    create_binary_labels_column,
    ebnerd_from_path,
    sampling_strategy_wu2019,
)
from ebnerd_tpu.data.dataloader import EvalFeed, NewsrecFeed
from ebnerd_tpu.data.lookup import Lookup
from ebnerd_tpu.data.ragged import Ragged

H, T, NPRATIO, BS = 8, 12, 4, 16


@pytest.fixture(scope="module")
def split(tmp_path_factory):
    from ebnerd_tpu.data.synthetic import make_synthetic_ebnerd

    path = tmp_path_factory.mktemp("feed") / "train"
    make_synthetic_ebnerd(path, n_users=40, n_articles=100, n_impressions=300, seed=3)
    return path


@pytest.fixture(scope="module")
def lookup(split):
    from ebnerd_tpu.data.table import read_parquet

    articles = read_parquet(split / "articles.parquet")
    ids = np.asarray(articles[c.DEFAULT_ARTICLE_ID_COL])
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 250, size=(len(ids), T)).astype(np.int32)
    return Lookup.from_values(ids, tokens)


def _train_df(split):
    df = ebnerd_from_path(split, history_size=H)
    df = sampling_strategy_wu2019(df, npratio=NPRATIO, shuffle=True, seed=5)
    return create_binary_labels_column(df)


def test_train_feed_shapes_and_labels(split, lookup):
    df = _train_df(split)
    feed = NewsrecFeed(df, lookup, history_size=H, batch_size=BS)
    assert feed.n_candidates == NPRATIO + 1
    batches = list(feed.epoch())
    assert len(batches) == len(feed) == feed.n_rows // BS
    b = batches[0]
    assert b["hist_idx"].shape == (BS, H) and b["hist_idx"].dtype == np.int32
    assert b["cand_idx"].shape == (BS, NPRATIO + 1)
    assert b["labels"].shape == (BS, NPRATIO + 1)
    # wu2019 + labels: exactly one positive per impression
    np.testing.assert_array_equal(b["labels"].sum(1), np.ones(BS, np.float32))
    # all indices land inside the lookup
    assert b["hist_idx"].max() < lookup.n_rows and b["cand_idx"].min() >= 0


def test_train_feed_reshuffles_deterministically(split, lookup):
    df = _train_df(split)
    f1 = NewsrecFeed(df, lookup, history_size=H, batch_size=BS, seed=9)
    f2 = NewsrecFeed(df, lookup, history_size=H, batch_size=BS, seed=9)
    a1 = next(iter(f1.epoch()))
    a2 = next(iter(f2.epoch()))
    np.testing.assert_array_equal(a1["cand_idx"], a2["cand_idx"])
    b1 = next(iter(f1.epoch()))
    assert not np.array_equal(a1["cand_idx"], b1["cand_idx"])  # epoch 2 differs


def test_train_feed_requires_fixed_candidates(split, lookup):
    df = create_binary_labels_column(ebnerd_from_path(split, history_size=H))
    with pytest.raises(ValueError, match="fixed candidate count"):
        NewsrecFeed(df, lookup, history_size=H, batch_size=BS)


def test_train_feed_user_mapping(split, lookup):
    df = _train_df(split)
    users = np.unique(np.asarray(df[c.DEFAULT_USER_COL]))
    mapping = {int(u): i for i, u in enumerate(users)}
    feed = NewsrecFeed(df, lookup, history_size=H, batch_size=BS, user_mapping=mapping)
    b = next(iter(feed.epoch()))
    assert b["user_idx"].shape == (BS,) and b["user_idx"].max() < len(users)


def test_unknown_user_convention(split, lookup):
    """Unseen users map to index len(user_mapping) — the reserved fresh
    embedding row — NOT to 0 like the reference (which aliases them with
    a real trained user, newsrec/dataloader.py:219-224). Deliberate: see
    data/dataloader._map_users."""
    df = _train_df(split)
    known = np.asarray(df[c.DEFAULT_USER_COL])
    # a mapping that knows every user EXCEPT the first row's
    mapping = {int(u): i for i, u in enumerate(np.unique(known[1:]))}
    assert int(known[0]) not in mapping or known[0] in known[1:]
    feed = NewsrecFeed(df, lookup, history_size=H, batch_size=BS,
                       user_mapping=mapping)
    expected_unknown = len(mapping)
    unknown_rows = np.asarray(
        [int(u) not in mapping for u in known])
    np.testing.assert_array_equal(
        feed.user_idx[unknown_rows],
        np.full(unknown_rows.sum(), expected_unknown, np.int32))
    # known users keep their mapped index; nothing collides with row 0
    # unless user 0 is genuinely the first trained user
    known_rows = ~unknown_rows
    np.testing.assert_array_equal(
        feed.user_idx[known_rows],
        np.asarray([mapping[int(u)] for u in known[known_rows]], np.int32))


def test_eval_feed_mask_invariant(split, lookup):
    df = create_binary_labels_column(ebnerd_from_path(split, history_size=H))
    feed = EvalFeed(df, lookup, history_size=H, batch_size=BS)
    inview: Ragged = df[c.DEFAULT_INVIEW_ARTICLES_COL]
    # the reference eval-unfold invariant, masked-batched form
    assert int(feed.cand_mask.sum()) == inview.total
    total_rows = 0
    seen_rows = []
    for b in feed.batches():
        w = b["cand_idx"].shape[1]
        assert b["cand_idx"].shape == (BS, w)
        assert b["cand_mask"].shape == (BS, w)
        assert w in feed.bucket_widths
        total_rows += b["n_valid"]
        seen_rows.append(b["rows"])
    assert total_rows == feed.n_rows == len(df)
    # every impression appears in exactly one batch
    all_rows = np.concatenate(seen_rows)
    np.testing.assert_array_equal(np.sort(all_rows), np.arange(feed.n_rows))


def test_eval_feed_bucketing_preserves_order(split, lookup):
    """Bucketed batches interleave impressions; placing scores by ``rows``
    must reproduce exactly the per-impression candidate order."""
    df = create_binary_labels_column(ebnerd_from_path(split, history_size=H))
    feed = EvalFeed(df, lookup, history_size=H, batch_size=4, n_buckets=3)
    inview: Ragged = df[c.DEFAULT_INVIEW_ARTICLES_COL]
    # "score" = the candidate's row index in the table (deterministic,
    # candidate-identifying) so placement errors are visible
    out = np.zeros((feed.n_rows, feed.width), np.float32)
    for b in feed.batches():
        rows = b["rows"]
        scores = b["cand_idx"].astype(np.float32)  # stand-in for model output
        out[rows, : scores.shape[1]] = scores[: len(rows)]
    ragged = feed.unpad(out)
    expected = lookup.map_ragged(inview)
    np.testing.assert_array_equal(ragged.values.astype(np.int64), expected.values)
    np.testing.assert_array_equal(ragged.offsets, expected.offsets)
    # buckets actually differentiate when the split is skewed: with
    # n_buckets=3 and multiple distinct inview widths, at least two
    # distinct padded widths must exist (>= 1 would be vacuous)
    if len(np.unique(inview.lengths)) >= 3:
        assert len(set(feed.bucket_widths)) > 1


def test_eval_feed_unpad_roundtrip(split, lookup):
    df = create_binary_labels_column(ebnerd_from_path(split, history_size=H))
    feed = EvalFeed(df, lookup, history_size=H, batch_size=BS)
    scores = np.arange(feed.n_rows * feed.width, dtype=np.float32).reshape(
        feed.n_rows, feed.width
    )
    ragged = feed.unpad(scores)
    inview: Ragged = df[c.DEFAULT_INVIEW_ARTICLES_COL]
    np.testing.assert_array_equal(ragged.offsets, inview.offsets)
    # row i keeps its first K_i scores (left-aligned candidates)
    for i in [0, 3, feed.n_rows - 1]:
        k = int(inview.lengths[i])
        np.testing.assert_array_equal(ragged.row(i), scores[i, :k])

"""Real-schema compatibility: the full data pipeline over the reference's
vendored EB-NeRD fixture (reference: test/data/ebnerd/{behaviors,history}
.parquet — 1046/44 rows with the production dtypes: u32 ids, i32 article
ids, i8 demographics, timestamp[us] lists) mirroring the coverage of
reference test/dataloader/test_newsrec.py:66-190.

The rest of the suite runs on the synthetic generator; these tests pin
the dtypes synthetic data never exercises, so a schema regression cannot
ship while staying green on synthetic-only CI.
"""
from pathlib import Path

import numpy as np
import pytest

from ebnerd_tpu import constants as c
from ebnerd_tpu.data.behaviors import (
    add_known_user_column,
    create_binary_labels_column,
    ebnerd_from_path,
    sampling_strategy_wu2019,
)
from ebnerd_tpu.data.dataloader import EvalFeed, NewsrecFeed
from ebnerd_tpu.data.lookup import Lookup
from ebnerd_tpu.data.ragged import Ragged

FIXTURE = Path("/root/reference/test/data/ebnerd")
H, T, NPRATIO, BS = 20, 12, 4, 32

pytestmark = pytest.mark.skipif(
    not (FIXTURE / "behaviors.parquet").exists(),
    reason="reference fixture not available",
)


@pytest.fixture(scope="module")
def df_all():
    return ebnerd_from_path(FIXTURE, history_size=H)


@pytest.fixture(scope="module")
def lookup(df_all):
    # articles.parquet is stripped from the reference fixture
    # (.MISSING_LARGE_BLOBS); fabricate tokens per unique behavior article,
    # exactly as reference test_newsrec.py:34-39 does
    from ebnerd_tpu.data.behaviors import unique_article_ids_in_behaviors

    ids = unique_article_ids_in_behaviors(df_all)
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 250, size=(len(ids), T)).astype(np.int32)
    return Lookup.from_values(ids, tokens)


def test_fixture_load_and_dtypes(df_all):
    """ebnerd_from_path handles the production schema end-to-end."""
    assert len(df_all) == 1046
    hist: Ragged = df_all[c.DEFAULT_HISTORY_ARTICLE_ID_COL]
    inview: Ragged = df_all[c.DEFAULT_INVIEW_ARTICLES_COL]
    clicked: Ragged = df_all[c.DEFAULT_CLICKED_ARTICLES_COL]
    # history is truncated to tail-H (left-padded downstream, not here)
    assert hist.lengths.max() <= H
    assert inview.lengths.min() >= 1 and clicked.lengths.min() >= 1
    # production integer dtypes survive the join
    assert np.asarray(df_all[c.DEFAULT_USER_COL]).dtype == np.uint32
    assert np.issubdtype(inview.values.dtype, np.signedinteger)


def test_fixture_known_user_and_labels(df_all):
    df = add_known_user_column(df_all, known_users=np.asarray(df_all[c.DEFAULT_USER_COL])[:5])
    assert np.asarray(df[c.DEFAULT_KNOWN_USER_COL]).dtype == np.bool_
    df = create_binary_labels_column(df_all)
    labels: Ragged = df[c.DEFAULT_LABELS_COL]
    inview: Ragged = df[c.DEFAULT_INVIEW_ARTICLES_COL]
    np.testing.assert_array_equal(labels.lengths, inview.lengths)
    assert labels.values.min() >= 0 and labels.values.max() <= 1
    # every impression has at least one clicked article in view or not;
    # label sum per row equals |inview ∩ clicked|
    clicked: Ragged = df[c.DEFAULT_CLICKED_ARTICLES_COL]
    for r in range(0, len(df), 97):
        iv = inview.row(r)
        ck = set(clicked.row(r).tolist())
        np.testing.assert_array_equal(
            labels.row(r), np.isin(iv, list(ck)).astype(labels.values.dtype)
        )


def test_fixture_wu2019_train_feed(df_all, lookup):
    df = sampling_strategy_wu2019(df_all, npratio=NPRATIO, shuffle=True, seed=123)
    df = create_binary_labels_column(df)
    inview: Ragged = df[c.DEFAULT_INVIEW_ARTICLES_COL]
    assert (inview.lengths == NPRATIO + 1).all()
    feed = NewsrecFeed(df, lookup, history_size=H, batch_size=BS)
    batches = list(feed.epoch())
    assert len(batches) == len(df) // BS
    b = batches[0]
    assert b["hist_idx"].shape == (BS, H) and b["hist_idx"].dtype == np.int32
    assert b["cand_idx"].shape == (BS, NPRATIO + 1)
    np.testing.assert_array_equal(b["labels"].sum(1), np.ones(BS, np.float32))
    assert 0 <= b["cand_idx"].min() and b["cand_idx"].max() < lookup.n_rows


def test_fixture_eval_feed_unfold_invariant(df_all, lookup):
    """The reference's eval-unfold invariant (test_newsrec.py:102-105):
    total scored candidates == sum of inview lengths."""
    df = create_binary_labels_column(df_all)
    feed = EvalFeed(df, lookup, history_size=H, batch_size=BS)
    inview: Ragged = df[c.DEFAULT_INVIEW_ARTICLES_COL]
    total_valid = 0
    for b in feed.batches():
        total_valid += int(b["cand_mask"].sum())
    assert total_valid == inview.total
    # unpad round-trips to the exact ragged structure
    scores = np.zeros((feed.n_rows, feed.width), np.float32)
    ragged = feed.unpad(scores)
    np.testing.assert_array_equal(ragged.lengths, inview.lengths)

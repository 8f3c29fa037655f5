"""Chunked resumable inference (reference protocol: ebnerd_nrms.py:287-315)."""
import numpy as np

from ebnerd_tpu import constants as c
from ebnerd_tpu.data.behaviors import create_binary_labels_column, ebnerd_from_path
from ebnerd_tpu.data.dataloader import NewsrecFeed
from ebnerd_tpu.data.lookup import Lookup
from ebnerd_tpu.models.config import HParamsNRMS
from ebnerd_tpu.models.inputs import token_batch
from ebnerd_tpu.models.newsrec import NRMS
from ebnerd_tpu.training.inference import (
    RANKS_COL,
    SCORES_COL,
    assemble_submission,
    chunked_score,
    split_chunks,
)
from ebnerd_tpu.training.trainer import Trainer, TrainerConfig

H, T, VOCAB = 4, 6, 120


def _setup(ebnerd_fixture):
    df = create_binary_labels_column(ebnerd_from_path(ebnerd_fixture, history_size=H))
    rng = np.random.default_rng(0)
    from ebnerd_tpu.data.table import read_parquet

    articles = read_parquet(ebnerd_fixture / "articles.parquet")
    ids = np.asarray(articles[c.DEFAULT_ARTICLE_ID_COL])
    lookup = Lookup.from_values(ids, rng.integers(1, VOCAB, (len(ids), T)).astype(np.int32))
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=2, head_dim=4,
                     attention_hidden_dim=8)
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=8)
    trainer = Trainer(model, {"title": lookup.matrix}, token_batch,
                      TrainerConfig(seed=0), log_fn=lambda s: None)
    first = {
        "hist_idx": np.zeros((4, H), np.int32),
        "cand_idx": np.zeros((4, 3), np.int32),
        "labels": np.zeros((4, 3), np.float32),
    }
    trainer.init_state(first)
    return df, lookup, trainer


def test_split_chunks_partitions_rows(ebnerd_fixture):
    df = create_binary_labels_column(ebnerd_from_path(ebnerd_fixture, history_size=H))
    chunks = split_chunks(df, 7)
    assert len(chunks) == 7
    assert sum(len(ch) for ch in chunks) == len(df)


def test_chunked_score_and_resume(tmp_path, ebnerd_fixture):
    df, lookup, trainer = _setup(ebnerd_fixture)
    out = chunked_score(trainer, df, lookup, history_size=H, batch_size=16,
                        n_chunks=3, out_dir=tmp_path, log=lambda s: None)
    assert len(out) == len(df)
    inview = df[c.DEFAULT_INVIEW_ARTICLES_COL]
    assert out[SCORES_COL].total == inview.total
    # ranks are a permutation of 1..K within each impression
    ranks = out[RANKS_COL]
    for i in (0, len(df) // 2, len(df) - 1):
        row = np.sort(ranks.row(i))
        np.testing.assert_array_equal(row, np.arange(1, len(row) + 1))
    # delete one chunk -> only that chunk recomputes; results identical
    (tmp_path / "pred_chunk_1.parquet").unlink()
    calls = []
    out2 = chunked_score(trainer, df, lookup, history_size=H, batch_size=16,
                         n_chunks=3, out_dir=tmp_path, log=calls.append)
    assert sum("skipping" in m for m in calls) == 2
    np.testing.assert_allclose(out[SCORES_COL].values, out2[SCORES_COL].values, atol=1e-6)


def test_assemble_submission_restores_impression_order(tmp_path, ebnerd_fixture):
    """The reference's final test-set assembly: wo_ba + w_ba halves scored
    separately must come back together in the ORIGINAL impression order and
    round-trip through the zipped predictions.txt
    (reference: ebnerd_nrms.py:352-364)."""
    from ebnerd_tpu.utils.submission import read_submission_file, write_submission_file

    df, lookup, trainer = _setup(ebnerd_fixture)
    # emulate the is_beyond_accuracy split: interleaved mask, two parts
    ba_mask = np.zeros(len(df), bool)
    ba_mask[::3] = True
    parts = [
        chunked_score(trainer, df.filter(~ba_mask), lookup, history_size=H,
                      batch_size=16, n_chunks=2, out_dir=tmp_path / "wo_ba",
                      log=lambda s: None),
        chunked_score(trainer, df.filter(ba_mask), lookup, history_size=H,
                      batch_size=16, n_chunks=1, out_dir=tmp_path / "w_ba",
                      log=lambda s: None),
    ]
    imp_ids = np.asarray(df[c.DEFAULT_IMPRESSION_ID_COL])
    ranks = assemble_submission(parts, imp_ids)
    # per-row identity: each assembled row equals the row scored for that
    # impression inside its own part
    whole = chunked_score(trainer, df, lookup, history_size=H, batch_size=16,
                          n_chunks=1, out_dir=tmp_path / "whole", log=lambda s: None)
    np.testing.assert_array_equal(ranks.values, whole[RANKS_COL].values)
    np.testing.assert_array_equal(ranks.offsets, whole[RANKS_COL].offsets)
    # uploadable zip round-trips bit-exact
    path = tmp_path / "predictions.txt"
    write_submission_file(imp_ids, ranks, path, rm_file=False)
    rt_ids, rt_ranks = read_submission_file(path)
    np.testing.assert_array_equal(rt_ids, imp_ids.astype(np.int64))
    np.testing.assert_array_equal(rt_ranks.values, ranks.values)
    # mismatched coverage fails loudly
    import pytest

    with pytest.raises(ValueError, match="impressions"):
        assemble_submission(parts[:1], imp_ids)

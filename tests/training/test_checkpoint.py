"""Full-TrainState checkpoint round-trip (exceeds the reference's
weights-only checkpointing, reference: ebnerd_nrms.py:222-229)."""
import jax
import numpy as np
import pytest

from ebnerd_tpu.models.config import HParamsNRMS
from ebnerd_tpu.models.inputs import token_batch
from ebnerd_tpu.models.newsrec import NRMS
from ebnerd_tpu.training.checkpoint import (
    CheckpointManager,
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from ebnerd_tpu.training.trainer import Trainer, TrainerConfig

T, H, K, VOCAB = 6, 4, 3, 64


def _batch(seed):
    r = np.random.default_rng(seed)
    labels = np.zeros((8, K), np.float32)
    labels[:, 0] = 1
    return {
        "hist_idx": r.integers(0, 20, (8, H)).astype(np.int32),
        "cand_idx": r.integers(0, 20, (8, K)).astype(np.int32),
        "labels": labels,
    }


def _trainer():
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=2, head_dim=4,
                     attention_hidden_dim=8)
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=8)
    table = np.random.default_rng(0).integers(1, VOCAB, (21, T)).astype(np.int32)
    return Trainer(model, {"title": table}, token_batch,
                   TrainerConfig(learning_rate=1e-3, seed=0), log_fn=lambda s: None)


def test_full_state_roundtrip(tmp_path):
    tr = _trainer()
    tr.init_state(_batch(0))
    key = jax.random.key(0)
    for i in range(3):
        key, sub = jax.random.split(key)
        tr.state, _ = tr._train_step(tr.state, _batch(i), sub)
    save_checkpoint(tr.state, tmp_path, step=3)
    assert latest_step(tmp_path) == 3

    tr2 = _trainer()
    tr2.init_state(_batch(0))
    restored = restore_checkpoint(tr2.state, tmp_path, step=3)
    assert int(restored.step) == 3
    # params AND optimizer state round-trip exactly
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        tr.state.params, restored.params,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        tr.state.opt_state, restored.opt_state,
    )
    # resumed training continues identically
    key = jax.random.key(42)
    tr.state, l1 = tr._train_step(tr.state, _batch(9), key)
    tr2.state = restored
    tr2.state, l2 = tr2._train_step(tr2.state, _batch(9), key)
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)


def test_manager_keep_and_best(tmp_path):
    tr = _trainer()
    tr.init_state(_batch(0))
    mgr = CheckpointManager(tmp_path, keep=2)
    for s in (1, 2, 3):
        mgr.save_step(tr.state, s)
    assert latest_step(tmp_path) == 3
    assert not (tmp_path / "step_1").exists()
    mgr.save_best(tr.state)
    restored = mgr.restore_best(tr.state)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        tr.state.params, restored.params,
    )
    latest, step = mgr.restore_latest(tr.state)
    assert step == 3


def test_sparse_state_roundtrip(tmp_path):
    """TrainState with the SparseEmbedState field (table + moments outside
    opt_state) round-trips through orbax."""
    from ebnerd_tpu.training.sparse_embed import prep_sparse_batch

    hp = HParamsNRMS(title_size=T, history_size=H, head_num=2, head_dim=4,
                     attention_hidden_dim=8)
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=8)
    table = np.random.default_rng(0).integers(1, VOCAB, (21, T)).astype(np.int32)
    tr = Trainer(model, {"title": table}, token_batch,
                 TrainerConfig(learning_rate=1e-3, seed=0,
                               sparse_embedding=True, sparse_min_bucket=8),
                 log_fn=lambda s: None)
    tr.init_state(_batch(0))
    key = jax.random.key(0, impl=tr.config.rng_impl)
    for i in range(2):
        raw = prep_sparse_batch(_batch(i), tr._host_tables, tr._sparse_tables,
                                VOCAB, 8)
        tr.state, _ = tr._train_step(tr.state, raw, key)
    save_checkpoint(tr.state, tmp_path, step=2)
    tr2 = Trainer(model, {"title": table}, token_batch,
                  TrainerConfig(learning_rate=1e-3, seed=0,
                                sparse_embedding=True, sparse_min_bucket=8),
                  log_fn=lambda s: None)
    tr2.init_state(_batch(0))
    restored = restore_checkpoint(tr2.state, tmp_path, step=2)
    assert int(restored.step) == 2
    np.testing.assert_array_equal(np.asarray(restored.emb.table),
                                  np.asarray(tr.state.emb.table))
    np.testing.assert_array_equal(np.asarray(restored.emb.m),
                                  np.asarray(tr.state.emb.m))
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(tr.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _fit_setup(tmpdir, seed=17):
    """Synthetic feeds + a fresh trainer for fit-level resume tests."""
    import tempfile
    from pathlib import Path

    from ebnerd_tpu import constants as c
    from ebnerd_tpu.data.behaviors import (
        create_binary_labels_column,
        ebnerd_from_path,
        sampling_strategy_wu2019,
    )
    from ebnerd_tpu.data.dataloader import EvalFeed, NewsrecFeed
    from ebnerd_tpu.data.lookup import Lookup
    from ebnerd_tpu.data.synthetic import make_synthetic_ebnerd
    from ebnerd_tpu.data.table import read_parquet

    path = make_synthetic_ebnerd(Path(tmpdir) / "data", n_users=20,
                                 n_articles=30, n_impressions=96, seed=seed)
    df = ebnerd_from_path(path, history_size=H)
    train_df = create_binary_labels_column(
        sampling_strategy_wu2019(df, npratio=K - 1, shuffle=True, seed=1))
    val_df = create_binary_labels_column(df)
    articles = read_parquet(path / "articles.parquet")
    ids = np.asarray(articles[c.DEFAULT_ARTICLE_ID_COL])
    tokens = np.random.default_rng(0).integers(
        1, VOCAB, size=(len(ids), T)).astype(np.int32)
    lookup = Lookup.from_values(ids, tokens)

    def make_trainer():
        hp = HParamsNRMS(title_size=T, history_size=H, head_num=2, head_dim=4,
                         attention_hidden_dim=8, dropout=0.2)
        model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=8)
        return Trainer(model, {"title": lookup.matrix}, token_batch,
                       TrainerConfig(learning_rate=1e-2, seed=0,
                                     early_stopping_patience=None,
                                     lr_patience=2),
                       log_fn=lambda s: None)

    def make_feeds():
        return (NewsrecFeed(train_df, lookup, history_size=H, batch_size=16),
                EvalFeed(val_df, lookup, history_size=H, batch_size=16),
                val_df[c.DEFAULT_LABELS_COL])

    return make_trainer, make_feeds


def test_fit_resume_matches_uninterrupted(tmp_path):
    """A run killed after epoch 1 and resumed with fit(resume=True)
    reproduces the uninterrupted run exactly: same per-epoch losses and
    val AUCs (shuffle order, dropout stream, and callback state all
    restored), same final (best-restored) parameters."""
    make_trainer, make_feeds = _fit_setup(tmp_path)
    epochs = 4

    # uninterrupted reference run (checkpointing on, never restored)
    tr_a = make_trainer()
    feed_a, val_a, labels_a = make_feeds()
    hist_a = tr_a.fit(feed_a, val_a, labels_a, epochs=epochs,
                      ckpt_dir=tmp_path / "a")

    # interrupted run: 2 epochs, then a FRESH trainer resumes to 4
    tr_b = make_trainer()
    feed_b, val_b, labels_b = make_feeds()
    tr_b.fit(feed_b, val_b, labels_b, epochs=2, ckpt_dir=tmp_path / "b")
    del tr_b
    tr_c = make_trainer()
    feed_c, val_c, labels_c = make_feeds()
    hist_c = tr_c.fit(feed_c, val_c, labels_c, epochs=epochs,
                      ckpt_dir=tmp_path / "b", resume=True)

    assert len(hist_a) == len(hist_c) == epochs
    for ra, rc in zip(hist_a, hist_c):
        assert ra["epoch"] == rc["epoch"]
        np.testing.assert_allclose(ra["loss"], rc["loss"], rtol=1e-6)
        np.testing.assert_allclose(ra["val_auc"], rc["val_auc"], rtol=1e-6)
        np.testing.assert_allclose(ra["lr"], rc["lr"], rtol=1e-6)
    # final eval weights (best-restored) agree
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        tr_a.state.params, tr_c.state.params)


def test_fit_meta_kill_between_state_and_meta(tmp_path):
    """meta.json names the consistent checkpoint: if a newer step_<n>
    exists without matching metadata (kill between the two writes),
    resume uses the meta'd epoch, not the orphan."""
    import json

    make_trainer, make_feeds = _fit_setup(tmp_path, seed=23)
    tr = make_trainer()
    feed, val, labels = make_feeds()
    tr.fit(feed, val, labels, epochs=2, ckpt_dir=tmp_path / "c")
    # simulate the kill: a newer state checkpoint, stale meta
    save_checkpoint(tr.state, tmp_path / "c", step=7)
    meta = json.loads((tmp_path / "c" / "meta.json").read_text())
    assert meta["epoch"] == 1
    tr2 = make_trainer()
    feed2, val2, labels2 = make_feeds()
    hist = tr2.fit(feed2, val2, labels2, epochs=3, ckpt_dir=tmp_path / "c",
                   resume=True)
    # resumed after epoch 1 (meta), trained exactly epoch 2
    assert [h["epoch"] for h in hist] == [0, 1, 2]

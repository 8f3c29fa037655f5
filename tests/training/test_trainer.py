"""End-to-end training-loop tests: synthetic split -> wu2019 -> feeds ->
jitted Trainer -> val AUC, the TPU counterpart of the reference's
quick-start dummy runs + Keras fit wiring
(reference: examples/quick_start/nrms_dummy.py, ebnerd_nrms.py:212-257)."""
import numpy as np
import pytest

import jax

from ebnerd_tpu import constants as c
from ebnerd_tpu.data.behaviors import (
    create_binary_labels_column,
    ebnerd_from_path,
    sampling_strategy_wu2019,
)
from ebnerd_tpu.data.dataloader import EvalFeed, NewsrecFeed
from ebnerd_tpu.data.lookup import Lookup
from ebnerd_tpu.models.config import HParamsNRMS
from ebnerd_tpu.models.inputs import token_batch
from ebnerd_tpu.models.newsrec import NRMS
from ebnerd_tpu.parallel.mesh import make_mesh
from ebnerd_tpu.training.trainer import Trainer, TrainerConfig

H, T, NPRATIO, BS = 6, 8, 3, 16
VOCAB = 200


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from ebnerd_tpu.data.synthetic import make_synthetic_ebnerd

    path = tmp_path_factory.mktemp("trainer") / "train"
    make_synthetic_ebnerd(path, n_users=40, n_articles=80, n_impressions=256, seed=1)
    df = ebnerd_from_path(path, history_size=H)
    train_df = create_binary_labels_column(
        sampling_strategy_wu2019(df, npratio=NPRATIO, shuffle=True, seed=2)
    )
    val_df = create_binary_labels_column(df)

    rng = np.random.default_rng(0)
    from ebnerd_tpu.data.table import read_parquet

    articles = read_parquet(path / "articles.parquet")
    ids = np.asarray(articles[c.DEFAULT_ARTICLE_ID_COL])
    tokens = rng.integers(1, VOCAB, size=(len(ids), T)).astype(np.int32)
    lookup = Lookup.from_values(ids, tokens)

    train_feed = NewsrecFeed(train_df, lookup, history_size=H, batch_size=BS)
    val_feed = EvalFeed(val_df, lookup, history_size=H, batch_size=BS)
    val_labels = val_df[c.DEFAULT_LABELS_COL]
    return lookup, train_feed, val_feed, val_labels


def _make_trainer(lookup, mesh=None):
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=2, head_dim=8,
                     attention_hidden_dim=16)
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=16)
    cfg = TrainerConfig(learning_rate=1e-3, early_stopping_patience=None,
                        lr_patience=None, seed=0)
    return Trainer(model, {"title": lookup.matrix}, token_batch, cfg,
                   mesh=mesh, log_fn=lambda s: None)


def test_fit_and_score_end_to_end(setup):
    lookup, train_feed, val_feed, val_labels = setup
    trainer = _make_trainer(lookup)
    history = trainer.fit(train_feed, val_feed, val_labels, epochs=2)
    assert len(history) == 2
    assert np.isfinite(history[0]["loss"])
    # random-data loss starts near ln(npratio+1) and decreases
    assert history[1]["loss"] < history[0]["loss"]
    assert 0.0 <= history[0]["val_auc"] <= 1.0
    scores = trainer.score(val_feed)
    assert scores.offsets[-1] == val_labels.offsets[-1]
    vals = np.asarray(scores.values)
    assert np.isfinite(vals).all() and (vals >= 0).all() and (vals <= 1).all()


def test_scan_steps_trains_equivalently(setup):
    """scan_steps=4 (N steps per dispatch via lax.scan) applies the same
    per-batch updates as the per-step path: with dropout disabled the
    parameter trajectories are identical (the dropout STREAM differs —
    fold_in vs sequential split — so equality is checked at dropout=0)."""
    import jax

    lookup, train_feed, _, _ = setup
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=2, head_dim=8,
                     attention_hidden_dim=16, dropout=0.0)

    def run(scan_steps):
        model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=16)
        cfg = TrainerConfig(learning_rate=1e-3, early_stopping_patience=None,
                            lr_patience=None, seed=0, scan_steps=scan_steps)
        tr = Trainer(model, {"title": lookup.matrix}, token_batch, cfg,
                     log_fn=lambda s: None)
        train_feed._epoch = 0  # identical shuffle order for both runs
        tr.fit(train_feed, epochs=1, steps_per_epoch=6)  # 4 scanned + 2 single
        return tr.state

    s1, s4 = run(1), run(4)
    assert int(s1.step) == int(s4.step) == 6
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-5, atol=1e-6),
        s1.params, s4.params)


def test_lr_plateau_and_early_stop(setup):
    lookup, train_feed, val_feed, val_labels = setup
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=2, head_dim=8,
                     attention_hidden_dim=16)
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=16)
    cfg = TrainerConfig(learning_rate=0.0, early_stopping_patience=2,
                        lr_patience=1, lr_factor=0.5, min_lr=0.0, seed=0)
    trainer = Trainer(model, {"title": lookup.matrix}, token_batch, cfg,
                      log_fn=lambda s: None)
    # lr=0 -> val_auc can never improve after epoch 1 -> early stop at epoch 3
    history = trainer.fit(train_feed, val_feed, val_labels, epochs=10,
                          steps_per_epoch=2)
    assert len(history) == 3
    assert history[-1]["lr"] < history[0]["lr"] or history[0]["lr"] == 0.0


def test_gradient_accumulation_matches_large_batch(setup):
    """accumulation_steps=2 at bs B must match one step at bs 2B (Adam on
    the mean gradient; reference: fastformer/dataloader.py:198-204)."""
    import jax

    lookup, train_feed, _, _ = setup
    # dropout off: masks are shape-dependent, which would differ between
    # the two micro-batches and the one large batch
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=2, head_dim=8,
                     attention_hidden_dim=16, dropout=0.0)

    def make(accum):
        model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=16)
        cfg = TrainerConfig(learning_rate=1e-3, early_stopping_patience=None,
                            lr_patience=None, seed=0, accumulation_steps=accum)
        return Trainer(model, {"title": lookup.matrix}, token_batch, cfg,
                       log_fn=lambda s: None)

    batches = [b for _, b in zip(range(2), train_feed.epoch(shuffle=False))]
    big = {k: np.concatenate([b[k] for b in batches]) for k in batches[0]}

    accum = make(2)
    accum.init_state(batches[0])
    key = jax.random.key(0)
    for b in batches:
        accum.state, _ = accum._train_step(accum.state, dict(b), key)

    ref = make(1)
    ref.init_state(batches[0])
    ref.state, _ = ref._train_step(ref.state, big, key)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-6),
        accum.state.params, ref.state.params,
    )


def test_best_weights_survive_buffer_donation(setup):
    """_train_step donates the state; the best-weights snapshot must own
    its buffers. With a diverging lr the initial snapshot is never
    replaced, so restoring it after training exercises exactly the
    aliased-donated-buffer path (regression: 'Buffer has been deleted or
    donated' on score after fit)."""
    lookup, train_feed, val_feed, val_labels = setup
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=2, head_dim=8,
                     attention_hidden_dim=16)
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=16)
    cfg = TrainerConfig(learning_rate=1e6, early_stopping_patience=None,
                        lr_patience=None, seed=0)
    trainer = Trainer(model, {"title": lookup.matrix}, token_batch, cfg,
                      log_fn=lambda s: None)
    trainer.fit(train_feed, val_feed, val_labels, epochs=2, steps_per_epoch=2)
    scores = trainer.score(val_feed)  # must not hit dead donated buffers
    assert scores.offsets[-1] == val_labels.offsets[-1]


def test_data_parallel_mesh_matches_single_device(setup):
    lookup, train_feed, val_feed, val_labels = setup
    mesh = make_mesh()  # 8 virtual CPU devices on the data axis
    assert mesh.devices.size == len(jax.devices())
    single = _make_trainer(lookup)
    sharded = _make_trainer(lookup, mesh=mesh)
    first = next(iter(train_feed.epoch(shuffle=False)))
    single.init_state(first)
    sharded.init_state(first)
    # identical params at init -> near-bitwise identical scores
    np.testing.assert_allclose(
        np.asarray(single.score(val_feed).values),
        np.asarray(sharded.score(val_feed).values), rtol=1e-5, atol=1e-6,
    )
    single.fit(train_feed, epochs=1, steps_per_epoch=3)
    sharded.fit(train_feed, epochs=1, steps_per_epoch=3)
    s1 = single.score(val_feed)
    s2 = sharded.score(val_feed)
    # after training: psum reduction order + adam amplification -> loose tol
    np.testing.assert_allclose(np.asarray(s1.values), np.asarray(s2.values),
                               atol=3e-3)


def test_article_index_fresh_after_best_weight_restore(setup):
    """Regression (r2 advisor, high): the two-tower article-vector cache
    is keyed on the optimizer step, which fit()'s best-weights restore
    does NOT change — scoring after fit must not serve vectors encoded
    with the final epoch's params against best-epoch user-tower params.
    fit() clears the cache on restore; two-tower and full-forward scores
    must agree afterwards."""
    lookup, train_feed, val_feed, val_labels = setup
    trainer = _make_trainer(lookup)
    trainer.fit(train_feed, val_feed, val_labels, epochs=2)
    assert getattr(trainer, "_art_cache", "unset") is None
    s_tt = trainer.score(val_feed, two_tower=True)
    assert trainer._art_cache is not None  # refilled at restored params
    s_full = trainer.score(val_feed, two_tower=False)
    np.testing.assert_allclose(np.asarray(s_tt.values),
                               np.asarray(s_full.values), atol=2e-5)

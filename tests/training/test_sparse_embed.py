"""Row-sparse embedding updates (training/sparse_embed.py).

Semantics under test (module docstring there): the sparse path equals
dense Adam exactly whenever every touched-set row is touched (so at step
1 from zero moments the WHOLE table matches), and implements
LazyAdam-style behavior for rows skipped after being touched — no moment
decay, no momentum-carryover update. This is a deliberate deviation from
the reference's keras Adam, whose IndexedSlices handling decays moments
and updates ALL rows densely (base_model.py:69-80); the trainer's dense
default is the reference-parity path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ebnerd_tpu.models.config import HParamsNRMS
from ebnerd_tpu.models.inputs import token_batch
from ebnerd_tpu.models.newsrec import NRMS
from ebnerd_tpu.parallel.mesh import make_mesh
from ebnerd_tpu.training.sparse_embed import (
    SparseEmbedState,
    bucket_size,
    prep_sparse_batch,
    rowwise_adam,
)
from ebnerd_tpu.training.trainer import Trainer, TrainerConfig

H, T, K, BS = 4, 6, 3, 8
VOCAB, EMB, N_ART = 64, 16, 40


def _model(dropout=0.0):
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=2, head_dim=8,
                     attention_hidden_dim=16, dropout=dropout)
    return NRMS(hp, vocab_size=VOCAB, word_emb_dim=EMB)


def _table(rng, full_cover=False):
    """Article token table; full_cover=True makes every batch touch every
    vocab row (first articles enumerate the vocab)."""
    tok = rng.integers(0, VOCAB, size=(N_ART + 1, T)).astype(np.int32)
    if full_cover:
        tok[1 : 1 + VOCAB // T + 1] = np.arange(
            (VOCAB // T + 1) * T).reshape(-1, T) % VOCAB
    return tok


def _batch(rng, full_cover=False):
    hist = rng.integers(0, N_ART + 1, (BS, H)).astype(np.int32)
    cand = rng.integers(0, N_ART + 1, (BS, K)).astype(np.int32)
    if full_cover:  # force the batch through ALL vocab-covering articles
        cover = np.arange(1, VOCAB // T + 2, dtype=np.int32)
        hist.reshape(-1)[: len(cover)] = cover
    labels = np.zeros((BS, K), np.float32)
    labels[:, 0] = 1.0
    return {"hist_idx": hist, "cand_idx": cand, "labels": labels}


def _trainer(table, sparse, mesh=None, min_bucket=8):
    cfg = TrainerConfig(learning_rate=1e-2, seed=0, sparse_embedding=sparse,
                        sparse_min_bucket=min_bucket,
                        early_stopping_patience=None, lr_patience=None)
    return Trainer(_model(), {"title": table}, token_batch, cfg, mesh=mesh,
                   log_fn=lambda s: None)


def _run_steps(trainer, batches, table):
    trainer.init_state(batches[0])
    key = jax.random.key(0, impl=trainer.config.rng_impl)
    losses = []
    for raw in batches:
        if trainer._sparse:
            raw = prep_sparse_batch(raw, trainer._host_tables,
                                    trainer._sparse_tables, VOCAB,
                                    trainer.config.sparse_min_bucket)
        trainer.state, loss = trainer._train_step(
            trainer.state, trainer._put(raw), key)
        losses.append(float(loss))
    return losses


def _emb_table(trainer):
    if trainer.state.emb is not None:
        return np.asarray(trainer.state.emb.table)
    return np.asarray(trainer.state.params["word_embedding"]["embedding"])


def test_bucket_size():
    assert bucket_size(5, 8) == 8
    assert bucket_size(8, 8) == 8
    assert bucket_size(9, 8) == 16
    assert bucket_size(4097) == 8192


def test_prep_sparse_batch_covers_all_batch_tokens():
    rng = np.random.default_rng(0)
    table = _table(rng)
    raw = prep_sparse_batch(_batch(rng), {"title": table}, ("title",), VOCAB,
                            min_bucket=8)
    idx = np.concatenate([raw["hist_idx"].ravel(), raw["cand_idx"].ravel()])
    toks = np.unique(table[idx])
    n_valid = int(raw["emb_valid"].sum())
    assert set(toks) == set(raw["emb_uniq"][:n_valid].tolist())
    # remap round-trips: uniq[remap[t]] == t for every batch token
    assert (raw["emb_uniq"][raw["emb_remap"][toks]] == toks).all()
    assert len(raw["emb_uniq"]) == bucket_size(len(toks), 8)


def test_first_step_matches_dense_exactly():
    """From zero-initialized moments, step 1 of the sparse path equals
    dense Adam on the ENTIRE table (untouched rows get zero update in
    both), and the forward/loss agrees through the slot remap."""
    rng = np.random.default_rng(1)
    table = _table(rng)
    batches = [_batch(np.random.default_rng(2))]
    td = _trainer(table, sparse=False)
    ls_d = _run_steps(td, batches, table)
    ts = _trainer(table, sparse=True)
    ls_s = _run_steps(ts, batches, table)
    assert ls_d[0] == pytest.approx(ls_s[0], abs=1e-6)
    np.testing.assert_allclose(_emb_table(ts), _emb_table(td), atol=1e-6)
    # non-embedding params took the identical optax update (path-keyed)
    d_params = dict(td.state.params)
    d_params.pop("word_embedding")
    s_params = dict(ts.state.params)
    flat_d = jax.tree_util.tree_flatten_with_path(d_params)[0]
    flat_s = dict(jax.tree_util.tree_flatten_with_path(s_params)[0])
    for path, leaf in flat_d:
        np.testing.assert_allclose(
            np.asarray(flat_s[path]), np.asarray(leaf), atol=1e-6,
            err_msg=str(path))


def test_multi_step_matches_dense_when_every_row_always_touched():
    """When every vocab row is touched every step the stale-moment
    distinction vanishes: N sparse steps == N dense steps bitwise-ish."""
    rng = np.random.default_rng(3)
    table = _table(rng, full_cover=True)
    mk = lambda: [_batch(np.random.default_rng(10 + i), full_cover=True)
                  for i in range(3)]
    td = _trainer(table, sparse=False)
    _run_steps(td, mk(), table)
    ts = _trainer(table, sparse=True, min_bucket=VOCAB)
    _run_steps(ts, mk(), table)
    # confirm the premise: every row touched
    raw = prep_sparse_batch(mk()[0], {"title": table}, ("title",), VOCAB,
                            min_bucket=8)
    assert int(raw["emb_valid"].sum()) == VOCAB
    np.testing.assert_allclose(_emb_table(ts), _emb_table(td), atol=2e-5)


def test_stale_moment_semantics_rows_skip_updates():
    """A row touched at step 1 then absent at step 2 must NOT move at
    step 2 (LazyAdam-style row-sparse semantics — a deliberate deviation;
    the reference's dense-decay Adam, like the trainer's dense default,
    WOULD apply a momentum-carryover update there)."""
    rng = np.random.default_rng(4)
    table = _table(rng)
    b1 = _batch(np.random.default_rng(5))
    # second batch references only article row 1 -> few tokens touched
    b2 = {"hist_idx": np.ones((BS, H), np.int32),
          "cand_idx": np.ones((BS, K), np.int32),
          "labels": b1["labels"].copy()}
    ts = _trainer(table, sparse=True)
    ts.init_state(b1)
    key = jax.random.key(0, impl=ts.config.rng_impl)
    p1 = prep_sparse_batch(b1, ts._host_tables, ts._sparse_tables, VOCAB, 8)
    ts.state, _ = ts._train_step(ts.state, ts._put(p1), key)
    after1 = _emb_table(ts)
    m_after1 = np.asarray(ts.state.emb.m)
    p2 = prep_sparse_batch(b2, ts._host_tables, ts._sparse_tables, VOCAB, 8)
    n2 = int(p2["emb_valid"].sum())
    touched2 = set(p2["emb_uniq"][:n2].tolist())
    ts.state, _ = ts._train_step(ts.state, ts._put(p2), key)
    after2 = _emb_table(ts)
    m_after2 = np.asarray(ts.state.emb.m)
    untouched = np.array(sorted(set(range(VOCAB)) - touched2))
    np.testing.assert_array_equal(after2[untouched], after1[untouched])
    np.testing.assert_array_equal(m_after2[untouched], m_after1[untouched])
    moved = np.array(sorted(touched2))
    assert np.abs(after2[moved] - after1[moved]).max() > 0


def test_rowwise_adam_matches_reference_formula():
    """Hand-computed TF-style sparse Adam on a 3-row toy table."""
    table = jnp.asarray(np.ones((4, 3), np.float32))
    st = SparseEmbedState.create(table)
    uniq = jnp.asarray([1, 3, 0], jnp.int32)
    valid = jnp.asarray([1.0, 1.0, 0.0])  # pad slot duplicates row 0
    g = jnp.asarray(np.array([[1.0], [2.0], [5.0]]) * np.ones((1, 3)),
                    jnp.float32)
    lr, b1, b2, eps = 0.1, 0.9, 0.999, 1e-8
    st2 = rowwise_adam(st, uniq, valid, g, lr, jnp.asarray(1), b1, b2, eps)
    for row, gi in ((1, 1.0), (3, 2.0)):
        m = (1 - b1) * gi
        v = (1 - b2) * gi * gi
        upd = lr * (m / (1 - b1)) / (np.sqrt(v / (1 - b2)) + eps)
        np.testing.assert_allclose(np.asarray(st2.table)[row], 1.0 - upd,
                                   rtol=1e-6)
    # padded slot left row 0 (and its moments) untouched
    np.testing.assert_array_equal(np.asarray(st2.table)[0], 1.0)
    np.testing.assert_array_equal(np.asarray(st2.m)[0], 0.0)
    np.testing.assert_array_equal(np.asarray(st2.table)[2], 1.0)


def test_sparse_fit_and_score_end_to_end():
    """fit() with prefetch-thread dedup + eval through the reinserted
    table; AUC computable and loss decreases on learnable data."""
    from ebnerd_tpu import constants as c
    from ebnerd_tpu.data.behaviors import (
        create_binary_labels_column,
        ebnerd_from_path,
        sampling_strategy_wu2019,
    )
    from ebnerd_tpu.data.dataloader import EvalFeed, NewsrecFeed
    from ebnerd_tpu.data.lookup import Lookup
    from ebnerd_tpu.data.synthetic import make_synthetic_ebnerd
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as tmp:
        path = Path(tmp) / "train"
        make_synthetic_ebnerd(path, n_users=30, n_articles=60,
                              n_impressions=160, seed=11)
        df = ebnerd_from_path(path, history_size=H)
        train_df = create_binary_labels_column(
            sampling_strategy_wu2019(df, npratio=K - 1, shuffle=True, seed=2))
        val_df = create_binary_labels_column(df)
        rng = np.random.default_rng(0)
        from ebnerd_tpu.data.table import read_parquet

        articles = read_parquet(path / "articles.parquet")
        ids = np.asarray(articles[c.DEFAULT_ARTICLE_ID_COL])
        tokens = rng.integers(1, VOCAB, size=(len(ids), T)).astype(np.int32)
        lookup = Lookup.from_values(ids, tokens)
        trainer = _trainer(lookup.matrix, sparse=True)
        feed = NewsrecFeed(train_df, lookup, history_size=H, batch_size=BS)
        val_feed = EvalFeed(val_df, lookup, history_size=H, batch_size=BS)
        hist = trainer.fit(feed, val_feed, val_df[c.DEFAULT_LABELS_COL],
                           epochs=2)
        assert np.isfinite(hist[0]["loss"])
        assert 0.0 <= hist[0]["val_auc"] <= 1.0
        scores = trainer.score(val_feed)
        assert np.isfinite(np.asarray(scores.values)).all()


def test_sparse_dp_mesh_matches_single_device():
    """Sparse step under a 4-way data-parallel mesh: replicated dedup
    side-tables + sharded batch produce the single-device result."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    rng = np.random.default_rng(6)
    table = _table(rng)
    batches = [_batch(np.random.default_rng(20 + i)) for i in range(2)]
    t1 = _trainer(table, sparse=True)
    l1 = _run_steps(t1, [dict(b) for b in batches], table)
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    t2 = _trainer(table, sparse=True, mesh=mesh)
    l2 = _run_steps(t2, [dict(b) for b in batches], table)
    np.testing.assert_allclose(l1, l2, atol=1e-5)
    np.testing.assert_allclose(_emb_table(t1), _emb_table(t2), atol=1e-5)


def test_sparse_config_validation():
    rng = np.random.default_rng(0)
    table = _table(rng)
    with pytest.raises(ValueError, match="accumulation_steps"):
        Trainer(_model(), {"title": table}, token_batch,
                TrainerConfig(sparse_embedding=True, accumulation_steps=2),
                log_fn=lambda s: None)
    with pytest.raises(ValueError, match="l2_regularization"):
        Trainer(_model(), {"title": table}, token_batch,
                TrainerConfig(sparse_embedding=True, l2_regularization=1e-4),
                log_fn=lambda s: None)


def test_sparse_naml_multi_table_dedup():
    """NAML embeds title AND body tokens through the shared word
    embedding; the host dedup must union both tables' tokens."""
    from ebnerd_tpu.models.config import HParamsNAML
    from ebnerd_tpu.models.inputs import naml_batch
    from ebnerd_tpu.models.newsrec import NAML

    rng = np.random.default_rng(7)
    TB = 8
    tables = {
        "title": rng.integers(0, VOCAB, (N_ART + 1, T)).astype(np.int32),
        "body": rng.integers(0, VOCAB, (N_ART + 1, TB)).astype(np.int32),
        "cat": rng.integers(0, 10, (N_ART + 1,)).astype(np.int32),
        "subcat": rng.integers(0, 10, (N_ART + 1,)).astype(np.int32),
    }
    hp = HParamsNAML(title_size=T, body_size=TB, history_size=H,
                     vert_num=10, subvert_num=10, filter_num=16,
                     attention_hidden_dim=16, dropout=0.0)
    model = NAML(hp, vocab_size=VOCAB, word_emb_dim=EMB)
    cfg = TrainerConfig(learning_rate=1e-2, seed=0, sparse_embedding=True,
                        sparse_min_bucket=8, early_stopping_patience=None,
                        lr_patience=None)
    tr = Trainer(model, tables, naml_batch, cfg, log_fn=lambda s: None)
    assert set(tr._sparse_tables) == {"title", "body"}
    raw = _batch(np.random.default_rng(8))
    tr.init_state(raw)
    prep = prep_sparse_batch(raw, tr._host_tables, tr._sparse_tables, VOCAB,
                             min_bucket=8)
    idx = np.concatenate([raw["hist_idx"].ravel(), raw["cand_idx"].ravel()])
    want = np.union1d(np.unique(tables["title"][idx]),
                      np.unique(tables["body"][idx]))
    n = int(prep["emb_valid"].sum())
    assert set(want.tolist()) == set(prep["emb_uniq"][:n].tolist())
    key = jax.random.key(0, impl=cfg.rng_impl)
    tr.state, loss = tr._train_step(tr.state, tr._put(prep), key)
    assert np.isfinite(float(loss))
    # dense comparison at step 1 (zero moments -> exact match)
    td = Trainer(model, tables, naml_batch,
                 TrainerConfig(learning_rate=1e-2, seed=0,
                               early_stopping_patience=None, lr_patience=None),
                 log_fn=lambda s: None)
    td.init_state(dict(raw))
    td.state, loss_d = td._train_step(td.state, td._put(dict(raw)), key)
    assert float(loss_d) == pytest.approx(float(loss), abs=1e-6)
    np.testing.assert_allclose(
        np.asarray(tr.state.emb.table),
        np.asarray(td.state.params["word_embedding"]["embedding"]), atol=1e-6)

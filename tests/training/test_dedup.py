"""Train-time unique-article dedup (training/dedup.py + model slot paths).

Invariants: the deduped batch is a pure re-indexing — in eval mode every
model family produces bit-identical logits through the slot path, and
with dropout disabled one full train step produces the same loss and the
same updated parameters as the per-slot path (the gather backward is a
segment-sum over slot cotangents). Under dropout the paths deliberately
diverge (one stochastic encode per unique article vs per slot — see
training/dedup.py docstring); convergence parity is pinned by the
PARITY_TRAIN.json dedup entry, not here.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ebnerd_tpu.models.config import (
    HParamsLSTUR,
    HParamsNAML,
    HParamsNPA,
    HParamsNRMS,
    HParamsNRMSDocVec,
)
from ebnerd_tpu.models.inputs import docvec_batch, naml_batch, token_batch
from ebnerd_tpu.models.newsrec import LSTUR, NAML, NPA, NRMS, NRMSDocVec
from ebnerd_tpu.parallel.mesh import make_mesh
from ebnerd_tpu.training.dedup import (
    dedup_bucket,
    pad_dedup_to,
    prep_dedup_batch,
)
from ebnerd_tpu.training.trainer import Trainer, TrainerConfig

H, T, K, BS = 4, 6, 3, 8
VOCAB, EMB, N_ART = 64, 16, 40
N_USERS = 12


def _batch(rng, with_user=False):
    out = {
        "hist_idx": rng.integers(0, N_ART + 1, (BS, H)).astype(np.int32),
        "cand_idx": rng.integers(0, N_ART + 1, (BS, K)).astype(np.int32),
        "labels": np.zeros((BS, K), np.float32),
    }
    out["labels"][:, 0] = 1.0
    if with_user:
        out["user_idx"] = rng.integers(0, N_USERS, (BS,)).astype(np.int32)
    return out


def _tables(rng):
    tok = rng.integers(0, VOCAB, size=(N_ART + 1, T)).astype(np.int32)
    tok[0] = 0  # padding article row
    return {
        "title": tok,
        "body": rng.integers(0, VOCAB, size=(N_ART + 1, T + 2)).astype(np.int32),
        "cat": rng.integers(0, 5, size=(N_ART + 1,)).astype(np.int32),
        "subcat": rng.integers(0, 9, size=(N_ART + 1,)).astype(np.int32),
        "docvec": rng.normal(size=(N_ART + 1, 10)).astype(np.float32),
    }


def test_dedup_bucket_ladder():
    assert dedup_bucket(1, 512) == 512
    assert dedup_bucket(512, 512) == 512
    assert dedup_bucket(513, 512) == 768  # 1.25x then round up to 256
    assert dedup_bucket(100, 8) == 256  # floor is one lane tile
    n = dedup_bucket(16_001, 512)
    assert n >= 16_001 and n % 256 == 0 and n <= 16_001 * 1.3 + 256


def test_prep_round_trip():
    rng = np.random.default_rng(0)
    raw = _batch(rng, with_user=True)
    out = prep_dedup_batch(raw, min_bucket=8)
    c = out["art_uniq"].shape[0]
    assert c % 256 == 0
    n = out["n_uniq"]
    uniq = out["art_uniq"]
    # slots reconstruct the original index batch exactly
    np.testing.assert_array_equal(uniq[out["hist_slot"]], raw["hist_idx"])
    np.testing.assert_array_equal(uniq[out["cand_slot"]], raw["cand_idx"])
    assert out["hist_slot"].max() < n and out["cand_slot"].max() < n
    # untouched keys carried through; consumed keys dropped
    assert "user_idx" in out and "labels" in out
    assert "hist_idx" not in out and "cand_idx" not in out
    # pad entries (row 0) are never referenced
    assert (uniq[n:] == 0).all()
    grown = pad_dedup_to(out, c + 256)
    assert grown["art_uniq"].shape[0] == c + 256
    np.testing.assert_array_equal(grown["art_uniq"][:c], uniq)


def _models():
    common = dict(vocab_size=VOCAB, word_emb_dim=EMB)
    yield ("nrms", NRMS(HParamsNRMS(title_size=T, history_size=H, head_num=2,
                                    head_dim=8, attention_hidden_dim=16,
                                    dropout=0.0), **common),
           token_batch, False)
    yield ("nrms_docvec",
           NRMSDocVec(HParamsNRMSDocVec(title_size=10, history_size=H,
                                        head_num=2, head_dim=8,
                                        attention_hidden_dim=16, dropout=0.0,
                                        newsencoder_units_per_layer=(12,))),
           docvec_batch, False)
    yield ("lstur", LSTUR(HParamsLSTUR(title_size=T, history_size=H,
                                       filter_num=12, window_size=3,
                                       attention_hidden_dim=16, gru_unit=12,
                                       n_users=N_USERS, dropout=0.0), **common),
           token_batch, True)
    yield ("naml", NAML(HParamsNAML(title_size=T, body_size=T + 2,
                                    history_size=H, filter_num=12,
                                    window_size=3, attention_hidden_dim=16,
                                    vert_num=5, subvert_num=9, dropout=0.0),
                        **common),
           naml_batch, False)
    # NPA dedups PARTIALLY: user-independent embedding->conv prefix only
    yield ("npa", NPA(HParamsNPA(title_size=T, history_size=H, filter_num=12,
                                 window_size=3, attention_hidden_dim=16,
                                 user_emb_dim=8, n_users=N_USERS,
                                 dropout=0.0), **common),
           token_batch, True)


@pytest.mark.parametrize("name,model,builder,with_user",
                         [m for m in _models()],
                         ids=[m[0] for m in _models()])
def test_eval_forward_identical(name, model, builder, with_user):
    """Slot path == per-slot path bit-for-bit in eval mode."""
    rng = np.random.default_rng(1)
    tables = {k: jnp.asarray(v) for k, v in _tables(rng).items()}
    raw = _batch(rng, with_user=with_user)
    plain = builder(tables, {k: jnp.asarray(v) for k, v in raw.items()})
    variables = model.init(jax.random.key(0), plain, train=False)
    logits = model.apply(variables, plain, train=False)
    ded = prep_dedup_batch(raw, min_bucket=8)
    ded.pop("n_uniq")
    dbatch = builder(tables, {k: jnp.asarray(v) for k, v in ded.items()})
    logits_d = model.apply(variables, dbatch, train=False)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits_d))


def test_fastformer_eval_forward_identical():
    from ebnerd_tpu.models.config import HParamsFastformer
    from ebnerd_tpu.models.fastformer import Fastformer

    rng = np.random.default_rng(2)
    hp = HParamsFastformer(n_layers=1, embedding_dim=16, n_heads=2,
                           intermediate_dim=16, title_size=T, history_size=H,
                           dropout=0.0)
    model = Fastformer(hp, vocab_size=VOCAB)
    tables = {"title": jnp.asarray(_tables(rng)["title"])}
    raw = _batch(rng)
    plain = token_batch(tables, {k: jnp.asarray(v) for k, v in raw.items()})
    variables = model.init(jax.random.key(0), plain, train=False)
    logits = model.apply(variables, plain, train=False)
    ded = prep_dedup_batch(raw, min_bucket=8)
    ded.pop("n_uniq")
    dbatch = token_batch(tables, {k: jnp.asarray(v) for k, v in ded.items()})
    logits_d = model.apply(variables, dbatch, train=False)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits_d))


def _nrms_trainer(tables, dedup, mesh=None, dropout=0.0):
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=2, head_dim=8,
                     attention_hidden_dim=16, dropout=dropout)
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=EMB)
    cfg = TrainerConfig(learning_rate=1e-2, seed=0, dedup_articles=dedup,
                        early_stopping_patience=None, lr_patience=None)
    return Trainer(model, {"title": tables["title"]}, token_batch, cfg,
                   mesh=mesh, log_fn=lambda s: None)


def _one_step(trainer, raw):
    trainer.init_state(raw)
    key = jax.random.key(0, impl=trainer.config.rng_impl)
    if trainer._dedup:
        raw = prep_dedup_batch(raw, trainer.config.dedup_min_bucket)
    trainer.state, loss = trainer._train_step(trainer.state, trainer._put(raw), key)
    return float(loss), trainer.state


def test_train_step_equivalent_no_dropout():
    """With dropout off, one dedup train step == one per-slot train step:
    same loss, same updated parameters (segment-sum backward)."""
    rng = np.random.default_rng(3)
    tables = _tables(rng)
    raw = _batch(np.random.default_rng(4))
    loss_p, state_p = _one_step(_nrms_trainer(tables, dedup=False), dict(raw))
    loss_d, state_d = _one_step(_nrms_trainer(tables, dedup=True), dict(raw))
    assert np.isclose(loss_p, loss_d, rtol=1e-6)
    flat_p = jax.tree_util.tree_leaves_with_path(state_p.params)
    flat_d = dict(jax.tree_util.tree_leaves_with_path(state_d.params))
    # tolerance: the segment-sum backward reassociates float adds vs the
    # per-slot scatter; Adam's m/sqrt(v) normalization amplifies those
    # last-ulp grad differences to ~1e-6 absolute on the updated params
    for path, leaf in flat_p:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_d[path]),
                                   rtol=1e-3, atol=2e-5, err_msg=str(path))


def test_npa_partial_dedup_auto_on_and_unknown_model_rejected():
    """NPA dedups partially (conv prefix), so auto turns dedup ON; an
    unknown model family is rejected conservatively."""
    hp = HParamsNPA(title_size=T, history_size=H, filter_num=12, window_size=3,
                    attention_hidden_dim=16, user_emb_dim=8, n_users=N_USERS,
                    dropout=0.0)
    model = NPA(hp, vocab_size=VOCAB, word_emb_dim=EMB)
    tables = _tables(np.random.default_rng(5))
    tr = Trainer(model, {"title": tables["title"]}, token_batch,
                 TrainerConfig(dedup_articles="auto"), log_fn=lambda s: None)
    assert tr._dedup is True

    from flax import linen as nn

    class Mystery(nn.Module):
        @nn.compact
        def __call__(self, batch, train=False):
            return jnp.zeros((1, 1))

    with pytest.raises(ValueError, match="unknown model family"):
        Trainer(Mystery(), {"title": tables["title"]}, token_batch,
                TrainerConfig(dedup_articles=True), log_fn=lambda s: None)
    tr2 = Trainer(Mystery(), {"title": tables["title"]}, token_batch,
                  TrainerConfig(dedup_articles="auto"), log_fn=lambda s: None)
    assert tr2._dedup is False


def test_fit_with_dedup_and_scan_groups():
    """fit() with dedup default-on: prefetch-thread prep, scan-group
    bucket alignment, finite decreasing loss, eval scoring works."""
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

    with tempfile.TemporaryDirectory() as tmp:
        path = make_synthetic_ebnerd(Path(tmp) / "t", n_users=20, n_articles=39,
                                     n_impressions=96, seed=6)
        df = ebnerd_from_path(path, history_size=H)
        train_df = create_binary_labels_column(
            sampling_strategy_wu2019(df, npratio=K - 1, shuffle=True, seed=1))
        val_df = create_binary_labels_column(df)
        articles = read_parquet(path / "articles.parquet")
        ids = np.asarray(articles[c.DEFAULT_ARTICLE_ID_COL])
        tokens = np.random.default_rng(0).integers(
            1, VOCAB, size=(len(ids), T)).astype(np.int32)
        lookup = Lookup.from_values(ids, tokens)
        hp = HParamsNRMS(title_size=T, history_size=H, head_num=2, head_dim=8,
                         attention_hidden_dim=16, dropout=0.2)
        model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=EMB)
        tr = Trainer(model, {"title": lookup.matrix}, token_batch,
                     TrainerConfig(learning_rate=1e-2, seed=0, scan_steps=2,
                                   early_stopping_patience=None,
                                   lr_patience=None),
                     log_fn=lambda s: None)
        assert tr._dedup is True
        feed = NewsrecFeed(train_df, lookup, history_size=H, batch_size=16)
        val_feed = EvalFeed(val_df, lookup, history_size=H, batch_size=16)
        hist = tr.fit(feed, val_feed, val_df[c.DEFAULT_LABELS_COL], epochs=3)
        losses = [h["loss"] for h in hist]
        assert np.isfinite(losses).all() and losses[-1] < losses[0]
        scores = tr.score(val_feed)
        assert np.isfinite(np.asarray(scores.values)).all()


def test_dedup_under_mesh_matches_single_device():
    """4-device data-parallel dedup step == single-device dedup step
    (global slots into the data-sharded unique axis; XLA inserts the
    [C, D] all-gather + reduce-scatter)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    rng = np.random.default_rng(7)
    tables = _tables(rng)
    raw = _batch(np.random.default_rng(8))
    loss_1, state_1 = _one_step(_nrms_trainer(tables, dedup=True), dict(raw))
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    loss_m, state_m = _one_step(_nrms_trainer(tables, dedup=True, mesh=mesh),
                                dict(raw))
    assert np.isclose(loss_1, loss_m, rtol=1e-5)
    emb_1 = np.asarray(state_1.params["word_embedding"]["embedding"])
    emb_m = np.asarray(state_m.params["word_embedding"]["embedding"])
    np.testing.assert_allclose(emb_1, emb_m, rtol=1e-5, atol=1e-6)


def test_weighted_bn_dedup_under_mesh_matches_single_device():
    """Slot-count-weighted BN + dedup under a 4-device dp mesh == the
    single-device dedup step (GSPMD reductions are global, so the
    weighted moments see the whole batch — layers.WeightedBatchNorm)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    _, model, builder, _ = list(_models())[1]  # NRMSDocVec
    tables = _tables(np.random.default_rng(41))
    raw = _batch(np.random.default_rng(42))

    def one(mesh):
        cfg = TrainerConfig(learning_rate=1e-2, seed=0, dedup_articles=True,
                            early_stopping_patience=None, lr_patience=None)
        t = Trainer(model, tables, builder, cfg, mesh=mesh,
                    log_fn=lambda s: None)
        t.init_state(dict(raw))
        r = prep_dedup_batch(dict(raw), 8)
        key = jax.random.key(0, impl=cfg.rng_impl)
        t.state, loss = t._train_step(t.state, t._put(r), key)
        return float(loss), t.state

    loss_1, st_1 = one(None)
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    loss_m, st_m = one(mesh)
    assert np.isclose(loss_1, loss_m, rtol=1e-5)
    flat_m = dict(jax.tree_util.tree_leaves_with_path(st_m.batch_stats))
    for path, leaf in jax.tree_util.tree_leaves_with_path(st_1.batch_stats):
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_m[path]),
                                   rtol=1e-5, atol=1e-6, err_msg=str(path))


@pytest.mark.parametrize("name,model,builder,with_user",
                         [m for m in _models()],
                         ids=[m[0] for m in _models()])
def test_grads_equivalent_all_families(name, model, builder, with_user):
    """No-dropout GRADIENTS through the dedup path == the per-slot path
    for every dedup-capable family (comparing grads, not post-Adam
    params: Adam's m/sqrt(v) normalization blows last-ulp differences on
    near-zero-gradient components up to ~lr).

    NRMSDocVec (train-mode BatchNorm article tower) dedups via
    slot-count-weighted BN moments (layers.WeightedBatchNorm): weighting
    each unique article by its slot multiplicity reproduces the per-slot
    statistics exactly, so its gradients must match too."""
    rng = np.random.default_rng(11)
    tables = _tables(rng)
    raw = _batch(np.random.default_rng(12), with_user=with_user)

    def grads(dedup):
        cfg = TrainerConfig(learning_rate=1e-2, seed=0, dedup_articles=dedup,
                            early_stopping_patience=None, lr_patience=None)
        tr = Trainer(model, tables, builder, cfg, log_fn=lambda s: None)
        tr.init_state(dict(raw))
        r = dict(raw)
        if dedup:
            r = prep_dedup_batch(r, 8)
            r.pop("n_uniq")
        batch = builder(tr.tables, {k: jnp.asarray(v) for k, v in r.items()})
        labels = jnp.asarray(raw["labels"])

        def loss_of(p):
            variables = {"params": p}
            mutable = False
            if tr.state.batch_stats:
                variables["batch_stats"] = tr.state.batch_stats
                mutable = ["batch_stats"]
            out = model.apply(variables, batch, train=True,
                              rngs={"dropout": jax.random.key(0)},
                              mutable=mutable)
            logits = out[0] if mutable else out
            return tr.loss_fn(logits, labels)

        loss, g = jax.value_and_grad(loss_of)(tr.state.params)
        return float(loss), g

    loss_p, g_p = grads(False)
    loss_d, g_d = grads(True)
    assert np.isclose(loss_p, loss_d, rtol=1e-6)
    flat_d = dict(jax.tree_util.tree_leaves_with_path(g_d))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_p):
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_d[path]),
                                   rtol=1e-3, atol=1e-6,
                                   err_msg=f"{name} {path}")


def test_batchnorm_models_dedup_with_weighted_moments():
    """BatchNorm article towers dedup via slot-count-weighted BN moments
    (layers.WeightedBatchNorm): auto turns dedup ON, and one train step
    through the dedup path matches the per-slot step — including the
    updated BN running statistics, which unweighted moments over the
    bucket-padded unique axis would corrupt (r4 measured loss 3.04 vs
    1.29 before the weighting existed)."""
    _, model, builder, _ = list(_models())[1]  # NRMSDocVec (dense stack + BN)
    tables = _tables(np.random.default_rng(21))
    tr = Trainer(model, tables, builder,
                 TrainerConfig(dedup_articles="auto"), log_fn=lambda s: None)
    assert tr._dedup is True
    # NRMS with a dense stack (BN) is auto-capable the same way
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=2, head_dim=8,
                     attention_hidden_dim=16, dropout=0.0,
                     newsencoder_units_per_layer=(12,))
    m2 = NRMS(hp, vocab_size=VOCAB, word_emb_dim=EMB)
    tr2 = Trainer(m2, {"title": tables["title"]}, token_batch,
                  TrainerConfig(dedup_articles="auto"), log_fn=lambda s: None)
    assert tr2._dedup is True

    # one train step, per-slot vs dedup: loss, params AND batch_stats agree
    raw = _batch(np.random.default_rng(22))

    def one(dedup):
        cfg = TrainerConfig(learning_rate=1e-2, seed=0, dedup_articles=dedup,
                            early_stopping_patience=None, lr_patience=None)
        t = Trainer(model, tables, builder, cfg, log_fn=lambda s: None)
        t.init_state(dict(raw))
        r = dict(raw)
        if dedup:
            r = prep_dedup_batch(r, 8)
        key = jax.random.key(0, impl=cfg.rng_impl)
        t.state, loss = t._train_step(t.state, t._put(r), key)
        return float(loss), t.state

    loss_p, state_p = one(False)
    loss_d, state_d = one(True)
    assert np.isclose(loss_p, loss_d, rtol=1e-5)
    flat_d = dict(jax.tree_util.tree_leaves_with_path(state_d.batch_stats))
    for path, leaf in jax.tree_util.tree_leaves_with_path(state_p.batch_stats):
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_d[path]),
                                   rtol=1e-5, atol=1e-6, err_msg=str(path))
    flat_dp = dict(jax.tree_util.tree_leaves_with_path(state_d.params))
    for path, leaf in jax.tree_util.tree_leaves_with_path(state_p.params):
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_dp[path]),
                                   rtol=1e-3, atol=2e-5, err_msg=str(path))


def test_fastformer_grads_equivalent():
    from ebnerd_tpu.models.config import HParamsFastformer
    from ebnerd_tpu.models.fastformer import Fastformer

    rng = np.random.default_rng(13)
    hp = HParamsFastformer(n_layers=1, embedding_dim=16, n_heads=2,
                           intermediate_dim=16, title_size=T, history_size=H,
                           dropout=0.0)
    model = Fastformer(hp, vocab_size=VOCAB)
    tables = {"title": _tables(rng)["title"]}
    raw = _batch(np.random.default_rng(14))

    def grads(dedup):
        cfg = TrainerConfig(learning_rate=1e-2, seed=0, dedup_articles=dedup,
                            early_stopping_patience=None, lr_patience=None)
        tr = Trainer(model, tables, token_batch, cfg, log_fn=lambda s: None)
        tr.init_state(dict(raw))
        r = dict(raw)
        if dedup:
            r = prep_dedup_batch(r, 8)
            r.pop("n_uniq")
        batch = token_batch(tr.tables, {k: jnp.asarray(v) for k, v in r.items()})
        labels = jnp.asarray(raw["labels"])

        def loss_of(p):
            logits = model.apply({"params": p}, batch, train=True,
                                 rngs={"dropout": jax.random.key(0)})
            return tr.loss_fn(logits, labels)

        loss, g = jax.value_and_grad(loss_of)(tr.state.params)
        return float(loss), g

    loss_p, g_p = grads(False)
    loss_d, g_d = grads(True)
    assert np.isclose(loss_p, loss_d, rtol=1e-6)
    flat_d = dict(jax.tree_util.tree_leaves_with_path(g_d))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_p):
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_d[path]),
                                   rtol=1e-3, atol=1e-6, err_msg=str(path))


def test_dedup_with_gradient_accumulation():
    """Dedup composes with optax.MultiSteps accumulation: varying bucket
    shapes across micro-batches leave the param-shaped accumulator
    untouched; the model only updates every accumulation_steps batches."""
    rng = np.random.default_rng(31)
    tables = _tables(rng)
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=2, head_dim=8,
                     attention_hidden_dim=16, dropout=0.0)
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=EMB)
    tr = Trainer(model, {"title": tables["title"]}, token_batch,
                 TrainerConfig(learning_rate=1e-2, seed=0,
                               accumulation_steps=2,
                               early_stopping_patience=None,
                               lr_patience=None),
                 log_fn=lambda s: None)
    raw = _batch(np.random.default_rng(32))
    tr.init_state(dict(raw))
    p0 = np.asarray(tr.state.params["word_embedding"]["embedding"])
    key = jax.random.key(0, impl=tr.config.rng_impl)
    for i, bucket in enumerate((8, 300)):  # two different ladder buckets
        p = prep_dedup_batch(dict(raw), bucket)
        p.pop("n_uniq")
        tr.state, loss = tr._train_step(tr.state, tr._put(p), key)
        p_now = np.asarray(tr.state.params["word_embedding"]["embedding"])
        if i == 0:  # first micro-batch: accumulate only, no update
            np.testing.assert_array_equal(p_now, p0)
        else:       # second: the optimizer applied
            assert np.abs(p_now - p0).max() > 0
    assert np.isfinite(float(loss))

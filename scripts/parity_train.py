#!/usr/bin/env python
"""Accuracy-parity training run: reference TF/Keras NRMS vs ebnerd_tpu NRMS
on the SAME synthetic split, same tokens, same npratio, same word2vec init.

The reference publishes no accuracy numbers (BASELINE.md), so parity is
demonstrated by training BOTH implementations locally (CPU) on a synthetic
EB-NeRD-shaped dataset with a learnable topic signal (users prefer a topic;
titles carry topic words; the clicked inview article matches the user's
topic ~80% of the time) and comparing val AUC curves. Uniform-random
clicks would leave both at AUC 0.5 and prove nothing.

Writes PARITY_TRAIN.json at the repo root:
  - reference & ebnerd_tpu per-epoch val AUC
  - ebnerd_tpu re-run with a different seed (run-to-run variance scale)
  - pass/fail: |AUC_ref - AUC_ours| <= max(2 * seed_spread, 0.02)

Run: python scripts/parity_train.py   (CPU, ~3-6 min)
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE_SRC = "/root/reference/src"

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
sys.path.insert(0, str(REPO))

import numpy as np

# -- config (nrms_dummy scale: reference quick_start/nrms_dummy.py:13-47) --
VOCAB, EMB = 2_000, 64
N_TOPICS, WORDS_PER_TOPIC = 10, 150
H, T, NPRATIO, K = 10, 12, 4, 5
HEADS, HEAD_DIM, ATT = 8, 8, 32
N_ARTICLES, N_TRAIN, N_VAL = 400, 6_000, 1_500
EPOCHS, BATCH, LR = 3, 64, 1e-3
TOPIC_CLICK_P = 0.8


def make_signal_dataset(seed: int, return_indices: bool = False):
    """Token matrices + labels with a learnable topic preference signal.
    ``return_indices`` additionally exposes the article-index view of the
    train split + the article token table (the dedup parity run trains
    through the index/dedup path, training/dedup.py)."""
    rng = np.random.default_rng(seed)
    art_topic = rng.integers(0, N_TOPICS, N_ARTICLES)
    # title tokens: 2/3 from the article's topic block, 1/3 common words
    common_lo = N_TOPICS * WORDS_PER_TOPIC + 1
    tokens = np.zeros((N_ARTICLES, T), np.int32)
    for a in range(N_ARTICLES):
        lo = 1 + art_topic[a] * WORDS_PER_TOPIC
        topic_words = rng.integers(lo, lo + WORDS_PER_TOPIC, T)
        common = rng.integers(common_lo, VOCAB, T)
        use_topic = rng.random(T) < 0.67
        tokens[a] = np.where(use_topic, topic_words, common)

    def impressions(n):
        user_topic = rng.integers(0, N_TOPICS, n)
        his = np.zeros((n, H), np.int64)
        cand = np.zeros((n, K), np.int64)
        labels = np.zeros((n, K), np.float32)
        for i in range(n):
            ut = user_topic[i]
            on_topic = np.flatnonzero(art_topic == ut)
            off_topic = np.flatnonzero(art_topic != ut)
            # history: mostly on-topic articles
            n_on = rng.binomial(H, 0.8)
            his[i] = np.concatenate([
                rng.choice(on_topic, n_on), rng.choice(off_topic, H - n_on)])
            # candidates: npratio off-topic negatives + 1 positive
            neg = rng.choice(off_topic, NPRATIO, replace=False)
            pos_pool = on_topic if rng.random() < TOPIC_CLICK_P else off_topic
            pos = rng.choice(pos_pool)
            order = rng.permutation(K)
            cand[i] = np.concatenate([neg, [pos]])[order]
            labels[i, np.flatnonzero(order == NPRATIO)[0]] = 1.0
        return tokens[his], tokens[cand], labels, his, cand

    t_his, t_cand, t_y, t_hidx, t_cidx = impressions(N_TRAIN)
    v_his, v_cand, v_y, _, _ = impressions(N_VAL)
    train = (t_his, t_cand, t_y)
    val = (v_his, v_cand, v_y)
    if return_indices:
        return train, val, tokens, (t_hidx, t_cidx, t_y)
    return train, val


def make_docvec_dataset(seed: int, dv: int = 64):
    """Document-vector variant of the topic-signal dataset: article
    docvecs = topic centroid + noise, so the user's topic preference is
    learnable from raw vectors (NRMSDocVec's input regime,
    reference nrms_docvec.py:99-137)."""
    rng = np.random.default_rng(seed)
    art_topic = rng.integers(0, N_TOPICS, N_ARTICLES)
    centroids = rng.standard_normal((N_TOPICS, dv)).astype(np.float32)
    docvecs = (centroids[art_topic]
               + 0.7 * rng.standard_normal((N_ARTICLES, dv))).astype(np.float32)

    def impressions(n):
        user_topic = rng.integers(0, N_TOPICS, n)
        his = np.zeros((n, H), np.int64)
        cand = np.zeros((n, K), np.int64)
        labels = np.zeros((n, K), np.float32)
        for i in range(n):
            ut = user_topic[i]
            on_topic = np.flatnonzero(art_topic == ut)
            off_topic = np.flatnonzero(art_topic != ut)
            n_on = rng.binomial(H, 0.8)
            his[i] = np.concatenate([
                rng.choice(on_topic, n_on), rng.choice(off_topic, H - n_on)])
            neg = rng.choice(off_topic, NPRATIO, replace=False)
            pos_pool = on_topic if rng.random() < TOPIC_CLICK_P else off_topic
            pos = rng.choice(pos_pool)
            order = rng.permutation(K)
            cand[i] = np.concatenate([neg, [pos]])[order]
            labels[i, np.flatnonzero(order == NPRATIO)[0]] = 1.0
        return docvecs[his], docvecs[cand], labels

    return impressions(N_TRAIN), impressions(N_VAL)


def _install_keras3_shim():
    """int shapes -> 1-tuples (the reference NRMSDocVec passes a bare int
    to tf.keras.Input, which Keras 3 rejects; see
    tests/parity/test_reference_nrms_docvec.py)."""
    import keras.src.backend.common.variables as kv

    orig = kv.standardize_shape

    def compat(shape):
        if isinstance(shape, int):
            shape = (shape,)
        return orig(shape)

    kv.standardize_shape = compat
    import keras.src.layers.core.input_layer as il

    il.backend.standardize_shape = compat


def train_reference_docvec(train, val, seed: int, dv: int = 64) -> list[float]:
    sys.path.insert(0, REFERENCE_SRC)
    _install_keras3_shim()
    from ebrec.models.newsrec.model_config import hparams_nrms_docvec
    from ebrec.models.newsrec.nrms_docvec import NRMSDocVec as RefNRMSDocVec

    hp = hparams_nrms_docvec()
    hp.title_size, hp.history_size = dv, H
    hp.head_num, hp.head_dim, hp.attention_hidden_dim = HEADS, HEAD_DIM, ATT
    hp.newsencoder_units_per_layer = [64, 64]
    hp.learning_rate = LR
    model = RefNRMSDocVec(hparams=hp, seed=seed)
    his, cand, y = train
    vhis, vcand, vy = val
    aucs = []
    for _ in range(EPOCHS):
        model.model.fit((his, cand), y, batch_size=BATCH, epochs=1, verbose=0)
        probs = model.model.predict([vhis, vcand], verbose=0, batch_size=256)
        aucs.append(auc_from_probs(probs, vy))
    return aucs


def train_ours_docvec(train, val, seed: int, dv: int = 64) -> list[float]:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ebnerd_tpu.models.config import HParamsNRMSDocVec
    from ebnerd_tpu.models.newsrec import NRMSDocVec
    from ebnerd_tpu.training.trainer import Trainer, TrainerConfig

    his, cand, y = train
    vhis, vcand, vy = val
    hp = HParamsNRMSDocVec(title_size=dv, history_size=H, head_num=HEADS,
                           head_dim=HEAD_DIM, attention_hidden_dim=ATT,
                           newsencoder_units_per_layer=(64, 64))
    model = NRMSDocVec(hp)

    def builder(tables, raw):
        return {"hist_vecs": raw["hist_vecs"], "cand_vecs": raw["cand_vecs"]}

    trainer = Trainer(model, {"docvec": np.zeros((1, dv), np.float32)}, builder,
                      TrainerConfig(learning_rate=LR, seed=seed,
                                    l2_regularization=hp.newsencoder_l2_regularization),
                      log_fn=lambda s: None)
    trainer.init_state({
        "hist_vecs": his[:BATCH], "cand_vecs": cand[:BATCH], "labels": y[:BATCH],
    })

    @jax.jit
    def score(state, vh, vc):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits = model.apply(variables, {"hist_vecs": vh, "cand_vecs": vc},
                             train=False)
        return jax.nn.sigmoid(logits)

    rng = np.random.default_rng(seed)
    key = jax.random.key(seed)
    n_total = his.shape[0]
    aucs = []
    for _ in range(EPOCHS):
        order = rng.permutation(n_total)
        for s in range(0, n_total - BATCH + 1, BATCH):
            idx = order[s:s + BATCH]
            batch = {"hist_vecs": his[idx], "cand_vecs": cand[idx], "labels": y[idx]}
            key, sub = jax.random.split(key)
            trainer.state, _ = trainer._train_step(trainer.state, batch, sub)
        probs = np.concatenate([
            np.asarray(score(trainer.state, jnp.asarray(vhis[s:s + 500]),
                             jnp.asarray(vcand[s:s + 500])))
            for s in range(0, vhis.shape[0], 500)])
        aucs.append(auc_from_probs(probs, vy))
    return aucs


def auc_from_probs(probs: np.ndarray, labels: np.ndarray) -> float:
    from ebnerd_tpu.data.ragged import Ragged
    from ebnerd_tpu.evaluation.ranking import per_impression_auc

    r_scores = Ragged.from_dense(probs.astype(np.float32))
    r_labels = Ragged.from_dense(labels.astype(np.float32))
    return float(np.nanmean(per_impression_auc(r_labels, r_scores)))


def train_reference(train, val, w2v, seed: int) -> list[float]:
    sys.path.insert(0, REFERENCE_SRC)
    from ebrec.models.newsrec import NRMSModel
    from ebrec.models.newsrec.model_config import hparams_nrms

    hp = hparams_nrms()
    hp.title_size, hp.history_size = T, H
    hp.head_num, hp.head_dim, hp.attention_hidden_dim = HEADS, HEAD_DIM, ATT
    hp.learning_rate = LR
    model = NRMSModel(hparams=hp, word2vec_embedding=w2v.copy(), seed=seed)
    his, cand, y = train
    vhis, vcand, vy = val
    aucs = []
    for _ in range(EPOCHS):
        model.model.fit((his, cand), y, batch_size=BATCH, epochs=1, verbose=0)
        probs = model.model.predict([vhis, vcand], verbose=0, batch_size=256)
        aucs.append(auc_from_probs(probs, vy))
    return aucs


def train_ours(train, val, w2v, seed: int) -> list[float]:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ebnerd_tpu.models.config import HParamsNRMS
    from ebnerd_tpu.models.newsrec import NRMS, embedding_initializer
    from ebnerd_tpu.training.trainer import Trainer, TrainerConfig

    his, cand, y = train
    vhis, vcand, vy = val
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=HEADS,
                     head_dim=HEAD_DIM, attention_hidden_dim=ATT)
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=EMB,
                 word_emb_init=embedding_initializer(w2v))
    # identity "table": batches carry token rows directly via an identity
    # gather — the in-graph gather path with tokens as the table rows.
    n_total = his.shape[0]

    def builder(tables, raw):
        return {"hist_tokens": raw["hist_tokens"], "cand_tokens": raw["cand_tokens"]}

    trainer = Trainer(model, {"title": np.zeros((1, T), np.int32)}, builder,
                      TrainerConfig(learning_rate=LR, seed=seed),
                      log_fn=lambda s: None)
    trainer.init_state({
        "hist_tokens": his[:BATCH].astype(np.int32),
        "cand_tokens": cand[:BATCH].astype(np.int32),
        "labels": y[:BATCH],
    })
    import jax.numpy as jnp

    @jax.jit
    def score(state, vh, vc):
        logits = model.apply({"params": state.params},
                             {"hist_tokens": vh, "cand_tokens": vc}, train=False)
        return jax.nn.sigmoid(logits)

    rng = np.random.default_rng(seed)
    key = jax.random.key(seed)
    aucs = []
    for _ in range(EPOCHS):
        order = rng.permutation(n_total)
        for s in range(0, n_total - BATCH + 1, BATCH):
            idx = order[s:s + BATCH]
            batch = {"hist_tokens": his[idx].astype(np.int32),
                     "cand_tokens": cand[idx].astype(np.int32),
                     "labels": y[idx]}
            key, sub = jax.random.split(key)
            trainer.state, _ = trainer._train_step(trainer.state, batch, sub)
        probs = np.concatenate([
            np.asarray(score(trainer.state,
                             jnp.asarray(vhis[s:s + 500].astype(np.int32)),
                             jnp.asarray(vcand[s:s + 500].astype(np.int32))))
            for s in range(0, vhis.shape[0], 500)])
        aucs.append(auc_from_probs(probs, vy))
    return aucs


def train_ours_dedup(train_idx, tokens_table, val, w2v, seed: int) -> list[float]:
    """Ours through the article-index + unique-article-dedup path
    (training/dedup.py): the model encodes each unique article ONCE per
    step, so dropout draws one stochastic encode per unique article
    instead of the reference's independent mask per slot — THE semantic
    deviation this run pins (same data/signal as train_ours)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ebnerd_tpu.models.config import HParamsNRMS
    from ebnerd_tpu.models.inputs import token_batch
    from ebnerd_tpu.models.newsrec import NRMS, embedding_initializer
    from ebnerd_tpu.training.dedup import prep_dedup_batch
    from ebnerd_tpu.training.trainer import Trainer, TrainerConfig

    hidx, cidx, y = train_idx
    vhis, vcand, vy = val
    hp = HParamsNRMS(title_size=T, history_size=H, head_num=HEADS,
                     head_dim=HEAD_DIM, attention_hidden_dim=ATT)
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=EMB,
                 word_emb_init=embedding_initializer(w2v))
    trainer = Trainer(model, {"title": tokens_table.astype(np.int32)},
                      token_batch,
                      TrainerConfig(learning_rate=LR, seed=seed,
                                    dedup_articles=True, dedup_min_bucket=64),
                      log_fn=lambda s: None)
    trainer.init_state({
        "hist_idx": hidx[:BATCH].astype(np.int32),
        "cand_idx": cidx[:BATCH].astype(np.int32),
        "labels": y[:BATCH],
    })

    @jax.jit
    def score(state, vh, vc):
        logits = model.apply({"params": state.params},
                             {"hist_tokens": vh, "cand_tokens": vc}, train=False)
        return jax.nn.sigmoid(logits)

    rng = np.random.default_rng(seed)
    key = jax.random.key(seed)
    n_total = hidx.shape[0]
    aucs = []
    for _ in range(EPOCHS):
        order = rng.permutation(n_total)
        for s in range(0, n_total - BATCH + 1, BATCH):
            idx = order[s:s + BATCH]
            raw = prep_dedup_batch({
                "hist_idx": hidx[idx].astype(np.int32),
                "cand_idx": cidx[idx].astype(np.int32),
                "labels": y[idx]}, min_bucket=64)
            raw.pop("n_uniq")
            key, sub = jax.random.split(key)
            trainer.state, _ = trainer._train_step(trainer.state, raw, sub)
        probs = np.concatenate([
            np.asarray(score(trainer.state,
                             jnp.asarray(vhis[s:s + 500].astype(np.int32)),
                             jnp.asarray(vcand[s:s + 500].astype(np.int32))))
            for s in range(0, vhis.shape[0], 500)])
        aucs.append(auc_from_probs(probs, vy))
    return aucs


def _verdict(ref, ours_a, ours_b):
    spread = abs(ours_a[-1] - ours_b[-1])
    gap = abs(ref[-1] - ours_a[-1])
    tol = max(2 * spread, 0.02)
    return {
        "reference_val_auc": [round(x, 4) for x in ref],
        "ebnerd_tpu_val_auc": [round(x, 4) for x in ours_a],
        "ebnerd_tpu_val_auc_seed7": [round(x, 4) for x in ours_b],
        "final_gap": round(gap, 4),
        "seed_spread": round(spread, 4),
        "tolerance": round(tol, 4),
        "pass": bool(gap <= tol),
    }


def main() -> None:
    only = sys.argv[1] if len(sys.argv) > 1 else "all"
    t0 = time.time()
    result = {
        "hardware": "host CPU (TF has no TPU backend here)",
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    out = REPO / "PARITY_TRAIN.json"
    if out.exists():  # preserve ALL existing entries not rerun this
        try:  # invocation (incl. parity_headline.py's headline_* keys)
            prev = json.loads(out.read_text())
            for k, v in prev.items():
                if k not in ("hardware", "measured_at", "wall_seconds"):
                    result[k] = v
        except Exception:  # noqa: BLE001
            pass

    if only in ("all", "nrms"):
        train, val = make_signal_dataset(seed=0)
        rng = np.random.default_rng(1)
        w2v = (rng.standard_normal((VOCAB, EMB)) * 0.1).astype(np.float32)
        ours_a = train_ours(train, val, w2v, seed=42)
        ours_b = train_ours(train, val, w2v, seed=7)
        ref = train_reference(train, val, w2v, seed=42)
        result["nrms"] = {
            "config": {
                "model": "NRMS", "vocab": VOCAB, "emb": EMB, "history": H,
                "title": T, "npratio": NPRATIO, "heads": f"{HEADS}x{HEAD_DIM}",
                "epochs": EPOCHS, "batch": BATCH, "lr": LR,
                "n_train": N_TRAIN, "n_val": N_VAL,
                "data": "synthetic EB-NeRD with topic-preference click signal",
            },
            **_verdict(ref, ours_a, ours_b),
        }

    if only in ("all", "nrms_dedup"):
        train, val, tokens_table, train_idx = make_signal_dataset(
            seed=0, return_indices=True)
        rng = np.random.default_rng(1)
        w2v = (rng.standard_normal((VOCAB, EMB)) * 0.1).astype(np.float32)
        dd_a = train_ours_dedup(train_idx, tokens_table, val, w2v, seed=42)
        dd_b = train_ours_dedup(train_idx, tokens_table, val, w2v, seed=7)
        # reference curve: reuse the nrms section's if present (identical
        # dataset + w2v by construction), else train it here
        if "nrms" in result:
            ref = [float(x) for x in result["nrms"]["reference_val_auc"]]
        else:
            ref = train_reference(train, val, w2v, seed=42)
        result["nrms_dedup"] = {
            "config": {
                "model": "NRMS via article-index + unique-article dedup "
                         "(training/dedup.py; one stochastic encode per "
                         "unique article per step vs the reference's "
                         "independent dropout mask per slot)",
                "vocab": VOCAB, "emb": EMB, "history": H, "title": T,
                "npratio": NPRATIO, "heads": f"{HEADS}x{HEAD_DIM}",
                "epochs": EPOCHS, "batch": BATCH, "lr": LR,
                "dropout": 0.2,
                "n_train": N_TRAIN, "n_val": N_VAL,
                "data": "same topic-signal synthetic split as 'nrms'",
            },
            **_verdict(ref, dd_a, dd_b),
        }

    if only in ("all", "nrms_docvec"):
        dtrain, dval = make_docvec_dataset(seed=0)
        d_a = train_ours_docvec(dtrain, dval, seed=42)
        d_b = train_ours_docvec(dtrain, dval, seed=7)
        d_ref = train_reference_docvec(dtrain, dval, seed=42)
        result["nrms_docvec"] = {
            "config": {
                "model": "NRMSDocVec (reference run via Keras-3 input shim)",
                "docvec_dim": 64, "dense": [64, 64], "history": H,
                "npratio": NPRATIO, "heads": f"{HEADS}x{HEAD_DIM}",
                "epochs": EPOCHS, "batch": BATCH, "lr": LR,
                "n_train": N_TRAIN, "n_val": N_VAL,
                "data": "synthetic docvecs (topic centroid + noise) with "
                        "topic-preference click signal",
            },
            **_verdict(d_ref, d_a, d_b),
        }

    result["wall_seconds"] = round(time.time() - t0, 1)
    all_pass = all(result[k]["pass"]
                   for k in ("nrms", "nrms_docvec", "nrms_dedup")
                   if k in result)
    out.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result, indent=2))
    if not all_pass:
        raise SystemExit("parity FAILED")


if __name__ == "__main__":
    main()

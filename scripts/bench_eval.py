#!/usr/bin/env python
"""Serving-side benchmark: two-tower eval scoring throughput on the
attached device (impressions/sec), plus the one-time corpus-encode cost.

The reference scores eval impressions by exploding to one scorer call
per candidate (reference: newsrec/dataloader.py:94-107). Here the corpus
is encoded ONCE through the article tower (cached per parameter state)
and each impression costs a vector gather + the user tower
(serving.py / Trainer._score_two_tower).

Run: python scripts/bench_eval.py [n_impressions]
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ebnerd_tpu.utils import compile_cache  # noqa: E402  (persistent XLA cache)

import jax

from ebnerd_tpu import constants as c
from ebnerd_tpu.data.dataloader import EvalFeed
from ebnerd_tpu.data.lookup import Lookup
from ebnerd_tpu.data.ragged import Ragged
from ebnerd_tpu.data.table import Table
from ebnerd_tpu.models.config import HParamsNRMS
from ebnerd_tpu.models.inputs import token_batch
from ebnerd_tpu.models.newsrec import NRMS
from ebnerd_tpu.training.trainer import Trainer, TrainerConfig

VOCAB, EMB, N_ART, T, H = 250_002, 1_024, 25_000, 30, 20
N_IMP = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
BS = int(os.environ.get("BE_BS", "1024"))


def main():
    rng = np.random.default_rng(0)
    model = NRMS(HParamsNRMS(dropout=0.2), vocab_size=VOCAB, word_emb_dim=EMB,
                 dtype="bfloat16", use_fused_encoder=True)
    tokens = rng.integers(0, VOCAB, (N_ART, T)).astype(np.int32)
    ids = np.arange(1, N_ART + 1, dtype=np.int64)
    lookup = Lookup.from_values(ids, tokens)
    trainer = Trainer(model, {"title": lookup.matrix}, token_batch,
                      TrainerConfig(learning_rate=1e-4, seed=0),
                      log_fn=lambda s: None)
    k = 5
    labels = np.zeros((8, k), np.float32)
    labels[:, 0] = 1.0
    trainer.init_state({
        "hist_idx": rng.integers(0, N_ART + 1, (8, H)).astype(np.int32),
        "cand_idx": rng.integers(0, N_ART + 1, (8, k)).astype(np.int32),
        "labels": labels,
    })

    # ragged eval impressions: 5-15 candidates, 1-20 history articles
    inview = Ragged.from_lists(
        [rng.choice(ids, rng.integers(5, 16), replace=False)
         for _ in range(N_IMP)])
    hist = Ragged.from_lists(
        [rng.choice(ids, rng.integers(1, H + 1), replace=False)
         for _ in range(N_IMP)])
    df = Table({
        c.DEFAULT_IMPRESSION_ID_COL: np.arange(N_IMP, dtype=np.uint32),
        c.DEFAULT_INVIEW_ARTICLES_COL: inview,
        c.DEFAULT_LABELS_COL: Ragged(np.zeros(inview.total, np.int8),
                                     inview.offsets.copy()),
        c.DEFAULT_HISTORY_ARTICLE_ID_COL: hist,
    })
    feed = EvalFeed(df, lookup, history_size=H, batch_size=BS)

    t0 = time.perf_counter()
    art = trainer._article_index()
    jax.block_until_ready(art)
    t_corpus = time.perf_counter() - t0

    scores = trainer.score(feed)  # warm (compiles the bucket programs)
    assert np.isfinite(scores.values).all()
    t0 = time.perf_counter()
    scores = trainer.score(feed)
    dt = time.perf_counter() - t0
    print(f"corpus encode ({N_ART} articles, one-time/param-state): "
          f"{t_corpus * 1000:.1f} ms ({N_ART / t_corpus:,.0f} articles/s)")
    print(f"two-tower eval: {N_IMP / dt:,.0f} impressions/s "
          f"({scores.total / dt:,.0f} candidate scores/s; "
          f"{N_IMP} impressions in {dt * 1000:.1f} ms, bs {BS})")


if __name__ == "__main__":
    main()

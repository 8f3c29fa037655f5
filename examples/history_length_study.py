#!/usr/bin/env python
"""History-length sensitivity study: train once, evaluate AUC at many
history truncation lengths.

Reference: examples/reproducibility_scripts/ebnerd_nrms_doc_hist.py
(trains NRMSDocVec at history 20, sweeps eval history 1..N, dumps
auc_history_length.json).

  python examples/history_length_study.py --synthetic --epochs 1 \
      --sweep 1 2 4 8 16
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ebnerd_tpu import constants as c
from ebnerd_tpu.data.behaviors import (
    create_binary_labels_column,
    ebnerd_from_path,
    sampling_strategy_wu2019,
)
from ebnerd_tpu.data.dataloader import EvalFeed, NewsrecFeed
from ebnerd_tpu.data.lookup import Lookup
from ebnerd_tpu.data.table import read_parquet
from ebnerd_tpu.evaluation.ranking import per_impression_auc
from ebnerd_tpu.models.config import HParamsNRMSDocVec
from ebnerd_tpu.models.inputs import docvec_batch
from ebnerd_tpu.models.newsrec import NRMSDocVec
from ebnerd_tpu.training.trainer import Trainer, TrainerConfig


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", type=str, default=None)
    p.add_argument("--datasplit", type=str, default="ebnerd_small")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--document_embeddings", type=str, default=None)
    p.add_argument("--history_size", type=int, default=20)
    p.add_argument("--sweep", type=int, nargs="+",
                   default=[1, 2, 3, 5, 10, 15, 20, 30, 40, 50])
    p.add_argument("--npratio", type=int, default=4)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--bs", type=int, default=64)
    p.add_argument("--docvec_dim", type=int, default=128)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out_dir", type=str, default="ebnerd_predictions/hist_study")
    args = p.parse_args(argv)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    if args.synthetic:
        from ebnerd_tpu.data.synthetic import make_synthetic_ebnerd

        train_path = make_synthetic_ebnerd(out / "syn/train", n_users=150,
                                           n_articles=400, n_impressions=2000,
                                           seed=args.seed)
        val_path = make_synthetic_ebnerd(out / "syn/validation", n_users=150,
                                         n_articles=400, n_impressions=600,
                                         seed=args.seed + 1)
        articles = read_parquet(train_path / "articles.parquet")
    else:
        split = Path(args.data_path).expanduser() / args.datasplit
        train_path, val_path = split / "train", split / "validation"
        articles = read_parquet(split / "articles.parquet")

    ids = np.asarray(articles[c.DEFAULT_ARTICLE_ID_COL])
    if args.document_embeddings:
        from ebnerd_tpu.data.articles import build_value_lookup, load_article_id_embeddings

        articles = load_article_id_embeddings(articles, args.document_embeddings)
        lookup = build_value_lookup(articles, "document_vector", dtype=np.float32)
        dv_dim = lookup.matrix.shape[1]
    else:
        dv_dim = args.docvec_dim
        lookup = Lookup.from_values(
            ids, rng.standard_normal((len(ids), dv_dim)).astype(np.float32)
        )

    # train at the max sweep length (reference trains at history_size then
    # evaluates each truncation)
    max_hist = max(max(args.sweep), args.history_size)
    df_train = create_binary_labels_column(
        sampling_strategy_wu2019(
            ebnerd_from_path(train_path, history_size=args.history_size),
            npratio=args.npratio, shuffle=True, seed=args.seed),
        shuffle=True, seed=args.seed)
    hp = HParamsNRMSDocVec(title_size=dv_dim, history_size=args.history_size,
                           head_num=8, head_dim=16,
                           newsencoder_units_per_layer=(128, 128))
    model = NRMSDocVec(hp)
    trainer = Trainer(model, {"docvec": lookup.matrix}, docvec_batch,
                      TrainerConfig(learning_rate=1e-4, seed=args.seed))
    trainer.fit(
        NewsrecFeed(df_train, lookup, history_size=args.history_size,
                    batch_size=args.bs, seed=args.seed),
        epochs=args.epochs,
    )

    aucs = {}
    for h in args.sweep:
        df_val = create_binary_labels_column(
            ebnerd_from_path(val_path, history_size=h))
        feed = EvalFeed(df_val, lookup, history_size=h, batch_size=args.bs)
        scores = trainer.score(feed)
        auc = float(np.nanmean(per_impression_auc(df_val[c.DEFAULT_LABELS_COL], scores)))
        aucs[h] = auc
        print(f"history {h:>3}: AUC {auc:.4f}")
    (out / "auc_history_length.json").write_text(json.dumps(aucs, indent=2))
    return aucs


if __name__ == "__main__":
    main()

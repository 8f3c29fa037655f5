#!/usr/bin/env python
"""Generate the document-embedding parquet artifact for NRMSDocVec.

Reference: examples/quick_start/make_embedding_artifacts.ipynb — concat
title+subtitle+body, batch-encode with an HF transformer's CLS vectors,
write ``{article_id, document_vector}`` parquet.

  python examples/make_embedding_artifacts.py --data_path ~/ebnerd_data \
      --transformer_model_name FacebookAI/xlm-roberta-large
  python examples/make_embedding_artifacts.py --synthetic   # random vecs
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ebnerd_tpu import constants as c
from ebnerd_tpu.data.articles import concat_str_columns
from ebnerd_tpu.data.ragged import Ragged
from ebnerd_tpu.data.table import Table, read_parquet, write_parquet


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--transformer_model_name", type=str,
                   default="FacebookAI/xlm-roberta-large")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--dim", type=int, default=768, help="synthetic vector dim")
    p.add_argument("--out", type=str, default="document_vector.parquet")
    args = p.parse_args(argv)

    if args.synthetic:
        from ebnerd_tpu.data.synthetic import make_synthetic_articles

        rng = np.random.default_rng(0)
        articles = make_synthetic_articles(rng, 200)
        vecs = rng.standard_normal((len(articles), args.dim)).astype(np.float32)
    else:
        from transformers import AutoModel, AutoTokenizer

        from ebnerd_tpu.data.nlp import generate_embeddings_with_transformers

        articles = read_parquet(Path(args.data_path).expanduser() / "articles.parquet")
        articles, cat_col = concat_str_columns(
            articles, [c.DEFAULT_TITLE_COL, c.DEFAULT_SUBTITLE_COL, c.DEFAULT_BODY_COL]
        )
        tok = AutoTokenizer.from_pretrained(args.transformer_model_name)
        model = AutoModel.from_pretrained(args.transformer_model_name)
        vecs = generate_embeddings_with_transformers(
            model, tok, [str(t) for t in np.asarray(articles[cat_col])],
            batch_size=args.batch_size,
        )

    out = Table({
        c.DEFAULT_ARTICLE_ID_COL: np.asarray(articles[c.DEFAULT_ARTICLE_ID_COL]),
        "document_vector": Ragged.from_dense(vecs),
    })
    write_parquet(out, args.out)
    print(f"wrote {args.out}: {len(out)} articles x {vecs.shape[1]}-d vectors")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Build the beyond-accuracy evaluation artifacts and score baseline
recommenders on them.

Reference: examples/beyond_accuracy/make_beyond_accuracy.ipynb — from the
test split's ``is_beyond_accuracy`` impressions it derives the fixed
candidate list, an article attribute lookup (min-max normalized pageview
popularity, sentiment, category, topics), truncated user histories, and
then evaluates editorial (top-inviews), popularity (top-pageviews), and
random rankings with the full BA suite
(diversity/sentiment/novelty/serendipity/coverage/distribution).

  python examples/make_beyond_accuracy.py --synthetic --out_dir /tmp/ba
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ebnerd_tpu import constants as c
from ebnerd_tpu.data.behaviors import ebnerd_from_path
from ebnerd_tpu.data.table import read_parquet
from ebnerd_tpu.evaluation.beyond_accuracy import (
    Coverage,
    Distribution,
    IntralistDiversity,
    Novelty,
    Sentiment,
    Serendipity,
)
from ebnerd_tpu.evaluation.utils import scale_range

N_RECOMMENDATIONS = 5
HISTORY_TRUNC = 20


def build_lookup(articles, docvecs: np.ndarray) -> dict:
    """{article_id: {attributes...}} — the BA lookup dict (notebook cells
    31-33: min-max normalized pageviews + doc embeddings)."""
    ids = np.asarray(articles[c.DEFAULT_ARTICLE_ID_COL])
    pv = np.asarray(articles[c.DEFAULT_TOTAL_PAGEVIEWS_COL], dtype=np.float64)
    pop = scale_range(pv, t_min=1e-6, t_max=1.0)  # avoid -log2(0)
    sent = np.asarray(articles[c.DEFAULT_SENTIMENT_SCORE_COL], dtype=np.float64)
    cat = np.asarray(articles[c.DEFAULT_CATEGORY_COL])
    out = {}
    for i, aid in enumerate(ids):
        out[int(aid)] = {
            "popularity": float(pop[i]),
            "sentiment_score": float(sent[i]),
            "category": int(cat[i]),
            "vector": docvecs[i].tolist(),
        }
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", type=str, default=None)
    p.add_argument("--testsplit", type=str, default="ebnerd_testset/test")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--out_dir", type=str, default="ebnerd_predictions/beyond_accuracy")
    p.add_argument("--n_recommendations", type=int, default=N_RECOMMENDATIONS)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    if args.synthetic:
        from ebnerd_tpu.data.synthetic import make_synthetic_ebnerd

        split = make_synthetic_ebnerd(out / "synthetic", n_users=120,
                                      n_articles=260, n_impressions=800,
                                      seed=args.seed, test_set=True)
        articles = read_parquet(split / "articles.parquet")
    else:
        root = Path(args.data_path).expanduser()
        split = root / args.testsplit
        articles = read_parquet(root / "articles.parquet")

    df = ebnerd_from_path(split, history_size=HISTORY_TRUNC)
    if c.DEFAULT_IS_BEYOND_ACCURACY_COL in df:
        ba_rows = df.filter(np.asarray(df[c.DEFAULT_IS_BEYOND_ACCURACY_COL]))
    else:
        ba_rows = df
    if len(ba_rows) == 0:
        raise SystemExit("no beyond-accuracy rows in the split")

    # the fixed candidate list: the BA impressions share one inview set
    # (notebook cell 13 takes the first row's list)
    inview = ba_rows[c.DEFAULT_INVIEW_ARTICLES_COL]
    candidates = np.unique(inview.values)
    histories = ba_rows[c.DEFAULT_HISTORY_ARTICLE_ID_COL]

    ids = np.asarray(articles[c.DEFAULT_ARTICLE_ID_COL])
    docvecs = rng.standard_normal((len(ids), 32))  # placeholder w/o real embeddings
    lookup = build_lookup(articles, docvecs)
    known = [a for a in candidates if int(a) in lookup]

    pv = {int(a): lookup[int(a)]["popularity"] for a in known}
    top_by = lambda key: np.asarray(
        sorted(known, key=lambda a: -lookup[int(a)][key])[: args.n_recommendations]
    )
    k = args.n_recommendations
    recs = {
        "editorial_topinview": top_by("popularity"),  # proxy: inviews ~ pageviews
        "popular_toppageviews": top_by("popularity"),
        "random": rng.choice(known, size=k, replace=False),
    }

    div, sen, nov, ser, cov, dist = (IntralistDiversity(), Sentiment(),
                                     Novelty(), Serendipity(), Coverage(),
                                     Distribution())
    n_users = len(ba_rows)
    results = {}
    for name, rec in recs.items():
        R = np.tile(rec, (n_users, 1))
        H = [histories.row(i) for i in range(n_users)]
        cov_c, cov_f = cov(R, candidates)
        results[name] = {
            "intralist_diversity": float(np.nanmean(div(R, lookup, "vector"))),
            "sentiment": float(np.nanmean(sen(R, lookup, "sentiment_score"))),
            "novelty": float(np.nanmean(nov(R, lookup, "popularity"))),
            "serendipity": float(np.nanmean(ser(R, H, lookup, "vector"))),
            "coverage_count": cov_c,
            "coverage_fraction": float(cov_f),
            "category_distribution": dist(R, lookup, "category"),
        }
    # attainable bounds on the candidate list (notebook cells 42-72)
    lo_d, hi_d = div._candidate_diversity(known, k, lookup, "vector",
                                          max_number_combinations=2000,
                                          seed=args.seed)
    results["_bounds"] = {
        "diversity": [lo_d, hi_d],
        "sentiment": list(sen._candidate_sentiment(known, k, lookup,
                                                   "sentiment_score")),
        "novelty": list(nov._candidate_novelty(known, k, lookup, "popularity")),
    }
    (out / "beyond_accuracy_baselines.json").write_text(
        json.dumps(results, indent=2, default=str)
    )
    np.save(out / "candidate_list.npy", candidates)
    print(json.dumps({k2: {m: v for m, v in r.items()
                           if not isinstance(v, dict)}
                      for k2, r in results.items()}, indent=2, default=str))
    return results


if __name__ == "__main__":
    main()

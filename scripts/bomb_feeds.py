#!/usr/bin/env python
"""Input-pipeline stress test: iterate the feeds repeatedly and measure
host-side batch throughput (the counterpart of the reference's bombing
script, reference: test/bombing/bomb_dataloader.py — 300 iterations per
loader under time_it).

  python scripts/bomb_feeds.py --iterations 300
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ebnerd_tpu.utils import compile_cache  # noqa: E402  (persistent XLA cache)

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
from ebnerd_tpu.utils.misc import time_it


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iterations", type=int, default=300)
    p.add_argument("--n_impressions", type=int, default=2000)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--history_size", type=int, default=20)
    args = p.parse_args(argv)

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        path = make_synthetic_ebnerd(Path(tmp) / "train", n_users=300,
                                     n_articles=1000,
                                     n_impressions=args.n_impressions, seed=0)
        df = ebnerd_from_path(path, history_size=args.history_size)
        train_df = create_binary_labels_column(
            sampling_strategy_wu2019(df, npratio=4, seed=0))
        val_df = create_binary_labels_column(df)
        articles = read_parquet(path / "articles.parquet")
        ids = np.asarray(articles[c.DEFAULT_ARTICLE_ID_COL])
        lookup = Lookup.from_values(
            ids, np.random.default_rng(0).integers(1, 1000, (len(ids), 30)).astype(np.int32))

        t0 = time.perf_counter()
        feed = NewsrecFeed(train_df, lookup, history_size=args.history_size,
                           batch_size=args.batch_size)
        print(f"NewsrecFeed pretransform: {time.perf_counter() - t0:.3f}s "
              f"({len(train_df)} rows)")

        n_batches = 0
        with time_it(f"NewsrecFeed x{args.iterations} epochs"):
            for _ in range(args.iterations):
                for batch in feed.epoch():
                    n_batches += 1
        rows = n_batches * args.batch_size
        print(f"  {n_batches} batches, {rows} impressions")

        efeed = EvalFeed(val_df, lookup, history_size=args.history_size,
                         batch_size=args.batch_size)
        n_batches = 0
        with time_it(f"EvalFeed x{args.iterations} passes"):
            for _ in range(args.iterations):
                for batch in efeed.batches():
                    n_batches += 1
        print(f"  {n_batches} batches")


if __name__ == "__main__":
    main()

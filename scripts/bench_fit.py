#!/usr/bin/env python
"""End-to-end Trainer.fit() throughput at the bench config (VERDICT r3
item 4: the flagship number must survive the real host feed).

Drives the REAL pipeline — NewsrecFeed epoch batching, prefetch thread,
per-batch host article-dedup prep, host->device transfer, jitted fused
train step — over a synthetic behaviors table with bench.py's exact
shapes and Zipf article popularity, and reports impressions/s measured
around fit() wall-clock, to be compared against bench.py's device-only
number (within ~5% = the host feed is effectively free).

Run ON the chip:  python scripts/bench_fit.py
Env: FIT_BS (1024), FIT_STEPS (100 measured), FIT_WARM_EPOCHS (2).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import numpy as np

VOCAB, EMB, N_ART, T, H, NPRATIO = 250_002, 1_024, 25_000, 30, 20, 4


def _zipf(rng, n_rows, shape, a=1.07):
    m = int(np.prod(shape))
    ranks = rng.zipf(a, size=3 * m)
    ranks = ranks[ranks <= n_rows][:m] - 1
    perm = rng.permutation(n_rows).astype(np.int64)
    return perm[ranks].reshape(shape)


def main() -> None:
    import jax
    import jax.numpy as jnp

    import bench
    from ebnerd_tpu import constants as c
    from ebnerd_tpu.data.dataloader import NewsrecFeed
    from ebnerd_tpu.data.lookup import Lookup
    from ebnerd_tpu.data.ragged import Ragged
    from ebnerd_tpu.data.table import Table
    from ebnerd_tpu.models.config import HParamsNRMS
    from ebnerd_tpu.models.inputs import token_batch
    from ebnerd_tpu.models.newsrec import NRMS
    from ebnerd_tpu.training.trainer import Trainer, TrainerConfig

    bs = int(os.environ.get("FIT_BS", "1024"))
    steps = int(os.environ.get("FIT_STEPS", "100"))
    warm_epochs = int(os.environ.get("FIT_WARM_EPOCHS", "2"))
    warm_steps = int(os.environ.get("FIT_WARM_STEPS", "15"))
    k = NPRATIO + 1

    rng = np.random.default_rng(0)
    ids = np.arange(1, N_ART + 1, dtype=np.int64) * 3 + 11  # non-trivial id space
    tokens = bench._token_table(rng, "zipf")[1:]             # [N_ART, T]
    lookup = Lookup.from_values(ids, tokens)

    n_imp = (warm_steps * warm_epochs + steps + 2) * bs
    hist = ids[_zipf(rng, N_ART, (n_imp, H))]
    cand = ids[_zipf(rng, N_ART, (n_imp, k))]
    labels = np.zeros((n_imp, k), np.float32)
    pos = rng.integers(0, k, n_imp)
    labels[np.arange(n_imp), pos] = 1.0
    df = Table({
        c.DEFAULT_HISTORY_ARTICLE_ID_COL: Ragged.from_dense(hist),
        c.DEFAULT_INVIEW_ARTICLES_COL: Ragged.from_dense(cand),
        c.DEFAULT_LABELS_COL: Ragged.from_dense(labels),
        c.DEFAULT_USER_COL: np.arange(n_imp, dtype=np.int64),
    })

    fused = os.environ.get("FIT_FUSED", "1") != "0"  # =0 for CPU sanity runs
    hp = HParamsNRMS(dropout=0.2)
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=EMB, dtype=jnp.bfloat16,
                 use_fused_encoder=fused, fused_block_n=8)
    trainer = Trainer(
        model, {"title": lookup.matrix}, token_batch,
        TrainerConfig(learning_rate=1e-4, seed=0,
                      early_stopping_patience=None, lr_patience=None),
        log_fn=lambda s: None,
    )
    feed = NewsrecFeed(df, lookup, history_size=H, batch_size=bs, seed=0)

    # warm the compile cache across the dedup bucket ladder (buckets vary
    # batch-to-batch; a mid-measurement remote compile would wreck the
    # number and measure nothing real)
    for _ in range(warm_epochs):
        trainer.fit(feed, epochs=1, steps_per_epoch=warm_steps)

    t0 = time.perf_counter()
    trainer.fit(feed, epochs=1, steps_per_epoch=steps)
    dt = time.perf_counter() - t0
    ips = bs * steps / dt

    print(json.dumps({
        "metric": "nrms_fit_impressions_per_sec",
        "value": round(ips, 1),
        "unit": "impressions/s",
        "step_ms": round(dt / steps * 1000, 2),
        "config": (f"bs{bs} steps{steps} fused={int(fused)} bf16 dedup "
                   f"zipf prefetch2"),
    }))


if __name__ == "__main__":
    main()

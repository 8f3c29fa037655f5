#!/usr/bin/env python
"""TPU smoke gate: compile + run the EXACT bench-default train step.

Round 2 shipped a default path (in-kernel PRNG dropout) that had never
executed on the deployed toolchain — CPU tests cannot catch this because
interpret mode falls back to the mask path. This gate runs bench.py's
default configuration (fused kernel + rng dropout + bf16) for a couple of
steps and exits non-zero on any compile/run failure. Run it after ANY
kernel/model/trainer change and before round end:

  python scripts/smoke_tpu.py

Runtime: one compile (may take minutes cold over the remote tunnel;
seconds warm) + 2 steps. The JSON line it prints is NOT a benchmark
number (too few steps) — it only proves the default path executes.
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ebnerd_tpu.utils import compile_cache  # noqa: E402  (persistent XLA cache)

os.environ.setdefault("BENCH_STEPS", "2")
os.environ.setdefault("BENCH_WARMUP", "1")

import bench  # noqa: E402


def mesh_fused_train_eval() -> None:
    """The fused kernel under a jax.sharding.Mesh on the real chip: one
    train step + one two-tower eval scoring pass on a 1-device ('data',)
    mesh — the only automated artifact that executes the flagship kernel
    end-to-end under the production sharding machinery (the CPU
    dryrun_multichip necessarily uses the unfused path)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from ebnerd_tpu.data.dataloader import EvalFeed
    from ebnerd_tpu.models.config import HParamsNRMS
    from ebnerd_tpu.models.inputs import token_batch
    from ebnerd_tpu.models.newsrec import NRMS
    from ebnerd_tpu.training.trainer import Trainer, TrainerConfig

    n_articles, bs = 2048, 64
    hp = HParamsNRMS(dropout=0.2)
    model = NRMS(hp, vocab_size=bench.VOCAB, word_emb_dim=bench.EMB,
                 dtype="bfloat16", use_fused_encoder=True)
    rng = np.random.default_rng(0)
    table = rng.integers(0, bench.VOCAB,
                         size=(n_articles + 1, bench.TITLE)).astype(np.int32)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    trainer = Trainer(model, {"title": table}, token_batch,
                      TrainerConfig(learning_rate=1e-4, seed=0), mesh=mesh,
                      log_fn=lambda s: None)
    k = bench.NPRATIO + 1
    labels = np.zeros((bs, k), np.float32)
    labels[:, 0] = 1.0
    batch = {
        "hist_idx": rng.integers(0, n_articles + 1, (bs, bench.HISTORY)).astype(np.int32),
        "cand_idx": rng.integers(0, n_articles + 1, (bs, k)).astype(np.int32),
        "labels": labels,
    }
    trainer.init_state(batch)

    from ebnerd_tpu.training.dedup import prep_dedup_batch

    key = jax.random.key(0, impl=trainer.config.rng_impl)
    # production default: dedup prep + fused kernel + mesh, on the chip
    ded = prep_dedup_batch(batch, trainer.config.dedup_min_bucket)
    trainer.state, loss = trainer._train_step(trainer.state, trainer._put(ded), key)
    loss = float(loss)
    assert np.isfinite(loss), f"non-finite loss {loss}"

    # two-tower eval: encodes the corpus through the fused kernel
    from ebnerd_tpu.data.ragged import Ragged
    from ebnerd_tpu.data.table import Table
    from ebnerd_tpu import constants as c
    from ebnerd_tpu.data.lookup import Lookup

    ids = np.arange(1, n_articles + 1, dtype=np.int64)
    lookup = Lookup.from_values(ids, table[1:])
    inview = Ragged.from_lists(
        [rng.choice(ids, rng.integers(3, 9), replace=False) for _ in range(32)])
    labels_r = Ragged(np.zeros(inview.total, np.int8), inview.offsets.copy())
    hist = Ragged.from_lists(
        [rng.choice(ids, rng.integers(1, bench.HISTORY + 1), replace=False)
         for _ in range(32)])
    df = Table({
        c.DEFAULT_IMPRESSION_ID_COL: np.arange(32, dtype=np.uint32),
        c.DEFAULT_INVIEW_ARTICLES_COL: inview,
        c.DEFAULT_LABELS_COL: labels_r,
        c.DEFAULT_HISTORY_ARTICLE_ID_COL: hist,
    })
    feed = EvalFeed(df, lookup, history_size=bench.HISTORY, batch_size=16)
    scores = trainer.score(feed)
    assert scores.total == inview.total
    assert np.isfinite(scores.values).all()
    print(f"[smoke_tpu] fused+dedup mesh train (loss {loss:.4f}) + two-tower "
          f"eval ({scores.total} scores): OK")


def main() -> None:
    bench.main()
    print("[smoke_tpu] bench-default train step compiled and ran: OK")
    mesh_fused_train_eval()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: NRMS training throughput (impressions/sec/chip).

Measures the jitted train step of the flagship NRMS reproduction config
(ebnerd_small: history 20, title 30, npratio 4, 20 heads x 20 dim,
xlm-roberta-large-sized vocab/embedding) on the default JAX device, with
the article token table resident on device and the in-graph gather path —
i.e. the real training hot loop, fed synthetic index batches.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

``vs_baseline`` compares against the locally measured reference
(ebanalyse/ebnerd-benchmark TF/Keras NRMS run via
scripts/measure_reference_baseline.py; recorded in BASELINE_LOCAL.json —
the repo publishes no numbers of its own, see BASELINE.md).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

# Reference reproduction config (reference: README.md:118-133, args_nrms.py)
VOCAB = 250_002      # xlm-roberta-large vocab
EMB = 1_024          # xlm-roberta-large word-embedding dim
N_ARTICLES = 25_000  # ebnerd_small-scale article table
TITLE = 30
HISTORY = 20
NPRATIO = 4


def _batch(seed: int, bs: int, n_rows: int) -> dict[str, np.ndarray]:
    r = np.random.default_rng(seed)
    k = NPRATIO + 1
    labels = np.zeros((bs, k), np.float32)
    labels[np.arange(bs), r.integers(0, k, bs)] = 1.0
    return {
        "hist_idx": r.integers(0, n_rows, (bs, HISTORY)).astype(np.int32),
        "cand_idx": r.integers(0, n_rows, (bs, k)).astype(np.int32),
        "labels": labels,
    }


def main() -> None:
    import jax

    from ebnerd_tpu.models.config import HParamsNRMS
    from ebnerd_tpu.models.inputs import token_batch
    from ebnerd_tpu.models.newsrec import NRMS
    from ebnerd_tpu.training.trainer import Trainer, TrainerConfig

    import jax.numpy as jnp

    bs = int(os.environ.get("BENCH_BS", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "30"))
    warmup = int(os.environ.get("BENCH_WARMUP", "5"))
    # bf16 compute (fp32 params) is the TPU-native default; measured AUC
    # parity with fp32 at convergence on synthetic EB-NeRD (see git log).
    dtype = jnp.float32 if os.environ.get("BENCH_DTYPE") == "float32" else jnp.bfloat16

    fused = os.environ.get("BENCH_FUSED") == "1"
    fused_block = int(os.environ.get("BENCH_FUSED_BLOCK", "8"))

    hp = HParamsNRMS()  # title 30, hist 20, 20x20 heads, attn 200
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=EMB, dtype=dtype,
                 use_fused_encoder=fused, fused_block_n=fused_block)
    rng = np.random.default_rng(0)
    table = rng.integers(0, VOCAB, size=(N_ARTICLES + 1, TITLE)).astype(np.int32)
    trainer = Trainer(
        model, {"title": table}, token_batch,
        TrainerConfig(learning_rate=1e-4, seed=0), log_fn=lambda s: None,
    )
    trainer.init_state(_batch(0, bs, N_ARTICLES + 1))

    key = jax.random.key(0)
    loss = None
    for i in range(warmup):
        key, sub = jax.random.split(key)
        trainer.state, loss = trainer._train_step(
            trainer.state, _batch(i, bs, N_ARTICLES + 1), sub
        )
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        trainer.state, loss = trainer._train_step(
            trainer.state, _batch(1000 + i, bs, N_ARTICLES + 1), sub
        )
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    ips = bs * steps / dt

    baseline_path = Path(__file__).parent / "BASELINE_LOCAL.json"
    vs = 0.0
    if baseline_path.exists():
        ref = json.loads(baseline_path.read_text()).get("reference_impressions_per_sec")
        if ref:
            vs = ips / float(ref)
    print(json.dumps({
        "metric": "nrms_train_impressions_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "impressions/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""ebnerd_large-scale proof: NAML multi-view training at a >=125k-article
catalogue on one chip (VERDICT r4 missing item 3 / next-round item 4).

The north-star NAML config is ebnerd_large + multi-host
(BASELINE.json configs[4]); EB-NeRD large has a ~125k-article catalogue
and the NAML reproduction consumes title 30 + body 40 + category +
subcategory views (reference model_config.py:23-42). Unproven at r4:
dedup ladder behavior at ~40k+ unique buckets, HBM fit with the extra
body/cat tables, and throughput at that scale. This measures them the
bench.py way: Trainer._train_step per pre-staged batch, per-batch ladder
buckets, two timed passes printed as one JSON line.

Run on the chip: python scripts/bench_large.py
Env: BL_BS (4096), BL_NART (125000), BL_STEPS (20), BL_MODEL (naml).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ebnerd_tpu.utils import compile_cache  # noqa: E402  (persistent XLA cache)

import jax
import jax.numpy as jnp

from ebnerd_tpu.models import config as mcfg
from ebnerd_tpu.models.inputs import builder_for
from ebnerd_tpu.models.newsrec import NAML, NRMS
from ebnerd_tpu.training.dedup import prep_dedup_batch
from ebnerd_tpu.training.trainer import Trainer, TrainerConfig

BS = int(os.environ.get("BL_BS", "4096"))
N_ART = int(os.environ.get("BL_NART", "125000"))
STEPS = int(os.environ.get("BL_STEPS", "20"))
WARMUP = 3
MODEL = os.environ.get("BL_MODEL", "naml")
H, T, TB, K = 20, 30, 40, 5
VOCAB, EMB = 250_002, 1_024


def _zipf(r, shape):
    m = int(np.prod(shape))
    ranks = r.zipf(1.07, size=3 * m)
    ranks = ranks[ranks <= N_ART][:m] - 1
    perm = r.permutation(N_ART).astype(np.int32)
    return perm[ranks].reshape(shape).astype(np.int32)


def main() -> None:
    r = np.random.default_rng(0)
    tables = {"title": r.integers(0, VOCAB, (N_ART + 1, T)).astype(np.int32)}
    if MODEL == "naml":
        tables.update(
            body=r.integers(0, VOCAB, (N_ART + 1, TB)).astype(np.int32),
            cat=r.integers(0, 30, N_ART + 1).astype(np.int32),
            subcat=r.integers(0, 200, N_ART + 1).astype(np.int32),
        )
        # remat + chunked encode: without them the title+body per-token
        # intermediates exceed the v5e's 16 GB at bs4096 x 125k articles
        # (measured 15.90G plain and 15.92G with remat alone — one
        # rematted block still materializes everything during the
        # backward recompute; chunking the unique-article axis bounds
        # the peak to ~1/N of it, models/newsrec.py NAML.encode_chunks)
        model = NAML(mcfg.HParamsNAML(), vocab_size=VOCAB, word_emb_dim=EMB,
                     dtype=jnp.bfloat16,
                     remat_encoder=os.environ.get("BL_REMAT", "1") != "0",
                     encode_chunks=int(os.environ.get("BL_CHUNKS", "8")))
    else:
        model = NRMS(mcfg.HParamsNRMS(), vocab_size=VOCAB, word_emb_dim=EMB,
                     dtype=jnp.bfloat16, use_fused_encoder=True)
    builder = builder_for(MODEL)
    trainer = Trainer(model, tables, builder,
                      TrainerConfig(learning_rate=1e-4, seed=0,
                                    dedup_articles=True),
                      log_fn=lambda s: None)

    n = WARMUP + STEPS
    raws = []
    for i in range(n):
        raw = {"hist_idx": _zipf(r, (BS, H)), "cand_idx": _zipf(r, (BS, K)),
               "labels": np.zeros((BS, K), np.float32)}
        raw["labels"][:, 0] = 1.0
        raws.append(raw)
    trainer.init_state(dict(raws[0]))

    t_prep = time.perf_counter()
    preps = [prep_dedup_batch(raw, min_bucket=512) for raw in raws]
    uniqs = [p.pop("n_uniq") for p in preps]
    prep_ms = (time.perf_counter() - t_prep) / n * 1000
    buckets = sorted({p["art_uniq"].shape[0] for p in preps})
    staged = [{k: jnp.asarray(v) for k, v in p.items()} for p in preps]
    jax.block_until_ready([staged[-1]["hist_slot"]])

    subs = list(jax.random.split(
        jax.random.key(0, impl=trainer.config.rng_impl), n))
    jax.block_until_ready(subs[-1])

    # compile-warm each distinct bucket (one program per ladder rung)
    seen: dict[int, dict] = {}
    for s in staged:
        seen.setdefault(s["art_uniq"].shape[0], s)
    loss = None
    t_c = time.perf_counter()
    for ex in seen.values():
        copy = {k: jnp.copy(v) for k, v in ex.items()}
        trainer.state, loss = trainer._train_step(trainer.state, copy, subs[0])
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t_c
    for i in range(WARMUP):
        trainer.state, loss = trainer._train_step(trainer.state, staged[i], subs[i])
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(WARMUP, n):
        trainer.state, loss = trainer._train_step(trainer.state, staged[i], subs[i])
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    ips = BS * STEPS / dt

    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats()
        mem = {"hbm_peak_gb": round(stats.get("peak_bytes_in_use", 0) / 2**30, 2),
               "hbm_limit_gb": round(stats.get("bytes_limit", 0) / 2**30, 2)}
    except Exception:  # noqa: BLE001 - stats are best-effort per backend
        pass
    slots = BS * (H + K)
    print(json.dumps({
        "metric": f"{MODEL}_large_train_impressions_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "impressions/s",
        "step_ms": round(dt / STEPS * 1000, 2),
        "config": f"bs{BS} n_articles={N_ART} bf16 dedup zipf steps{STEPS}",
        "uniq_mean": int(np.mean(uniqs)),
        "uniq_frac": round(float(np.mean(uniqs)) / slots, 4),
        "ladder_buckets": buckets,
        "distinct_programs": len(buckets),
        "compile_warm_s": round(compile_s, 1),
        "prep_ms": round(prep_ms, 2),
        **mem,
    }))


if __name__ == "__main__":
    main()

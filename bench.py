#!/usr/bin/env python
"""Headline benchmark: NRMS training throughput (impressions/sec/chip).

Measures the jitted training hot loop of the flagship NRMS reproduction
config (ebnerd_small: history 20, title 30, npratio 4, 20 heads x 20 dim,
xlm-roberta-large-sized vocab/embedding) on the default JAX device: the
article token table resident on device, the in-graph gather path, bf16
compute, the fused Pallas news-encoder (BENCH_FUSED=0 for the pure-XLA
path), batches pre-staged on device (what the Trainer's prefetch thread
provides in production), async per-step dispatch.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...,
   "mfu_pct": ..., "step_ms": ...}

``vs_baseline`` compares against the locally measured reference
(ebanalyse/ebnerd-benchmark TF/Keras NRMS via
scripts/measure_reference_baseline.py; recorded in BASELINE_LOCAL.json —
the repo publishes no numbers of its own, see BASELINE.md). The reference
runs on host CPU (TF has no TPU backend here); see BENCH notes.
``mfu_pct`` is model FLOPs (analytic, fwd+bwd, unpadded math) over the
chip's bf16 peak.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

# Persistent XLA compile cache env (utils/compile_cache.py has the
# measured caveats: the deployed TPU plugin only persists small host-side
# programs; big-step repeat speedups come from server-side caching).
# Harmless on TPU, a real win for any CPU execution of this module.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", str(Path(__file__).resolve().parent / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

# Reference reproduction config (reference: README.md:118-133, args_nrms.py)
VOCAB = 250_002      # xlm-roberta-large vocab
EMB = 1_024          # xlm-roberta-large word-embedding dim
N_ARTICLES = 25_000  # ebnerd_small-scale article table
TITLE = 30
HISTORY = 20
NPRATIO = 4

# v5e bf16 peak; override for other chips via BENCH_PEAK_TFLOPS
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))


def _article_flops(d: int = 400, a: int = 200) -> float:
    """Analytic news-encoder FLOPs for ONE article forward:
    QKV + attention + pooling (unpadded math)."""
    t = TITLE
    return (3 * t * EMB * d * 2          # QKV projections
            + 2 * t * t * d * 2          # attention logits + apply
            + t * d * a * 2 + t * a * 2  # additive pooling
            )


def _user_flops(d: int = 400, a: int = 200) -> float:
    h_hist = HISTORY
    return 3 * h_hist * d * d * 2 + 2 * h_hist * h_hist * d * 2 + h_hist * d * a * 2


def model_flops_per_impression(d: int = 400, a: int = 200) -> float:
    """Analytic NRMS train-step FLOPs per impression (fwd x3 for bwd) on
    the per-slot path: every history/candidate slot encodes its article."""
    k = NPRATIO + 1
    fwd = (HISTORY + k) * _article_flops(d, a) + _user_flops(d, a) + k * d * 2
    return 3.0 * fwd


def _zipf_indices(rng: np.random.Generator, n_rows: int,
                  shape: tuple, a: float = 1.07) -> np.ndarray:
    """Article row draws with Zipf(a) popularity over a shuffled
    rank->article assignment (realistic skew: real inview/history lists
    concentrate on the day's few hundred active articles; the uniform
    draw of r2/r3 was the same realism-bias class as the uniform token
    table fixed in r3 — it hid the duplicate-article rate)."""
    m = int(np.prod(shape))
    ranks = rng.zipf(a, size=3 * m)
    ranks = ranks[ranks <= n_rows][:m] - 1
    while len(ranks) < m:  # astronomically unlikely at a=1.07; be exact
        extra = rng.zipf(a, size=m)
        ranks = np.concatenate([ranks, extra[extra <= n_rows] - 1])[:m]
    perm = rng.permutation(n_rows).astype(np.int32)
    return perm[ranks].reshape(shape).astype(np.int32)


def _batches(seed: int, steps: int, bs: int, n_rows: int,
             dist: str = "zipf") -> dict[str, np.ndarray]:
    r = np.random.default_rng(seed)
    k = NPRATIO + 1
    labels = np.zeros((steps, bs, k), np.float32)
    labels[..., 0] = 1.0
    if dist == "uniform":
        hist = r.integers(0, n_rows, (steps, bs, HISTORY)).astype(np.int32)
        cand = r.integers(0, n_rows, (steps, bs, k)).astype(np.int32)
    else:
        hist = _zipf_indices(r, n_rows, (steps, bs, HISTORY))
        cand = _zipf_indices(r, n_rows, (steps, bs, k))
    return {"hist_idx": hist, "cand_idx": cand, "labels": labels}


def _token_table(rng: np.random.Generator, dist: str) -> np.ndarray:
    """The [N+1, T] article token table. ``zipf`` (default) draws token
    ids with Zipf(1.07) frequencies over the vocab with a shuffled
    rank->id assignment — the realistic regime for tokenized titles
    (round-2 used ``uniform``, which touches nearly every vocab row per
    bs-512 batch and thereby biased the embedding-optimizer design; see
    BENCH notes / scripts/bench_embed_grad2.py)."""
    shape = (N_ARTICLES + 1, TITLE)
    if dist == "uniform":
        return rng.integers(0, VOCAB, size=shape).astype(np.int32)
    m = shape[0] * shape[1]
    ranks = rng.zipf(1.07, size=3 * m)
    ranks = ranks[ranks <= VOCAB][:m] - 1
    perm = rng.permutation(VOCAB).astype(np.int32)
    return perm[ranks].reshape(shape).astype(np.int32)


def _prep_sparse(all_b: dict, table: np.ndarray, steps: int) -> list[dict]:
    """Per-step host dedup (in production this rides the prefetch thread;
    here it is done up-front like the batch staging). All steps are padded
    to ONE common row-bucket so the loop stays a single compiled program."""
    from ebnerd_tpu.training.sparse_embed import bucket_size, prep_sparse_batch

    raws = [{k: v[i] for k, v in all_b.items()} for i in range(steps)]
    preps, max_rows = [], 0
    for raw in raws:
        p = prep_sparse_batch(raw, {"title": table}, ("title",), VOCAB,
                              min_bucket=4096)
        max_rows = max(max_rows, int(p["emb_valid"].sum()))
        preps.append(p)
    bucket = bucket_size(max_rows, 4096)
    for p in preps:
        n = int(p["emb_valid"].sum())
        uniq = np.zeros(bucket, np.int32)
        uniq[:n] = p["emb_uniq"][:n]
        valid = np.zeros(bucket, np.float32)
        valid[:n] = 1.0
        p["emb_uniq"], p["emb_valid"] = uniq, valid
    return preps


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ebnerd_tpu.models.config import HParamsNRMS
    from ebnerd_tpu.models.inputs import token_batch
    from ebnerd_tpu.models.newsrec import NRMS
    from ebnerd_tpu.training.trainer import Trainer, TrainerConfig

    # batch-size scaling (stock env, two agreeing runs each): bs1024
    # 14,092 imp/s / bs2048 19,933 / bs4096 27,707 / bs8192 41,973 /
    # bs16384 61,793 (265 ms; 5.5% unique — the same duplicate rate the
    # reference's REAL vendored behaviors fixture measures, 5.4% at
    # bs1024, BASELINE.md anchor). The dedup fraction improves with
    # batch, so scaling is super-linear toward the catalogue-saturated
    # regime real traffic occupies at any batch size.
    # Default 16384 (r5): the training recipe at every default candidate
    # is pinned by on-chip parity runs — sqrt-scaled LR
    # (1e-4 * sqrt(bs/64)) reaches reference accuracy at bs1024 through
    # bs16384 on the synthetic topic-signal split (PARITY_TRAIN.json
    # nrms_fused_bf16_bs16384: 0.8977/0.9007 vs reference 0.8972; plain
    # lr does NOT converge — docs/performance.md "Large-batch recipe").
    # r3 per-slot history: bs512 4,014 / bs1024 4,484 / bs2048 4,425.
    bs = int(os.environ.get("BENCH_BS", "16384"))
    steps = int(os.environ.get("BENCH_STEPS", "30"))
    warmup = int(os.environ.get("BENCH_WARMUP", "5"))
    # bf16 compute (fp32 params) is the TPU-native default; measured AUC
    # parity with fp32 at convergence on synthetic EB-NeRD (see git log).
    dtype = jnp.float32 if os.environ.get("BENCH_DTYPE") == "float32" else jnp.bfloat16
    # fused Pallas news encoder is the default (wins end to end; see
    # BENCH notes / ops/news_encoder.py); BENCH_FUSED=0 for pure XLA
    fused = os.environ.get("BENCH_FUSED", "1") != "0"
    fused_block = int(os.environ.get("BENCH_FUSED_BLOCK", "8"))

    dropout = float(os.environ.get("BENCH_DROPOUT", "0.2"))
    # realistic Zipfian token stats by default; BENCH_TOKEN_DIST=uniform
    # reproduces the round-2 setting. Measured irrelevant to the dense
    # step (4,014.3 vs 4,014.4 imp/s, r3): the dense scatter+Adam cost is
    # vocab-size-bound, not unique-row-bound.
    token_dist = os.environ.get("BENCH_TOKEN_DIST", "zipf")
    # realistic Zipfian ARTICLE popularity by default (r4; the r2/r3
    # uniform article draw was the same realism-bias class one level up —
    # real inview/history lists concentrate on few active articles)
    art_dist = os.environ.get("BENCH_ARTICLE_DIST", "zipf")
    # train-time unique-article dedup (training/dedup.py), the production
    # default: encode each unique article once per step
    dedup = os.environ.get("BENCH_DEDUP", "1") != "0"
    # row-sparse embedding updates (trainer sparse_embedding mode).
    # Default OFF: measured SLOWER end-to-end on v5e at Zipfian stats
    # (3,561 vs 4,014 imp/s; row gather/scatter of ~51k touched rows
    # costs more than the dense [V,E] streaming sweep — see
    # scripts/bench_embed_grad2.py results in STATUS.md).
    sparse = os.environ.get("BENCH_SPARSE", "0") != "0"
    hp = HParamsNRMS(dropout=dropout)  # title 30, hist 20, 20x20 heads, attn 200
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=EMB, dtype=dtype,
                 use_fused_encoder=fused, fused_block_n=fused_block)
    rng = np.random.default_rng(0)
    table = _token_table(rng, token_dist)
    # BENCH_MU_DTYPE=bfloat16 stores Adam's first moment in bf16 (halves
    # the [V,E] m-traffic; a numerics trade, default off = parity fp32)
    mu_dtype = os.environ.get("BENCH_MU_DTYPE") or None
    trainer = Trainer(
        model, {"title": table}, token_batch,
        TrainerConfig(learning_rate=1e-4, seed=0, sparse_embedding=sparse,
                      dedup_articles=dedup, adam_mu_dtype=mu_dtype),
        log_fn=lambda s: None,
    )
    first = {k: v[0] for k, v in _batches(0, 1, bs, N_ARTICLES + 1, art_dist).items()}
    trainer.init_state(first)

    key = jax.random.key(0, impl=trainer.config.rng_impl)
    # pre-stage every batch on device (the trainer's prefetch thread does
    # the same one step ahead in production), then drive the per-step jit;
    # dispatch is async, so consecutive steps pipeline on device
    all_b = _batches(2, warmup + steps, bs, N_ARTICLES + 1, art_dist)
    t_prep = time.perf_counter()
    uniq_frac, sparse_rows = 1.0, 0
    if sparse:
        raws = _prep_sparse(all_b, table, warmup + steps)
        sparse_rows = int(raws[0]["emb_valid"].sum())
    else:
        raws = [{k: v[i] for k, v in all_b.items()}
                for i in range(warmup + steps)]
    if dedup:
        from ebnerd_tpu.training.dedup import prep_dedup_batch

        slots = bs * (HISTORY + NPRATIO + 1)
        preps = [prep_dedup_batch(r, min_bucket=512) for r in raws]
        uniq_frac = float(np.mean([p.pop("n_uniq") for p in preps]) / slots)
        # per-batch ladder buckets, exactly what fit()'s prefetch thread
        # produces (padding every step to the max bucket measured ~12%
        # slower end to end; one compiled program per distinct bucket)
        raws = preps
    prep_ms = (time.perf_counter() - t_prep) / (warmup + steps) * 1000
    staged = [{k: jnp.asarray(v) for k, v in raw.items()} for raw in raws]
    probe = "hist_slot" if dedup else "hist_idx"
    jax.block_until_ready([staged[-1][probe]])

    # pre-split all dropout keys: a per-step host-side split is a tiny
    # device dispatch each (expensive over a remote-TPU tunnel)
    subs = list(jax.random.split(key, warmup + steps))
    jax.block_until_ready(subs[-1])

    loss = None
    if dedup:
        # compile-warm every distinct bucket size before timing (a
        # mid-measurement compile would time the compiler, not the step).
        # _train_step donates its batch, so warm on fresh copies.
        seen: dict[int, dict] = {}
        for s in staged:
            seen.setdefault(s["art_uniq"].shape[0], s)
        for ex in seen.values():
            copy = {k: jnp.copy(v) for k, v in ex.items()}
            trainer.state, loss = trainer._train_step(trainer.state, copy, subs[0])
        jax.block_until_ready(loss)
    for i in range(warmup):
        trainer.state, loss = trainer._train_step(trainer.state, staged[i], subs[i])
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for i in range(warmup, warmup + steps):
        trainer.state, loss = trainer._train_step(trainer.state, staged[i], subs[i])
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    ips = bs * steps / dt

    baseline_path = Path(__file__).parent / "BASELINE_LOCAL.json"
    vs = 0.0
    if baseline_path.exists():
        ref = json.loads(baseline_path.read_text()).get("reference_impressions_per_sec")
        if ref:
            vs = ips / float(ref)
    d, a = hp.head_num * hp.head_dim, hp.attention_hidden_dim
    k = NPRATIO + 1
    if dedup:
        # MFU counts the FLOPs the deduped step actually needs: each
        # unique article encodes once (pad rows excluded — they are
        # wasted, not useful, work)
        slots = bs * (HISTORY + k)
        fwd = (uniq_frac * slots / bs) * _article_flops(d, a) + _user_flops(d, a) + k * d * 2
        flops = 3.0 * fwd
    else:
        flops = model_flops_per_impression(d, a)
    mfu = ips * flops / (PEAK_TFLOPS * 1e12) * 100.0
    # analytic as-shipped reference-on-A100 estimate: 3,500 imp/s midpoint
    # (derivation in BASELINE.md "Analytic GPU estimate"); vs_baseline
    # stays TPU-vs-CPU (the only locally runnable reference)
    print(json.dumps({
        "metric": "nrms_train_impressions_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "impressions/s",
        "vs_baseline": round(vs, 2),
        "vs_gpu_estimate": round(ips / 3500.0, 2),
        "mfu_pct": round(mfu, 2),
        "step_ms": round(dt / steps * 1000, 2),
        "config": (f"bs{bs} bf16 fused={int(fused)} sparse={int(sparse)} "
                   f"dedup={int(dedup)} tok={token_dist} art={art_dist} "
                   f"steps{steps}"),
        # mean unique-article fraction per batch (1.0 = no dedup): the
        # duplicate-encode share the dedup path removes is 1 - this
        "dedup_uniq_frac": round(uniq_frac, 4),
        # host prep cost per step (dedup and/or sparse vocab dedup; rides
        # the prefetch thread in production) + sparse touched-row count
        "prep_ms": round(prep_ms, 2),
        "sparse_rows": sparse_rows,
    }))


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Attribute the bench-default NRMS train step (bs512 bf16 fused +
rng-dropout) into forward / backward / embedding-grad / optimizer shares.

Five chained-dispatch variants, each its own jit (bench-style timing: the
per-step output feeds the next step, so async dispatch pipelines but
nothing can be lazily skipped; the final fetch forces the whole chain):

  full    exact bench step: value_and_grad over ALL params + dense Adam
  noemb   word-embedding frozen (no [V,E] grad scatter, no [V,E] Adam)
  noopt   value_and_grad over all params, gradient checksum, NO update
  fwd     training-mode forward + loss only
  infer   eval-mode forward (no dropout) — the serving-side cost

Run: python scripts/profile_step_budget.py [steps]
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ebnerd_tpu.utils import compile_cache  # noqa: E402  (persistent XLA cache)

import jax
import jax.numpy as jnp
import optax

from ebnerd_tpu.models.config import HParamsNRMS
from ebnerd_tpu.models.inputs import token_batch
from ebnerd_tpu.models.newsrec import NRMS

VOCAB = int(os.environ.get("PSB_VOCAB", "250002"))
EMB = int(os.environ.get("PSB_EMB", "1024"))
N_ART, T, H, K = 25_000, 30, 20, 5
BS = int(os.environ.get("PSB_BS", "512"))
STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
WARMUP = 3
# r4 defaults matching bench.py: unique-article dedup + Zipf popularity
PSB_DEDUP = os.environ.get("PSB_DEDUP", "1") != "0"
PSB_ART = os.environ.get("PSB_ART_DIST", "zipf")


def _draw(r, shape):
    if PSB_ART == "uniform":
        return r.integers(0, N_ART + 1, shape).astype(np.int32)
    m = int(np.prod(shape))
    ranks = r.zipf(1.07, size=3 * m)
    ranks = ranks[ranks <= N_ART + 1][:m] - 1
    perm = r.permutation(N_ART + 1).astype(np.int32)
    return perm[ranks].reshape(shape).astype(np.int32)


def main():
    hp = HParamsNRMS(dropout=0.2)
    model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=EMB, dtype=jnp.bfloat16,
                 use_fused_encoder=True,
                 fused_interpret=os.environ.get("PSB_INTERPRET") == "1")
    rng = np.random.default_rng(0)
    tables = {"title": jnp.asarray(
        rng.integers(0, VOCAB, (N_ART + 1, T)).astype(np.int32))}
    raws = []
    for i in range(WARMUP + STEPS):
        r = np.random.default_rng(100 + i)
        labels = np.zeros((BS, K), np.float32)
        labels[:, 0] = 1.0
        raws.append({
            "hist_idx": _draw(r, (BS, H)),
            "cand_idx": _draw(r, (BS, K)),
            "labels": labels,
        })
    if PSB_DEDUP:
        from ebnerd_tpu.training.dedup import pad_dedup_to, prep_dedup_batch

        preps = [prep_dedup_batch(raw, min_bucket=512) for raw in raws]
        uniq = int(np.mean([p.pop("n_uniq") for p in preps]))
        bucket = max(p["art_uniq"].shape[0] for p in preps)
        raws = [pad_dedup_to(p, bucket) for p in preps]
        print(f"dedup: mean uniq {uniq}/{BS * (H + K)} slots, bucket {bucket}")
    raws = [{k: jnp.asarray(v) for k, v in raw.items()} for raw in raws]
    jax.block_until_ready(raws[-1]["labels"])
    keys = list(jax.random.split(jax.random.key(0, impl="rbg"), WARMUP + STEPS))
    jax.block_until_ready(keys[-1])

    batch0 = token_batch(tables, {k: v for k, v in raws[0].items() if k != "labels"})
    variables = model.init(jax.random.key(0), batch0, train=False)
    params = variables["params"]

    def loss_of(p, raw, rng_key, eps):
        batch = token_batch(tables, raw)
        logits = model.apply({"params": p}, batch, train=True,
                             rngs={"dropout": rng_key})
        labels = raw["labels"] + eps  # chain: prior step's probe feeds in
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.mean(jnp.sum(labels * logp, -1))

    def drive(step_fn, state):
        """Chained async dispatch; returns ms/step."""
        eps = jnp.zeros((), jnp.float32)
        for i in range(WARMUP):
            state, eps = step_fn(state, raws[i], keys[i], eps)
        jax.block_until_ready(eps)
        t0 = time.perf_counter()
        for i in range(WARMUP, WARMUP + STEPS):
            state, eps = step_fn(state, raws[i], keys[i], eps)
        jax.block_until_ready(eps)
        return (time.perf_counter() - t0) / STEPS * 1000.0

    tx = optax.adam(1e-4)

    # -- full: the bench step ------------------------------------------------
    @jax.jit
    def full_step(state, raw, rng_key, eps):
        p, s = state
        loss, grads = jax.value_and_grad(loss_of)(p, raw, rng_key, eps)
        updates, s2 = tx.update(grads, s, p)
        return (optax.apply_updates(p, updates), s2), loss * 1e-20

    ms_full = drive(full_step, (params, tx.init(params)))
    print(f"full train step (bench default)      {ms_full:8.2f} ms", flush=True)

    # -- noemb: word embedding frozen ---------------------------------------
    # the frozen [V, E] table rides the STATE tuple: a closure capture
    # would bake a 1 GB constant into the executable and send the compile
    # into constant-folding pathology (observed: >25 min, killed)
    emb_leaf = params["word_embedding"]
    rest = {k: v for k, v in params.items() if k != "word_embedding"}

    @jax.jit
    def noemb_step(state, raw, rng_key, eps):
        p, s, emb = state

        def lf(pr):
            return loss_of({**pr, "word_embedding": emb}, raw, rng_key, eps)

        loss, grads = jax.value_and_grad(lf)(p)
        updates, s2 = tx.update(grads, s, p)
        return (optax.apply_updates(p, updates), s2, emb), loss * 1e-20

    ms_noemb = drive(noemb_step, (rest, tx.init(rest), emb_leaf))
    print(f"  frozen embedding (no scatter/Adam) {ms_noemb:8.2f} ms  "
          f"(emb grad+Adam = {ms_full - ms_noemb:+.2f})", flush=True)

    # -- noopt: grads, no update --------------------------------------------
    @jax.jit
    def noopt_step(state, raw, rng_key, eps):
        loss, grads = jax.value_and_grad(loss_of)(state, raw, rng_key, eps)
        probe = sum(jnp.sum(g.astype(jnp.float32)) * 1e-30
                    for g in jax.tree_util.tree_leaves(grads))
        return state, (loss + probe) * 1e-20

    ms_noopt = drive(noopt_step, params)
    print(f"  grads only, no optimizer           {ms_noopt:8.2f} ms  "
          f"(all-param Adam = {ms_full - ms_noopt:+.2f})", flush=True)

    # -- fwd: loss only ------------------------------------------------------
    @jax.jit
    def fwd_step(state, raw, rng_key, eps):
        return state, loss_of(state, raw, rng_key, eps) * 1e-20

    ms_fwd = drive(fwd_step, params)
    print(f"  forward+loss only (train mode)     {ms_fwd:8.2f} ms  "
          f"(backward = {ms_noopt - ms_fwd:+.2f})", flush=True)

    # -- infer: eval-mode forward -------------------------------------------
    @jax.jit
    def infer_step(state, raw, rng_key, eps):
        batch = token_batch(tables, {k: v for k, v in raw.items() if k != "labels"})
        logits = model.apply({"params": state}, batch, train=False)
        return state, (jnp.sum(logits.astype(jnp.float32)) * 1e-30 + eps) * 1e-20

    ms_inf = drive(infer_step, params)
    print(f"  eval-mode forward (serving)        {ms_inf:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()

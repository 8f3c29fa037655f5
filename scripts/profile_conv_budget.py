#!/usr/bin/env python
"""Per-family step budgets for the CONV families at the r5 bench balance
(bs4096 + Zipf + dedup): is the conv/attention article-encoder chain
dominant enough to deserve a fused Pallas conv+pooling kernel?

VERDICT r4 weak item 1: the r3 "no new kernels" decision was asserted
a fortiori after dedup; this re-measures it. For each of NAML / LSTUR /
NPA (the reference conv encoders, naml.py:143-203 / lstur.py:113-144 /
npa.py:107-153) it times, chained-dispatch style:

  full   the full train step (value_and_grad over all params + Adam)
  enc    fwd+bwd of the article ENCODER alone over the deduped unique
         articles (value_and_grad of a reduction of encode_news)
  emb    fwd+bwd of just the embedding gather (the unavoidable part)

The encoder share (enc/full) and its conv-dominated part (enc - emb)
decide the kernel question with numbers. Dropout is OFF in the probes
(attribution only; the full step keeps it ON like the bench).

Run on the chip: python scripts/profile_conv_budget.py [naml lstur npa]
Env: PCB_BS (default 4096), PCB_STEPS (default 10).
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ebnerd_tpu.utils import compile_cache  # noqa: E402  (persistent XLA cache)

import jax
import jax.numpy as jnp
import optax

from ebnerd_tpu.models import config as mcfg
from ebnerd_tpu.models.inputs import builder_for
from ebnerd_tpu.models.newsrec import LSTUR, NAML, NPA
from ebnerd_tpu.training.dedup import prep_dedup_batch

BS = int(os.environ.get("PCB_BS", "4096"))
STEPS = int(os.environ.get("PCB_STEPS", "10"))
H, T, K = 20, 30, 5
VOCAB, EMB = 250_002, 1_024
N_ART, N_USERS = 25_001, 50_000
DTYPE = jnp.bfloat16


def _draw(r, shape):
    m = int(np.prod(shape))
    ranks = r.zipf(1.07, size=3 * m)
    ranks = ranks[ranks <= N_ART][:m] - 1
    perm = r.permutation(N_ART).astype(np.int32)
    return perm[ranks].reshape(shape).astype(np.int32)


def timed(fn, *args) -> float:
    """Chained scan timer (profile_models.py style): STEPS dependent
    invocations inside one jit, timed on the second call."""

    @jax.jit
    def loop(*a):
        leaves0, treedef0 = jax.tree_util.tree_flatten(a[0])
        fidx = next(i for i, l in enumerate(leaves0)
                    if jnp.issubdtype(l.dtype, jnp.floating))

        def body(carry, _):
            leaves = list(leaves0)
            leaves[fidx] = leaves[fidx] + carry.astype(leaves[fidx].dtype)
            first = jax.tree_util.tree_unflatten(treedef0, leaves)
            out = fn(first, *a[1:])
            probe = sum(l.ravel()[0].astype(jnp.float32)
                        for l in jax.tree_util.tree_leaves(out)
                        if hasattr(l, "ravel") and l.size)
            return (probe * 1e-30).astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=STEPS)
        return c

    _ = float(loop(*args))
    t0 = time.perf_counter()
    _ = float(loop(*args))
    return (time.perf_counter() - t0) / STEPS * 1000.0


def encoder_probe(name, model):
    """(fn(params, batch) -> scalar) reductions: full encoder vs
    embedding-gather-only, both over the deduped unique-article axis."""
    if name == "naml":
        def enc(p, b):
            return jnp.sum(jnp.square(model.apply(
                {"params": p}, b["uniq_tokens"], b["uniq_body"], b["uniq_cat"],
                b["uniq_subcat"], False, method=model.encode_news)))

        def emb(p, b):
            return jnp.sum(jnp.square(model.apply(
                {"params": p}, b["uniq_tokens"],
                method=lambda m, x: m.embedding(x)))) + jnp.sum(jnp.square(
                    model.apply({"params": p}, b["uniq_body"],
                                method=lambda m, x: m.embedding(x))))
        return enc, emb
    if name == "lstur":
        def enc(p, b):
            return jnp.sum(jnp.square(model.apply(
                {"params": p}, b["uniq_tokens"], False,
                method=model.encode_news)))

        def emb(p, b):
            return jnp.sum(jnp.square(model.apply(
                {"params": p}, b["uniq_tokens"],
                method=lambda m, x: m.embedding(x))))
        return enc, emb
    if name == "npa":
        # NPA's dedupable prefix is embedding->conv (user-independent)
        def enc(p, b):
            return jnp.sum(jnp.square(model.apply(
                {"params": p}, b["uniq_tokens"],
                method=lambda m, x: m.conv(m.embedding(x)))))

        def emb(p, b):
            return jnp.sum(jnp.square(model.apply(
                {"params": p}, b["uniq_tokens"],
                method=lambda m, x: m.embedding(x))))
        return enc, emb
    raise ValueError(name)


def main():
    which = sys.argv[1:] or ["naml", "lstur", "npa"]
    r = np.random.default_rng(0)
    tables = {
        "title": jnp.asarray(r.integers(0, VOCAB, (N_ART, T)).astype(np.int32)),
        "body": jnp.asarray(r.integers(0, VOCAB, (N_ART, 40)).astype(np.int32)),
        "cat": jnp.asarray(r.integers(0, 30, N_ART).astype(np.int32)),
        "subcat": jnp.asarray(r.integers(0, 200, N_ART).astype(np.int32)),
    }
    common = dict(vocab_size=VOCAB, word_emb_dim=EMB, dtype=DTYPE)
    models = {
        "naml": lambda: NAML(mcfg.HParamsNAML(), **common),
        "lstur": lambda: LSTUR(mcfg.HParamsLSTUR(n_users=N_USERS), **common),
        "npa": lambda: NPA(mcfg.HParamsNPA(n_users=N_USERS), **common),
    }
    print(f"bs={BS} steps={STEPS} device={jax.devices()[0]} bf16 dedup zipf")
    for name in which:
        model = models[name]()
        builder = builder_for(name)
        raw = {"hist_idx": _draw(r, (BS, H)), "cand_idx": _draw(r, (BS, K))}
        if name in ("lstur", "npa"):
            raw["user_idx"] = r.integers(0, N_USERS, BS).astype(np.int32)
        raw = prep_dedup_batch(raw, min_bucket=512)
        uniq = raw.pop("n_uniq")
        raw = {k: jnp.asarray(v) for k, v in raw.items()}
        labels = jnp.zeros((BS, K)).at[:, 0].set(1.0)
        batch = builder(tables, raw)
        variables = model.init(jax.random.key(0), batch, train=False)
        params = variables["params"]
        tx = optax.adam(1e-4)
        opt_state = tx.init(params)

        def loss_fn(p, rw):
            logits = model.apply({"params": p}, builder(tables, rw), train=True,
                                 rngs={"dropout": jax.random.key(1)})
            logp = jax.nn.log_softmax(logits, -1)
            return -jnp.mean(jnp.sum(labels * logp, -1))

        def full_step(p, s, rw):
            loss, grads = jax.value_and_grad(loss_fn)(p, rw)
            updates, s2 = tx.update(grads, s, p)
            return optax.apply_updates(p, updates), s2, loss

        enc_fn, emb_fn = encoder_probe(name, model)

        def enc_step(p, b):
            return jax.value_and_grad(enc_fn)(p, b)

        def emb_step(p, b):
            return jax.value_and_grad(emb_fn)(p, b)

        full_ms = timed(full_step, params, opt_state, raw)
        enc_ms = timed(enc_step, params, batch)
        emb_ms = timed(emb_step, params, batch)
        print(f"{name:8s} C={raw['art_uniq'].shape[0]} uniq={uniq} | "
              f"full {full_ms:7.2f} ms | encoder(fwd+bwd) {enc_ms:7.2f} "
              f"({enc_ms / full_ms * 100:4.1f}%) | embed-only {emb_ms:7.2f} | "
              f"conv+pool share {enc_ms - emb_ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

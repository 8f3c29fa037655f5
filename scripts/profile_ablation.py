#!/usr/bin/env python
"""Step-time ablations for the NRMS training step — locates where the
time goes on the attached accelerator (forward vs backward vs embedding
gradient/Adam vs model size).

  python scripts/profile_ablation.py            # all ablations
  python scripts/profile_ablation.py fwd full   # a subset
"""
from __future__ import annotations

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
from ebnerd_tpu.models.newsrec import NRMS

import os

BS, H, T, K = int(os.environ.get("ABL_BS", "256")), 20, 30, 5
STEPS, WARMUP = int(os.environ.get("ABL_STEPS", "10")), 3
DTYPE = os.environ.get("ABL_DTYPE", "float32")  # float32 | bfloat16


def make_setup(vocab, emb, dtype):
    hp = HParamsNRMS()
    model = NRMS(hp, vocab_size=vocab, word_emb_dim=emb, dtype=dtype)
    rng = np.random.default_rng(0)
    n_art = 25_001
    table = jnp.asarray(rng.integers(0, vocab, (n_art, T)).astype(np.int32))
    batch_idx = {
        "hist_idx": jnp.asarray(rng.integers(0, n_art, (BS, H)).astype(np.int32)),
        "cand_idx": jnp.asarray(rng.integers(0, n_art, (BS, K)).astype(np.int32)),
    }
    labels = jnp.zeros((BS, K)).at[:, 0].set(1.0)
    batch = {
        "hist_tokens": table[batch_idx["hist_idx"]],
        "cand_tokens": table[batch_idx["cand_idx"]],
    }
    variables = model.init(jax.random.key(0), batch, train=False)
    params = variables["params"]
    return model, table, batch_idx, labels, params


def timed(fn, *args):
    """Device-only ms/step: STEPS iterations inside one jitted lax.scan
    chained through a scalar carry folded into the first float leaf of
    the first argument. (Unchained python-loop repetition under-measures
    through the remote runtime: dispatches whose outputs are dropped are
    skipped lazily.)"""

    @jax.jit
    def loop(*a):
        leaves0, treedef0 = jax.tree_util.tree_flatten(a[0])

        float_idx = next(i for i, l in enumerate(leaves0)
                         if jnp.issubdtype(l.dtype, jnp.floating))

        def body(carry, _):
            leaves = list(leaves0)
            leaves[float_idx] = leaves[float_idx] + carry.astype(leaves[float_idx].dtype)
            first = jax.tree_util.tree_unflatten(treedef0, leaves)
            out = fn(first, *a[1:])
            # probe EVERY output leaf so no part of the computation is DCE'd
            probe = sum(
                l.ravel()[0].astype(jnp.float32)
                for l in jax.tree_util.tree_leaves(out)
                if hasattr(l, "ravel") and l.size
            )
            return (probe * 1e-30).astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=STEPS)
        return c

    _ = float(loop(*args))  # compile + warm
    t0 = time.perf_counter()
    _ = float(loop(*args))
    return (time.perf_counter() - t0) / STEPS * 1000.0


def report(name, ms):
    print(f"{name:32s} {ms:8.2f} ms/step   {BS / ms * 1000:9.0f} imp/s")


def run(which, vocab=250_002, emb=1_024, dtype=jnp.float32, tag=""):
    model, table, idx, labels, params = make_setup(vocab, emb, dtype)
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    def gather(idx):
        return {"hist_tokens": table[idx["hist_idx"]],
                "cand_tokens": table[idx["cand_idx"]]}

    def loss_fn(p, idx):
        logits = model.apply({"params": p}, gather(idx), train=True,
                             rngs={"dropout": jax.random.key(1)})
        logp = jax.nn.log_softmax(logits, -1)
        return -jnp.mean(jnp.sum(labels * logp, -1))

    if "fwd" in which:
        fwd = jax.jit(lambda p, i: loss_fn(p, i))
        report(f"forward only{tag}", timed(fwd, params, idx))
    if "grad" in which:
        g = jax.jit(lambda p, i: jax.grad(loss_fn)(p, i))
        report(f"forward+backward{tag}", timed(g, params, idx))
    if "grad_frozen_emb" in which:
        def loss_frozen(p_rest, p_emb, i):
            p = {**p_rest, "word_embedding": jax.lax.stop_gradient(p_emb)}
            return loss_fn(p, i)
        p_emb = params["word_embedding"]
        p_rest = {k: v for k, v in params.items() if k != "word_embedding"}
        g2 = jax.jit(lambda pr, pe, i: jax.grad(loss_frozen)(pr, pe, i))
        report(f"fwd+bwd, frozen word-emb{tag}", timed(g2, p_rest, p_emb, idx))
    if "full" in which:
        @jax.jit
        def step(p, s, i):
            loss, grads = jax.value_and_grad(loss_fn)(p, i)
            updates, s2 = tx.update(grads, s, p)
            return optax.apply_updates(p, updates), s2, loss
        ms = timed(step, params, opt_state, idx)
        report(f"full train step{tag}", ms)


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"fwd", "grad", "grad_frozen_emb", "full"}
    print(f"bs={BS} hist={H} title={T} K={K}, device={jax.devices()[0]}")
    run(which, dtype=getattr(jnp, DTYPE))
    if "small" in which or not sys.argv[1:]:
        run({"full"}, vocab=32_000, emb=300, tag=" (vocab 32k, emb 300)")
        run({"full"}, dtype=jnp.bfloat16, tag=" (bf16)")

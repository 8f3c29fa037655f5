#!/usr/bin/env python
"""Hypothesis probe: how much of the NRMS step is dropout RNG?

The news encoder applies dropout to [B*(H+K), T, E] embeddings and to
[B*(H+K), T, D] attention outputs; at bs512 that is ~8G random bits per
step from the default threefry2x32 generator, which is ALU-heavy on TPU.
Measures fwd/step time with dropout on/off and with the rbg PRNG.

  python scripts/profile_dropout.py
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

from ebnerd_tpu.models.config import HParamsNRMS
from ebnerd_tpu.models.newsrec import NRMS

BS = int(os.environ.get("ABL_BS", "512"))
H, T, K = 20, 30, 5
STEPS = 10
VOCAB, EMB = 250_002, 1_024
DTYPE = jnp.bfloat16


def timed(fn, *args):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            out = fn(*a)
            probe = sum(l.ravel()[0].astype(jnp.float32)
                        for l in jax.tree_util.tree_leaves(out) if hasattr(l, "ravel") and l.size)
            return carry + probe * 1e-30, ()
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=STEPS)
        return c

    _ = float(loop(*args))
    t0 = time.perf_counter()
    _ = float(loop(*args))
    return (time.perf_counter() - t0) / STEPS * 1000.0


def main():
    rng = np.random.default_rng(0)
    n_art = 25_001
    table = jnp.asarray(rng.integers(0, VOCAB, (n_art, T)).astype(np.int32))
    idx = {
        "hist_idx": jnp.asarray(rng.integers(0, n_art, (BS, H)).astype(np.int32)),
        "cand_idx": jnp.asarray(rng.integers(0, n_art, (BS, K)).astype(np.int32)),
    }
    labels = jnp.zeros((BS, K)).at[:, 0].set(1.0)

    def gather(i):
        return {"hist_tokens": table[i["hist_idx"]],
                "cand_tokens": table[i["cand_idx"]]}

    print(f"bs={BS} device={jax.devices()[0]} dtype=bf16")

    # raw RNG cost: the two dropout masks the news encoder draws per step
    n_art_rows = BS * (H + K)
    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(0, impl=impl)
        def masks(k):
            k1, k2 = jax.random.split(k)
            m1 = jax.random.bernoulli(k1, 0.8, (n_art_rows, T, EMB))
            m2 = jax.random.bernoulli(k2, 0.8, (n_art_rows, T, 400))
            return m1.sum() + m2.sum()
        print(f"  dropout-mask RNG only [{impl}]      {timed(masks, key):8.2f} ms")

    for dropout, impl, tag in [
        (0.2, "threefry2x32", "dropout .2 threefry"),
        (0.2, "rbg", "dropout .2 rbg"),
        (0.0, "threefry2x32", "dropout 0"),
    ]:
        hp = HParamsNRMS(dropout=dropout)
        model = NRMS(hp, vocab_size=VOCAB, word_emb_dim=EMB, dtype=DTYPE)
        variables = model.init(jax.random.key(0), gather(idx), train=False)
        params = variables["params"]
        tx = optax.adam(1e-4)
        opt_state = tx.init(params)
        key = jax.random.key(1, impl=impl)

        def loss_fn(p, i):
            logits = model.apply({"params": p}, gather(i), train=True,
                                 rngs={"dropout": key})
            logp = jax.nn.log_softmax(logits, -1)
            return -jnp.mean(jnp.sum(labels * logp, -1))

        fwd = jax.jit(loss_fn)
        print(f"  forward [{tag}]  {timed(fwd, params, idx):8.2f} ms")

        @jax.jit
        def step(p, s, i):
            loss, grads = jax.value_and_grad(loss_fn)(p, i)
            updates, s2 = tx.update(grads, s, p)
            return optax.apply_updates(p, updates), s2, loss

        print(f"  full step [{tag}] {timed(step, params, opt_state, idx):8.2f} ms")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Bisect the FUSED NRMS train step: where do the ~190ms at bs512 go?

  python scripts/profile_fused.py
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

from ebnerd_tpu.ops.news_encoder import news_encoder

BS, H, T, K, E, D, A = 512, 20, 30, 5, 1024, 400, 200
NH, HD = 20, 20
N = BS * (H + K)
STEPS = 10
VOCAB = 250_002
BLOCK = int(os.environ.get("FUSED_BLOCK", "8"))


def timed(fn, *args):
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


def report(name, ms):
    print(f"{name:48s} {ms:8.2f} ms")


def main():
    r = np.random.default_rng(0)
    print(f"device={jax.devices()[0]} block_n={BLOCK} N={N}")
    x = jnp.asarray(r.standard_normal((N, T, E)).astype(np.float32)).astype(jnp.bfloat16)
    wq = jnp.asarray(r.standard_normal((E, D)).astype(np.float32) * 0.02)
    wk = jnp.asarray(r.standard_normal((E, D)).astype(np.float32) * 0.02)
    wv = jnp.asarray(r.standard_normal((E, D)).astype(np.float32) * 0.02)
    w = jnp.asarray(r.standard_normal((D, A)).astype(np.float32) * 0.02)
    b = jnp.zeros((A,), jnp.float32)
    q = jnp.asarray(r.standard_normal((A, 1)).astype(np.float32) * 0.02)
    ones = jnp.ones((8, 128), jnp.float32)
    mask = jnp.asarray(
        (r.random((N, T, D)) < 0.8).astype(np.float32))

    def fwd_nodrop(ws, x):
        wq_, wk_, wv_, w_, b_, q_ = ws
        return news_encoder(x, wq_, wk_, wv_, w_, b_, q_, ones, None,
                            NH, BLOCK, False, 1.0, "bfloat16")

    def fwd_drop(ws, x, m):
        wq_, wk_, wv_, w_, b_, q_ = ws
        return news_encoder(x, wq_, wk_, wv_, w_, b_, q_, m, None,
                            NH, BLOCK, False, 0.8, "bfloat16")

    ws = (wq, wk, wv, w, b, q)
    report("fused news-enc FWD (no dropout)",
           timed(jax.jit(fwd_nodrop), ws, x))
    report("fused news-enc FWD (dropout)",
           timed(jax.jit(fwd_drop), ws, x, mask))

    def loss_nd(ws, x):
        return jnp.sum(fwd_nodrop(ws, x) * 1e-6)

    def loss_d(ws, x, m):
        return jnp.sum(fwd_drop(ws, x, m) * 1e-6)

    report("fused news-enc FWD+BWD (no dropout)",
           timed(jax.jit(lambda ws, x: jax.grad(loss_nd)(ws, x)), ws, x))
    report("fused news-enc FWD+BWD (dropout)",
           timed(jax.jit(lambda ws, x, m: jax.grad(loss_d)(ws, x, m)), ws, x, mask))

    # bwd wrt x only (embedding path needs dx; weights small)
    report("fused news-enc FWD+BWD wrt x only",
           timed(jax.jit(lambda x, ws: jax.grad(
               lambda x_, ws_: loss_nd(ws_, x_))(x, ws)), x, ws))

    # user encoder size
    xu = jnp.asarray(r.standard_normal((BS, H, D)).astype(np.float32)).astype(jnp.bfloat16)
    wq2 = jnp.asarray(r.standard_normal((D, D)).astype(np.float32) * 0.02)
    ws2 = (wq2, wq2, wq2, w, b, q)
    def loss_u(ws, x):
        wq_, wk_, wv_, w_, b_, q_ = ws
        return jnp.sum(news_encoder(x, wq_, wk_, wv_, w_, b_, q_, ones, None,
                                    NH, BLOCK, False, 1.0, "bfloat16") * 1e-6)
    report("fused user-enc FWD+BWD",
           timed(jax.jit(lambda ws, x: jax.grad(loss_u)(ws, x)), ws2, xu))

    # embedding gather + dropout + scatter grad (the non-kernel part)
    tokens = jnp.asarray(r.integers(0, VOCAB, (N, T)).astype(np.int32))
    table = jnp.asarray(r.standard_normal((VOCAB, E)).astype(np.float32))
    key = jax.random.key(0)

    def emb_drop(p, tok, k):
        xg = p[tok].astype(jnp.bfloat16)
        keep = jax.random.bernoulli(k, 0.8, xg.shape)
        return jnp.sum((jnp.where(keep, xg / 0.8, 0)).astype(jnp.float32) * 1e-6)

    report("emb gather+dropout FWD+BWD (scatter)",
           timed(jax.jit(lambda p, t_, k_: jax.grad(emb_drop)(p, t_, k_)),
                 table, tokens, key))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Bisect the NRMS backward-pass time by component and dtype.

Times value_and_grad of each isolated piece of the news/user encoder on
the attached device with the carry-chained scan timer (lazy-dispatch
safe, no loop-invariant hoisting).

  python scripts/profile_bisect.py [bf16|fp32] ...
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

BS, H, T, K, E, D = 512, 20, 30, 5, 1024, 400
NH, HD = 20, 20
N = BS * (H + K)  # article rows
STEPS = 10
VOCAB = 250_002


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
    print(f"{name:44s} {ms:8.2f} ms")


def run(dtype_name):
    dt = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    r = np.random.default_rng(0)
    print(f"== dtype {dtype_name}, N={N} articles x T={T}, E={E}, D={D} ==")

    tokens = jnp.asarray(r.integers(0, VOCAB, (N, T)).astype(np.int32))
    emb_table = jnp.asarray(r.standard_normal((VOCAB, E)).astype(np.float32))
    x_emb = jnp.asarray(r.standard_normal((N, T, E)).astype(np.float32)).astype(dt)
    wq = jnp.asarray(r.standard_normal((E, D)).astype(np.float32) * 0.02)
    wk = jnp.asarray(r.standard_normal((E, D)).astype(np.float32) * 0.02)
    wv = jnp.asarray(r.standard_normal((E, D)).astype(np.float32) * 0.02)
    w_pool = jnp.asarray(r.standard_normal((D, 200)).astype(np.float32) * 0.02)
    q_pool = jnp.asarray(r.standard_normal((200, 1)).astype(np.float32) * 0.02)

    # 1. embedding gather + scatter-grad only
    def emb_only(p, tok):
        return jnp.sum(p[tok].astype(dt).astype(jnp.float32) * 1e-6)
    g1 = jax.jit(lambda p, tok: jax.grad(emb_only)(p, tok))
    report("embedding gather+scatter grad", timed(g1, emb_table, tokens))

    # 2. QKV projections only (the big matmuls)
    def qkv_only(ws, x):
        wq, wk, wv = ws
        y = (x @ wq.astype(dt)) + (x @ wk.astype(dt)) + (x @ wv.astype(dt))
        return jnp.sum(y.astype(jnp.float32) * 1e-6)
    g2 = jax.jit(lambda ws, x: jax.grad(qkv_only)(ws, x))
    report("QKV matmuls fwd+bwd", timed(g2, (wq, wk, wv), x_emb))

    # 3. full self-attention (proj + einsum attn)
    def selfatt(ws, x):
        wq_, wk_, wv_ = ws
        qh = (x @ wq_.astype(dt)).reshape(N, T, NH, HD)
        kh = (x @ wk_.astype(dt)).reshape(N, T, NH, HD)
        vh = (x @ wv_.astype(dt)).reshape(N, T, NH, HD)
        logits = jnp.einsum("nqhd,nkhd->nhqk", qh, kh) / np.sqrt(HD).astype(np.float32)
        wts = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("nhqk,nkhd->nqhd", wts, vh)
        return jnp.sum(out.astype(jnp.float32) * 1e-6)
    g3 = jax.jit(lambda ws, x: jax.grad(selfatt)(ws, x))
    report("self-attention fwd+bwd", timed(g3, (wq, wk, wv), x_emb))

    # 3b. attention core only (no projections)
    qh0 = jnp.asarray(r.standard_normal((N, T, NH, HD)).astype(np.float32)).astype(dt)
    def attncore(q3, k3, v3):
        logits = jnp.einsum("nqhd,nkhd->nhqk", q3, k3) / np.sqrt(HD).astype(np.float32)
        wts = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("nhqk,nkhd->nqhd", wts, v3)
        return jnp.sum(out.astype(jnp.float32) * 1e-6)
    g3b = jax.jit(lambda q3, k3, v3: jax.grad(attncore, argnums=(0, 1, 2))(q3, k3, v3))
    report("attention core (einsums+softmax) fwd+bwd", timed(g3b, qh0, qh0, qh0))

    # 4. additive pooling only
    x_att = jnp.asarray(r.standard_normal((N, T, D)).astype(np.float32)).astype(dt)
    def pool(ws, x):
        w, q = ws
        a = jnp.tanh(x @ w.astype(dt))
        a = (a @ q.astype(dt))[..., 0]
        a = a - jax.lax.stop_gradient(jnp.max(a, -1, keepdims=True))
        e = jnp.exp(a)
        wt = e / (jnp.sum(e, -1, keepdims=True) + 1e-8)
        return jnp.sum((x * wt[..., None].astype(dt)).astype(jnp.float32) * 1e-6)
    g4 = jax.jit(lambda ws, x: jax.grad(pool)(ws, x))
    report("additive pooling fwd+bwd", timed(g4, (w_pool, q_pool), x_att))

    # 5. dropout through bwd (saved-mask multiply)
    def dropmul(x, key):
        m = jax.random.bernoulli(key, 0.8, x.shape)
        return jnp.sum((x * m).astype(jnp.float32) * 1e-6)
    key = jax.random.key(0)
    g5 = jax.jit(lambda x, k: jax.grad(dropmul)(x, k))
    report("dropout mask gen+apply fwd+bwd", timed(g5, x_emb, key))


if __name__ == "__main__":
    which = sys.argv[1:] or ["bf16", "fp32"]
    print(f"device={jax.devices()[0]}")
    for d in which:
        run(d)

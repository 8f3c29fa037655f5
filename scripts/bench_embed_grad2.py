#!/usr/bin/env python
"""Embedding-gradient + optimizer strategies under REALISTIC token stats.

Round-2 dismissed sparse updates using UNIFORM tokens (N_tokens 384k >
vocab 250k at bs512, so "every row is touched"). Real EB-NeRD titles are
Zipfian: the unique-token count per batch is a small fraction of the
vocab, so a host-deduped row-sparse path can skip most of the dense
scatter + dense-Adam HBM traffic. This script measures the END-TO-END
slab (embedding-grad reduction + Adam update of the [V, E] table) per
strategy, at uniform AND Zipf token draws:

  dense       zeros(V,E).at[tokens].add(g)  + dense Adam over [V,E]
              (what jax.grad of a plain gather emits; the r2 default)
  hostdedup   host np.unique -> (unique_ids[C], slots[M]); device
              scatter-add into [C,E] by slots + row-wise Adam on the
              touched rows only (gather m/v rows, update, scatter back).
              Untouched rows keep stale moments (TF/Keras legacy sparse
              Adam semantics — the reference's own behavior for
              IndexedSlices embedding grads).
  devsort     device argsort(tokens) + permute g + segment_sum -> dense
              table grad (no host work; measures whether sorting alone
              helps XLA's scatter)

Zipf draw: token ids ~ Zipf(s) truncated to V, shuffled id->rank map so
hot tokens are spread over the table (matches a real tokenizer's id
assignment better than rank==id).

Run: python scripts/bench_embed_grad2.py [bs]
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

STEPS = 10
V = 250_002
E = 1_024
T, H, K = 30, 20, 5
B1, B2, EPS, LR = 0.9, 0.999, 1e-8, 1e-4

bs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
M = bs * (H + K) * T


def zipf_tokens(rng, m, s=1.07):
    """m token ids with Zipf(s) frequencies over the V-sized vocab."""
    ranks = rng.zipf(s, size=4 * m)
    ranks = ranks[ranks <= V][:m] - 1
    perm = rng.permutation(V).astype(np.int32)
    return perm[ranks]


def timed(fn, state, *args):
    """Timer that defeats the runtime's laziness (STATUS.md: dropped
    outputs are skipped, [0]-element probes get slice-propagated, and
    block_until_ready alone does not force remote execution — only a
    FETCH does). STEPS updates are unrolled inside ONE jit (unrolling,
    not lax.scan: a multi-GB scan carry defeats buffer aliasing, r2
    negative result) and the fetched probe is a FULL checksum of the
    final state, which depends elementwise on every update of every
    step — nothing can be sliced away."""

    @partial(jax.jit, donate_argnums=0)
    def loop(state, *a):
        for _ in range(STEPS):
            state = fn(state, *a)
        return sum(jnp.sum(l.astype(jnp.float32) * 1e-20) for l in state)

    _ = float(loop(tuple(jnp.copy(x) for x in state), *args))  # compile+run
    s2 = tuple(jnp.copy(x) for x in state)
    t0 = time.perf_counter()
    _ = float(loop(s2, *args))
    return (time.perf_counter() - t0) / STEPS * 1000.0


def dense_step(state, tokens, g, step):
    table, m, v = state
    grad = jnp.zeros((V, E), g.dtype).at[tokens].add(g)
    m = B1 * m + (1 - B1) * grad
    v = B2 * v + (1 - B2) * grad * grad
    mh = m / (1 - B1 ** step)
    vh = v / (1 - B2 ** step)
    table = table - LR * mh / (jnp.sqrt(vh) + EPS)
    return table, m, v


def hostdedup_step(state, unique_ids, slots, valid, g, step):
    table, m, v = state
    C = unique_ids.shape[0]
    gr = jnp.zeros((C, E), g.dtype).at[slots].add(g)
    mr = B1 * m[unique_ids] + (1 - B1) * gr
    vr = B2 * v[unique_ids] + (1 - B2) * gr * gr
    mh = mr / (1 - B1 ** step)
    vh = vr / (1 - B2 ** step)
    upd = (LR * mh / (jnp.sqrt(vh) + EPS)) * valid[:, None]
    table = table.at[unique_ids].add(-upd)
    m = m.at[unique_ids].add((mr - m[unique_ids]) * valid[:, None])
    v = v.at[unique_ids].add((vr - v[unique_ids]) * valid[:, None])
    return table, m, v


def devsort_step(state, tokens, g, step):
    table, m, v = state
    order = jnp.argsort(tokens)
    grad = jax.ops.segment_sum(g[order], tokens[order], num_segments=V,
                               indices_are_sorted=True)
    m = B1 * m + (1 - B1) * grad
    v = B2 * v + (1 - B2) * grad * grad
    mh = m / (1 - B1 ** step)
    vh = v / (1 - B2 ** step)
    table = table - LR * mh / (jnp.sqrt(vh) + EPS)
    return table, m, v


def main():
    rng = np.random.default_rng(0)
    g_np = rng.standard_normal((M, E)).astype(np.float32)
    g = jnp.asarray(g_np)
    step = jnp.asarray(2.0)

    print(f"bs={bs} M={M} V={V} E={E} device={jax.devices()[0]}")
    for dist in ("uniform", "zipf"):
        if dist == "uniform":
            tokens_np = rng.integers(0, V, M, dtype=np.int64)
        else:
            tokens_np = zipf_tokens(rng, M).astype(np.int64)
        uniq = np.unique(tokens_np)
        print(f"\n[{dist}] unique tokens/batch: {len(uniq)} "
              f"({len(uniq)/V*100:.1f}% of vocab)")
        tokens = jnp.asarray(tokens_np.astype(np.int32))

        def mkstate():
            return (jnp.zeros((V, E), jnp.float32),
                    jnp.zeros((V, E), jnp.float32),
                    jnp.zeros((V, E), jnp.float32))

        ms = timed(dense_step, mkstate(), tokens, g, step)
        print(f"  dense scatter + dense adam      {ms:8.2f} ms")

        # host dedup (this cost rides the prefetch thread in production)
        t0 = time.perf_counter()
        unique_np, slots_np = np.unique(tokens_np, return_inverse=True)
        host_ms = (time.perf_counter() - t0) * 1000
        C = 1 << int(np.ceil(np.log2(max(len(unique_np), 8))))
        valid_np = np.zeros(C, np.float32)
        valid_np[: len(unique_np)] = 1.0
        upad = np.zeros(C, np.int64)
        upad[: len(unique_np)] = unique_np
        ms = timed(hostdedup_step, mkstate(),
                   jnp.asarray(upad.astype(np.int32)),
                   jnp.asarray(slots_np.astype(np.int32)),
                   jnp.asarray(valid_np), g, step)
        print(f"  hostdedup C={C:<7d} rowwise adam {ms:8.2f} ms"
              f"   (+{host_ms:.1f} ms host np.unique, prefetch-hidden)")

        ms = timed(devsort_step, mkstate(), tokens, g, step)
        print(f"  devsort segsum + dense adam     {ms:8.2f} ms")


if __name__ == "__main__":
    main()

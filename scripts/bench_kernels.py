#!/usr/bin/env python
"""Microbenchmarks on the attached accelerator:

1. fused pallas news-encoder (fwd and fwd+bwd) vs the XLA reference math
2. embedding-gradient strategies: autodiff scatter-add vs
   sort+segment-sum+unique-scatter

  python scripts/bench_kernels.py [encoder] [embgrad]
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

import os

N = int(os.environ.get("KBENCH_N", "1600"))
T, DIN, HEADS, HEAD_DIM, A = 30, 1024, 20, 20, 200
VOCAB, EMB = 250_002, 1024
STEPS, WARMUP = int(os.environ.get("KBENCH_STEPS", "8")), 3


def timed(fn, *args):
    """Device-only ms/step: STEPS iterations inside one jitted lax.scan,
    each chained through the carry (a bare python loop with
    block_until_ready under-measures through the remote runtime — unused
    intermediate dispatches are not forced)."""
    first = args[0]

    @jax.jit
    def loop(*a):
        def body(carry, _):
            out = fn(carry, *a[1:])
            # probe every output leaf so nothing is DCE'd inside the scan
            probe = sum(
                l.ravel()[0].astype(carry.dtype)
                for l in jax.tree_util.tree_leaves(out)
                if hasattr(l, "ravel") and l.size
            )
            return carry + probe * 1e-20, ()

        c, _ = jax.lax.scan(body, a[0], None, length=STEPS)
        return c.ravel()[0]

    _ = float(loop(*args))  # compile + warm
    t0 = time.perf_counter()
    val = float(loop(*args))
    return (time.perf_counter() - t0) / STEPS * 1000.0


def bench_encoder():
    from ebnerd_tpu.ops.news_encoder import (
        fused_news_encoder,
        news_encoder,
        news_encoder_reference,
    )

    rng = np.random.default_rng(0)
    d = HEADS * HEAD_DIM
    mk = lambda *s, sc=0.05: jnp.asarray(rng.standard_normal(s, dtype=np.float32) * sc)
    x = mk(N, T, DIN, sc=1.0)
    args = (x, mk(DIN, d), mk(DIN, d), mk(DIN, d), mk(d, A), mk(A), mk(A, 1))

    bf16_args = tuple(a.astype(jnp.bfloat16) for a in args)
    ref = jax.jit(partial(news_encoder_reference, num_heads=HEADS))
    expected = ref(*args)
    print(f"xla fwd fp32            {timed(ref, *args):8.2f} ms", flush=True)
    print(f"xla fwd bf16            {timed(ref, *bf16_args):8.2f} ms", flush=True)
    for cd, blocks, a_ in (("float32", (8, 16), args),
                           ("bfloat16", (8, 16, 32), (bf16_args[0],) + args[1:])):
        for block in blocks:
            fused = jax.jit(partial(fused_news_encoder, num_heads=HEADS,
                                    block_n=block, compute_dtype=cd))
            try:
                err = float(jnp.max(jnp.abs(fused(*a_) - expected)))
                print(f"pallas fwd {cd[:4]} block={block:<3}"
                      f"{timed(fused, *a_):8.2f} ms   maxerr {err:.2e}", flush=True)
            except Exception as e:
                print(f"pallas fwd {cd[:4]} block={block}: FAILED "
                      f"{type(e).__name__}: {str(e)[:110]}", flush=True)

    def loss_ref(*a):
        return jnp.sum(news_encoder_reference(*a, num_heads=HEADS))

    gref = jax.jit(jax.grad(loss_ref, argnums=tuple(range(7))))
    g2 = gref(*args)
    print(f"xla fwd+bwd fp32        {timed(gref, *args):8.2f} ms", flush=True)
    print(f"xla fwd+bwd bf16        {timed(gref, *bf16_args):8.2f} ms", flush=True)
    dummy_mask = jnp.ones((8, 128), jnp.float32)
    for cd, blocks, a_ in (("float32", (8,), args),
                           ("bfloat16", (8, 16), (bf16_args[0],) + args[1:])):
        for block in blocks:
            def loss_fused(*a, _b=block, _cd=cd):
                return jnp.sum(news_encoder(*a, dummy_mask, None, HEADS, _b, False,
                                            1.0, _cd))

            gfused = jax.jit(jax.grad(loss_fused, argnums=tuple(range(7))))
            try:
                g1 = gfused(*a_)
                err = max(float(jnp.max(jnp.abs(x_.astype(jnp.float32) - y_)))
                          for x_, y_ in zip(g1, g2))
                print(f"pallas fwd+bwd {cd[:4]} block={block:<3}"
                      f"{timed(gfused, *a_):8.2f} ms   maxerr {err:.2e}", flush=True)
            except Exception as e:
                print(f"pallas fwd+bwd {cd[:4]} block={block}: FAILED "
                      f"{type(e).__name__}: {str(e)[:110]}", flush=True)


def bench_embgrad():
    rng = np.random.default_rng(0)
    n_tok = 256 * 25 * 30  # batch 256, 25 articles, 30 tokens
    ids = jnp.asarray(rng.integers(0, VOCAB, n_tok).astype(np.int32))
    table = jnp.asarray(rng.standard_normal((VOCAB, EMB), dtype=np.float32) * 0.02)
    g = jnp.asarray(rng.standard_normal((n_tok, EMB), dtype=np.float32))

    @jax.jit
    def autodiff_scatter(table, ids, g):
        def f(tbl):
            return jnp.sum(tbl[ids] * g)

        return jax.grad(f)(table)

    @jax.jit
    def sorted_unique_scatter(table, ids, g):
        order = jnp.argsort(ids)
        sid, sg = ids[order], g[order]
        # segment boundaries of equal ids
        first = jnp.concatenate([jnp.ones(1, bool), sid[1:] != sid[:-1]])
        seg = jnp.cumsum(first) - 1
        summed = jax.ops.segment_sum(sg, seg, num_segments=n_tok)
        uids = jnp.where(first, sid, -1)
        uids = jax.ops.segment_max(jnp.where(first, sid, -1), seg, num_segments=n_tok)
        out = jnp.zeros_like(table)
        return out.at[uids].add(summed, mode="drop", unique_indices=True)

    d1 = timed(autodiff_scatter, table, ids, g)
    print(f"embgrad autodiff scatter  {d1:8.2f} ms", flush=True)
    try:
        a = autodiff_scatter(table, ids, g)
        b = sorted_unique_scatter(table, ids, g)
        err = float(jnp.max(jnp.abs(a - b)))
        d2 = timed(sorted_unique_scatter, table, ids, g)
        print(f"embgrad sort+segsum       {d2:8.2f} ms   maxerr {err:.2e}", flush=True)
    except Exception as e:
        print(f"embgrad sort+segsum: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"encoder", "embgrad"}
    print(f"device={jax.devices()[0]}")
    if "encoder" in which:
        bench_encoder()
    if "embgrad" in which:
        bench_embgrad()

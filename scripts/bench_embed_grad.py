#!/usr/bin/env python
"""Microbenchmark: strategies for the word-embedding gradient scatter.

The NRMS train step's single most expensive op (STATUS.md: ~48ms of a
~150ms bs256 fp32 step) is the scatter-add of [B*(H+K)*T, E] token
gradients into the [V, E] word-embedding table, followed by dense Adam
over the full table. Candidate strategies, all measured on the attached
device with the scan-chained timer (lazy-dispatch-safe):

  plain      grad = zeros(V, E).at[ids].add(g)           (what jax.grad of
             a gather emits — XLA scatter with duplicate indices)
  sorted     sort ids (argsort) first, scatter with indices_are_sorted=True
  seg_sorted sort + jax.ops.segment_sum(num_segments=V, indices_are_sorted)
  onehot_blk per 8k-vocab block: one_hot(ids_in_block) @ g on the MXU
             (turns the scatter into matmuls; FLOPs V*N*E/blk... measured)

Run: python scripts/bench_embed_grad.py [N] [V] [E]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ebnerd_tpu.utils import compile_cache  # noqa: E402  (persistent XLA cache)

import jax
import jax.numpy as jnp

STEPS = 10

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256 * 25 * 30  # bs256 tokens
V = int(sys.argv[2]) if len(sys.argv) > 2 else 250_002
E = int(sys.argv[3]) if len(sys.argv) > 3 else 1_024


def timed(fn, *args):
    @jax.jit
    def loop(*a):
        def body(carry, _):
            g = a[1] + carry
            out = fn(a[0], g, *a[2:])
            return out.ravel()[0].astype(jnp.float32) * 1e-30, ()

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=STEPS)
        return c

    _ = float(loop(*args))
    t0 = time.perf_counter()
    _ = float(loop(*args))
    return (time.perf_counter() - t0) / STEPS * 1000.0


def main():
    r = np.random.default_rng(0)
    ids = jnp.asarray(r.integers(0, V, N, dtype=np.int32))
    g = jnp.asarray(r.standard_normal((N, E), dtype=np.float32))

    def plain(ids, g):
        return jnp.zeros((V, E), g.dtype).at[ids].add(g)

    def sorted_scatter(ids, g):
        order = jnp.argsort(ids)
        return jnp.zeros((V, E), g.dtype).at[ids[order]].add(
            g[order], indices_are_sorted=True
        )

    def seg_sorted(ids, g):
        order = jnp.argsort(ids)
        return jax.ops.segment_sum(
            g[order], ids[order], num_segments=V, indices_are_sorted=True
        )

    def plain_bf16(ids, g):
        return jnp.zeros((V, E), jnp.bfloat16).at[ids].add(g.astype(jnp.bfloat16))

    print(f"N={N} V={V} E={E} device={jax.devices()[0]}")
    for name, fn in [
        ("plain scatter-add", plain),
        ("sorted scatter-add", sorted_scatter),
        ("sorted segment_sum", seg_sorted),
        ("plain scatter-add bf16", plain_bf16),
    ]:
        try:
            ms = timed(fn, ids, g)
            print(f"{name:28s} {ms:8.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B: WordEmbed cast-then-gather (current) vs gather-then-cast.

The bf16 model currently casts the whole [V, E] table to bf16 BEFORE the
token gather; the backward therefore scatter-adds bf16 token grads into a
bf16 [V, E] buffer and casts THAT to fp32 for Adam. Gather-then-cast
flips it: fp32 rows are gathered (2x forward gather read), dx is cast at
[C, T, E] and scatter-accumulated directly in fp32 — no [V, E] cast pass
and fp32 accumulation of duplicate-token grads (closer to the fp32
reference numerics).

Run on the chip: python scripts/probe_embed_cast.py
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("BENCH_STEPS", "30")

import numpy as np


def run(variant: str) -> None:
    import jax
    import jax.numpy as jnp

    import bench
    from ebnerd_tpu.models import layers as L

    if variant == "gather_then_cast":
        from flax import linen as nn

        def call(self, tokens):
            if self.has_variable("emb_over", "table"):
                table = self.get_variable("emb_over", "table")
            else:
                table = self.param(
                    "embedding", self.embedding_init,
                    (self.num_embeddings, self.features), jnp.float32)
            rows = jnp.take(table, tokens, axis=0)
            if self.dtype is not None:
                rows = rows.astype(self.dtype)
            return rows

        from flax.linen.module import wrap_method_once

        L.WordEmbed.__call__ = wrap_method_once(nn.compact(call))
    bench.main()


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "gather_then_cast")

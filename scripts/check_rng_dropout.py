#!/usr/bin/env python
"""TPU check of the fused kernel's on-chip-PRNG dropout path (no interpret
lowering exists for the Mosaic PRNG, so this can't be a CPU pytest).

Strategy: the Mosaic PRNG is deterministic per (seed, shape) ACROSS
kernels (verified here first), so a tiny mask-dump kernel regenerates the
exact masks the fused forward/backward draw. The rng path is then
validated against the EXTERNAL-mask path — whose forward and gradients
are pinned against XLA autodiff by tests/ops/test_news_encoder.py — with
those dumped masks:

1. determinism: same seed -> identical forward; different seed differs.
2. keep-rate: empirical mask density within 1% of keep_prob.
3. attention-dropout parity: rng path (emb_keep=1) vs external path with
   the dumped stream-1 mask — outputs AND all analytic grads must agree.
4. embedding-dropout parity: rng path (emb_keep<1) vs external path fed
   pre-masked x — outputs and grads must agree (dx compared through the
   mask chain rule).

  python scripts/check_rng_dropout.py
"""
from __future__ import annotations

import sys
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ebnerd_tpu.utils import compile_cache  # noqa: E402  (persistent XLA cache)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ebnerd_tpu.ops.news_encoder import _prng_mask, news_encoder

N, T, E, D, A, H = 64, 30, 128, 64, 32, 4
KEEP = 0.8
SEED = 123


def dump_masks(seed: int, keep: float) -> tuple[np.ndarray, np.ndarray]:
    """Regenerate the fused kernel's dropout masks [N*T, E] (stream 0,
    embedding) and [N*T, D] (stream 1, attention-out) for ``seed``.
    Values are 0 or 1/keep (inverted-dropout scale), exactly as the
    kernels apply them."""

    def kern(seed_ref, m0_ref, m1_ref):
        sd = seed_ref[0, 0]
        m0_ref[:] = _prng_mask(sd, 0, 0, N // 8, 8 * T, E, keep)
        m1_ref[:] = _prng_mask(sd, 1, 0, N // 8, 8 * T, D, keep)

    m0, m1 = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_shape=(jax.ShapeDtypeStruct((N * T, E), jnp.float32),
                   jax.ShapeDtypeStruct((N * T, D), jnp.float32)),
    )(jnp.full((1, 1), seed, jnp.int32))
    return np.asarray(m0), np.asarray(m1)


def main():
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((N, T, E)).astype(np.float32))
    wq = jnp.asarray((r.standard_normal((E, D)) * 0.05).astype(np.float32))
    wk = jnp.asarray((r.standard_normal((E, D)) * 0.05).astype(np.float32))
    wv = jnp.asarray((r.standard_normal((E, D)) * 0.05).astype(np.float32))
    w = jnp.asarray((r.standard_normal((D, A)) * 0.05).astype(np.float32))
    b = jnp.zeros((A,), jnp.float32)
    q = jnp.asarray((r.standard_normal((A, 1)) * 0.05).astype(np.float32))
    ones = jnp.ones((8, 128), jnp.float32)
    seed = jnp.asarray([SEED], jnp.int32)
    seed2 = jnp.asarray([SEED + 1], jnp.int32)
    cos = jnp.cos(jnp.arange(N * D).reshape(N, D) * 0.01)

    def fwd_rng(x_, wq_, wk_, wv_, w_, b_, q_, sd, emb_keep):
        return news_encoder(x_, wq_, wk_, wv_, w_, b_, q_, ones, sd,
                            H, 16, False, KEEP, "float32", emb_keep)

    # -- 1. determinism ---------------------------------------------------
    f = jax.jit(partial(fwd_rng, emb_keep=KEEP))
    o1 = np.asarray(f(x, wq, wk, wv, w, b, q, seed))
    o1b = np.asarray(f(x, wq, wk, wv, w, b, q, seed))
    o2 = np.asarray(f(x, wq, wk, wv, w, b, q, seed2))
    assert np.array_equal(o1, o1b), "same seed must reproduce"
    assert not np.array_equal(o1, o2), "different seed must differ"
    assert np.isfinite(o1).all()
    print("determinism: ok")

    # -- 2. mask statistics ----------------------------------------------
    m0, m1 = dump_masks(SEED, KEEP)
    for name, m in (("emb", m0), ("att", m1)):
        rate = (m > 0).mean()
        assert abs(rate - KEEP) < 0.01, f"{name} keep rate {rate}"
        print(f"{name} mask keep rate: {rate:.4f} (target {KEEP})")

    # -- 3. attention-dropout parity (emb dropout off) --------------------
    m1_01 = jnp.asarray((m1 > 0).astype(np.float32).reshape(N, T, D))

    def fwd_ext(x_, wq_, wk_, wv_, w_, b_, q_):
        return news_encoder(x_, wq_, wk_, wv_, w_, b_, q_, m1_01, None,
                            H, 16, False, KEEP, "float32", 1.0)

    def loss_of(fwd):
        def loss(x_, wq_, wk_, wv_, w_, b_, q_):
            return jnp.sum(fwd(x_, wq_, wk_, wv_, w_, b_, q_) * cos)
        return loss

    args = (x, wq, wk, wv, w, b, q)
    o_rng = np.asarray(jax.jit(partial(fwd_rng, sd=seed, emb_keep=1.0))(*args))
    o_ext = np.asarray(jax.jit(fwd_ext)(*args))
    err = np.abs(o_rng - o_ext).max()
    print(f"att-dropout fwd rng-vs-external max diff: {err:.2e}")
    assert err < 1e-4

    g_rng = jax.jit(jax.grad(loss_of(partial(fwd_rng, sd=seed, emb_keep=1.0)),
                             argnums=tuple(range(7))))(*args)
    g_ext = jax.jit(jax.grad(loss_of(fwd_ext), argnums=tuple(range(7))))(*args)
    for i, nm in enumerate(["x", "wq", "wk", "wv", "w", "b", "q"]):
        ra = np.asarray(g_rng[i]); rb = np.asarray(g_ext[i])
        rel = np.abs(ra - rb).max() / (np.abs(rb).max() + 1e-12)
        print(f"  grad[{nm}] rel diff {rel:.2e}")
        assert rel < 1e-4, f"grad {nm} mismatch"
    print("attention-dropout gradients: ok")

    # -- 4. embedding-dropout parity --------------------------------------
    x_masked = x * jnp.asarray(m0.reshape(N, T, E))  # includes 1/keep scale

    o_rng = np.asarray(jax.jit(partial(fwd_rng, sd=seed, emb_keep=KEEP))(*args))
    o_ext = np.asarray(jax.jit(fwd_ext)(x_masked, *args[1:]))
    err = np.abs(o_rng - o_ext).max()
    print(f"emb-dropout fwd rng-vs-external max diff: {err:.2e}")
    assert err < 1e-4

    g_rng = jax.jit(jax.grad(loss_of(partial(fwd_rng, sd=seed, emb_keep=KEEP)),
                             argnums=tuple(range(7))))(*args)
    g_ext = jax.jit(jax.grad(loss_of(fwd_ext),
                             argnums=tuple(range(7))))(x_masked, *args[1:])
    # dL/dx through the emb mask: rng path reports it directly; external
    # path reports dL/dx_masked -> chain rule multiplies the mask back
    gx_ext = np.asarray(g_ext[0]) * m0.reshape(N, T, E)
    rel = np.abs(np.asarray(g_rng[0]) - gx_ext).max() / (np.abs(gx_ext).max() + 1e-12)
    print(f"  grad[x] (chain-ruled) rel diff {rel:.2e}")
    assert rel < 1e-4
    for i, nm in enumerate(["wq", "wk", "wv", "w", "b", "q"], start=1):
        ra = np.asarray(g_rng[i]); rb = np.asarray(g_ext[i])
        rel = np.abs(ra - rb).max() / (np.abs(rb).max() + 1e-12)
        print(f"  grad[{nm}] rel diff {rel:.2e}")
        assert rel < 1e-4, f"grad {nm} mismatch"
    print("embedding-dropout gradients: ok")
    print("RNG-dropout path: ALL OK")


if __name__ == "__main__":
    main()

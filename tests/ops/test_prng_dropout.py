"""Seed-recompute PRNG dropout (ops/dropout.py) — CPU-side contract.

The Mosaic PRNG path is TPU-only (no interpret lowering, like the NRMS
kernel's rng mode); these tests pin the parts that must hold on any
backend: the fallback stream's determinism, inverted-dropout statistics,
and — the property the custom VJP exists for — that the backward applies
EXACTLY the forward's mask (dx = dy * mask / keep from the same seed).
"""
import jax
import jax.numpy as jnp
import numpy as np

from ebnerd_tpu.ops.dropout import prng_dropout


def test_deterministic_per_seed():
    x = jnp.ones((333, 70), jnp.float32)
    seed = jnp.asarray([123], jnp.int32)
    a = prng_dropout(x, seed, 0.8, use_kernel=False)
    b = prng_dropout(x, seed, 0.8, use_kernel=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = prng_dropout(x, jnp.asarray([124], jnp.int32), 0.8, use_kernel=False)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_inverted_dropout_statistics():
    x = jnp.ones((512, 257), jnp.float32)
    keep = 0.8
    y = np.asarray(prng_dropout(x, jnp.asarray([7], jnp.int32), keep,
                                use_kernel=False))
    kept = y > 0
    assert abs(kept.mean() - keep) < 0.01
    np.testing.assert_allclose(y[kept], 1.0 / keep, rtol=1e-6)
    np.testing.assert_allclose(y.mean(), 1.0, atol=0.02)


def test_backward_reapplies_identical_mask():
    """grad(sum(dropout(x))) must equal mask/keep — the same mask the
    forward drew (regenerated from the seed, never stored)."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(97, 33)),
                    jnp.float32)
    seed = jnp.asarray([42], jnp.int32)
    keep = 0.7

    y, vjp = jax.vjp(lambda v: prng_dropout(v, seed, keep, False), x)
    (dx,) = vjp(jnp.ones_like(y))
    mask_fwd = (np.asarray(y) != 0)
    np.testing.assert_array_equal(np.asarray(dx) != 0, mask_fwd)
    np.testing.assert_allclose(np.asarray(dx)[mask_fwd], 1.0 / keep,
                               rtol=1e-6)


def test_bf16_roundtrip_dtype():
    x = jnp.ones((64, 128), jnp.bfloat16)
    y = prng_dropout(x, jnp.asarray([1], jnp.int32), 0.5, use_kernel=False)
    assert y.dtype == jnp.bfloat16

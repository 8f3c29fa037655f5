"""Seed-recompute PRNG dropout — a standalone Pallas kernel.

Measured motivation (r5, bs4096 + dedup): the conv families lose ~40% of
their train step to framework dropout — NPA 330.5 -> 179.0 ms and NAML
257.8 -> 157.4 ms with dropout off. jax.random dropout (a) generates a
u32 rng-bit tensor the size of the activation (GBs/step at these
shapes), (b) stores the mask between forward and backward, and (c)
breaks producer/consumer fusions around the `where`. The NRMS fused
encoder already solved this with its in-kernel PRNG
(ops/news_encoder.py); this module packages the same trick as a
DROP-IN elementwise kernel usable by every other model:

- masks are generated on-chip per block from `pltpu.prng_random_bits`,
  seeded by (step seed, block index) — no HBM bit buffers;
- the custom-VJP backward RE-GENERATES the identical mask from the same
  seeds (dx = dy * mask / keep is the same kernel applied to dy) — no
  stored masks;
- HBM traffic is exactly read-x/write-y forward and read-dy/write-dx
  backward — the floor for an elementwise op.

Stream semantics: Bernoulli(keep) per element up to the 2^-24 threshold
quantization, deterministic per (seed, block) — a different (still
deterministic) stream than jax.random, the same deliberate deviation
class as the NRMS kernel's `fused_rng_dropout` (models/newsrec.py).

Off-TPU (CPU tests, interpret runs) `prng_dropout` falls back to a
jax.random mask derived from the same seed — Mosaic's PRNG has no
interpret lowering (reference note: ops/news_encoder.py:268).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["prng_dropout"]

_WIDTH = 1024     # flat lane width (multiple of 128)
_BLOCK_ROWS = 512  # rows per grid block ([512, 1024] bf16 = 1 MB VMEM)


def _kernel(seed_ref, x_ref, y_ref, *, keep: float):
    pid = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0, 0], pid)
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    thr = jnp.uint32(int(keep * (1 << 24)))
    mask = ((bits >> 8) < thr).astype(jnp.float32) / keep
    y_ref[...] = (x_ref[...].astype(jnp.float32) * mask).astype(y_ref.dtype)


@partial(jax.jit, static_argnames=("keep",))
def _apply_kernel(x2d: jnp.ndarray, seed: jnp.ndarray, keep: float):
    rows = x2d.shape[0]
    grid = rows // _BLOCK_ROWS
    return pl.pallas_call(
        partial(_kernel, keep=keep),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((_BLOCK_ROWS, _WIDTH), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, _WIDTH), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
    )(seed.reshape(1, 1), x2d)


def _mask_apply(x: jnp.ndarray, seed: jnp.ndarray, keep: float,
                use_kernel: bool) -> jnp.ndarray:
    """y = x * mask(seed)/keep with the mask regenerated from ``seed`` —
    shared by forward (on x) and backward (on dy)."""
    if not use_kernel:
        # jax.random fallback (CPU/interpret): same determinism contract,
        # different stream
        k = jax.random.fold_in(jax.random.key(0), seed.reshape(()))
        mask = jax.random.bernoulli(k, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))
    flat = x.reshape(-1)
    n = flat.shape[0]
    chunk = _BLOCK_ROWS * _WIDTH
    padded = (n + chunk - 1) // chunk * chunk
    if padded != n:
        flat = jnp.pad(flat, (0, padded - n))
    y = _apply_kernel(flat.reshape(-1, _WIDTH), seed, keep)
    return y.reshape(-1)[:n].reshape(x.shape)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def prng_dropout(x: jnp.ndarray, seed: jnp.ndarray, keep: float,
                 use_kernel: bool = True) -> jnp.ndarray:
    """Inverted dropout with on-chip PRNG masks regenerated (not stored)
    in the backward. ``seed``: int32 size-1 array (one per step/layer
    from the jax dropout stream). ``keep``: static keep probability."""
    return _mask_apply(x, seed, keep, use_kernel)


def _fwd(x, seed, keep, use_kernel):
    return _mask_apply(x, seed, keep, use_kernel), seed


def _bwd(keep, use_kernel, seed, dy):
    # identical mask from the identical seeds: dx = dy * mask / keep
    return _mask_apply(dy, seed, keep, use_kernel), None


prng_dropout.defvjp(_fwd, _bwd)

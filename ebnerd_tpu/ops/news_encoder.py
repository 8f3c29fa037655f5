"""Pallas TPU kernel: fused NRMS news-encoder core.

Fuses the per-article chain
    Q/K/V projections -> multi-head self-attention -> additive-attention
    pooling
(reference math: SelfAttention + AttLayer2, src/ebrec/models/newsrec/
layers.py:107-270 and :7-104) into one kernel that keeps every
intermediate in VMEM.

Why: with N = batch*(history+candidates) articles per step, the XLA path
materializes Q, K, V, the attention probabilities [N, h, T, T], and the
attended values in HBM — several hundred MB per step for the headline
config. The fused kernel blocks over articles and touches HBM only for
the input embeddings, the weights, and the [N, D] output.

Numerics: attention uses the NRMS convention (no projection biases, no
output projection, scale 1/sqrt(head_dim)); pooling subtracts the row max
before exp (same weights as the reference's raw exp, stable). Matches
``SelfAttention`` + ``AdditiveAttention`` in models/layers.py to ~1e-5.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_news_encoder", "news_encoder", "news_encoder_reference"]


def _cdot(a, b, dims, cdt):
    """dot_general with operands cast to the compute dtype (bf16 on the
    MXU's native path) and fp32 accumulation."""
    return jax.lax.dot_general(a.astype(cdt), b.astype(cdt), (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _bdot(a, b, dims, bdims, cdt):
    """Batched variant of _cdot."""
    return jax.lax.dot_general(a.astype(cdt), b.astype(cdt), (dims, bdims),
                               preferred_element_type=jnp.float32)


def _row_head_mask(t: int, num_heads: int, head_dim: int, cdt) -> jnp.ndarray:
    """[h*t, D] 0/1 matrix: row h*t + k selects head h's feature slice
    (MASK[r, d] = 1 iff r // t == d // head_dim)."""
    d = num_heads * head_dim
    rs = jax.lax.broadcasted_iota(jnp.int32, (num_heads * t, d), 0)
    ds = jax.lax.broadcasted_iota(jnp.int32, (num_heads * t, d), 1)
    return (rs // t == ds // head_dim).astype(cdt)


def _head_sum_matrix(t: int, num_heads: int, cdt) -> jnp.ndarray:
    """[h*t, h] 0/1 matrix summing each head's contiguous t-wide row group:
    SH[r, j] = 1 iff r // t == j."""
    rs = jax.lax.broadcasted_iota(jnp.int32, (num_heads * t, num_heads), 0)
    js = jax.lax.broadcasted_iota(jnp.int32, (num_heads * t, num_heads), 1)
    return (rs // t == js).astype(cdt)


def _head_masked(x3: jnp.ndarray, mask_ht: jnp.ndarray, cdt) -> jnp.ndarray:
    """[nb, t, D] -> [nb, h*t, D] with row (h*t + k) = x3[:, k] * head-mask h.

    One tile-repeat + one VPU multiply; no transposes. Turns per-head
    attention into ONE batched matmul with a D-wide contraction (see
    _mhsa): the head mask zeroes cross-head terms, so
    sum_d q[d] * (k[d] * MASK[h*t+k, d]) = the head-h dot product.
    All ops stay 3-D (Mosaic, as deployed here, rejects 4-D
    broadcasts/reshapes); pltpu.repeat tiles along the row axis in one op
    (a 20-operand concat made Mosaic compile times explode with block_n).
    """
    h = mask_ht.shape[0] // x3.shape[1]
    xc = x3.astype(cdt)
    return pltpu.repeat(xc, h, axis=1) * mask_ht[None]


def _softmax_per_head(logits: jnp.ndarray, sh: jnp.ndarray, cdt) -> jnp.ndarray:
    """Softmax over each head's contiguous t-wide slice of the h*t minor
    axis of [nb, q, h*t], via matmul-based segment sums (SH from
    _head_sum_matrix). Stability: subtract the GLOBAL row max — softmax is
    shift-invariant per head, and the global max bounds every head's."""
    nb, q, ht = logits.shape
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    ssum = _cdot(e.reshape(nb * q, ht), sh, ((1,), (0,)), cdt)      # [nb*q, h]
    denom = _cdot(ssum, sh, ((1,), (1,)), cdt).reshape(nb, q, ht)   # broadcast back
    return e / (denom + 1e-30)


def _sum_heads_masked(y: jnp.ndarray, mask_ht: jnp.ndarray, t: int) -> jnp.ndarray:
    """[nb, h*t, D] -> [nb, t, D]: sum_h y[:, h*t+k, :] * MASK[h*t+k, :]."""
    h = mask_ht.shape[0] // t
    ym = y * mask_ht[None].astype(y.dtype)
    acc = ym[:, 0:t, :]
    for i in range(1, h):
        acc = acc + ym[:, i * t:(i + 1) * t, :]
    return acc


def _mhsa(q3, k3, v3, num_heads, head_dim, cdt):
    """Multi-head attention as two big batched matmuls (masked-matmul
    formulation).

    head_dim (20) and t (30) are far below the 128-lane MXU tile, so the
    textbook per-head batched dot wastes >90% of the MXU and dominates
    the step (measured: ~70ms per step at bs512 vs ~5ms here). Instead,
    head-masked copies of K and V ([nb, h*t, D]) make the contraction
    dimension D = h*head_dim (400): FLOPs inflate by h on zeros, but
    every matmul runs at native MXU efficiency. No 4D transposes
    (Mosaic, as deployed here, rejects them).
    """
    nb, t, d = q3.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
    mask_ht = _row_head_mask(t, num_heads, head_dim, cdt)
    sh = _head_sum_matrix(t, num_heads, jnp.float32)
    k_masked = _head_masked(k3, mask_ht, cdt)             # [nb, h*t, D]
    v_masked = _head_masked(v3, mask_ht, cdt)
    # logits[n, q, h*t + k] = <q3[n, q], k_masked[n, h*t + k]>
    logits = _bdot(q3, k_masked, ((2,), (2,)), ((0,), (0,)), cdt) * scale
    probs = _softmax_per_head(logits, sh, jnp.float32)
    # out[n, q, d] = sum_{h,k} probs[n, q, h*t+k] * v_masked[n, h*t+k, d]
    return _bdot(probs, v_masked, ((2,), (1,)), ((0,), (0,)), cdt)  # [nb, t, D]


def _qkv_stride(d: int) -> int:
    """Lane-aligned stride for one projection inside the packed QKV weight
    (slices at multiples of 128 avoid relayouts)."""
    return -(-d // 128) * 128


def _pack_qkv(wq, wk, wv, cdt) -> jnp.ndarray:
    """[din, d] x3 -> [din, 3*stride] zero-padded packed weight. ONE wide
    matmul instead of three narrow ones: measured on v5e, a
    [*,1024]@[1024,400] GEMM runs at ~25 TFLOP/s while ~1200-wide output
    reaches ~58 — narrow-N output is the bottleneck, not FLOPs."""
    d = wq.shape[1]
    s = _qkv_stride(d)
    pad = ((0, 0), (0, s - d))
    return jnp.concatenate(
        [jnp.pad(w, pad) for w in (wq, wk, wv)], axis=1).astype(cdt)


def _prng_mask(seed, stream: int, gsub0, n_sub: int, rows8: int, width: int,
               keep: float) -> jnp.ndarray:
    """Deterministic inverted-dropout mask [n_sub*rows8, width] from the
    on-chip PRNG, seeded per GLOBAL 8-article sub-block so the recompute
    backward regenerates the identical mask regardless of its block size
    (both block sizes are multiples of 8). ``stream`` separates the
    embedding-dropout and attention-out-dropout masks."""
    thr = jnp.uint32(int(keep * (1 << 24)))
    parts = []
    for i in range(n_sub):
        # Mosaic (as deployed) supports at most TWO seed values; fold the
        # stream id (0 or 1) and the global sub-block index into one int32.
        pltpu.prng_seed(seed, (gsub0 + i) * 2 + jnp.int32(stream))
        bits = pltpu.bitcast(pltpu.prng_random_bits((rows8, width)), jnp.uint32)
        parts.append(((bits >> 8) < thr).astype(jnp.float32))
    m = parts[0] if n_sub == 1 else jnp.concatenate(parts, axis=0)
    return m / keep


def _kernel(x_ref, wqkv_ref, w_ref, b_ref, q_ref, mask_ref, nv_ref,
            out_ref, *, num_heads: int, head_dim: int,
            keep_prob: float, cdt: jnp.dtype,
            rng_dropout: bool = False, emb_keep: float = 1.0):
    """Forward block: packed QKV GEMM -> masked-matmul attention ->
    additive pooling, everything in VMEM. (A stored-residual variant that
    wrote qkv+probs to HBM for the backward was measured SLOWER than the
    recompute backward — the extra per-block DMA cost more than the
    well-overlapped recompute matmuls saved.)

    ``rng_dropout``: masks come from the on-chip PRNG (mask_ref holds the
    (1,1) int32 seed in SMEM) instead of an HBM mask tensor — no mask
    generation or traffic outside the kernel; ``emb_keep`` additionally
    applies the reference's EMBEDDING dropout (nrms.py:136) to x inside
    the kernel.

    ``nv_ref`` (SMEM (1,1) int32): number of VALID leading articles.
    Blocks entirely past it (dedup bucket padding, training/dedup.py)
    skip all compute and write zeros — the ladder buckets bound the
    compiled-program count while compute scales with real articles.
    Skipping is safe under sharding: a local row index >= n_valid implies
    the global row is padding."""
    nb, t, din = x_ref.shape
    d = num_heads * head_dim
    s = _qkv_stride(d)
    block_valid = pl.program_id(0) * nb < nv_ref[0, 0]

    @pl.when(block_valid)
    def _compute():
        x = x_ref[:].reshape(nb * t, din)
        if rng_dropout:
            seed = mask_ref[0, 0]
            gsub0 = pl.program_id(0) * (nb // 8)
            if emb_keep < 1.0:
                xm = _prng_mask(seed, 0, gsub0, nb // 8, 8 * t, din, emb_keep)
                x = (x.astype(jnp.float32) * xm).astype(cdt)
        qkv = _cdot(x, wqkv_ref[:], ((1,), (0,)), cdt)        # [nb*t, 3s]
        q = qkv[:, 0:d]
        k = qkv[:, s:s + d]
        v = qkv[:, 2 * s:2 * s + d]
        o = _mhsa(q.reshape(nb, t, d), k.reshape(nb, t, d), v.reshape(nb, t, d),
                  num_heads, head_dim, cdt).reshape(nb * t, d)
        if keep_prob < 1.0:
            # inverted dropout between attention and pooling (the
            # reference's training-mode Dropout, nrms.py:154)
            if rng_dropout:
                seed = mask_ref[0, 0]
                gsub0 = pl.program_id(0) * (nb // 8)
                o = o * _prng_mask(seed, 1, gsub0, nb // 8, 8 * t, d, keep_prob)
            else:
                o = o * mask_ref[:].reshape(nb * t, d).astype(jnp.float32) / keep_prob
        # additive attention pooling over t
        att = jnp.tanh(_cdot(o, w_ref[:], ((1,), (0,)), cdt) + b_ref[:])
        att = _cdot(att, q_ref[:], ((1,), (0,)), cdt)         # [nb*t, 1]
        att = att.reshape(nb, t)
        att = att - jnp.max(att, axis=-1, keepdims=True)
        expo = jnp.exp(att)
        weight = expo / (jnp.sum(expo, axis=-1, keepdims=True) + 1e-8)  # [nb, t]
        # VPU weighted sum over t (an M=1 batched dot wastes 7/8 MXU sublanes)
        pooled = jnp.sum(o.reshape(nb, t, d) * weight[..., None], axis=1)
        out_ref[:] = pooled.astype(jnp.float32)

    @pl.when(jnp.logical_not(block_valid))
    def _skip():
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)


@partial(jax.jit, static_argnames=("num_heads", "block_n", "interpret",
                                   "keep_prob", "compute_dtype",
                                   "emb_keep_prob"))
def fused_news_encoder(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    wk: jnp.ndarray,
    wv: jnp.ndarray,
    w_att: jnp.ndarray,
    b_att: jnp.ndarray,
    q_att: jnp.ndarray,
    *,
    num_heads: int,
    block_n: int = 8,  # sweeps: r3 bs1024 per-slot 8/16/32 -> 4,484/4,273/4,151; r4 bs1024 dedup 8 -> 14,092 vs 16 -> 13,602; 4 is below the TPU 8-row block minimum
    interpret: bool = False,
    drop_mask: jnp.ndarray | None = None,
    keep_prob: float = 1.0,
    compute_dtype: str = "float32",
    rng_seed: jnp.ndarray | None = None,
    emb_keep_prob: float = 1.0,
    n_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """x [N, T, Din] (fp32 or bf16), projections [Din, D], pooling params
    ([D, A], [A], [A, 1]) -> pooled article vectors [N, D] fp32.

    ``n_valid`` (optional int32 scalar/size-1 array): only the first
    n_valid articles are real; blocks entirely past it (dedup bucket
    padding) skip compute and emit zeros. None = all N valid.

    Dropout, two ways:
    - ``drop_mask`` [N, T, D] 0/1 + ``keep_prob``: the reference's
      attention->pooling dropout with an externally generated mask
      (works in interpret mode).
    - ``rng_seed`` (int32, any shape-1) + ``keep_prob``/``emb_keep_prob``:
      masks from the ON-CHIP PRNG — no host mask generation or HBM mask
      traffic; ``emb_keep_prob`` also applies the reference's embedding
      dropout (nrms.py:136) inside the kernel. Deterministic per seed.
      Compiled TPU only (Mosaic PRNG has no interpret lowering).
    ``compute_dtype="bfloat16"`` runs every matmul with bf16 operands and
    fp32 accumulation — the MXU's native rate — matching the numerics of
    the unfused bf16 path (flax modules with dtype=bfloat16).
    N is padded to a multiple of ``block_n`` internally.
    """
    n, t, din = x.shape
    d = wq.shape[1]
    if d % num_heads:
        raise ValueError(f"d={d} not divisible by num_heads={num_heads}")
    head_dim = d // num_heads
    s = _qkv_stride(d)
    wqkv = _pack_qkv(wq, wk, wv, jnp.dtype(compute_dtype))
    n_pad = -(-n // block_n) * block_n
    rng_dropout = rng_seed is not None and (keep_prob < 1.0 or emb_keep_prob < 1.0)
    if rng_dropout and block_n % 8:
        # the PRNG masks are seeded per 8-article sub-block so forward and
        # backward (possibly different block sizes) regenerate identically
        raise ValueError(f"rng dropout needs block_n % 8 == 0, got {block_n}")
    with_dropout = (not rng_dropout) and drop_mask is not None and keep_prob < 1.0
    if rng_dropout:
        drop_mask = jnp.asarray(rng_seed, jnp.int32).reshape(1, 1)
        mask_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)
    elif not with_dropout:
        keep_prob = 1.0
        # unused by the kernel (static keep_prob branch); tiny dummy so no
        # HBM traffic is spent on a mask in eval mode
        drop_mask = jnp.ones((8, 128), jnp.float32)
        mask_spec = pl.BlockSpec((8, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_spec = pl.BlockSpec((block_n, t, d), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0), (0, 0)))
        if with_dropout:
            drop_mask = jnp.pad(drop_mask, ((0, n_pad - n), (0, 0), (0, 0)))
    nv = jnp.asarray(n if n_valid is None else n_valid,
                     jnp.int32).reshape(1, 1)
    grid = (n_pad // block_n,)
    cdt = jnp.dtype(compute_dtype)
    out = pl.pallas_call(
        partial(_kernel, num_heads=num_heads, head_dim=head_dim,
                keep_prob=float(keep_prob), cdt=cdt,
                rng_dropout=rng_dropout,
                emb_keep=float(emb_keep_prob) if rng_dropout else 1.0),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, t, din), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((din, 3 * s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, w_att.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_att.shape[1],), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_att.shape[1], 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            mask_spec,
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_n, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, wqkv, w_att, b_att, q_att, drop_mask, nv)
    return out[:n]


def _bwd_kernel(x_ref, wqkv_ref, w_ref, b_ref, q_ref,
                mask_ref, nv_ref, g_ref,
                dx_ref, dwqkv_ref, dw_ref, db_ref, dq_ref,
                *, num_heads: int, head_dim: int, keep_prob: float,
                cdt: jnp.dtype, rng_dropout: bool = False,
                emb_keep: float = 1.0):
    """Recompute-forward backward pass for one article block; weight grads
    accumulate across sequential grid steps into revisited output blocks.
    (Recompute beats stored residuals here: reading stored qkv+probs
    blocks from HBM measured slower than redoing the well-overlapped
    matmuls.) With ``rng_dropout`` the masks are regenerated from the
    on-chip PRNG seeded per GLOBAL 8-article sub-block, so they match the
    forward's exactly even when block sizes differ.

    Blocks entirely past ``nv_ref`` (dedup bucket padding) skip: their
    incoming cotangent is exactly zero (no slot references a pad row),
    so dx is zeroed directly and their weight-grad contribution — zero
    by algebra — is never computed. Block 0 is always valid, so the
    accumulator initialization always runs."""
    nb, t, din = x_ref.shape
    d = num_heads * head_dim
    s = _qkv_stride(d)
    is_first = pl.program_id(0) == 0
    block_valid = pl.program_id(0) * nb < nv_ref[0, 0]

    @pl.when(jnp.logical_not(block_valid))
    def _skip():
        dx_ref[:] = jnp.zeros(dx_ref.shape, dx_ref.dtype)

    @pl.when(block_valid)
    def _compute():
        _bwd_body(x_ref, wqkv_ref, w_ref, b_ref, q_ref, mask_ref, g_ref,
                  dx_ref, dwqkv_ref, dw_ref, db_ref, dq_ref, is_first,
                  num_heads=num_heads, head_dim=head_dim,
                  keep_prob=keep_prob, cdt=cdt, rng_dropout=rng_dropout,
                  emb_keep=emb_keep)


def _bwd_body(x_ref, wqkv_ref, w_ref, b_ref, q_ref, mask_ref, g_ref,
              dx_ref, dwqkv_ref, dw_ref, db_ref, dq_ref, is_first,
              *, num_heads: int, head_dim: int, keep_prob: float,
              cdt: jnp.dtype, rng_dropout: bool, emb_keep: float):
    nb, t, din = x_ref.shape
    d = num_heads * head_dim
    s = _qkv_stride(d)

    x = x_ref[:].reshape(nb * t, din)
    wqkv = wqkv_ref[:]
    w_att, b_att, q_att = w_ref[:], b_ref[:], q_ref[:]
    g = g_ref[:]                                           # [nb, d]

    xmask = None
    if rng_dropout:
        seed = mask_ref[0, 0]
        gsub0 = pl.program_id(0) * (nb // 8)
        if emb_keep < 1.0:
            xmask = _prng_mask(seed, 0, gsub0, nb // 8, 8 * t, din, emb_keep)
            x = (x.astype(jnp.float32) * xmask).astype(cdt)

    # ---- recompute forward (masked-matmul attention; see _mhsa) ----
    qkv = _cdot(x, wqkv, ((1,), (0,)), cdt)               # [nb*t, 3s]
    q3 = qkv[:, 0:d].reshape(nb, t, d)
    k3 = qkv[:, s:s + d].reshape(nb, t, d)
    v3 = qkv[:, 2 * s:2 * s + d].reshape(nb, t, d)
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
    mask_ht = _row_head_mask(t, num_heads, head_dim, cdt)
    sh = _head_sum_matrix(t, num_heads, jnp.float32)
    k_masked = _head_masked(k3, mask_ht, cdt)             # [nb, h*t, d]
    v_masked = _head_masked(v3, mask_ht, cdt)
    logits = _bdot(q3, k_masked, ((2,), (2,)), ((0,), (0,)), cdt) * scale
    probs = _softmax_per_head(logits, sh, jnp.float32)
    o = _bdot(probs, v_masked, ((2,), (1,)), ((0,), (0,)), cdt).reshape(nb * t, d)
    if keep_prob < 1.0:
        if rng_dropout:
            drop_scale = _prng_mask(seed, 1, gsub0, nb // 8, 8 * t, d, keep_prob)
        else:
            drop_scale = mask_ref[:].reshape(nb * t, d).astype(jnp.float32) / keep_prob
        o = o * drop_scale  # everything downstream sees the dropped values
    z = _cdot(o, w_att, ((1,), (0,)), cdt) + b_att
    hact = jnp.tanh(z)                                     # [nb*t, a]
    att = _cdot(hact, q_att, ((1,), (0,)), cdt).reshape(nb, t)
    att = att - jnp.max(att, axis=-1, keepdims=True)
    expo = jnp.exp(att)
    weight = expo / (jnp.sum(expo, axis=-1, keepdims=True) + 1e-8)

    # ---- pooling backward ----
    o3 = o.reshape(nb, t, d)
    dvals = _bdot(o3, g.reshape(nb, d, 1),
                  ((2,), (1,)), ((0,), (0,)), cdt).reshape(nb, t)  # d_i = g . O_i
    inner = jnp.sum(weight * dvals, axis=-1, keepdims=True)
    datt = weight * (dvals - inner)                        # [nb, t]
    do = weight[..., None] * g[:, None, :]                 # from the sum
    datt_flat = datt.reshape(nb * t, 1)
    dq_acc = _cdot(hact.T, datt_flat, ((1,), (0,)), cdt)
    dh = _cdot(datt_flat, q_att.T, ((1,), (0,)), cdt)
    dz = dh * (1.0 - hact * hact)
    dw_acc = _cdot(o.T, dz, ((1,), (0,)), cdt)
    db_acc = jnp.sum(dz, axis=0)
    do = do.reshape(nb * t, d) + _cdot(dz, w_att.T, ((1,), (0,)), cdt)
    if keep_prob < 1.0:
        do = do * drop_scale  # route the gradient back through the dropout

    # ---- attention backward (masked-matmul formulation, see _mhsa) ----
    do3 = do.reshape(nb, t, d)
    # dprobs[n, q, h*t+k] = <do[n, q], v_masked[n, h*t+k]>
    dprobs = _bdot(do3, v_masked, ((2,), (2,)), ((0,), (0,)), cdt)
    # dV[n, k, d] = sum_h (probs^T @ do)[n, h*t+k, d] * MASK[h*t+k, d]
    dv_masked = _bdot(probs, do3, ((1,), (1,)), ((0,), (0,)), cdt)
    dv3 = _sum_heads_masked(dv_masked, mask_ht, t)
    # softmax backward with matmul-based per-head inner products
    pd = probs * dprobs                                    # [nb, t, ht]
    ht = num_heads * t
    ip = _cdot(pd.reshape(nb * t, ht), sh, ((1,), (0,)), jnp.float32)
    ipb = _cdot(ip, sh, ((1,), (1,)), jnp.float32).reshape(nb, t, ht)
    dlogits = probs * (dprobs - ipb) * scale
    dq3 = _bdot(dlogits, k_masked, ((2,), (1,)), ((0,), (0,)), cdt)
    dk_masked = _bdot(dlogits, q3, ((1,), (1,)), ((0,), (0,)), cdt)
    dk3 = _sum_heads_masked(dk_masked, mask_ht, t)
    dq_flat = dq3.reshape(nb * t, d)
    dk_flat = dk3.reshape(nb * t, d)
    dv_flat = dv3.reshape(nb * t, d)

    # ---- projection backward (packed, one wide matmul each way) ----
    if s == d:
        dqkv = jnp.concatenate([dq_flat, dk_flat, dv_flat], axis=1)
    else:
        zpad = jnp.zeros((nb * t, s - d), dq_flat.dtype)
        dqkv = jnp.concatenate(
            [dq_flat, zpad, dk_flat, zpad, dv_flat, zpad], axis=1)
    dwqkv_acc = _cdot(x.T, dqkv, ((1,), (0,)), cdt)       # [din, 3s]
    # dx = dqkv @ wqkv^T, expressed as contraction over both minor dims
    # (padding columns hit wqkv's zero columns, contributing nothing)
    dx = _cdot(dqkv, wqkv, ((1,), (1,)), cdt)             # [nb*t, din]
    if xmask is not None:
        # route dx back through the in-kernel embedding dropout
        dx = dx * xmask
    dx_ref[:] = dx.reshape(nb, t, din).astype(dx_ref.dtype)

    @pl.when(is_first)
    def _():
        dwqkv_ref[:] = dwqkv_acc
        dw_ref[:] = dw_acc
        db_ref[:] = db_acc
        dq_ref[:] = dq_acc

    @pl.when(jnp.logical_not(is_first))
    def _():
        dwqkv_ref[:] += dwqkv_acc
        dw_ref[:] += dw_acc
        db_ref[:] += db_acc
        dq_ref[:] += dq_acc


@partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def news_encoder(x, wq, wk, wv, w_att, b_att, q_att, drop_mask, rng_seed,
                 num_heads, block_n=16, interpret=False, keep_prob=1.0,
                 compute_dtype="float32", emb_keep_prob=1.0, n_valid=None):
    """Differentiable fused news encoder (custom VJP, recompute backward).

    Dropout either from ``drop_mask`` (float 0/1 [N, T, D]; pass ones for
    eval; interpret-mode friendly) or — when ``rng_seed`` (int32 size-1
    array) is given — from the on-chip PRNG, including the embedding
    dropout via ``emb_keep_prob`` (see fused_news_encoder).
    ``compute_dtype="bfloat16"`` runs the matmuls at the MXU's native bf16
    rate with fp32 accumulation (forward and recompute-backward alike).
    ``n_valid`` (optional int32 size-1 array) marks trailing articles as
    dedup-bucket padding: forward AND backward skip those blocks (their
    cotangent is structurally zero — no slot gathers a pad row).
    """
    return fused_news_encoder(x, wq, wk, wv, w_att, b_att, q_att,
                              num_heads=num_heads, block_n=block_n,
                              interpret=interpret, drop_mask=drop_mask,
                              keep_prob=keep_prob, compute_dtype=compute_dtype,
                              rng_seed=rng_seed, emb_keep_prob=emb_keep_prob,
                              n_valid=n_valid)


def _news_encoder_fwd(x, wq, wk, wv, w_att, b_att, q_att, drop_mask, rng_seed,
                      num_heads, block_n, interpret, keep_prob, compute_dtype,
                      emb_keep_prob, n_valid=None):
    out = fused_news_encoder(x, wq, wk, wv, w_att, b_att, q_att,
                             num_heads=num_heads, block_n=block_n,
                             interpret=interpret, drop_mask=drop_mask,
                             keep_prob=keep_prob, compute_dtype=compute_dtype,
                             rng_seed=rng_seed, emb_keep_prob=emb_keep_prob,
                             n_valid=n_valid)
    return out, (x, wq, wk, wv, w_att, b_att, q_att, drop_mask, rng_seed,
                 n_valid)


def _news_encoder_bwd(num_heads, block_n, interpret, keep_prob, compute_dtype,
                      emb_keep_prob, residuals, g):
    x, wq, wk, wv, w_att, b_att, q_att, drop_mask, rng_seed, n_valid = residuals
    n, t, din = x.shape
    d = wq.shape[1]
    a = w_att.shape[1]
    head_dim = d // num_heads
    s = _qkv_stride(d)
    wqkv = _pack_qkv(wq, wk, wv, jnp.dtype(compute_dtype))
    # the backward holds q/k/v + grads + weight-grad accumulators in VMEM;
    # smaller article blocks than the forward keep it under the VMEM limit
    block_n = min(block_n, 16)
    n_pad = -(-n // block_n) * block_n
    rng_dropout = rng_seed is not None and (keep_prob < 1.0 or emb_keep_prob < 1.0)
    with_dropout = (not rng_dropout) and keep_prob < 1.0
    if rng_dropout:
        mask_in = jnp.asarray(rng_seed, jnp.int32).reshape(1, 1)
        mask_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)
    elif with_dropout:
        mask_in = drop_mask
        mask_spec = pl.BlockSpec((block_n, t, d), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_in = jnp.ones((8, 128), jnp.float32)
        mask_spec = pl.BlockSpec((8, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, n_pad - n), (0, 0)))
        if with_dropout:
            mask_in = jnp.pad(mask_in, ((0, n_pad - n), (0, 0), (0, 0)))
    nv = jnp.asarray(n if n_valid is None else n_valid,
                     jnp.int32).reshape(1, 1)
    grid = (n_pad // block_n,)
    full = lambda *shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        partial(_bwd_kernel, num_heads=num_heads, head_dim=head_dim,
                keep_prob=float(keep_prob), cdt=jnp.dtype(compute_dtype),
                rng_dropout=rng_dropout,
                emb_keep=float(emb_keep_prob) if rng_dropout else 1.0),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, t, din), x.dtype),  # dx
            jax.ShapeDtypeStruct((din, 3 * s), jnp.float32),  # packed dwqkv
            jax.ShapeDtypeStruct((d, a), jnp.float32),
            jax.ShapeDtypeStruct((a,), jnp.float32),
            jax.ShapeDtypeStruct((a, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, t, din), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full(din, 3 * s),
            full(d, a), full(a), full(a, 1),
            mask_spec,
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_n, t, din), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full(din, 3 * s),
            full(d, a), full(a), full(a, 1),
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, wqkv, w_att, b_att, q_att, mask_in, nv, g)
    dx, dwqkv, dw, db, dq = outs
    dwq = dwqkv[:, 0:d]
    dwk = dwqkv[:, s:s + d]
    dwv = dwqkv[:, 2 * s:2 * s + d]
    d_mask = jnp.zeros_like(residuals[7])
    # rng_seed is integer-typed: its tangent space is float0
    import numpy as _np

    d_seed = None
    if residuals[8] is not None:
        d_seed = _np.zeros(_np.shape(residuals[8]), dtype=jax.dtypes.float0)
    d_nv = None  # int32: tangent space float0
    if residuals[9] is not None:
        d_nv = _np.zeros(_np.shape(residuals[9]), dtype=jax.dtypes.float0)
    return (dx[:n], dwq, dwk, dwv, dw, db, dq, d_mask, d_seed, d_nv)


news_encoder.defvjp(_news_encoder_fwd, _news_encoder_bwd)


def news_encoder_reference(x, wq, wk, wv, w_att, b_att, q_att, *, num_heads):
    """Pure-XLA reference of the same math (used for parity tests and as
    the baseline the kernel must beat)."""
    n, t, din = x.shape
    d = wq.shape[1]
    head_dim = d // num_heads

    def proj(w):
        y = jnp.einsum("ntd,df->ntf", x, w)
        return y.reshape(n, t, num_heads, head_dim)

    qh, kh, vh = proj(wq), proj(wk), proj(wv)
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
    logits = jnp.einsum("nqhd,nkhd->nhqk", qh, kh) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("nhqk,nkhd->nqhd", probs, vh).reshape(n, t, d)
    att = jnp.tanh(o @ w_att + b_att) @ q_att
    att = att[..., 0]
    att = att - jnp.max(att, axis=-1, keepdims=True)
    expo = jnp.exp(att)
    weight = expo / (jnp.sum(expo, axis=-1, keepdims=True) + 1e-8)
    return jnp.einsum("ntd,nt->nd", o, weight)

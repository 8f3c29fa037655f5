"""Shared model layers (flax.linen), semantic counterparts of the reference
Keras layers (reference: src/ebrec/models/newsrec/layers.py).

All layers are written batched-and-fused: instead of the reference's
``TimeDistributed`` wrappers, callers flatten (batch, articles) into one
leading axis so the MXU sees one large matmul per projection.

Parity notes (math, not packing):
- ``AdditiveAttention`` = AttLayer2 (layers.py:7-104): att = q·tanh(Wx+b),
  exp-normalized with optional multiplicative mask and an epsilon in the
  denominator. We subtract the row max before exp (same weights, stable).
- ``SelfAttention`` (layers.py:107-270): per-head QKV projections WITHOUT
  biases and WITHOUT an output projection, scaled by 1/sqrt(head_dim).
- ``PersonalizedAttentivePooling`` (layers.py:314-339): dropout on values,
  tanh projection, dot with a query vector, softmax, weighted sum of the
  dropped values.
- ``MaskedGRU``: Keras ``Masking``+``GRU`` semantics (lstur.py:84-106) —
  masked timesteps do not update the recurrent state. Cell math follows
  flax's GRUCell (reset_after=False variant); parity with Keras is at the
  semantics level, not bit level.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

glorot = nn.initializers.glorot_uniform
zeros = nn.initializers.zeros


def _prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out

__all__ = [
    "AdditiveAttention",
    "SelfAttention",
    "PersonalizedAttentivePooling",
    "ConvEncoder",
    "MaskedGRU",
    "WordEmbed",
    "WeightedBatchNorm",
    "PrngDropout",
    "compute_token_mask",
]


class PrngDropout(nn.Module):
    """Drop-in ``nn.Dropout`` whose masks come from the seed-recompute
    Pallas PRNG kernel (ops/dropout.py) on TPU — no rng-bit tensors, no
    stored masks, fusion-friendly. Measured: framework dropout costs the
    conv families ~40% of their bs4096 train step (NPA 330->179 ms with
    dropout off); this recovers most of it. Off-TPU it transparently
    falls back to a jax.random mask (different deterministic stream —
    the same deviation class as NRMS's ``fused_rng_dropout``)."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        from ..ops.dropout import prng_dropout

        seed = jax.random.randint(self.make_rng("dropout"), (1,), 0,
                                  jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        use_kernel = jax.default_backend() == "tpu"
        return prng_dropout(x, seed, 1.0 - self.rate, use_kernel)


class WeightedBatchNorm(nn.Module):
    """BatchNorm whose train-mode moments weight each LEADING-axis row.

    With ``weights=None`` this is exactly ``nn.BatchNorm`` over all
    non-feature axes (Keras BatchNormalization semantics, the reference's
    dense-stack BN, nrms_docvec.py:99-130). With ``weights`` [N] it
    computes  mean = sum_i w_i x_i / sum_i w_i  (and the matching biased
    variance), which is what makes unique-article dedup exact for
    BN article towers: weighting each unique article by its slot
    multiplicity reproduces the per-slot batch moments EXACTLY, and
    bucket-pad rows get weight 0 so they never touch the statistics
    (training/dedup.py). Under a GSPMD mesh the reductions are global,
    so the equality holds sharded too.

    Parameter/collection layout matches ``nn.BatchNorm`` (params
    scale/bias, batch_stats mean/var), so checkpoints written by either
    are interchangeable. Like flax's default (dtype=None), compute is
    promoted to fp32 and the output stays fp32.
    """

    use_running_average: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", zeros, (feat,), jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            red = tuple(range(x.ndim - 1))
            if weights is None:
                mean = xf.mean(red)
                var = jnp.square(xf).mean(red) - jnp.square(mean)
            else:
                w = weights.astype(jnp.float32).reshape(
                    weights.shape[0], *([1] * (x.ndim - 1)))
                denom = jnp.sum(w) * float(_prod(x.shape[1:-1]))
                mean = jnp.sum(xf * w, axis=red) / denom
                var = jnp.sum(jnp.square(xf) * w, axis=red) / denom - jnp.square(mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class WordEmbed(nn.Module):
    """Drop-in ``nn.Embed`` for the trainable word-embedding table
    (reference: Keras Embedding init'd from HF word vectors, nrms.py:125-130)
    with a row-sparse override: when ``apply`` receives an ``emb_over``
    variable collection, the token inputs are COMPACT SLOT indices into its
    [C, E] ``table`` entry — the batch's touched vocabulary rows
    (training/sparse_embed.py) — and the [V, E] param is absent from the
    tree. A separate collection is used because flax validates ``params``
    shapes on apply, which forbids swapping in a smaller array directly.
    The dense-mode param path matches nn.Embed ('<name>/embedding'), so
    checkpoints and parity tests are unaffected."""

    num_embeddings: int
    features: int
    embedding_init: Callable = nn.initializers.variance_scaling(
        1.0, "fan_in", "normal", out_axis=0)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        if self.has_variable("emb_over", "table"):
            table = self.get_variable("emb_over", "table")
        else:
            table = self.param(
                "embedding", self.embedding_init,
                (self.num_embeddings, self.features), jnp.float32)
        if self.dtype is not None:
            table = table.astype(self.dtype)
        return jnp.take(table, tokens, axis=0)


def compute_token_mask(tokens: jnp.ndarray) -> jnp.ndarray:
    """float mask: 1.0 where token != 0 (reference: ComputeMasking,
    layers.py:273-288)."""
    return (tokens != 0).astype(jnp.float32)


class AdditiveAttention(nn.Module):
    """Additive (soft-alignment) attention pooling over the second-to-last
    axis. Input [..., L, D] -> output [..., D]."""

    dim: int = 200
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        w = self.param("W", glorot(), (x.shape[-1], self.dim), jnp.float32)
        b = self.param("b", zeros, (self.dim,), jnp.float32)
        q = self.param("q", glorot(), (self.dim, 1), jnp.float32)
        att = jnp.tanh(x.astype(self.dtype) @ w.astype(self.dtype) + b.astype(self.dtype))
        att = (att @ q.astype(self.dtype))[..., 0]  # [..., L]
        att = att - jax.lax.stop_gradient(jnp.max(att, axis=-1, keepdims=True))
        expo = jnp.exp(att)
        if mask is not None:
            expo = expo * mask.astype(expo.dtype)
        weight = expo / (jnp.sum(expo, axis=-1, keepdims=True) + 1e-8)
        return jnp.sum(x * weight[..., None].astype(x.dtype), axis=-2)


class SelfAttention(nn.Module):
    """Multi-head attention with NRMS conventions: no projection biases, no
    output projection. q/k/v: [..., L, D] -> [..., Lq, num_heads*head_dim].

    ``transposed=True`` reproduces the reference layer's EXACT numerics:
    its Keras-3 port applies the attention matrix with ``adjoint_a=True``
    (reference layers.py:249), i.e. out[i] = sum_q softmax_k(A)[q, i] v[q]
    — the TRANSPOSE of the softmaxed weights, normalized over the output
    axis instead of the reduction axis. This deviates from the original
    Microsoft-recommenders layer it was ported from (``K.batch_dot(A, V,
    axes=[3, 2])`` = standard attention) and from the NRMS paper; the
    difference is second-order at small logits (which is why it is easy to
    miss at init scale) but real for trained weights. Default ``False`` =
    standard attention: the mathematically intended op, and what the fused
    Pallas kernel computes. Training-level parity between the two is
    pinned by PARITY_TRAIN.json; exact-numerics parity by the transposed
    variant in tests/parity/."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    transposed: bool = False

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        key_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        out_dim = self.num_heads * self.head_dim

        def proj(name, x):
            wkernel = self.param(name, glorot(), (x.shape[-1], out_dim), jnp.float32)
            y = x.astype(self.dtype) @ wkernel.astype(self.dtype)
            return y.reshape(*y.shape[:-1], self.num_heads, self.head_dim)

        qh = proj("WQ", q)  # [..., Lq, H, Dh]
        kh = proj("WK", k)
        vh = proj("WV", v)
        scale = 1.0 / jnp.sqrt(jnp.asarray(self.head_dim, self.dtype))
        logits = jnp.einsum("...qhd,...khd->...hqk", qh, kh) * scale
        if key_mask is not None:
            neg = jnp.asarray(-1e12, logits.dtype)
            logits = jnp.where(key_mask[..., None, None, :].astype(bool), logits, neg)
        weights = jax.nn.softmax(logits, axis=-1)
        if self.transposed:
            # reference adjoint_a quirk: out[k] = sum_q weights[q, k] v[q]
            out = jnp.einsum("...hqk,...qhd->...khd", weights, vh)
        else:
            out = jnp.einsum("...hqk,...khd->...qhd", weights, vh)
        return out.reshape(*out.shape[:-2], out_dim)


class PersonalizedAttentivePooling(nn.Module):
    """Query-conditioned attention pooling: values [..., L, D], query
    [..., Q] -> [..., D]."""

    attention_dim: int
    dropout: float = 0.2
    dtype: jnp.dtype = jnp.float32
    # value-dropout via the seed-recompute PRNG kernel (PrngDropout) —
    # NPA's per-slot value tensor is the largest dropout target in the
    # framework ([B*(H+K), T, F])
    prng_dropout: bool = False

    def setup(self):
        self.att_proj = nn.Dense(self.attention_dim, kernel_init=glorot(),
                                 bias_init=zeros, dtype=self.dtype,
                                 name="att_proj")
        self.value_drop = (PrngDropout(self.dropout) if self.prng_dropout
                           else nn.Dropout(self.dropout))

    def drop_values(self, values: jnp.ndarray, train: bool) -> jnp.ndarray:
        """The reference applies dropout to the VALUES before projecting
        and pooling (layers.py:314-339)."""
        return self.value_drop(values, deterministic=not train)

    def project(self, values_dropped: jnp.ndarray) -> jnp.ndarray:
        """tanh(Dense(values)) [..., L, A] — per-position, so it commutes
        with slot gathers: NPA's dedup path computes it once per UNIQUE
        article and gathers the result (models/newsrec.py)."""
        return jnp.tanh(self.att_proj(values_dropped))

    def pool(self, values_dropped: jnp.ndarray, proj: jnp.ndarray,
             query: jnp.ndarray) -> jnp.ndarray:
        att = jnp.einsum("...ld,...d->...l", proj, query.astype(proj.dtype))
        weight = jax.nn.softmax(att, axis=-1)
        return jnp.sum(values_dropped * weight[..., None].astype(
            values_dropped.dtype), axis=-2)

    def __call__(
        self, values: jnp.ndarray, query: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        vd = self.drop_values(values, train)
        return self.pool(vd, self.project(vd), query)


class ConvEncoder(nn.Module):
    """1-D convolution over tokens with SAME padding + activation
    (reference: Conv1D blocks in lstur.py:129-136 / npa.py / naml.py)."""

    filters: int
    window: int = 3
    activation: Callable = nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Conv(
            features=self.filters,
            kernel_size=(self.window,),
            padding="SAME",
            kernel_init=glorot(),
            bias_init=zeros,
            dtype=self.dtype,
        )(x)
        return self.activation(y)


class MaskedGRU(nn.Module):
    """GRU over [B, L, D] with per-step masking: steps where mask==0 leave
    the state unchanged (Keras Masking semantics). Returns the final state."""

    units: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: jnp.ndarray,
        initial_state: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        batch = x.shape[0]
        if initial_state is None:
            initial_state = jnp.zeros((batch, self.units), x.dtype)
        cell = nn.GRUCell(
            features=self.units,
            kernel_init=glorot(),
            recurrent_kernel_init=glorot(),
            bias_init=zeros,
        )

        def step(cell, carry, inp):
            x_t, m_t = inp
            new_carry, _ = cell(carry, x_t)
            # GRUCell promotes bf16 state x fp32 params -> fp32; keep the
            # scan carry type-stable at the caller's state dtype
            new_carry = new_carry.astype(carry.dtype)
            carry = jnp.where(m_t[:, None].astype(bool), new_carry, carry)
            return carry, ()

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        carry, _ = scan(cell, initial_state, (x, mask))
        return carry

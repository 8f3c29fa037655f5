"""Fastformer (Wu et al. 2021, "Fastformer: Additive Attention Can Be All
You Need") as a flax module.

Semantic counterpart of the reference PyTorch implementation
(reference: src/ebrec/models/fastformer/fastformer.py). TPU-first design
changes (same math):

- The reference's user encoder loops over history articles in Python,
  calling the news encoder once per article (fastformer.py:394-402, which
  also calls the encoder twice and discards one result). Here (batch,
  articles) flatten into one leading axis and every article is encoded in
  a single batched pass.
- The reference scores ONE candidate per forward (fastformer.py:413-441);
  here K candidates are scored at once and raw logits [B, K] are
  returned, matching the newsrec convention (sigmoid/loss applied
  outside).
- The reference takes each article's token mask from history article 0
  (fastformer.py:390-391); here each article uses its own token mask —
  the stated intent of the masking code.
- The additive attention-pooling (fastformer.py:13-73) reuses
  ``AdditiveAttention``: the second projection's bias is a constant shift
  inside the exp-normalization, so omitting it is mathematically
  identical.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .config import HParamsFastformer
from .layers import AdditiveAttention, PrngDropout, WordEmbed, glorot, zeros

__all__ = ["Fastformer", "FastformerWu", "FastSelfAttention", "FastformerLayer"]


def _normal(stddev: float = 0.02):
    return nn.initializers.normal(stddev)


class FastSelfAttention(nn.Module):
    """Additive linear-complexity attention (reference:
    fastformer.py:76-176):

      q = Wq x ; k = Wk x
      alpha = softmax(att_q(q) / sqrt(dh) + mask)        per head, over seq
      pooled_q[h] = sum_t alpha_t q_t[h]
      p = k * broadcast(pooled_q)                        elementwise, per head
      beta = softmax(att_k(p) / sqrt(dh) + mask)
      pooled_k[h] = sum_t beta_t p_t[h]
      out_t = transform(pooled_k * q_t) + q_t            residual on q
    """

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask_bias: jnp.ndarray) -> jnp.ndarray:
        """x [B, L, D], mask_bias [B, L] additive (-1e4 at padding)."""
        d = self.num_heads * self.head_dim
        dense = lambda feat, name: nn.Dense(
            feat, kernel_init=_normal(), bias_init=zeros, dtype=self.dtype, name=name
        )
        q = dense(d, "query")(x)                      # [B, L, D]
        k = dense(d, "key")(x)
        scale = 1.0 / jnp.sqrt(jnp.asarray(self.head_dim, self.dtype))

        def head_split(y):
            return y.reshape(*y.shape[:-1], self.num_heads, self.head_dim)

        # global query per head
        q_score = dense(self.num_heads, "query_att")(q) * scale  # [B, L, H]
        alpha = nn.softmax(q_score + mask_bias[..., None], axis=-2)
        pooled_q = jnp.einsum("blh,blhd->bhd", alpha, head_split(q))
        p = head_split(k) * pooled_q[:, None]                   # [B, L, H, Dh]
        p_flat = p.reshape(*x.shape[:-1], d)
        # global key per head
        k_score = dense(self.num_heads, "key_att")(p_flat) * scale
        beta = nn.softmax(k_score + mask_bias[..., None], axis=-2)
        pooled_k = jnp.einsum("blh,blhd->bhd", beta, p)
        weighted = (pooled_k[:, None] * head_split(q)).reshape(*x.shape[:-1], d)
        return dense(d, "transform")(weighted) + q


class _SelfOutput(nn.Module):
    """Dense -> dropout -> LayerNorm(residual) (the reference wires HF's
    BertSelfOutput/BertOutput here, fastformer.py:179-239)."""

    dim: int
    dropout: float
    dtype: jnp.dtype = jnp.float32
    prng_dropout: bool = False  # seed-recompute kernel (layers.PrngDropout)

    @nn.compact
    def __call__(self, x, residual, train: bool):
        x = nn.Dense(self.dim, kernel_init=_normal(), bias_init=zeros,
                     dtype=self.dtype)(x)
        drop = (PrngDropout(self.dropout) if self.prng_dropout
                else nn.Dropout(self.dropout))
        x = drop(x, deterministic=not train)
        return nn.LayerNorm(epsilon=1e-12)(x + residual)


class FastformerLayer(nn.Module):
    """FastSelfAttention -> SelfOutput -> Intermediate(gelu) -> Output
    (reference: fastformer.py:210-239)."""

    num_heads: int
    head_dim: int
    intermediate_dim: int
    dropout: float
    dtype: jnp.dtype = jnp.float32
    prng_dropout: bool = False

    @nn.compact
    def __call__(self, x, mask_bias, train: bool):
        d = self.num_heads * self.head_dim
        att = FastSelfAttention(self.num_heads, self.head_dim, dtype=self.dtype)(
            x, mask_bias
        )
        att = _SelfOutput(d, self.dropout, dtype=self.dtype, name="att_out",
                          prng_dropout=self.prng_dropout)(
            att, x, train
        )
        inter = nn.gelu(
            nn.Dense(self.intermediate_dim, kernel_init=_normal(), bias_init=zeros,
                     dtype=self.dtype)(att),
            approximate=False,  # BertIntermediate uses exact erf gelu
        )
        return _SelfOutput(d, self.dropout, dtype=self.dtype, name="ffn_out",
                           prng_dropout=self.prng_dropout)(
            inter, att, train
        )


class Fastformer(nn.Module):
    """History/candidate Fastformer scorer (reference: fastformer.py:331-441).

    Batch dict: hist_tokens int32 [B, H, T], cand_tokens int32 [B, K, T].
    Returns raw logits [B, K].
    """

    hparams: HParamsFastformer
    vocab_size: int = 32000
    word_emb_dim: Optional[int] = None
    word_emb_init: Optional[Callable] = None
    dtype: jnp.dtype = jnp.float32
    # seed-recompute PRNG dropout kernel (layers.PrngDropout; see
    # docs/performance.md — measured +11% for NAML/LSTUR at bs4096)
    prng_dropout: bool = False

    def setup(self):
        hp = self.hparams
        emb_dim = self.word_emb_dim or hp.embedding_dim
        self.word_embedding = WordEmbed(
            self.vocab_size, emb_dim, embedding_init=self.word_emb_init or _normal(),
            dtype=self.dtype, name="word_embedding",
        )
        self.embedding_transform = nn.Dense(
            hp.embedding_dim, kernel_init=_normal(), bias_init=zeros, dtype=self.dtype
        )
        self.position_embedding = nn.Embed(
            hp.max_position, hp.embedding_dim, embedding_init=_normal(),
            name="position_embedding",
        )
        self.emb_norm = nn.LayerNorm(epsilon=1e-12)
        self.emb_drop = (PrngDropout(hp.dropout) if self.prng_dropout
                         else nn.Dropout(hp.dropout))
        head_dim = hp.embedding_dim // hp.n_heads
        if head_dim * hp.n_heads != hp.embedding_dim:
            raise ValueError(
                f"embedding_dim {hp.embedding_dim} not divisible by n_heads {hp.n_heads}"
            )
        self.layers = [
            FastformerLayer(hp.n_heads, head_dim, hp.intermediate_dim, hp.dropout,
                            dtype=self.dtype, name=f"layer_{i}",
                            prng_dropout=self.prng_dropout)
            for i in range(hp.n_layers)
        ]
        self.token_pool = AdditiveAttention(hp.embedding_dim, dtype=self.dtype,
                                            name="token_pool")
        self.user_pool = AdditiveAttention(hp.embedding_dim, dtype=self.dtype,
                                           name="user_pool")
        self.output_layer = nn.Dense(1, kernel_init=_normal(), bias_init=zeros,
                                     dtype=self.dtype)

    def encode_articles(self, tokens: jnp.ndarray, train: bool) -> jnp.ndarray:
        """tokens [N, T] -> article vectors [N, D]: embed, add position-0
        embedding (each article is one position in the reference's
        history-axis position encoding, fastformer.py:300-307), LN,
        dropout, n Fastformer layers over tokens, additive pooling."""
        token_mask = (tokens != 0).astype(self.dtype)          # [N, T]
        mask_bias = (1.0 - token_mask) * jnp.asarray(-1e4, self.dtype)
        x = self.embedding_transform(self.word_embedding(tokens))
        pos = self.position_embedding(jnp.zeros((), jnp.int32)).astype(x.dtype)
        x = self.emb_norm(x + pos)
        x = self.emb_drop(x, deterministic=not train)
        for layer in self.layers:
            x = layer(x, mask_bias, train)
        return self.token_pool(x, mask=token_mask)

    def __call__(self, batch: dict, train: bool = False) -> jnp.ndarray:
        if "uniq_tokens" in batch:
            # deduped batch (training/dedup.py): encode each unique
            # article once, gather vectors (and the token-presence mask)
            # back to history/candidate slots
            art = self.encode_articles(batch["uniq_tokens"], train)
            hist_vecs = art[batch["hist_slot"]]
            cand_vecs = art[batch["cand_slot"]]
            art_mask = (batch["uniq_tokens"] != 0).any(-1)
            hist_mask = art_mask[batch["hist_slot"]].astype(self.dtype)
        else:
            hist_tokens = batch["hist_tokens"]
            cand_tokens = batch["cand_tokens"]
            b, h = hist_tokens.shape[:2]
            k = cand_tokens.shape[1]
            # one encoder invocation over history+candidates (one large
            # matmul per layer instead of two dispatches)
            both = jnp.concatenate(
                [hist_tokens.reshape(b * h, -1), cand_tokens.reshape(b * k, -1)])
            vecs = self.encode_articles(both, train)
            hist_vecs = vecs[: b * h].reshape(b, h, -1)
            cand_vecs = vecs[b * h :].reshape(b, k, -1)
            hist_mask = (hist_tokens != 0).any(-1).astype(self.dtype)
        user = self.user_pool(hist_vecs, mask=hist_mask)        # [B, D]
        concat = jnp.concatenate(
            [jnp.broadcast_to(user[:, None], cand_vecs.shape), cand_vecs], axis=-1
        )
        return self.output_layer(concat)[..., 0]                # [B, K]


class FastformerWu(nn.Module):
    """The original Wu et al. Fastformer text classifier — the reference's
    ``Fastformer_wu`` (reference: fastformer/fastformer_wu.py:237-271 with
    ``StandardFastformerEncoder`` :158-234): token ids -> word embedding ->
    linear transform -> TOKEN-level position embeddings + LayerNorm +
    dropout -> n Fastformer layers -> attention pooling -> linear head of
    ``n_classes`` logits (the reference hardcodes 4, "likely the npratio",
    fastformer_wu.py:250-252). The reference computes cross-entropy inside
    ``forward``; here ``__call__`` returns raw logits and
    ``loss_and_logits`` mirrors the reference's (loss, score) contract.
    """

    hparams: HParamsFastformer
    vocab_size: int = 32000
    word_emb_dim: Optional[int] = None
    word_emb_init: Optional[Callable] = None
    n_classes: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        hp = self.hparams
        emb_dim = self.word_emb_dim or hp.embedding_dim
        self.word_embedding = WordEmbed(
            self.vocab_size, emb_dim, embedding_init=self.word_emb_init or _normal(),
            dtype=self.dtype, name="word_embedding",
        )
        self.embedding_transform = nn.Dense(
            hp.embedding_dim, kernel_init=_normal(), bias_init=zeros, dtype=self.dtype
        )
        self.position_embedding = nn.Embed(
            hp.max_position, hp.embedding_dim, embedding_init=_normal(),
            name="position_embedding",
        )
        self.emb_norm = nn.LayerNorm(epsilon=1e-12)
        self.emb_drop = nn.Dropout(hp.dropout)
        head_dim = hp.embedding_dim // hp.n_heads
        self.layers = [
            FastformerLayer(hp.n_heads, head_dim, hp.intermediate_dim, hp.dropout,
                            dtype=self.dtype, name=f"layer_{i}")
            for i in range(hp.n_layers)
        ]
        self.token_pool = AdditiveAttention(hp.embedding_dim, dtype=self.dtype,
                                            name="token_pool")
        self.output_layer = nn.Dense(self.n_classes, kernel_init=_normal(),
                                     bias_init=zeros, dtype=self.dtype)

    def __call__(self, input_ids: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """input_ids int32 [B, L] -> class logits [B, n_classes]."""
        token_mask = (input_ids != 0).astype(self.dtype)
        mask_bias = (1.0 - token_mask) * jnp.asarray(-1e4, self.dtype)
        x = self.embedding_transform(self.word_embedding(input_ids))
        pos_ids = jnp.arange(input_ids.shape[1], dtype=jnp.int32)
        x = self.emb_norm(x + self.position_embedding(pos_ids)[None].astype(x.dtype))
        x = self.emb_drop(x, deterministic=not train)
        for layer in self.layers:
            x = layer(x, mask_bias, train)
        pooled = self.token_pool(x, mask=token_mask)
        return self.output_layer(pooled)

    def loss_and_logits(self, input_ids: jnp.ndarray, targets: jnp.ndarray,
                        train: bool = False):
        """The reference forward's (loss, score) contract
        (fastformer_wu.py:264-271): mean softmax cross-entropy against
        integer class targets."""
        logits = self(input_ids, train=train)
        logp = nn.log_softmax(logits, axis=-1)
        loss = -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=-1))
        return loss, logits

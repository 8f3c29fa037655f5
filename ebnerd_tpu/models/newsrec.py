"""The newsrec model family as flax modules: NRMS, NRMSDocVec, LSTUR, NPA,
NAML (reference: src/ebrec/models/newsrec/{nrms,nrms_docvec,lstur,npa,naml}.py).

Design differences from the reference (TPU-first, same math):

- One module scores K candidates at once and returns raw logits [B, K].
  The reference's twin Keras graphs — a softmax "model" over npratio+1
  candidates and a sigmoid "scorer" over 1 candidate (nrms.py:161-210) —
  collapse into this single jitted function: softmax-CE is applied by the
  training loss, sigmoid by the eval path; both are monotone in the logit,
  so rankings are identical.
- The reference's ``TimeDistributed(news_encoder)`` becomes a reshape of
  (batch, articles) into one leading axis, turning every projection into a
  single large MXU matmul.
- The reference's pack-and-slice input encodings (NPA appends the user id
  to the token vector, npa.py:121-126; NAML packs title+body+cat+subcat
  into one int vector, naml.py:101-126) are replaced by explicit batch
  fields; the math is unchanged.

Batch dict convention (device arrays):
  hist_tokens  int32 [B, H, T]    (token models)
  cand_tokens  int32 [B, K, T]
  hist_vecs    float [B, H, Dv]   (docvec model)
  cand_vecs    float [B, K, Dv]
  user_id      int32 [B]          (LSTUR, NPA)
  hist_body / cand_body      int32 [B, ., Tb]   (NAML)
  hist_cat / cand_cat        int32 [B, .]       (NAML)
  hist_subcat / cand_subcat  int32 [B, .]       (NAML)
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .config import (
    HParamsLSTUR,
    HParamsNAML,
    HParamsNPA,
    HParamsNRMS,
    HParamsNRMSDocVec,
)
from .layers import (
    AdditiveAttention,
    ConvEncoder,
    MaskedGRU,
    PersonalizedAttentivePooling,
    PrngDropout,
    SelfAttention,
    WeightedBatchNorm,
    WordEmbed,
    glorot,
    zeros,
)

__all__ = ["NRMS", "NRMSDocVec", "LSTUR", "NPA", "NAML", "embedding_initializer"]


def embedding_initializer(matrix: np.ndarray) -> Callable:
    """Initializer that loads a pretrained word-embedding matrix (the
    reference initializes its Embedding from HF word embeddings,
    nrms.py:40-47)."""
    frozen = np.asarray(matrix, dtype=np.float32)

    def init(key, shape, dtype=jnp.float32):
        if tuple(shape) != frozen.shape:
            raise ValueError(f"embedding shape {shape} != matrix {frozen.shape}")
        return jnp.asarray(frozen, dtype)

    return init


def _flatten_articles(x: jnp.ndarray) -> tuple[jnp.ndarray, tuple]:
    """[B, L, ...] -> [B*L, ...]; returns the (B, L) prefix for unflattening."""
    prefix = x.shape[:2]
    return x.reshape(prefix[0] * prefix[1], *x.shape[2:]), prefix


def _dot_scores(news: jnp.ndarray, user: jnp.ndarray) -> jnp.ndarray:
    """logits[b, k] = <news[b, k], user[b]> (reference: Dot(axes=-1))."""
    return jnp.einsum("bkd,bd->bk", news, user)


def _maybe_remat(module, method, enabled: bool, n_array_args: int):
    """``jax.checkpoint`` (rematerialization) around an article-encoder
    method: the backward recomputes the encoder's forward instead of
    storing its per-token intermediates (embeddings, conv activations,
    dropout masks — the HBM-dominant residuals at large batch x large
    catalogue; an ebnerd_large NAML step at bs4096 otherwise exceeds a
    v5e's 16 GB). FLOPs-for-memory, numerics unchanged. ``method`` takes
    (module, *n_array_args arrays, train); train is static."""
    if not enabled:
        return lambda *args: method(module, *args)
    return lambda *args: nn.remat(
        method, static_argnums=(n_array_args + 1,))(module, *args)


def _dedup_gather(art_vecs: jnp.ndarray, batch: dict):
    """Deduped-batch path (training/dedup.py): [C, D] unique-article
    vectors -> ([B, H, D], [B, K, D]) via slot gathers. The backward of
    each gather is a segment-sum of slot cotangents into [C, D], so
    duplicate articles are encoded (and back-propagated through the
    encoder) exactly once per step."""
    return art_vecs[batch["hist_slot"]], art_vecs[batch["cand_slot"]]


def _encode_both(encode, hist: jnp.ndarray, cand: jnp.ndarray):
    """Run ONE encoder invocation over history and candidate articles
    concatenated along the article axis, then split. Same math as two
    calls, but a single large MXU matmul / one pallas grid instead of two
    dispatches (TimeDistributed in the reference runs per input tensor)."""
    (b, h), (_, k) = hist.shape[:2], cand.shape[:2]
    both = jnp.concatenate(
        [hist.reshape(b * h, *hist.shape[2:]), cand.reshape(b * k, *cand.shape[2:])]
    )
    vecs = encode(both)
    return vecs[: b * h].reshape(b, h, -1), vecs[b * h :].reshape(b, k, -1)


class _DenseStack(nn.Module):
    """relu Dense -> BatchNorm -> Dropout blocks (the reference's optional
    ``units_per_layer`` stack, nrms.py:141-155 / nrms_docvec.py:99-130).
    Kernel names start with ``l2_dense`` so the training loss can apply the
    reference's L2 kernel regularization selectively.

    ``weights`` (dedup path, training/dedup.py): per-row slot counts that
    make the BN batch moments EXACTLY equal the per-slot path's — each
    unique article contributes with its duplicate multiplicity and
    bucket-pad rows (weight 0) never touch the statistics."""

    units: tuple[int, ...]
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        for i, u in enumerate(self.units):
            x = nn.Dense(u, kernel_init=glorot(), bias_init=zeros,
                         dtype=self.dtype, name=f"l2_dense_{i}")(x)
            x = nn.relu(x)
            # epsilon matches Keras BatchNormalization's 1e-3 default (the
            # reference's BN, nrms_docvec.py:126); flax defaults to 1e-5
            x = WeightedBatchNorm(use_running_average=not train, epsilon=1e-3,
                                  name=f"bn_{i}")(x, weights=weights)
            # stays fp32 between BN and the next Dense, like nn.BatchNorm
            # with dtype=None did; the next Dense casts to self.dtype
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class _SelfAttParams(nn.Module):
    """Parameter container shaped exactly like ``SelfAttention``'s tree
    (WQ/WK/WV [din, d]) so fused and unfused NRMS share checkpoints."""

    din: int
    d: int

    def setup(self):
        self.WQ = self.param("WQ", glorot(), (self.din, self.d), jnp.float32)
        self.WK = self.param("WK", glorot(), (self.din, self.d), jnp.float32)
        self.WV = self.param("WV", glorot(), (self.din, self.d), jnp.float32)

    def __call__(self):  # params only; math lives in the pallas kernel
        return self.WQ, self.WK, self.WV


class _PoolParams(nn.Module):
    """Parameter container matching ``AdditiveAttention`` (W/b/q)."""

    din: int
    dim: int

    def setup(self):
        self.W = self.param("W", glorot(), (self.din, self.dim), jnp.float32)
        self.b = self.param("b", zeros, (self.dim,), jnp.float32)
        self.q = self.param("q", glorot(), (self.dim, 1), jnp.float32)

    def __call__(self):
        return self.W, self.b, self.q


class NRMS(nn.Module):
    """Neural News Recommendation with Multi-Head Self-Attention (Wu et al.,
    EMNLP 2019). Reference: nrms.py:12-210.

    ``use_fused_encoder=True`` routes both encoders through the pallas
    fused attention+pooling kernel (ops/news_encoder.py) — same math and
    the same parameter tree; requires ``newsencoder_units_per_layer`` to
    be empty.
    """

    hparams: HParamsNRMS
    vocab_size: int = 32000
    word_emb_dim: int = 300
    word_emb_init: Optional[Callable] = None
    dtype: jnp.dtype = jnp.float32
    use_fused_encoder: bool = False
    fused_block_n: int = 8  # measured optimum (ops/news_encoder.py block sweep)
    fused_interpret: bool = False  # interpret-mode kernels (CPU tests)
    # training dropout masks from the kernel's ON-CHIP PRNG instead of
    # host-side bernoulli tensors: no mask generation or HBM mask traffic,
    # and the embedding dropout moves inside the kernel too. Different
    # (still deterministic-per-seed) stream than jax.random. Compiled TPU
    # only — interpret mode falls back to the mask path automatically.
    fused_rng_dropout: bool = True
    # reproduce the reference layer's adjoint_a=True attention application
    # exactly (see SelfAttention.transposed). Default False = standard
    # attention; incompatible with use_fused_encoder.
    transposed_self_att: bool = False

    def setup(self):
        hp = self.hparams
        d = hp.head_num * hp.head_dim
        if self.use_fused_encoder and hp.newsencoder_units_per_layer:
            raise ValueError("fused encoder does not support the dense stack")
        self.drop = nn.Dropout(hp.dropout)
        self.embedding = WordEmbed(
            self.vocab_size,
            self.word_emb_dim,
            embedding_init=self.word_emb_init or glorot(),
            dtype=self.dtype,
            name="word_embedding",
        )
        if self.use_fused_encoder:
            if self.transposed_self_att:
                raise ValueError(
                    "transposed_self_att (reference adjoint quirk) is not "
                    "implemented by the fused kernel")
            self.news_self_att = _SelfAttParams(self.word_emb_dim, d)
            self.news_pool = _PoolParams(d, hp.attention_hidden_dim)
            self.user_self_att = _SelfAttParams(d, d)
            self.user_pool = _PoolParams(d, hp.attention_hidden_dim)
            return
        self.news_self_att = SelfAttention(hp.head_num, hp.head_dim, dtype=self.dtype,
                                           transposed=self.transposed_self_att)
        self.news_pool = AdditiveAttention(hp.attention_hidden_dim, dtype=self.dtype)
        if hp.newsencoder_units_per_layer:
            self.news_dense = _DenseStack(
                tuple(hp.newsencoder_units_per_layer), hp.dropout, dtype=self.dtype
            )
        self.user_self_att = SelfAttention(hp.head_num, hp.head_dim, dtype=self.dtype,
                                           transposed=self.transposed_self_att)
        self.user_pool = AdditiveAttention(hp.attention_hidden_dim, dtype=self.dtype)

    def _rng_dropout_active(self, train: bool) -> bool:
        return (self.use_fused_encoder and self.fused_rng_dropout
                and not self.fused_interpret and train
                and self.hparams.dropout > 0)

    def _fused(self, x: jnp.ndarray, att: "_SelfAttParams", pool: "_PoolParams",
               train: bool, with_dropout: bool,
               emb_dropout_in_kernel: bool = False,
               n_valid=None) -> jnp.ndarray:
        from ..ops.news_encoder import news_encoder

        hp = self.hparams
        keep = 1.0 - hp.dropout if (train and with_dropout and hp.dropout > 0) else 1.0
        d = hp.head_num * hp.head_dim
        seed = None
        emb_keep = 1.0
        if keep < 1.0 and self._rng_dropout_active(train):
            # on-chip PRNG masks; one int32 seed per step from the jax
            # dropout stream
            seed = jax.random.randint(self.make_rng("dropout"), (1,), 0,
                                      jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
            mask = jnp.ones((8, 128), jnp.float32)  # unused in rng mode
            if emb_dropout_in_kernel:
                emb_keep = keep
        elif keep < 1.0:
            # bf16 mask: exact 0/1 values at half the HBM traffic of fp32
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (x.shape[0], x.shape[1], d)
            ).astype(jnp.bfloat16)
        else:
            mask = jnp.ones((8, 128), jnp.float32)
        wq, wk, wv = att()
        w, b, q = pool()
        # bf16 models keep x in bf16 (half the kernel's HBM read) and run
        # the matmuls at the MXU's native bf16 rate with fp32 accumulation;
        # fp32 models keep full fp32 numerics
        compute = "bfloat16" if self.dtype == jnp.bfloat16 else "float32"
        x_in = x if compute == "bfloat16" else x.astype(jnp.float32)
        return news_encoder(x_in, wq, wk, wv, w, b, q, mask, seed,
                            hp.head_num, self.fused_block_n,
                            self.fused_interpret, keep,
                            compute, emb_keep, n_valid).astype(self.dtype)

    def encode_news(self, tokens: jnp.ndarray, train: bool,
                    n_valid=None, weights=None) -> jnp.ndarray:
        """tokens [N, T] -> news vectors [N, head_num*head_dim]
        (reference news encoder, nrms.py:116-159). ``n_valid`` (dedup
        path) lets the fused kernel skip trailing bucket-pad blocks;
        ``weights`` (dedup + dense stack) are per-article slot counts
        making the BN moments match the per-slot path exactly."""
        hp = self.hparams
        x = self.embedding(tokens)
        rng_drop = self._rng_dropout_active(train) if self.use_fused_encoder else False
        if not rng_drop:
            x = self.drop(x, deterministic=not train)
        if self.use_fused_encoder:
            # rng_drop: the kernel applies BOTH the embedding dropout and
            # the attention->pooling dropout from its on-chip PRNG
            return self._fused(x, self.news_self_att, self.news_pool,
                               train, with_dropout=True,
                               emb_dropout_in_kernel=rng_drop,
                               n_valid=n_valid)
        x = self.news_self_att(x, x, x)
        if hp.newsencoder_units_per_layer:
            x = self.news_dense(x, train, weights=weights)
        else:
            x = self.drop(x, deterministic=not train)
        return self.news_pool(x)

    def encode_user(self, hist_vecs: jnp.ndarray, train: bool) -> jnp.ndarray:
        """hist_vecs [B, H, D] -> user vector [B, D]
        (reference user encoder, nrms.py:92-114)."""
        if self.use_fused_encoder:
            return self._fused(hist_vecs, self.user_self_att, self.user_pool,
                               train, with_dropout=False)
        y = self.user_self_att(hist_vecs, hist_vecs, hist_vecs)
        return self.user_pool(y)

    def __call__(self, batch: dict, train: bool = False) -> jnp.ndarray:
        if "uniq_tokens" in batch:
            art = self.encode_news(batch["uniq_tokens"], train,
                                   n_valid=batch.get("art_n_uniq"),
                                   weights=batch.get("art_counts"))
            hist_vecs, cand_vecs = _dedup_gather(art, batch)
        else:
            hist_vecs, cand_vecs = _encode_both(
                lambda x: self.encode_news(x, train),
                batch["hist_tokens"], batch["cand_tokens"])
        user = self.encode_user(hist_vecs, train)
        return _dot_scores(cand_vecs, user)


class NRMSDocVec(nn.Module):
    """NRMS variant consuming frozen document-embedding vectors instead of
    token ids. Reference: nrms_docvec.py:8-188."""

    hparams: HParamsNRMSDocVec
    dtype: jnp.dtype = jnp.float32
    # reference adjoint-quirk parity switch (see SelfAttention.transposed)
    transposed_self_att: bool = False

    def setup(self):
        hp = self.hparams
        self.news_dense = _DenseStack(
            tuple(hp.newsencoder_units_per_layer), hp.dropout, dtype=self.dtype
        )
        self.news_out = nn.Dense(
            hp.head_num * hp.head_dim,
            kernel_init=glorot(),
            bias_init=zeros,
            dtype=self.dtype,
            name="news_out",
        )
        self.user_self_att = SelfAttention(hp.head_num, hp.head_dim, dtype=self.dtype,
                                           transposed=self.transposed_self_att)
        self.user_pool = AdditiveAttention(hp.attention_hidden_dim, dtype=self.dtype)

    def encode_news(self, vecs: jnp.ndarray, train: bool,
                    weights=None) -> jnp.ndarray:
        """``weights`` (dedup path): per-article slot counts so the dense
        stack's BN moments equal the per-slot path's exactly
        (layers.WeightedBatchNorm; training/dedup.py)."""
        x = self.news_dense(vecs, train, weights=weights)
        return nn.relu(self.news_out(x))

    def encode_user(self, hist_vecs: jnp.ndarray, train: bool) -> jnp.ndarray:
        y = self.user_self_att(hist_vecs, hist_vecs, hist_vecs)
        return self.user_pool(y)

    def __call__(self, batch: dict, train: bool = False) -> jnp.ndarray:
        if "uniq_vecs" in batch:
            art = self.encode_news(batch["uniq_vecs"], train,
                                   weights=batch.get("art_counts"))
            hist_vecs, cand_vecs = _dedup_gather(art, batch)
        else:
            hist_vecs, cand_vecs = _encode_both(
                lambda x: self.encode_news(x, train),
                batch["hist_vecs"], batch["cand_vecs"])
        user = self.encode_user(hist_vecs, train)
        return _dot_scores(cand_vecs, user)


class LSTUR(nn.Module):
    """Long- and Short-term User Representations (An et al., ACL 2019).
    Reference: lstur.py:12-201."""

    hparams: HParamsLSTUR
    vocab_size: int = 32000
    word_emb_dim: int = 300
    word_emb_init: Optional[Callable] = None
    dtype: jnp.dtype = jnp.float32
    # rematerialize the article encoder in the backward (see _maybe_remat)
    remat_encoder: bool = False
    # seed-recompute PRNG dropout kernel (layers.PrngDropout): measured
    # ~40% of the conv families' bs4096 step is framework dropout
    prng_dropout: bool = False

    def setup(self):
        hp = self.hparams
        self.drop = (PrngDropout(hp.dropout) if self.prng_dropout
                     else nn.Dropout(hp.dropout))
        self.embedding = WordEmbed(
            self.vocab_size, self.word_emb_dim,
            embedding_init=self.word_emb_init or glorot(),
            dtype=self.dtype, name="word_embedding",
        )
        # long-term user embedding, zero-initialized (lstur.py:71-77)
        self.user_embedding = nn.Embed(
            hp.n_users + 1, hp.gru_unit, embedding_init=zeros, name="user_embedding"
        )
        self.conv = ConvEncoder(hp.filter_num, hp.window_size, dtype=self.dtype)
        self.news_pool = AdditiveAttention(hp.attention_hidden_dim, dtype=self.dtype)
        self.gru = MaskedGRU(hp.gru_unit)
        if hp.type == "con":
            self.con_dense = nn.Dense(
                hp.gru_unit, kernel_init=glorot(), bias_init=zeros, dtype=self.dtype
            )

    def encode_news(self, tokens: jnp.ndarray, train: bool) -> jnp.ndarray:
        """Embedding -> Conv1D -> masked additive attention; articles whose
        tokens are all padding encode to exactly zero (lstur.py:113-144 incl.
        OverwriteMasking + masked AttLayer2)."""
        hp = self.hparams
        token_mask = (tokens != 0).astype(self.dtype)
        x = self.embedding(tokens)
        x = self.drop(x, deterministic=not train)
        x = self.conv(x)
        x = self.drop(x, deterministic=not train)
        x = x * token_mask[..., None]
        return self.news_pool(x, mask=token_mask)

    def encode_user(
        self, hist_vecs: jnp.ndarray, hist_mask: jnp.ndarray,
        user_id: jnp.ndarray, train: bool,
    ) -> jnp.ndarray:
        """GRU over clicked-article vectors; ``type='ini'`` seeds the GRU
        with the long-term embedding, ``type='con'`` concatenates it
        (lstur.py:56-111). Zero (padded) articles are masked out."""
        hp = self.hparams
        long_u = self.user_embedding(user_id)
        if hp.type == "ini":
            return self.gru(hist_vecs, hist_mask, initial_state=long_u.astype(hist_vecs.dtype))
        if hp.type == "con":
            short_u = self.gru(hist_vecs, hist_mask)
            return self.con_dense(jnp.concatenate([short_u, long_u.astype(short_u.dtype)], -1))
        raise ValueError(f"unknown LSTUR type: {hp.type}")

    def __call__(self, batch: dict, train: bool = False) -> jnp.ndarray:
        encode = _maybe_remat(self, type(self).encode_news,
                              self.remat_encoder, 1)
        if "uniq_tokens" in batch:
            art = encode(batch["uniq_tokens"], train)
            hist_vecs, cand_vecs = _dedup_gather(art, batch)
            art_mask = (batch["uniq_tokens"] != 0).any(-1)
            hist_mask = art_mask[batch["hist_slot"]].astype(self.dtype)
        else:
            hist_vecs, cand_vecs = _encode_both(
                lambda x: encode(x, train),
                batch["hist_tokens"], batch["cand_tokens"])
            hist_mask = (batch["hist_tokens"] != 0).any(-1).astype(self.dtype)
        user = self.encode_user(hist_vecs, hist_mask, batch["user_id"], train)
        return _dot_scores(cand_vecs, user)


class NPA(nn.Module):
    """Neural News Recommendation with Personalized Attention (Wu et al.,
    KDD 2019). Reference: npa.py:14-233."""

    hparams: HParamsNPA
    vocab_size: int = 32000
    word_emb_dim: int = 300
    word_emb_init: Optional[Callable] = None
    dtype: jnp.dtype = jnp.float32
    # rematerialize the embedding->conv prefix in the backward
    # (see _maybe_remat)
    remat_encoder: bool = False
    # seed-recompute PRNG dropout kernel (layers.PrngDropout), applied to
    # the conv prefix AND the personalized poolings' value dropout (the
    # largest dropout target in the framework, [B*(H+K), T, F])
    prng_dropout: bool = False

    def setup(self):
        hp = self.hparams
        self.drop = (PrngDropout(hp.dropout) if self.prng_dropout
                     else nn.Dropout(hp.dropout))
        self.embedding = WordEmbed(
            self.vocab_size, self.word_emb_dim,
            embedding_init=self.word_emb_init or glorot(),
            dtype=self.dtype, name="word_embedding",
        )
        self.user_embedding = nn.Embed(
            hp.n_users + 1, hp.user_emb_dim, embedding_init=zeros, name="user_embedding"
        )
        self.conv = ConvEncoder(hp.filter_num, hp.window_size, dtype=self.dtype)
        # separate query projections for word-level and news-level attention
        # (npa.py:144-150 and npa.py:95-101 create two distinct Dense layers)
        self.word_query = nn.Dense(hp.attention_hidden_dim, kernel_init=glorot(),
                                   bias_init=zeros, dtype=self.dtype, name="word_query")
        self.news_query = nn.Dense(hp.attention_hidden_dim, kernel_init=glorot(),
                                   bias_init=zeros, dtype=self.dtype, name="news_query")
        self.word_pool = PersonalizedAttentivePooling(
            hp.attention_hidden_dim, hp.dropout, dtype=self.dtype,
            prng_dropout=self.prng_dropout,
        )
        self.news_pool = PersonalizedAttentivePooling(
            hp.attention_hidden_dim, hp.dropout, dtype=self.dtype,
            prng_dropout=self.prng_dropout,
        )

    def conv_prefix(self, tokens: jnp.ndarray, train: bool) -> jnp.ndarray:
        """User-independent embedding -> conv prefix [N, T, filter_num]
        (the dedupable ~94% of the encoder FLOPs)."""
        x = self.embedding(tokens)
        x = self.drop(x, deterministic=not train)
        x = self.conv(x)
        return self.drop(x, deterministic=not train)

    def encode_news(self, tokens: jnp.ndarray, user_emb: jnp.ndarray, train: bool) -> jnp.ndarray:
        """tokens [N, T], user_emb [N, U] -> [N, filter_num]
        (npa.py:107-153)."""
        x = _maybe_remat(self, type(self).conv_prefix,
                         self.remat_encoder, 1)(tokens, train)
        return self.word_pool(x, self.word_query(user_emb), train)

    def __call__(self, batch: dict, train: bool = False) -> jnp.ndarray:
        u_emb = self.user_embedding(batch["user_id"]).astype(self.dtype)  # [B, U]
        if "uniq_tokens" in batch:
            # PARTIAL dedup (training/dedup.py): only the word-level
            # personalized ATTENTION depends on the user. The
            # user-independent parts run ONCE per unique article: the
            # embedding -> conv prefix (~94% of the encoder FLOPs), the
            # pooling's value dropout (one mask per unique article —
            # the same shared-mask dedup deviation the conv-prefix
            # dropouts already carry, pinned by PARITY_TRAIN), and the
            # per-position tanh projection (linear per token position,
            # so it commutes with the slot gather — exact math). Only
            # the query dot + softmax + weighted sum run per slot.
            # r5 measured: moving dropout+projection to the unique axis
            # removes the framework's largest dropout mask
            # ([B*(H+K), T, F]) and 7.4x of the projection FLOPs.
            x = _maybe_remat(self, type(self).conv_prefix,
                             self.remat_encoder, 1)(
                batch["uniq_tokens"], train)                 # [C, T, F]
            xd = self.word_pool.drop_values(x, train)
            proj = self.word_pool.project(xd)                # [C, T, A]
            hist_y = xd[batch["hist_slot"]]                  # [B, H, T, F]
            cand_y = xd[batch["cand_slot"]]                  # [B, K, T, F]
            (b, h), k = hist_y.shape[:2], cand_y.shape[1]
            both_y = jnp.concatenate(
                [hist_y.reshape(b * h, *hist_y.shape[2:]),
                 cand_y.reshape(b * k, *cand_y.shape[2:])])
            both_p = jnp.concatenate(
                [proj[batch["hist_slot"]].reshape(b * h, *proj.shape[1:]),
                 proj[batch["cand_slot"]].reshape(b * k, *proj.shape[1:])])
            both_u = jnp.concatenate(
                [jnp.repeat(u_emb, h, axis=0), jnp.repeat(u_emb, k, axis=0)])
            vecs = self.word_pool.pool(both_y, both_p,
                                       self.word_query(both_u))
        else:
            hist, (b, h) = _flatten_articles(batch["hist_tokens"])
            cand, (_, k) = _flatten_articles(batch["cand_tokens"])
            # one encoder invocation over history+candidates (user
            # embedding repeated to match each article slot)
            both = jnp.concatenate([hist, cand])
            both_u = jnp.concatenate(
                [jnp.repeat(u_emb, h, axis=0), jnp.repeat(u_emb, k, axis=0)])
            vecs = self.encode_news(both, both_u, train)
        hist_vecs = vecs[: b * h].reshape(b, h, -1)
        cand_vecs = vecs[b * h :].reshape(b, k, -1)
        user = self.news_pool(hist_vecs, self.news_query(u_emb), train)
        return _dot_scores(cand_vecs, user)


class NAML(nn.Module):
    """Neural News Recommendation with Attentive Multi-View Learning
    (Wu et al., IJCAI 2019). Reference: naml.py:13-374."""

    hparams: HParamsNAML
    vocab_size: int = 32000
    word_emb_dim: int = 300
    word_emb_init: Optional[Callable] = None
    dtype: jnp.dtype = jnp.float32
    # rematerialize the 4-view article encoder in the backward (see
    # _maybe_remat). For ebnerd_large-scale batches remat ALONE is not
    # enough: the single rematted block still materializes every
    # per-token intermediate at once during the backward recompute
    # (measured 15.9 GB at bs4096 x 125k articles) — combine with
    # encode_chunks.
    remat_encoder: bool = False
    # dedup path only: encode the unique-article axis in N sequential
    # chunks (lax.scan of rematted chunks; params broadcast, dropout rng
    # split per chunk). Peak encoder HBM scales ~1/N while weight grads
    # accumulate across chunks — the jax.checkpoint-over-scan pattern
    # that makes catalogue-scale batches fit (scripts/bench_large.py).
    # C (the dedup bucket) must divide by it; buckets are multiples of
    # 256 (training/dedup.py), so any power of two <= 256 works.
    encode_chunks: int = 1
    # seed-recompute PRNG dropout kernel (layers.PrngDropout): the
    # title+body embed-dropout masks are the framework's biggest
    # ([C, 70, 1024] at bench shapes)
    prng_dropout: bool = False

    def setup(self):
        hp = self.hparams
        self.drop = (PrngDropout(hp.dropout) if self.prng_dropout
                     else nn.Dropout(hp.dropout))
        self.embedding = WordEmbed(
            self.vocab_size, self.word_emb_dim,
            embedding_init=self.word_emb_init or glorot(),
            dtype=self.dtype, name="word_embedding",
        )
        self.title_conv = ConvEncoder(hp.filter_num, hp.window_size, dtype=self.dtype)
        self.title_pool = AdditiveAttention(hp.attention_hidden_dim, dtype=self.dtype)
        self.body_conv = ConvEncoder(hp.filter_num, hp.window_size, dtype=self.dtype)
        self.body_pool = AdditiveAttention(hp.attention_hidden_dim, dtype=self.dtype)
        self.vert_embedding = nn.Embed(hp.vert_num, hp.vert_emb_dim, name="vert_embedding")
        self.vert_dense = nn.Dense(hp.filter_num, kernel_init=glorot(),
                                   bias_init=zeros, dtype=self.dtype)
        self.subvert_embedding = nn.Embed(hp.subvert_num, hp.subvert_emb_dim,
                                          name="subvert_embedding")
        self.subvert_dense = nn.Dense(hp.filter_num, kernel_init=glorot(),
                                      bias_init=zeros, dtype=self.dtype)
        self.view_pool = AdditiveAttention(hp.attention_hidden_dim, dtype=self.dtype)
        self.user_pool = AdditiveAttention(hp.attention_hidden_dim, dtype=self.dtype)

    def _text_view(self, tokens, conv, pool, train):
        hp = self.hparams
        x = self.embedding(tokens)
        x = self.drop(x, deterministic=not train)
        x = conv(x)
        x = self.drop(x, deterministic=not train)
        return pool(x)

    def encode_news(self, title, body, vert, subvert, train) -> jnp.ndarray:
        """Four views -> additive-attention fusion -> [N, filter_num]
        (naml.py:92-141)."""
        title_r = self._text_view(title, self.title_conv, self.title_pool, train)
        body_r = self._text_view(body, self.body_conv, self.body_pool, train)
        vert_r = nn.relu(self.vert_dense(self.vert_embedding(vert).astype(self.dtype)))
        subvert_r = nn.relu(self.subvert_dense(self.subvert_embedding(subvert).astype(self.dtype)))
        views = jnp.stack([title_r, body_r, vert_r, subvert_r], axis=-2)  # [N, 4, F]
        return self.view_pool(views)

    def _encode_chunked(self, title, body, vert, subvert, train: bool):
        """Encode the unique-article axis in ``encode_chunks`` sequential
        chunks via nn.scan, each chunk rematted when ``remat_encoder``:
        peak per-token HBM drops ~1/N (see the attribute comments)."""
        n = self.encode_chunks
        c = title.shape[0]
        if c % n:
            raise ValueError(f"encode_chunks={n} must divide C={c}")

        def body_fn(mdl, carry, xs):
            t, b, v, s = xs
            return carry, mdl.encode_news(t, b, v, s, train)

        if self.remat_encoder:
            body_fn = nn.remat(body_fn, prevent_cse=False)
        scan = nn.scan(body_fn, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True},
                       in_axes=0, out_axes=0)
        xs = tuple(x.reshape(n, c // n, *x.shape[1:])
                   for x in (title, body, vert, subvert))
        _, ys = scan(self, (), xs)
        return ys.reshape(c, ys.shape[-1])

    def __call__(self, batch: dict, train: bool = False) -> jnp.ndarray:
        encode = _maybe_remat(self, type(self).encode_news,
                              self.remat_encoder, 4)
        if "uniq_tokens" in batch:
            args = (batch["uniq_tokens"], batch["uniq_body"],
                    batch["uniq_cat"], batch["uniq_subcat"], train)
            art = (self._encode_chunked(*args) if self.encode_chunks > 1
                   else encode(*args))
            hist_vecs, cand_vecs = _dedup_gather(art, batch)
            user = self.user_pool(hist_vecs)
            return _dot_scores(cand_vecs, user)
        # one encoder invocation over history+candidates for all four views
        (b, h) = batch["hist_tokens"].shape[:2]
        k = batch["cand_tokens"].shape[1]

        def both(name):
            x = batch[f"hist_{name}"]
            y = batch[f"cand_{name}"]
            return jnp.concatenate(
                [x.reshape(b * h, *x.shape[2:]), y.reshape(b * k, *y.shape[2:])])

        vecs = encode(both("tokens"), both("body"),
                      both("cat"), both("subcat"), train)
        hist_vecs = vecs[: b * h].reshape(b, h, -1)
        cand_vecs = vecs[b * h :].reshape(b, k, -1)
        user = self.user_pool(hist_vecs)
        return _dot_scores(cand_vecs, user)

"""Two-tower serving: precomputed article-vector index + cheap per-request
user encoding.

No reference counterpart (the reference re-encodes every candidate for
every impression through the full news encoder, scorer-call per
candidate). For every model whose news encoder is user-independent
(NRMS, NRMSDocVec, LSTUR, NAML, Fastformer — all but NPA, whose word
attention is personalized), the article tower can be evaluated ONCE over
the corpus; scoring an impression is then one gather + a tiny user
encoder + a dot (or Fastformer's concat-MLP).

This is both the production serving path and a large eval-time
optimization: validation/test scoring cost drops from
O(sum_K * encoder) to O(V * encoder + sum_K * d). ``Trainer.score``
routes through the same pure functions (training/trainer.py) so the
per-epoch val AUC uses the cheap path with one stable jit cache.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .data.dataloader import EvalFeed
from .data.ragged import Ragged

__all__ = [
    "ArticleIndex",
    "TwoTowerScorer",
    "model_kind",
    "encode_article_rows",
    "article_validity",
    "two_tower_logits",
]

_USER_INDEPENDENT = {"nrms", "nrms_docvec", "nrmsdocvec", "lstur", "naml", "fastformer"}


def model_kind(model) -> Optional[str]:
    """Two-tower dispatch key for ``model``, or None when its news encoder
    is user-dependent (NPA's personalized word attention)."""
    name = type(model).__name__.lower()
    return name if name in _USER_INDEPENDENT else None


def _require_kind(model) -> str:
    kind = model_kind(model)
    if kind is None:
        raise ValueError(
            f"{type(model).__name__} has a user-dependent news encoder "
            "(personalized attention); two-tower serving does not apply."
        )
    return kind


def encode_article_rows(model, variables, tables: dict, idx: jnp.ndarray) -> jnp.ndarray:
    """Article tower: value-table rows ``idx`` -> article vectors [N, D].

    Pure in (variables, tables, idx) so callers can jit it with stable
    caches (weights traced, not baked in as constants)."""
    kind = _require_kind(model)
    m, v, t = model, variables, tables
    if kind == "nrms":
        return m.apply(v, t["title"][idx], False,
                       method=lambda mdl, tok, tr: mdl.encode_news(tok, tr))
    if kind in ("nrms_docvec", "nrmsdocvec"):
        return m.apply(v, t["docvec"][idx], False,
                       method=lambda mdl, x, tr: mdl.encode_news(x, tr))
    if kind == "lstur":
        return m.apply(v, t["title"][idx], False,
                       method=lambda mdl, tok, tr: mdl.encode_news(tok, tr))
    if kind == "naml":
        return m.apply(
            v, t["title"][idx], t["body"][idx], t["cat"][idx],
            t["subcat"][idx], False,
            method=lambda mdl, ti, bo, ca, su, tr: mdl.encode_news(
                ti, bo, ca, su, tr),
        )
    if kind == "fastformer":
        return m.apply(v, t["title"][idx], False,
                       method=lambda mdl, tok, tr: mdl.encode_articles(tok, tr))
    raise AssertionError(kind)


def article_validity(tables: dict) -> Optional[jnp.ndarray]:
    """Per-article-row history-mask vector [V+1] matching the full forward
    pass's ``(hist_tokens != 0).any(-1)`` semantics (models/newsrec.py): an
    article whose token row is all zeros (empty title — includes padding
    row 0) is masked out of LSTUR's GRU / Fastformer's user pooling.
    None when the model family carries no token table (docvec models don't
    mask)."""
    title = tables.get("title")
    if title is None:
        return None
    return (jnp.asarray(title) != 0).any(-1)


def _hist_mask(art_valid: Optional[jnp.ndarray], hist_idx: jnp.ndarray) -> jnp.ndarray:
    if art_valid is not None:
        return art_valid[hist_idx].astype(jnp.float32)
    # fallback: padding row 0 only (correct unless a known article has an
    # all-zero token row — pass art_valid to cover that edge case)
    return (hist_idx != 0).astype(jnp.float32)


def two_tower_logits(model, variables, art_vecs: jnp.ndarray, raw: dict,
                     art_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """User tower + scoring from precomputed article vectors.

    ``raw`` is an EvalFeed/NewsrecFeed batch (hist_idx [B, H],
    cand_idx [B, K], optional user_idx). Returns raw logits [B, K]
    identical to the full forward pass. ``art_valid`` (from
    ``article_validity``) supplies exact history-mask semantics for
    LSTUR/Fastformer."""
    kind = _require_kind(model)
    m, v = model, variables
    hist_vecs = art_vecs[raw["hist_idx"]]
    cand_vecs = art_vecs[raw["cand_idx"]]
    if kind in ("nrms", "nrms_docvec", "nrmsdocvec"):
        user = m.apply(v, hist_vecs, False,
                       method=lambda mdl, h, tr: mdl.encode_user(h, tr))
        return jnp.einsum("bkd,bd->bk", cand_vecs, user)
    if kind == "lstur":
        hist_mask = _hist_mask(art_valid, raw["hist_idx"])
        user = m.apply(
            v, hist_vecs, hist_mask, raw["user_idx"], False,
            method=lambda mdl, h, hm, u, tr: mdl.encode_user(h, hm, u, tr))
        return jnp.einsum("bkd,bd->bk", cand_vecs, user)
    if kind == "naml":
        user = m.apply(v, hist_vecs, method=lambda mdl, h: mdl.user_pool(h))
        return jnp.einsum("bkd,bd->bk", cand_vecs, user)
    if kind == "fastformer":
        hist_mask = _hist_mask(art_valid, raw["hist_idx"])

        def score_ff(mdl, h, hm, cand):
            user = mdl.user_pool(h, mask=hm)
            concat = jnp.concatenate(
                [jnp.broadcast_to(user[:, None], cand.shape), cand], -1)
            return mdl.output_layer(concat)[..., 0]

        return m.apply(v, hist_vecs, hist_mask, cand_vecs, method=score_ff)
    raise AssertionError(kind)


class ArticleIndex:
    """Precomputed [V+1, D] article-vector table for one trained model."""

    def __init__(self, model, variables, tables: dict, batch_size: int = 4096):
        self.kind = _require_kind(model)
        self.model = model
        self.variables = variables
        self.tables = {k: jnp.asarray(v) for k, v in tables.items()}
        self.batch_size = batch_size
        self.vectors: Optional[jnp.ndarray] = None
        self.validity = article_validity(self.tables)

    def build(self) -> jnp.ndarray:
        """Encode the whole corpus in fixed-size chunks (one compile)."""
        some = next(iter(self.tables.values()))
        n_rows = some.shape[0]
        bs = min(self.batch_size, n_rows)
        encode = jax.jit(partial(encode_article_rows, self.model))
        chunks = []
        for start in range(0, n_rows, bs):
            idx = jnp.arange(start, min(start + bs, n_rows))
            if idx.shape[0] < bs:  # pad to keep one compiled program
                idx = jnp.concatenate(
                    [idx, jnp.zeros(bs - idx.shape[0], idx.dtype)])
            chunks.append(encode(self.variables, self.tables, idx))
        self.vectors = jnp.concatenate(chunks, axis=0)[:n_rows]
        return self.vectors


class TwoTowerScorer:
    """Masked batched scoring over ragged impressions from a prebuilt
    ArticleIndex — drop-in replacement for ``Trainer.score``."""

    def __init__(self, index: ArticleIndex):
        if index.vectors is None:
            index.build()
        self.index = index
        self._score = jax.jit(
            lambda variables, art_vecs, art_valid, raw: jax.nn.sigmoid(
                two_tower_logits(index.model, variables, art_vecs, raw,
                                 art_valid=art_valid))
        )

    def score(self, feed: EvalFeed) -> Ragged:
        out = np.zeros((feed.n_rows, feed.width), np.float32)
        for raw in feed.batches():
            raw.pop("n_valid")
            rows = raw.pop("rows")
            raw.pop("cand_mask", None)
            scores = np.asarray(self._score(
                self.index.variables, self.index.vectors, self.index.validity,
                {k: jnp.asarray(x) for k, x in raw.items()}))
            out[rows, : scores.shape[1]] = scores[: len(rows)]
        return feed.unpad(out)

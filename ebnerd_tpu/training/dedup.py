"""Host-side unique-article dedup for training batches.

A training batch references B*(H+K) article slots, but the underlying
articles repeat heavily — even a uniform draw of 25.6k slots from a
25k-article table yields only ~16k unique rows (~37% duplicate encoder
FLOPs), and real EB-NeRD impressions concentrate on the day's few hundred
active articles, so the duplication is far higher (reference behavior:
every TimeDistributed slot re-encodes its article independently,
src/ebrec/models/newsrec/nrms.py:161-178). The reference has no train-time
dedup; its eval-side analogue is scoring every candidate separately too.

TPU-native path: on the HOST (riding the trainer's prefetch thread,
overlapped with the running device step) replace

  hist_idx [B, H], cand_idx [B, K]   (article-table row ids)

with

  art_uniq  [C] int32   the batch's unique article rows, padded to a
                        geometric size bucket (compile-count bounded)
  hist_slot [B, H] int32  positions into art_uniq
  cand_slot [B, K] int32

On device the model encodes each unique article ONCE ([C] through the
news encoder instead of [B*(H+K)]) and gathers vectors back to slots;
the backward of that gather is a segment-sum of slot cotangents — exactly
the dedup the eval path already exploits via the two-tower corpus encode
(serving.py), applied per training step.

Semantics: identical in eval mode (same tokens reach the same encoder).
Under dropout this is a DELIBERATE deviation: the reference draws an
independent mask per slot, while dedup draws one stochastic encode per
unique article per step, shared across its duplicate slots (fewer,
slightly correlated masks). Convergence parity is pinned by a recorded
training-parity run (PARITY_TRAIN.json, dedup entry).

BatchNorm article towers (NRMSDocVec's dense stack; NRMS with
``newsencoder_units_per_layer``) dedup via SLOT-COUNT-WEIGHTED batch
moments: ``prep_dedup_batch`` emits ``art_counts`` (each unique
article's slot multiplicity; bucket-pad rows 0), and
layers.WeightedBatchNorm weights each row's contribution by it — which
reproduces the per-slot BN statistics EXACTLY (pad rows never touch the
moments). r4 excluded these families because unweighted BN over the
bucket-padded unique axis deviated badly (loss 3.04 vs 1.29 measured).
NPA dedups PARTIALLY: the user-personalized word pooling stays
per-slot, but the user-independent embedding->conv prefix (the
FLOP-heavy part) runs once per unique article (NPA.__call__).
``dedup_capable`` encodes these rules; the Trainer's "auto" consults it.

Sharding: art_uniq's leading axis is the unique-article axis; under a
data-parallel mesh `shard_batch` splits it over 'data' like any batch
array, so the encoder work shards too. Slots are GLOBAL positions —
XLA inserts the all-gather of the (small) [C, D] vector block and the
matching reduce-scatter in the backward. Buckets are multiples of 256 so
C divides any practical mesh axis.
"""
from __future__ import annotations

import numpy as np

__all__ = ["dedup_bucket", "prep_dedup_batch", "pad_dedup_to", "DEDUP_KEYS",
           "dedup_capable"]

# keys prep_dedup_batch adds (consumed by models/inputs.py builders)
DEDUP_KEYS = ("art_uniq", "hist_slot", "cand_slot", "art_counts")


def dedup_capable(model) -> tuple[bool, str]:
    """(capable, reason-if-not) for one model instance (see module
    docstring; unknown model families are excluded conservatively). NPA
    is capable via PARTIAL dedup: its embedding->conv prefix is
    user-independent and dedups, while the personalized pooling stays
    per-slot (models/newsrec.py NPA.__call__). BatchNorm article towers
    (NRMSDocVec, NRMS + dense stack) are capable via slot-count-weighted
    BN moments (layers.WeightedBatchNorm) — exact per-slot statistics."""
    from ..serving import model_kind

    kind = model_kind(model)
    if kind is None:
        if type(model).__name__.lower() == "npa":
            return True, ""
        return False, ("unknown model family: no slot path implemented "
                       "for article dedup")
    return True, ""


def dedup_bucket(n: int, minimum: int = 512) -> int:
    """Smallest bucket >= n from a ~1.25x geometric ladder of multiples of
    256 (waste <= max(25%, 256 rows); distinct compiled programs stay at
    a handful across a whole training run)."""
    c = max(minimum, 256)
    c = -(-c // 256) * 256
    while c < n:
        c = -(-(c * 5 // 4) // 256) * 256
    return c


def prep_dedup_batch(raw: dict, min_bucket: int = 512,
                     bucket: int | None = None) -> dict:
    """Dedup one index batch (host, prefetch thread).

    Replaces ``hist_idx``/``cand_idx`` with ``art_uniq`` (bucket-padded
    with row 0) + ``hist_slot``/``cand_slot``. Pad entries are never
    referenced by any slot, so they add encoder FLOPs but touch neither
    logits nor gradients. ``bucket`` forces an exact bucket size (used to
    align lax.scan groups)."""
    hist = np.asarray(raw["hist_idx"])
    cand = np.asarray(raw["cand_idx"])
    b, h = hist.shape
    k = cand.shape[1]
    uniq, inv = np.unique(
        np.concatenate([hist.reshape(-1), cand.reshape(-1)]),
        return_inverse=True)
    c = bucket if bucket is not None else dedup_bucket(len(uniq), min_bucket)
    if len(uniq) > c:
        raise ValueError(f"bucket {c} < {len(uniq)} unique articles")
    uniq_pad = np.zeros(c, np.int32)
    uniq_pad[: len(uniq)] = uniq
    out = {key: v for key, v in raw.items() if key not in ("hist_idx", "cand_idx")}
    out["art_uniq"] = uniq_pad
    out["hist_slot"] = inv[: b * h].reshape(b, h).astype(np.int32)
    out["cand_slot"] = inv[b * h:].reshape(b, k).astype(np.int32)
    # slot multiplicity per unique row (pad rows 0): the weights that make
    # BatchNorm article towers' batch moments exactly per-slot
    # (layers.WeightedBatchNorm)
    out["art_counts"] = np.bincount(inv, minlength=c).astype(np.float32)
    out["n_uniq"] = len(uniq)  # host-side stat; dropped before device put
    # device-side valid count: fused kernels skip blocks past it
    out["art_n_uniq"] = np.asarray([len(uniq)], np.int32)
    return out


def pad_dedup_to(raw: dict, bucket: int) -> dict:
    """Re-pad a prepped batch's ``art_uniq`` to a larger bucket (aligning
    the members of one lax.scan group to a common shape)."""
    uniq = raw["art_uniq"]
    if uniq.shape[0] == bucket:
        return raw
    if uniq.shape[0] > bucket:
        raise ValueError(f"cannot shrink bucket {uniq.shape[0]} -> {bucket}")
    out = dict(raw)
    grown = np.zeros(bucket, np.int32)
    grown[: uniq.shape[0]] = uniq
    out["art_uniq"] = grown
    if "art_counts" in raw:
        counts = np.zeros(bucket, np.float32)
        counts[: uniq.shape[0]] = raw["art_counts"]
        out["art_counts"] = counts
    return out

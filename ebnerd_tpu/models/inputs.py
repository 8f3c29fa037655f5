"""In-graph batch builders: device-resident article tables -> model batches.

The feed (data/dataloader.py) ships int32 *row indices*; these builders run
INSIDE the jitted train/score step and gather the actual features from
device-resident value tables (the TPU-native analogue of the reference's
host-side ``lookup_article_matrix[indices]``,
reference: src/ebrec/models/newsrec/dataloader.py:108-116). XLA fuses the
gather into the downstream embedding lookup, so the host never touches a
token matrix.

``tables`` is a dict of device arrays built once per run:
  "title":  int32 [V+1, T]   token table          (NRMS, LSTUR, NPA, NAML)
  "docvec": float [V+1, Dv]  document embeddings  (NRMSDocVec)
  "body":   int32 [V+1, Tb]  body token table     (NAML)
  "cat":    int32 [V+1]      category id          (NAML)
  "subcat": int32 [V+1]      subcategory id       (NAML)
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

__all__ = ["token_batch", "docvec_batch", "naml_batch", "builder_for"]

BatchBuilder = Callable[[dict, dict], dict]


def _user(raw: dict, out: dict) -> dict:
    if "user_idx" in raw:
        out["user_id"] = raw["user_idx"]
    return out


def _slots(raw: dict, out: dict) -> dict:
    out["hist_slot"] = raw["hist_slot"]
    out["cand_slot"] = raw["cand_slot"]
    if "art_n_uniq" in raw:  # lets fused kernels skip bucket-pad blocks
        out["art_n_uniq"] = raw["art_n_uniq"]
    if "art_counts" in raw:  # slot-count weights for BN article towers
        out["art_counts"] = raw["art_counts"]
    return _user(raw, out)


def token_batch(tables: dict, raw: dict) -> dict:
    """NRMS / LSTUR / NPA / Fastformer: title tokens (+ optional user id).

    A deduped batch (training/dedup.py: ``art_uniq`` + slot indices)
    gathers each unique article's tokens once; the model encodes [C]
    articles and scatters vectors back through the slot gathers."""
    title = tables["title"]
    if "art_uniq" in raw:
        return _slots(raw, {"uniq_tokens": title[raw["art_uniq"]]})
    return _user(raw, {
        "hist_tokens": title[raw["hist_idx"]],
        "cand_tokens": title[raw["cand_idx"]],
    })


def docvec_batch(tables: dict, raw: dict) -> dict:
    """NRMSDocVec: frozen document-embedding vectors."""
    dv = tables["docvec"]
    if "art_uniq" in raw:
        return _slots(raw, {"uniq_vecs": dv[raw["art_uniq"]]})
    return _user(raw, {
        "hist_vecs": dv[raw["hist_idx"]],
        "cand_vecs": dv[raw["cand_idx"]],
    })


def naml_batch(tables: dict, raw: dict) -> dict:
    """NAML: title/body tokens + (sub)category ids, all gathered from the
    same row-index space (the reference packs these four into one int
    vector, naml.py:101-126; here they stay separate device gathers)."""
    if "art_uniq" in raw:
        u = raw["art_uniq"]
        return _slots(raw, {
            "uniq_tokens": tables["title"][u],
            "uniq_body": tables["body"][u],
            "uniq_cat": tables["cat"][u],
            "uniq_subcat": tables["subcat"][u],
        })
    out = {
        "hist_tokens": tables["title"][raw["hist_idx"]],
        "cand_tokens": tables["title"][raw["cand_idx"]],
        "hist_body": tables["body"][raw["hist_idx"]],
        "cand_body": tables["body"][raw["cand_idx"]],
        "hist_cat": tables["cat"][raw["hist_idx"]],
        "cand_cat": tables["cat"][raw["cand_idx"]],
        "hist_subcat": tables["subcat"][raw["hist_idx"]],
        "cand_subcat": tables["subcat"][raw["cand_idx"]],
    }
    return _user(raw, out)


def builder_for(model_name: str) -> BatchBuilder:
    name = model_name.lower()
    if name in ("nrms", "lstur", "npa", "fastformer"):
        return token_batch
    if name in ("nrmsdocvec", "nrms_docvec"):
        return docvec_batch
    if name == "naml":
        return naml_batch
    raise ValueError(f"no batch builder for model '{model_name}'")

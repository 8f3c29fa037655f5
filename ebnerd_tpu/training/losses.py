"""Training losses, matching the reference loss map semantics
(reference: src/ebrec/models/newsrec/nrms.py:56-67 — "cross_entropy_loss"
-> categorical CE over npratio+1 softmaxed candidates, "log_loss" ->
binary CE on sigmoid scores) plus the selective L2 kernel regularization
of the docvec dense stack (reference: nrms_docvec.py:105-124).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["categorical_crossentropy", "binary_logloss", "l2_penalty", "loss_fn_for"]


def categorical_crossentropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Softmax CE over the candidate axis; labels are 0/1 rows that sum to 1
    (wu2019 sampling yields exactly one positive per row)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(labels * logp, axis=-1))


def binary_logloss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Element-wise sigmoid binary cross-entropy over all candidates."""
    logp = jax.nn.log_sigmoid(logits)
    log1mp = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(labels * logp + (1.0 - labels) * log1mp)


def l2_penalty(params, substr: str = "l2_dense") -> jnp.ndarray:
    """Sum of squared kernels for modules whose path contains ``substr``
    (the reference attaches keras l2 regularizers only to the docvec dense
    stack's kernels, nrms_docvec.py:110-116)."""
    total = jnp.zeros((), jnp.float32)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if any(substr in str(k) for k in keys) and str(keys[-1]) == "kernel":
            total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return total


def loss_fn_for(name: str):
    if name == "cross_entropy_loss":
        return categorical_crossentropy
    if name == "log_loss":
        return binary_logloss
    raise ValueError(f"this loss not defined {name}")

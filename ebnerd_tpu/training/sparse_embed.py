"""Host-deduped row-sparse embedding gradients + row-wise Adam.

The trainable word-embedding table (reference: nrms.py:125-130 — a Keras
``Embedding`` initialized from HF word vectors) is by far the largest
parameter (xlm-roberta-large: 250k x 1024 = 1 GB fp32, 3 GB with Adam
moments). ``jax.grad`` of a plain gather emits a DENSE [V, E] scatter-add
followed by a dense Adam sweep of all three [V, E] arrays — ~6 GB of HBM
traffic per step regardless of how few vocabulary rows the batch touches.

Real EB-NeRD titles are Zipfian: a bs-512 batch's ~384k token slots cover
only a small fraction of the 250k-row vocabulary, so the TPU-native path
dedups on the HOST (riding the trainer's prefetch thread, overlapped with
the running step) and updates only the touched rows on device:

  host:    tokens -> unique row ids [C] (+ validity pad to a size bucket)
           + a [V] -> slot remap table so the model embeds COMPACT slots
  device:  gather the C embedding rows, differentiate w.r.t. the compact
           [C, E] slice, scatter-add grads by slot, row-wise Adam on the
           touched rows, scatter the updated rows/moments back.

SEMANTICS — a deliberate deviation, NOT reference parity. Untouched rows
here keep stale Adam moments and receive no update (LazyAdam-style
row-sparse Adam, as in tf-addons LazyAdam). The reference's own optimizer
(keras.optimizers.Adam, TF 2.12–2.15; base_model.py:69-80) handles the
embedding's ``IndexedSlices`` grad with DENSE moment decay and a DENSE
``variable.assign_sub`` over ALL rows — identical to dense Adam on a
zero-filled gradient. The dense default (``sparse_embedding=False``) is
therefore the reference-parity path; this mode trades that exactness for
lower update traffic/memory in settings where that binds.

With zero-initialized moments the two paths coincide until a row is
touched at step t1 and skipped at some later step t2 (dense/reference
then applies a momentum-decay update this mode skips) — covered by tests.

PERFORMANCE (measured, v5e, bs512, Zipf-1.07 tokens -> ~51k touched rows):
the sparse path is SLOWER end to end on TPU — 3,561 vs 4,014 imp/s
(bench.py r3), isolated slab 32.6 ms (row gather + row-wise Adam +
scatter-back) vs 6.6 ms for the dense scatter + streaming [V, E] Adam
sweep (scripts/bench_embed_grad2.py). TPU HBM strongly favors the dense
sequential sweep over ~51k-row random access; the intuition that "touched
rows ≪ vocab ⇒ sparse wins" does not hold on this hardware. Keep this
path for memory-constrained/DCN settings where update traffic, not time,
binds; the production default is dense
(TrainerConfig.sparse_embedding=False), which is also the
reference-parity path (see SEMANTICS above).
"""
from __future__ import annotations

from typing import Iterable, Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = ["SparseEmbedState", "prep_sparse_batch", "rowwise_adam",
           "TOKEN_KEYS_BY_TABLE", "bucket_size"]

# table name -> batch keys (builder outputs) whose values are token ids
# embedded through the shared word-embedding table (models/inputs.py);
# the uniq_* keys are the article-deduped variants (training/dedup.py)
TOKEN_KEYS_BY_TABLE = {
    "title": ("hist_tokens", "cand_tokens", "uniq_tokens"),
    "body": ("hist_body", "cand_body", "uniq_body"),
}


class SparseEmbedState(struct.PyTreeNode):
    """The embedding table + its Adam moments, held OUTSIDE the optax
    optimizer state so only touched rows are read/written per step."""

    table: jnp.ndarray  # [V, E] fp32 params
    m: jnp.ndarray      # [V, E] fp32 first moment
    v: jnp.ndarray      # [V, E] fp32 second moment

    @classmethod
    def create(cls, table: jnp.ndarray) -> "SparseEmbedState":
        z = jnp.zeros_like(table)
        return cls(table=table, m=z, v=jnp.zeros_like(table))


def bucket_size(n: int, minimum: int = 4096) -> int:
    """Next power-of-two pad size so the per-step compiled program count
    stays tiny while wasted rows stay < 2x."""
    c = minimum
    while c < n:
        c *= 2
    return c


def prep_sparse_batch(
    raw: dict,
    host_tables: dict[str, np.ndarray],
    table_names: Sequence[str],
    vocab_size: int,
    min_bucket: int = 4096,
) -> dict:
    """Host-side dedup (runs on the prefetch thread): derive the batch's
    unique vocabulary rows from the article index batch and attach

      emb_uniq  [C] int32  touched row ids, zero-padded to a size bucket
      emb_valid [C] f32    1 for real entries, 0 for pad
      emb_remap [V] int32  vocab id -> compact slot (defined on touched ids)

    to the raw batch. The model then embeds ``emb_remap[tokens]`` against
    the compact [C, E] row slice instead of vocab ids against [V, E].
    """
    idx = np.concatenate(
        [np.asarray(raw["hist_idx"]).ravel(), np.asarray(raw["cand_idx"]).ravel()])
    seen = np.zeros(vocab_size, dtype=bool)
    for name in table_names:
        tok = host_tables[name][idx]
        seen[tok.ravel()] = True
    uniq = np.flatnonzero(seen).astype(np.int32)
    c = bucket_size(len(uniq), min_bucket)
    uniq_pad = np.zeros(c, np.int32)
    uniq_pad[: len(uniq)] = uniq
    valid = np.zeros(c, np.float32)
    valid[: len(uniq)] = 1.0
    remap = np.zeros(vocab_size, np.int32)
    remap[uniq] = np.arange(len(uniq), dtype=np.int32)
    out = dict(raw)
    out["emb_uniq"] = uniq_pad
    out["emb_valid"] = valid
    out["emb_remap"] = remap
    return out


def rowwise_adam(
    state: SparseEmbedState,
    uniq: jnp.ndarray,
    valid: jnp.ndarray,
    g_rows: jnp.ndarray,
    lr,
    step,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> SparseEmbedState:
    """One Adam update restricted to the touched rows (TF legacy
    sparse-Adam semantics; see module docstring). ``step`` is the 1-based
    update count for bias correction (optax convention: count AFTER the
    increment). Padded slots (valid 0) are masked to no-ops; a duplicated
    pad id scatters zeros, so it never corrupts row 0."""
    rows_m = state.m[uniq]
    rows_v = state.v[uniq]
    g32 = g_rows.astype(jnp.float32)
    m_new = b1 * rows_m + (1.0 - b1) * g32
    v_new = b2 * rows_v + (1.0 - b2) * g32 * g32
    t = step.astype(jnp.float32)
    m_hat = m_new / (1.0 - b1 ** t)
    v_hat = v_new / (1.0 - b2 ** t)
    vcol = valid[:, None]
    upd = (lr * m_hat / (jnp.sqrt(v_hat) + eps)) * vcol
    return SparseEmbedState(
        table=state.table.at[uniq].add(-upd),
        m=state.m.at[uniq].add((m_new - rows_m) * vcol),
        v=state.v.at[uniq].add((v_new - rows_v) * vcol),
    )

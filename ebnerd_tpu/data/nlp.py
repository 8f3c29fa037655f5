"""Host-side NLP artifact builders: word-embedding extraction and document
embeddings via HF transformer models.

Semantic counterpart of the reference NLP utilities (reference:
src/ebrec/utils/_nlp.py). These run ONCE on the host to produce numpy
artifacts (word-embedding init matrices, [V+1, D] docvec tables) that are
then placed on the TPU; torch is used only here, never in the compute
path.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = [
    "get_transformers_word_embeddings",
    "generate_embeddings_with_transformers",
]


def get_transformers_word_embeddings(model) -> np.ndarray:
    """Pull the word-embedding matrix out of an HF model
    (reference: _nlp.py:17-18)."""
    return model.embeddings.word_embeddings.weight.data.to("cpu").numpy()


def generate_embeddings_with_transformers(
    model,
    tokenizer,
    text_list: list[str],
    batch_size: int = 8,
    device: Optional[str] = None,
    disable_tqdm: bool = False,
) -> "np.ndarray":
    """CLS-token document vectors for a list of texts
    (reference: _nlp.py:21-80 — batched tokenize, ``model(**enc)``,
    ``last_hidden_state[:, 0]``, no_grad). Returns [N, D] float32."""
    import torch

    device = device or ("cuda" if torch.cuda.is_available() else "cpu")
    model = model.to(device)
    model.eval()
    out = []
    iterator = range(0, len(text_list), batch_size)
    if not disable_tqdm:
        try:
            from tqdm import tqdm

            iterator = tqdm(iterator, desc="Encoding text", unit="batch")
        except ImportError:
            pass
    with torch.no_grad():
        for start in iterator:
            batch = text_list[start : start + batch_size]
            enc = tokenizer(
                batch, return_tensors="pt", padding=True, truncation=True
            ).to(device)
            hidden = model(**enc).last_hidden_state
            out.append(hidden[:, 0, :].to("cpu").numpy())
    return np.concatenate(out, axis=0).astype(np.float32)

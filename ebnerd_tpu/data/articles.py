"""Article-side feature builders: tokenization, token tables, doc embeddings.

Semantic counterpart of the reference article transforms
(reference: src/ebrec/utils/_articles.py, _nlp.py). Tokenization runs on
host via HF tokenizers; the output is a dense ``[V+1, max_length]`` int32
token table (row 0 = padding/unknown) that lives on the TPU for the
in-graph gather.
"""
from __future__ import annotations

import numpy as np

from ..constants import DEFAULT_ARTICLE_ID_COL
from .lookup import Lookup
from .table import Table, read_parquet

__all__ = [
    "concat_str_columns",
    "convert_text2encoding_with_transformers",
    "create_article_id_to_value_mapping",
    "build_token_lookup",
    "build_value_lookup",
    "load_article_id_embeddings",
    "create_sort_based_prediction_score",
]


def concat_str_columns(df: Table, columns: list[str]) -> tuple[Table, str]:
    """Join several string columns with a space into a new column
    (reference: concat_str_columns, _polars.py:547-571)."""
    concat_name = "-".join(columns)
    cols = [np.asarray(df[col], dtype=object) for col in columns]
    joined = cols[0]
    for nxt in cols[1:]:
        joined = np.asarray([f"{a} {b}" for a, b in zip(joined, nxt)], dtype=object)
    return df.with_columns(**{concat_name: joined}), concat_name


def convert_text2encoding_with_transformers(
    df: Table,
    tokenizer,
    column: str,
    max_length: int,
) -> tuple[Table, str]:
    """Tokenize a text column to fixed-length int token ids
    (reference: _articles.py:31-79 — ``add_special_tokens=False``,
    pad/truncate to ``max_length``). Returns (table, new_column_name)."""
    texts = [str(t) for t in np.asarray(df[column])]
    enc = tokenizer(
        texts,
        add_special_tokens=False,
        padding="max_length",
        truncation=True,
        max_length=max_length,
    )
    new_column = f"{column}_encode_{tokenizer.name_or_path}"
    tokens = np.asarray(enc["input_ids"], dtype=np.int32)
    from .ragged import Ragged

    return df.with_columns(**{new_column: Ragged.from_dense(tokens)}), new_column


def create_article_id_to_value_mapping(
    df: Table,
    value_col: str,
    article_col: str = DEFAULT_ARTICLE_ID_COL,
) -> dict:
    """{article_id: value} dict (reference: _articles.py:21-28)."""
    ids = np.asarray(df[article_col])
    col = df[value_col]
    from .ragged import Ragged

    if isinstance(col, Ragged):
        return {int(i): col.row(j) for j, i in enumerate(ids)}
    return {int(i): col[j] for j, i in enumerate(ids)}


def build_token_lookup(
    df: Table,
    token_col: str,
    article_col: str = DEFAULT_ARTICLE_ID_COL,
    unknown_representation: str = "zeros",
) -> Lookup:
    """Dense [V+1, T] int32 token table from a tokenized article table."""
    from .ragged import Ragged

    col = df[token_col]
    if isinstance(col, Ragged):
        widths = np.unique(col.lengths)
        if len(widths) != 1:
            raise ValueError("token column must be fixed-width; tokenize with padding")
        values = col.values.reshape(len(col), int(widths[0]))
    else:
        values = np.asarray(col)
    return Lookup.from_values(
        np.asarray(df[article_col]), values.astype(np.int32), unknown_representation
    )


def build_value_lookup(
    df: Table,
    value_col: str,
    article_col: str = DEFAULT_ARTICLE_ID_COL,
    unknown_representation: str = "zeros",
    dtype=None,
) -> Lookup:
    """Dense [V+1, D] value table (e.g. document embeddings, category ids)."""
    from .ragged import Ragged

    col = df[value_col]
    if isinstance(col, Ragged):
        widths = np.unique(col.lengths)
        if len(widths) != 1:
            raise ValueError("value column must be fixed-width")
        values = col.values.reshape(len(col), int(widths[0]))
    else:
        values = np.asarray(col)
        if values.ndim == 1:
            values = values[:, None]
    if dtype is not None:
        values = values.astype(dtype)
    return Lookup.from_values(np.asarray(df[article_col]), values, unknown_representation)


def load_article_id_embeddings(
    df: Table, path, item_col: str = DEFAULT_ARTICLE_ID_COL
) -> Table:
    """Left-join a document-embedding parquet onto the articles table
    (reference: _articles.py:11-18)."""
    emb = read_parquet(path)
    emb_ids = np.asarray(emb[item_col])
    order = np.argsort(emb_ids, kind="stable")
    sorted_ids = emb_ids[order]
    ids = np.asarray(df[item_col])
    pos = np.minimum(np.searchsorted(sorted_ids, ids), len(sorted_ids) - 1)
    if not (sorted_ids[pos] == ids).all():
        raise ValueError("articles missing from embedding parquet")
    idx = order[pos]
    out = dict((n, df[n]) for n in df.columns)
    from .ragged import Ragged

    for name in emb.columns:
        if name == item_col:
            continue
        col = emb[name]
        out[name] = col.take_rows(idx) if isinstance(col, Ragged) else col[idx]
    return Table(out)


def create_sort_based_prediction_score(
    df: Table,
    column: str,
    desc: bool = True,
    article_col: str = DEFAULT_ARTICLE_ID_COL,
    prediction_score_col: str = "prediction_score",
) -> Table:
    """Rank articles by a popularity-style column and attach 1/rank scores
    (reference: _articles.py:82-131) — used by the feature baselines."""
    vals = np.asarray(df[column], dtype=np.float64)
    vals = np.where(np.isnan(vals), -np.inf if desc else np.inf, vals)
    order = np.argsort(-vals if desc else vals, kind="stable")
    ranks = np.empty(len(vals), dtype=np.int64)
    ranks[order] = np.arange(1, len(vals) + 1)
    return df.with_columns(**{prediction_score_col: (1.0 / ranks).astype(np.float32)})

"""Data-ops parity tests (reference: src/ebrec/utils/_polars.py helpers,
_decay.py, _descriptive_analysis.py docstring examples)."""
import numpy as np
import pytest

from ebnerd_tpu.data.decay import (
    add_decay_weights,
    apply_decay_dense,
    exponential_decay_weights,
    linear_decay_weights,
)
from ebnerd_tpu.data.ops import (
    concat_list_str,
    drop_nulls_from_list,
    filter_list_elements,
    filter_maximum_lengths_from_list,
    filter_minimum_lengths_from_list,
    from_dict_to_table,
    keep_unique_values_in_list,
    remove_list_elements,
    shuffle_list_columns,
    split_fraction,
    split_in_n,
)
from ebnerd_tpu.data.ragged import Ragged
from ebnerd_tpu.data.table import Table


def _rag(rows, dtype=np.int64):
    return Ragged.from_lists(rows, dtype=dtype)


def test_decay_weights_golden():
    assert linear_decay_weights(5, True) == [0.2, 0.4, 0.6, 0.8, 1.0]
    assert linear_decay_weights(10, False) == pytest.approx(
        [1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1]
    )
    assert exponential_decay_weights(5, 0.5, True) == [0.0625, 0.125, 0.25, 0.5, 1.0]
    assert exponential_decay_weights(10, 0.5, False)[:3] == [1.0, 0.5, 0.25]


def test_add_decay_weights_matches_reference_table():
    df = Table({"col1": _rag([[1, 1, 1, 1], [1, 1, 1], [1, 1], []])})
    out = add_decay_weights(df, "col1", linear_decay_weights, ascending=True)
    w = out["col1_weights"]
    assert w.row(0).tolist() == [0.25, 0.5, 0.75, 1.0]
    assert w.row(1).tolist() == pytest.approx([1 / 3, 2 / 3, 1.0])
    assert w.row(2).tolist() == [0.5, 1.0]
    assert w.row(3).tolist() == []


def test_apply_decay_dense():
    hist = np.ones((2, 3, 4))
    w = np.array([[0.5, 1.0, 0.0], [1.0, 1.0, 1.0]])
    out = apply_decay_dense(hist, w)
    assert out[0, 0, 0] == 0.5 and out[0, 2, 1] == 0.0 and out[1].sum() == 12


def test_shuffle_list_columns_keeps_alignment():
    inview = _rag([[10, 20, 30], [40, 50]])
    labels = _rag([[1, 0, 0], [0, 1]], dtype=np.int8)
    df = Table({"iv": inview, "lab": labels})
    out = shuffle_list_columns(df, ["iv", "lab"], seed=3)
    for i in range(2):
        pairs = dict(zip(inview.row(i).tolist(), labels.row(i).tolist()))
        shuffled = dict(zip(out["iv"].row(i).tolist(), out["lab"].row(i).tolist()))
        assert pairs == shuffled


def test_splits():
    df = Table({"x": np.arange(10)})
    a, b = split_fraction(df, 0.3, seed=0)
    assert len(a) == 3 and len(b) == 7
    assert sorted(np.concatenate([a["x"], b["x"]]).tolist()) == list(range(10))
    parts = split_in_n(df, 3)
    assert [len(p) for p in parts] == [3, 4, 3] or sum(len(p) for p in parts) == 10


def test_list_element_ops():
    col = _rag([[1, 2, 2, 3], [4, 4], [], [5]])
    uniq = keep_unique_values_in_list(col)
    assert uniq.to_lists() == [[1, 2, 3], [4], [], [5]]
    kept = filter_list_elements(col, np.array([2, 4]))
    assert kept.to_lists() == [[2, 2], [4, 4], [], []]
    removed = remove_list_elements(col, np.array([2, 4]))
    assert removed.to_lists() == [[1, 3], [], [], [5]]


def test_length_filters():
    df = Table({"l": _rag([[1], [1, 2], [1, 2, 3]])})
    assert len(filter_minimum_lengths_from_list(df, "l", 2)) == 2
    assert len(filter_maximum_lengths_from_list(df, "l", 2)) == 2
    assert len(filter_minimum_lengths_from_list(df, "l", None)) == 3


def test_drop_nulls_and_concat_str():
    col = Ragged(np.array([1.0, np.nan, 2.0]), np.array([0, 2, 3], np.int64))
    assert drop_nulls_from_list(col).to_lists() == [[1.0], [2.0]]
    s = _rag([["a", "b"], ["c"]], dtype=object)
    assert concat_list_str(s).tolist() == ["a b", "c"]


def test_from_dict_to_table():
    t = from_dict_to_table({"a": [1, 2], "b": [[1], [2, 3]]})
    assert np.asarray(t["a"]).tolist() == [1, 2]
    assert t["b"].to_lists() == [[1], [2, 3]]


def test_descriptive(ebnerd_fixture):
    from ebnerd_tpu.data.descriptive import (
        min_max_impression_time_behaviors,
        min_max_impression_time_history,
    )
    from ebnerd_tpu.data.table import read_parquet

    hist = read_parquet(ebnerd_fixture / "history.parquet")
    beh = read_parquet(ebnerd_fixture / "behaviors.parquet")
    lo, hi = min_max_impression_time_history(hist)
    assert lo <= hi
    lo2, hi2 = min_max_impression_time_behaviors(beh)
    assert lo2 <= hi2

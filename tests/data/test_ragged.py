import numpy as np
import pytest

from ebnerd_tpu.data.ragged import Ragged


def test_from_lists_roundtrip():
    rows = [[1, 2, 3], [], [7], None, [4, 5]]
    r = Ragged.from_lists(rows, dtype=np.int32)
    assert len(r) == 5
    assert r.to_lists() == [[1, 2, 3], [], [7], [], [4, 5]]
    assert r.lengths.tolist() == [3, 0, 1, 0, 2]
    assert r.total == 6


def test_take_rows_with_repetition():
    r = Ragged.from_lists([[1, 2], [3], [], [4, 5, 6]])
    out = r.take_rows(np.array([3, 0, 0, 2, 1]))
    assert out.to_lists() == [[4, 5, 6], [1, 2], [1, 2], [], [3]]


def test_tail():
    r = Ragged.from_lists([[1, 2, 3, 4], [5], [], [6, 7]])
    assert r.tail(2).to_lists() == [[3, 4], [5], [], [6, 7]]


def test_to_padded_right_align():
    r = Ragged.from_lists([[1, 2, 3, 4], [5], []])
    dense, mask = r.to_padded(3, pad_value=0, align="right")
    assert dense.tolist() == [[2, 3, 4], [0, 0, 5], [0, 0, 0]]
    assert mask.tolist() == [[True] * 3, [False, False, True], [False] * 3]


def test_to_padded_left_align():
    r = Ragged.from_lists([[1, 2, 3, 4], [5], []])
    dense, mask = r.to_padded(3, pad_value=-1, align="left")
    assert dense.tolist() == [[1, 2, 3], [5, -1, -1], [-1, -1, -1]]
    assert mask.tolist() == [[True] * 3, [True, False, False], [False] * 3]


def test_isin_per_row():
    inview = Ragged.from_lists([[1, 2, 3], [4, 5, 6], [7, 8]])
    clicked = Ragged.from_lists([[2, 3, 4], [3, 5], []])
    # reference doctest: create_binary_labels_column (_behaviors.py:40-84)
    got = inview.isin_per_row(clicked).astype(int)
    assert got.tolist() == [0, 1, 1, 0, 1, 0, 0, 0]


def test_filter_values():
    r = Ragged.from_lists([[1, 2, 3], [4], [], [5, 6]])
    keep = np.array([True, False, True, False, True, True])
    assert r.filter_values(keep).to_lists() == [[1, 3], [], [], [5, 6]]


def test_concat_values():
    a = Ragged.from_lists([[1, 2], [], [3]])
    b = Ragged.from_lists([[9], [8], [7, 6]])
    assert a.concat_values(b).to_lists() == [[1, 2, 9], [8], [3, 7, 6]]


def test_shuffle_within_rows_preserves_rows():
    rng = np.random.default_rng(1)
    rows = [[1, 2, 3, 4, 5], [6], [], [7, 8]]
    r = Ragged.from_lists(rows)
    shuffled, perm = r.shuffle_within_rows(rng)
    assert shuffled.offsets.tolist() == r.offsets.tolist()
    for i, row in enumerate(rows):
        assert sorted(shuffled.row(i).tolist()) == sorted(row)
    # perm applies to parallel columns
    np.testing.assert_array_equal(r.values[perm], shuffled.values)


def test_from_dense():
    m = np.arange(6).reshape(2, 3)
    assert Ragged.from_dense(m).to_lists() == [[0, 1, 2], [3, 4, 5]]


def test_row_ids():
    r = Ragged.from_lists([[1, 2], [], [3]])
    assert r.row_ids().tolist() == [0, 0, 2]

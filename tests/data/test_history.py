"""History-construction parity with the reference docstring tables
(reference: _behaviors.py:657-1021 examples)."""
import numpy as np
import pytest

from ebnerd_tpu import constants as c
from ebnerd_tpu.data.history import (
    create_dynamic_history,
    create_fixed_history,
    create_fixed_history_aggr_columns,
)
from ebnerd_tpu.data.table import Table

NULL = -1  # sentinel standing in for the reference's polars nulls


def _df():
    return Table({
        c.DEFAULT_USER_COL: np.array([0, 0, 0, 1, 1, 1, 0, 2]),
        c.DEFAULT_ARTICLE_ID_COL: np.array(
            [9604210, 9634540, 9640420, 9647983, 9647984, 9647981, NULL, NULL]
        ),
        c.DEFAULT_IMPRESSION_TIMESTAMP_COL: np.array(
            ["2023-02-18", "2023-02-18", "2023-02-25", "2023-02-22",
             "2023-02-21", "2023-02-23", "2023-02-19", "2023-02-26"],
            dtype="datetime64[us]",
        ),
        c.DEFAULT_READ_TIME_COL: np.array([0, 2, 8, 13, 1, 1, 6, 1]),
    })


def test_dynamic_history_matches_reference_table():
    out = create_dynamic_history(_df(), 3, null_value=NULL)
    hist = out["history_dynamic"]
    # sorted (user, time): rows for user 0: 02-18, 02-18, 02-19(null), 02-25
    assert hist.to_lists() == [
        [], [9604210], [9604210, 9634540], [9604210, 9634540],
        [], [9647984], [9647984, 9647983],
        [],
    ]


def test_fixed_history_matches_reference_table():
    dt = np.datetime64("2023-02-24", "us")
    out = create_fixed_history(_df(), dt, null_value=NULL)
    hist = out["history_fixed"]
    assert hist.to_lists() == [
        [9604210, 9634540]] * 4 + [[9647984, 9647983, 9647981]] * 3 + [[]]
    out1 = create_fixed_history(_df(), dt, history_size=1, null_value=NULL)
    assert out1["history_fixed"].to_lists() == (
        [[9634540]] * 4 + [[9647981]] * 3 + [[]]
    )


def test_fixed_history_aggr_columns_matches_reference_table():
    dt = np.datetime64("2023-02-24", "us")
    out = create_fixed_history_aggr_columns(
        _df(), dt, columns=[c.DEFAULT_READ_TIME_COL], null_value=NULL
    )
    assert out[c.DEFAULT_ARTICLE_ID_COL + "_fixed"].to_lists() == (
        [[9604210, 9634540]] * 4 + [[9647984, 9647983, 9647981]] * 3 + [[]]
    )
    assert out[c.DEFAULT_READ_TIME_COL + "_fixed"].to_lists() == (
        [[0, 2]] * 4 + [[1, 13, 1]] * 3 + [[]]
    )
    out1 = create_fixed_history_aggr_columns(
        _df(), dt, history_size=1, columns=[c.DEFAULT_READ_TIME_COL],
        null_value=NULL,
    )
    assert out1[c.DEFAULT_ARTICLE_ID_COL + "_fixed"].to_lists() == (
        [[9634540]] * 4 + [[9647981]] * 3 + [[]]
    )
    assert out1[c.DEFAULT_READ_TIME_COL + "_fixed"].to_lists() == (
        [[2]] * 4 + [[1]] * 3 + [[]]
    )

"""Submission protocol round-trip (reference: src/ebrec/utils/_python.py:41-148)."""
import zipfile

import numpy as np
import pytest

from ebnerd_tpu.data.ragged import Ragged
from ebnerd_tpu.utils.submission import (
    rank_predictions_by_score,
    rank_ragged_scores,
    read_submission_file,
    write_submission_file,
)


def test_rank_predictions_by_score():
    # doctest from the reference (_python.py:41-59)
    np.testing.assert_array_equal(
        rank_predictions_by_score([0.1, 0.4, 0.2]), [3, 1, 2]
    )
    np.testing.assert_array_equal(rank_predictions_by_score([5.0]), [1])


def test_rank_ragged_matches_per_row():
    rng = np.random.default_rng(2)
    rows = [rng.random(rng.integers(1, 12)).astype(np.float32) for _ in range(50)]
    ragged = Ragged.from_lists(rows, dtype=np.float32)
    ranked = rank_ragged_scores(ragged)
    for i, r in enumerate(rows):
        np.testing.assert_array_equal(ranked.row(i), rank_predictions_by_score(r))


def test_submission_file_roundtrip(tmp_path):
    ids = [42, 7, 999]
    ranks = Ragged.from_lists([[1, 3, 2], [2, 1], [1]], dtype=np.int32)
    path = tmp_path / "predictions.txt"
    write_submission_file(ids, ranks, path, rm_file=False)
    # exact line format: "<impid> [r1,r2,...]" with no spaces inside the list
    lines = path.read_text().splitlines()
    assert lines[0] == "42 [1,3,2]"
    assert lines[1] == "7 [2,1]"
    assert lines[2] == "999 [1]"
    back_ids, back_ranks = read_submission_file(path)
    np.testing.assert_array_equal(back_ids, ids)
    assert back_ranks.to_lists() == ranks.to_lists()
    # zip exists and contains the txt
    with zipfile.ZipFile(tmp_path / "predictions.zip") as zf:
        assert zf.namelist() == ["predictions.txt"]


def test_submission_rm_file(tmp_path):
    path = tmp_path / "predictions.txt"
    write_submission_file([1], Ragged.from_lists([[1, 2]], dtype=np.int32), path)
    assert not path.exists()
    assert (tmp_path / "predictions.zip").exists()

"""utils/misc parity tests (reference: src/ebrec/utils/_python.py)."""
import numpy as np
import pytest

from ebnerd_tpu.utils.misc import (
    batch_items_generator,
    compute_npratio,
    convert_to_nested_list,
    create_lookup_dict,
    get_object_variables,
    read_json_file,
    repeat_by_list_values_from_matrix,
    time_it,
    unnest_dictionary,
    write_json_file,
)


def test_batch_items_generator():
    assert list(batch_items_generator(range(7), 3)) == [[0, 1, 2], [3, 4, 5], [6]]
    assert list(batch_items_generator([], 3)) == []


def test_unnest_dictionary():
    assert unnest_dictionary({"a": 1, "b": {"c": 2, "d": {"e": 3}}}) == {
        "a": 1, "b.c": 2, "b.d.e": 3,
    }


def test_compute_npratio_and_nested_list():
    assert compute_npratio(2, 9) == 4.5
    assert convert_to_nested_list([1, 2, 3, 4, 5], 2) == [[1, 2], [3, 4], [5]]


def test_repeat_by_list_values_from_matrix():
    m = np.arange(12).reshape(4, 3)
    out = repeat_by_list_values_from_matrix([0, 2], m, [2, 1])
    np.testing.assert_array_equal(out, np.stack([m[0], m[0], m[2]]))


def test_json_roundtrip(tmp_path):
    obj = {"a": 1, "b": [1, 2, 3]}
    write_json_file(obj, tmp_path / "x.json")
    assert read_json_file(tmp_path / "x.json") == obj


def test_time_it_logs():
    logs = []
    with time_it("block", log=logs.append):
        pass
    assert len(logs) == 1 and "block" in logs[0]


def test_object_variables_and_lookup_dict():
    class Obj:
        pass

    o = Obj()
    o.x, o.y = 1, "s"
    assert get_object_variables(o) == {"x": 1, "y": "s"}
    assert create_lookup_dict({1: "a"}) == {1: "a"}

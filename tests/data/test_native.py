"""Native C++ ragged kernels must be bit-identical to the numpy fallback
(ebnerd_tpu/native/ragged_kernels.cc vs data/ragged.py)."""
import numpy as np
import pytest

from ebnerd_tpu import native
from ebnerd_tpu.data.lookup import Lookup
from ebnerd_tpu.data.ragged import Ragged, _ranges


@pytest.fixture(scope="module")
def built():
    if native.lib() is None:
        pytest.skip("native library unavailable (no g++?)")
    return native.lib()


def _random_ragged(rng, n_rows=500, max_len=12, dtype=np.int32):
    lengths = rng.integers(0, max_len + 1, n_rows)
    values = rng.integers(0, 10_000, int(lengths.sum())).astype(dtype)
    return Ragged.from_lengths(values, lengths)


def test_gather_ranges_matches_numpy(built):
    rng = np.random.default_rng(0)
    r = _random_ragged(rng)
    starts = r.offsets[:-1]
    lengths = r.lengths
    total = int(lengths.sum())
    out = native.gather_ranges(r.values, starts, lengths, total)
    ref = r.values[_ranges(starts, lengths, total)]
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("dtype", [np.int32, np.int64, np.float32])
def test_take_rows_and_tail_all_dtypes(built, dtype):
    rng = np.random.default_rng(1)
    r = _random_ragged(rng, dtype=dtype)
    idx = rng.integers(0, len(r), 300)
    import os
    os.environ["EBNERD_TPU_NO_NATIVE"] = "1"
    try:
        ref_take = r.take_rows(idx)
        ref_tail = r.tail(3)
    finally:
        os.environ.pop("EBNERD_TPU_NO_NATIVE")
    got_take = r.take_rows(idx)
    got_tail = r.tail(3)
    np.testing.assert_array_equal(got_take.values, ref_take.values)
    np.testing.assert_array_equal(got_take.offsets, ref_take.offsets)
    np.testing.assert_array_equal(got_tail.values, ref_tail.values)
    np.testing.assert_array_equal(got_tail.offsets, ref_tail.offsets)


@pytest.mark.parametrize("align", ["right", "left"])
def test_to_padded_matches_numpy(built, align):
    rng = np.random.default_rng(2)
    r = _random_ragged(rng, n_rows=200, max_len=9)
    import os
    os.environ["EBNERD_TPU_NO_NATIVE"] = "1"
    try:
        ref_out, ref_mask = r.to_padded(6, pad_value=0, align=align)
    finally:
        os.environ.pop("EBNERD_TPU_NO_NATIVE")
    out, mask = r.to_padded(6, pad_value=0, align=align)
    np.testing.assert_array_equal(out, ref_out)
    np.testing.assert_array_equal(mask, ref_mask)


def test_map_ids_matches_numpy(built):
    rng = np.random.default_rng(3)
    ids = np.unique(rng.integers(0, 100_000, 5_000)).astype(np.uint32)
    lk = Lookup.from_values(ids, rng.integers(0, 9, (len(ids), 4)).astype(np.int32))
    query = rng.integers(0, 120_000, 20_000).astype(np.uint32)
    import os
    os.environ["EBNERD_TPU_NO_NATIVE"] = "1"
    try:
        ref = lk.map_ids(query)
    finally:
        os.environ.pop("EBNERD_TPU_NO_NATIVE")
    got = lk.map_ids(query)
    np.testing.assert_array_equal(got, ref)
    assert got.dtype == np.int32


def test_isin_per_row_matches_numpy(built):
    rng = np.random.default_rng(4)
    a = _random_ragged(rng, n_rows=400, max_len=10)
    b_lengths = rng.integers(0, 3, 400)
    b = Ragged.from_lengths(
        rng.integers(0, 10_000, int(b_lengths.sum())).astype(np.int32), b_lengths)
    import os
    os.environ["EBNERD_TPU_NO_NATIVE"] = "1"
    try:
        ref = a.isin_per_row(b)
    finally:
        os.environ.pop("EBNERD_TPU_NO_NATIVE")
    got = a.isin_per_row(b)
    np.testing.assert_array_equal(got, ref)

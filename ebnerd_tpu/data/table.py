"""A minimal columnar table: named columns of np.ndarray or Ragged.

Plays the role polars DataFrames play in the reference data layer
(reference: src/ebrec/utils/_polars.py) with only the operations the
EB-NeRD pipelines need. Row-level transforms stay vectorized; list
columns are Ragged (offsets+values) so they convert to/from Arrow
without copies and to dense padded device arrays in one shot.
"""
from __future__ import annotations

from typing import Iterator, Mapping, Union

import numpy as np
import pyarrow as pa

from .ragged import Ragged

Column = Union[np.ndarray, Ragged]

__all__ = ["Table", "read_parquet", "write_parquet"]


class Table:
    def __init__(self, columns: Mapping[str, Column]):
        self._cols: dict[str, Column] = dict(columns)
        n = {len(c) if isinstance(c, Ragged) else c.shape[0] for c in self._cols.values()}
        if len(n) > 1:
            raise ValueError(f"column length mismatch: { {k: len(v) if isinstance(v, Ragged) else v.shape[0] for k, v in self._cols.items()} }")
        self._n = n.pop() if n else 0

    # -- dict-ish API -----------------------------------------------------
    def __len__(self) -> int:
        return self._n

    def __contains__(self, name: str) -> bool:
        return name in self._cols

    def __getitem__(self, name: str) -> Column:
        return self._cols[name]

    def __iter__(self) -> Iterator[str]:
        return iter(self._cols)

    @property
    def columns(self) -> list[str]:
        return list(self._cols)

    def with_columns(self, **cols: Column) -> "Table":
        out = dict(self._cols)
        out.update(cols)
        return Table(out)

    def select(self, names: list[str]) -> "Table":
        return Table({n: self._cols[n] for n in names})

    def drop(self, names: list[str]) -> "Table":
        return Table({n: c for n, c in self._cols.items() if n not in names})

    def rename(self, mapping: Mapping[str, str]) -> "Table":
        return Table({mapping.get(n, n): c for n, c in self._cols.items()})

    # -- row ops ------------------------------------------------------------
    def take(self, indices: np.ndarray) -> "Table":
        indices = np.asarray(indices)
        return Table({
            n: c.take_rows(indices) if isinstance(c, Ragged) else c[indices]
            for n, c in self._cols.items()
        })

    def filter(self, mask: np.ndarray) -> "Table":
        return self.take(np.flatnonzero(np.asarray(mask, dtype=bool)))

    def head(self, n: int) -> "Table":
        return self.take(np.arange(min(n, self._n)))

    def slice(self, start: int, length: int) -> "Table":
        stop = min(start + length, self._n)
        return self.take(np.arange(start, stop))

    def sample_fraction(self, fraction: float, rng: np.random.Generator, shuffle: bool = True) -> "Table":
        k = int(round(self._n * fraction))
        idx = rng.choice(self._n, size=k, replace=False)
        if not shuffle:
            idx = np.sort(idx)
        return self.take(idx)

    def shuffle(self, rng: np.random.Generator) -> "Table":
        return self.take(rng.permutation(self._n))

    def concat(self, other: "Table") -> "Table":
        out = {}
        for n, c in self._cols.items():
            o = other[n]
            if isinstance(c, Ragged):
                values = np.concatenate([c.values, o.values])
                offsets = np.concatenate([c.offsets, o.offsets[1:] + c.offsets[-1]])
                out[n] = Ragged(values, offsets)
            else:
                out[n] = np.concatenate([c, o])
        return Table(out)

    def to_dict(self) -> dict[str, list]:
        return {
            n: (c.to_lists() if isinstance(c, Ragged) else c.tolist())
            for n, c in self._cols.items()
        }

    def __repr__(self) -> str:
        parts = ", ".join(
            f"{n}: {'list[' + str(c.values.dtype) + ']' if isinstance(c, Ragged) else c.dtype}"
            for n, c in self._cols.items()
        )
        return f"Table(n={self._n}, {parts})"

    # -- arrow interop -------------------------------------------------------
    @staticmethod
    def from_arrow(table: pa.Table, columns: list[str] | None = None) -> "Table":
        cols: dict[str, Column] = {}
        names = columns if columns is not None else table.column_names
        for name in names:
            arr = table.column(name).combine_chunks()
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.chunk(0) if arr.num_chunks else pa.array([], type=arr.type)
            cols[name] = _from_arrow_array(arr)
        return Table(cols)

    def to_arrow(self) -> pa.Table:
        arrays, names = [], []
        for n, c in self._cols.items():
            names.append(n)
            if isinstance(c, Ragged):
                arrays.append(
                    pa.LargeListArray.from_arrays(pa.array(c.offsets), pa.array(c.values))
                )
            elif c.dtype == object:
                arrays.append(pa.array(c.tolist()))
            else:
                arrays.append(pa.array(c))
        return pa.table(dict(zip(names, arrays)))


def _from_arrow_array(arr: pa.Array) -> Column:
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        if arr.null_count:
            # null rows → empty rows (reference treats null clicked lists as no clicks)
            arr = arr.fill_null([])
        offsets = np.asarray(arr.offsets, dtype=np.int64)
        values = _scalar_np(arr.values)
        # trim leading offset (sliced arrays)
        if offsets[0] != 0:
            values = values[offsets[0]:offsets[-1]]
            offsets = offsets - offsets[0]
        return Ragged(values, offsets)
    return _scalar_np(arr)


def _scalar_np(arr: pa.Array) -> np.ndarray:
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return np.asarray(arr.to_pylist(), dtype=object)
    if pa.types.is_timestamp(arr.type):
        return np.asarray(arr.cast(pa.int64())).astype("datetime64[us]")
    np_arr = arr.to_numpy(zero_copy_only=False)
    return np.asarray(np_arr)


def read_parquet(path, columns: list[str] | None = None) -> Table:
    import pyarrow.parquet as pq

    return Table.from_arrow(pq.read_table(path, columns=columns), columns)


def write_parquet(table: Table, path) -> None:
    import pyarrow.parquet as pq

    pq.write_table(table.to_arrow(), path)

"""Property fuzz for the Thrift-compact parquet footer walker
(sinks/parquet_footer.py): pyarrow writes parquet files over randomized
schemas — flat primitives, lists, structs, maps, nested combinations,
multiple row groups, empty tables — and the walker's num_rows /
top-level column names must agree with pyarrow's OWN footer parse.
(pyarrow-written footers are the cross-check corpus; the walker's reason
to exist — footers pyarrow rejects — is covered in test_variant.py.)"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opentelemetry_iceberg_exporter_spark.sinks.parquet_footer import (
    footer_column_names,
    footer_num_rows,
)

_PRIMITIVES = [
    pa.int32(),
    pa.int64(),
    pa.float64(),
    pa.string(),
    pa.bool_(),
    pa.binary(),
    pa.timestamp("us"),
    pa.date32(),
    pa.decimal128(12, 3),
]


def _random_type(rng: random.Random, depth: int = 0) -> pa.DataType:
    roll = rng.random()
    if depth >= 2 or roll < 0.55:
        return rng.choice(_PRIMITIVES)
    if roll < 0.70:
        return pa.list_(_random_type(rng, depth + 1))
    if roll < 0.85:
        n = rng.randint(1, 3)
        return pa.struct(
            [pa.field(f"s{i}", _random_type(rng, depth + 1)) for i in range(n)]
        )
    return pa.map_(pa.string(), _random_type(rng, depth + 1))


def _null_array(t: pa.DataType, n: int) -> pa.Array:
    return pa.nulls(n, type=t)


@pytest.mark.parametrize("seed", range(25))
def test_walker_agrees_with_pyarrow(tmp_path, seed):
    rng = random.Random(seed)
    n_cols = rng.randint(1, 6)
    names = [f"c{i}" for i in range(n_cols)]
    schema = pa.schema(
        [pa.field(n, _random_type(rng)) for n in names]
    )
    n_rows = rng.choice([0, 1, 7, 130])
    table = pa.Table.from_arrays(
        [_null_array(f.type, n_rows) for f in schema], schema=schema
    )
    path = str(tmp_path / f"f{seed}.parquet")
    pq.write_table(
        table, path, row_group_size=rng.choice([3, 50, 1000])
    )
    meta = pq.ParquetFile(path).metadata
    assert footer_num_rows(path) == meta.num_rows == n_rows
    assert footer_column_names(path) == set(schema.names)


def test_walker_on_every_testdata_table():
    base = "/root/testdata/sf0.001"
    for name in sorted(os.listdir(base)):
        if not name.endswith(".parquet"):
            continue
        p = os.path.join(base, name)
        meta = pq.ParquetFile(p).metadata
        assert footer_num_rows(p) == meta.num_rows, name
        assert footer_column_names(p) == set(
            pq.read_schema(p).names
        ), name

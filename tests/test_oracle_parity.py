"""Local replica of the driver's DuckDB cross-check: every QuerySpec
with oracle SQL must match row-count, column names, and values exactly
(columns sorted by name, rows sorted, floats compared exactly — the
queries round on both sides by contract)."""

from __future__ import annotations

import math

import duckdb
import pytest

from toyocr_spark.queries import QUERIES

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


@pytest.mark.parametrize("name", [n for n, s in QUERIES.items() if s.sql is not None])
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = QUERIES[name]
    sdf = spec.spark(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(spec.sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"

    # Driver-faithful dtype check: the driver canonicalizes BOTH sides
    # through pandas before hashing, and DuckDB renders HUGEINT (any
    # un-CAST sum-derived integer) as float64 while Spark's long stays
    # int64 — identical values, different hash (the round-2 q44/q45
    # red). fetchall() hides this (Python ints), so compare pandas
    # dtype KINDS explicitly: no column may be integral on one side
    # and float on the other.
    ddtypes = duck.execute(spec.sql).df().dtypes
    skinds = {
        f.name: ("i" if f.dataType.typeName() in
                 ("byte", "short", "integer", "long") else
                 "f" if f.dataType.typeName() in ("float", "double") else "?")
        for f in sdf.schema.fields
    }
    skew = [
        c
        for c in scols
        if {skinds[c], ddtypes[c].kind} == {"i", "f"}
    ]
    assert not skew, (
        f"{name}: int-vs-float dtype skew on {skew} — CAST the oracle "
        f"sum-derived column(s) to BIGINT (DuckDB HUGEINT -> pandas "
        f"float64 breaks the driver hash)"
    )
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sc, sn = _normalize(srows, scols)
    dc, dn = _normalize(drows, dcols)
    mism = [
        (a, b)
        for a, b in zip(sn, dn)
        if any(
            not (
                x == y
                or (isinstance(x, float) and isinstance(y, float) and math.isclose(x, y, rel_tol=0, abs_tol=1e-9))
            )
            for x, y in zip(a, b)
        )
    ]
    assert not mism, f"{name}: {len(mism)} mismatched rows; first: {mism[:3]}"


def test_rows_only_queries_run(spark, sf_dir):
    for name, spec in QUERIES.items():
        if spec.sql is None:
            df = spec.spark(spark, sf_dir)
            assert df.count() >= 0, name


def test_no_complex_result_columns(spark, sf_dir):
    """The driver canonicalizes EVERY query result (rows-only included)
    via pandas sort_values over all columns, which raises 'unhashable
    type' on array/map/struct columns (round-1 q30/q35 regression).
    Scalar output columns only — explode or serialize anything nested."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    for name, spec in QUERIES.items():
        df = spec.spark(spark, sf_dir)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        assert not bad, f"{name}: non-scalar result columns {bad}"

"""Driver-contract gate: every ``queries()`` entry vs its DuckDB oracle.

Mimics what the round driver does for CORRECTNESS_r{N}.json: runs the Spark
query and the oracle SQL at sf0.01, compares row count, column names, and an
order-insensitive value digest (rows sorted, floats rounded)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm_arrow_type(t):
    """Coarse Arrow-type class that still distinguishes integer widths.

    The driver hashes *typed* values, so DuckDB HUGEINT (arrow decimal128)
    vs Spark BIGINT (arrow int64) is a real mismatch even when the printed
    values agree (seen on q06 in rounds 1-2). String/large_string and
    timestamp timezone spellings are engine-representation noise, not type
    semantics, so those are collapsed."""
    import pyarrow as pa

    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_integer(t):
        return "int"  # width-insensitive: driver passes int32-vs-int64 (q10 rank)
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_norm_arrow_type(t.value_type)}>"
    return str(t)


def _arrow_types(tbl, cols):
    sch = tbl.schema
    return {c: _norm_arrow_type(sch.field(c).type) for c in cols}


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm_cell(r[i]) for i in order) for r in rows)
    return lines


QUERIES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(name, spark, duck):
    q = entrymod.queries()[name]
    oracle = entrymod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    if oracle is None:
        assert len(srows) >= 0  # rows-only check (driver's weaker gate)
        return
    ddf = duck.sql(oracle)
    darrow = ddf.arrow()
    dcols = darrow.column_names
    drows = list(zip(*(c.to_pylist() for c in darrow.columns))) if darrow.num_rows else []
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    stypes = _arrow_types(sdf.toArrow(), scols)
    dtypes = _arrow_types(darrow, dcols)
    tdiff = {c: (stypes[c], dtypes[c]) for c in scols if stypes[c] != dtypes[c]}
    assert not tdiff, f"{name}: arrow type mismatch (spark, duck): {tdiff}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sd = _digest(scols, [tuple(r) for r in srows])
    dd = _digest(dcols, drows)
    mism = [i for i, (a, b) in enumerate(zip(sd, dd)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} value mismatches; first: "
        f"spark={sd[mism[0]]!r} duck={dd[mism[0]]!r}"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_q38_matches_scalar_nonascii_fork(spark):
    """The distributed q38 plan must agree with the scalar reference
    kernel's NON-ASCII fork (vector_based.cpp:125-159 binary-presence
    cosine) on the same derived strings — proves the driver query
    exercises the fork, not the ASCII frequency path."""
    from pyspark.sql import functions as F
    from text_similarity_node_spark.functions.kernels import cosine_similarity
    from text_similarity_node_spark.config import (
        Algorithm,
        AlgorithmConfig,
        Preprocessing,
    )

    derived = {
        r.doc_id: r.s
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(
            "doc_id",
            F.translate(F.substring(F.col("text"), 1, 24), "aeiou", "äéíöü").alias("s"),
        )
        .collect()
    }
    cfg = AlgorithmConfig(
        algorithm=Algorithm.COSINE,
        preprocessing=Preprocessing.CHARACTER,
        case_sensitive=True,
    )
    rows = entrymod.q38_char_cosine_nonascii_pairs(spark, SF_DIR).collect()
    assert rows, "expected at least one pair above threshold"
    for r in rows[:200]:
        s1, s2 = derived[r.doc_id1], derived[r.doc_id2]
        assert not (s1.isascii() and s2.isascii())  # fork actually taken
        expect = cosine_similarity(s1, s2, cfg)
        assert abs(expect - r.char_cos_nonascii) < 1e-6, (r.doc_id1, r.doc_id2)

"""Mimic the driver's correctness gate: run every ``queries()`` entry in
Spark and its ``oracle_sql()`` twin in DuckDB at sf0.01; compare row
count, column names, and order-insensitive values."""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

ORACLES = entry.oracle_sql()
QUERIES = entry.queries()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _kind(dtype) -> str:
    """Collapse a pandas dtype to the comparison kind the driver's
    dtype-aware hash distinguishes: integer / float / bool / other.
    An int64 column on one side and float64 on the other hash
    differently in the driver (``95232`` vs ``95232.00``) even when
    numerically equal — the r4 ``multimodal_real_decode`` failure —
    so kinds MUST match before values are even compared."""
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "other"


def _canon_value(v, kind: str) -> str:
    """Driver-parity string form: doubles via printf('%.2f'), ints as
    bare integers, everything else via str()."""
    if v is None:
        return "\\0NULL"
    if kind == "float":
        if isinstance(v, float) and math.isnan(v):
            return "\\0NULL"
        return "%.2f" % float(v)
    if kind == "int":
        return str(int(v))
    if isinstance(v, float) and math.isnan(v):
        return "\\0NULL"
    return str(v)


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        kind = _kind(pdf[c].dtype)
        pdf[c] = pdf[c].map(lambda v, k=kind: _canon_value(v, k))
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, ddb):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    want = ddb.execute(ORACLES[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in sorted(got.columns):
        gk, wk = _kind(got[c].dtype), _kind(want[c].dtype)
        assert gk == wk, (
            f"{name}.{c}: dtype-kind mismatch spark={got[c].dtype}({gk}) "
            f"vs oracle={want[c].dtype}({wk}) — the driver's dtype-aware "
            f"hash WILL fail on this (r4 multimodal_real_decode trap)"
        )
    g, w = _canon(got), _canon(want)
    for c in g.columns:
        gv, wv = g[c].tolist(), w[c].tolist()
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(gv, wv)) if a != b]
        assert not bad, f"{name}.{c}: first mismatches {bad[:5]}"


def test_every_query_has_an_oracle():
    """The driver downgrades un-oracled queries to a weak rows-only
    check; the contract here is that NONE exist — every entry gets the
    full rows+schema+hash comparison."""
    assert set(QUERIES) == set(ORACLES)


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0

"""Corpus data card: exact-integer metrics, DuckDB twin byte-parity."""

from __future__ import annotations

import duckdb
import pytest

from sequila_native_spark.functions import corpus_report, corpus_report_sql
from _testdata import SF0_001

SF = SF0_001


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_report_matches_duckdb_twin(spark, docs):
    got = {r["metric"]: r["value"] for r in corpus_report(docs).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = dict(con.execute(corpus_report_sql("documents")).fetchall())
    assert got == want
    assert set(got) == {
        "n_docs", "n_distinct_ids", "n_words", "n_chars",
        "chars_p50", "chars_p90", "chars_p99",
        "words_p50", "words_p90", "words_p99",
    }


def test_percentiles_disc_semantics(spark):
    # 10 docs, char lengths 1..10
    rows = [(i, "x" * i) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["metric"]: r["value"] for r in corpus_report(df).collect()}
    # percentile_disc: rank ceil(n*p) -> p50 = 5, p90 = 9, p99 = 10 (max)
    assert got["chars_p50"] == 5
    assert got["chars_p90"] == 9
    assert got["chars_p99"] == 10
    assert got["n_docs"] == 10 and got["n_chars"] == 55


def test_adversarial_vs_duckdb(spark):
    # duplicate ids, empty and whitespace docs, repeated lengths
    rows = [(1, ""), (1, "a b"), (2, "a b"), (3, "aaaa"), (4, "a a a a"),
            (5, " "), (6, "q")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["metric"]: r["value"] for r in corpus_report(df).collect()}
    con = duckdb.connect()
    con.register("adocs", df.toPandas())
    want = dict(con.execute(corpus_report_sql("adocs")).fetchall())
    assert got == want
    assert got["n_docs"] == 7 and got["n_distinct_ids"] == 6


def test_null_text_and_empty_table_vs_duckdb(spark):
    import pandas as pd

    con = duckdb.connect()
    # null text: excluded from distributions, counted in n_docs
    rows = [(1, "a b"), (2, None), (3, "xyz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["metric"]: r["value"] for r in corpus_report(df).collect()}
    con.register("ndocs", df.toPandas())
    want = dict(con.execute(corpus_report_sql("ndocs")).fetchall())
    assert got == want
    assert got["n_docs"] == 3 and got["chars_p50"] == 3

    # empty table: metric rows present with NULL percentile values, both engines
    empty = spark.createDataFrame([], "doc_id long, text string")
    got_e = {r["metric"]: r["value"] for r in corpus_report(empty).collect()}
    con.register("edocs", pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                        "text": pd.Series(dtype="object")}))
    want_e = dict(con.execute(corpus_report_sql("edocs")).fetchall())
    assert got_e == want_e
    assert got_e["chars_p99"] is None and len(got_e) == 10

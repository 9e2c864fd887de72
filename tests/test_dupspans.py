"""ExactSubstr-style duplicated-span statistics (dupspans.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sequila_native_spark.functions import (
    duplicated_span_stats,
    duplicated_span_stats_sql,
    positioned_shingles,
)
from _testdata import SF0_001

SF = SF0_001


def _stats_py(docs: list[tuple[int, str]], n: int, min_count: int = 2):
    """Independent brute-force reference."""
    grams: dict[str, int] = {}
    per_doc = {}
    for doc_id, text in docs:
        toks = [t for t in text.lower().split(" ")] if text is not None else []
        gs = [
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ] if len(toks) >= n else []
        per_doc[doc_id] = (toks, gs)
        for g in gs:
            grams[g] = grams.get(g, 0) + 1
    out = {}
    for doc_id, (toks, gs) in per_doc.items():
        dup_pos = [i for i, g in enumerate(gs) if grams[g] >= min_count]
        covered: set[int] = set()
        for p in dup_pos:
            covered.update(range(p, p + n))
        out[doc_id] = (len(toks), max(len(toks) - n + 1, 0),
                       len(dup_pos), len(covered))
    return out


DOCS = [
    (1, "a b c d e f g h"),
    (2, "x y z a b c d e"),          # shares the 5-gram "a b c d e" head
    (3, "a b c d e f g h"),          # exact dup of 1
    (4, "p q r s t u v w"),          # clean
    (5, "m m m m m m m m m m"),      # within-doc repeats only
    (6, "short text"),               # < n tokens → zero grams
    (7, ""),                         # empty
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("n", [3, 5])
def test_matches_brute_force(spark, docs, n):
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_grams"], r["n_dup_grams"], r["dup_tokens"])
        for r in duplicated_span_stats(docs, n=n).collect()
    }
    assert got == _stats_py(DOCS, n)


def test_within_doc_repeats_count_as_duplicated(spark, docs):
    got = {r["doc_id"]: r for r in duplicated_span_stats(docs, n=3).collect()}
    # doc 5 is "m"*10 — every gram is "m m m", all instances duplicated,
    # every token covered
    assert got[5]["n_dup_grams"] == got[5]["n_grams"] == 8
    assert got[5]["dup_tokens"] == got[5]["n_tokens"] == 10
    # doc 4 is clean
    assert got[4]["n_dup_grams"] == 0 and got[4]["dup_tokens"] == 0
    # short/empty docs survive with zero grams
    assert got[6]["n_grams"] == 0 and got[7]["n_tokens"] == 1  # split('') = ['']


def test_duckdb_twin_hash_parity(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(
        tuple(r) for r in duplicated_span_stats(docs, n=8)
        .select("doc_id", "n_tokens", "n_grams", "n_dup_grams", "dup_tokens")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(
        duplicated_span_stats_sql("documents", n=8)
    ).fetchall())
    assert got == want
    assert any(r[3] > 0 for r in got), "fixture has no duplicated spans"


def test_coverage_law_merged_spans(spark):
    # overlapping duplicated grams must union, not double-count: two docs
    # sharing a 6-token run probed at n=5 → dup grams at pos 0,1 cover 6
    # tokens, not 10
    rows = [(1, "a b c d e f x y"), (2, "q a b c d e f r")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in duplicated_span_stats(df, n=5).collect()}
    assert got[1]["n_dup_grams"] == 2 and got[1]["dup_tokens"] == 6
    assert got[2]["n_dup_grams"] == 2 and got[2]["dup_tokens"] == 6


def test_validation(spark, docs):
    with pytest.raises(ValueError, match="n must be"):
        duplicated_span_stats(docs, n=0)
    with pytest.raises(ValueError, match="min_count"):
        duplicated_span_stats(docs, min_count=1)


def test_positioned_shingles_order_and_repeats(spark):
    df = spark.createDataFrame([(1, "a b a b a")], "doc_id long, text string")
    out = df.select(positioned_shingles(F.col("text"), 2).alias("g")).first()["g"]
    assert out == ["a b", "b a", "a b", "b a"]


def test_dupspans_tvf_matches_api(spark, docs):
    from sequila_native_spark.sql import sequila_sql

    docs.createOrReplaceTempView("dup_docs")
    got = sequila_sql(
        spark,
        "SELECT * FROM sequila_dupspans('dup_docs', 'text', 'doc_id', 3) "
        "ORDER BY doc_id",
    ).collect()
    want = duplicated_span_stats(docs, n=3).orderBy("doc_id").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    with pytest.raises(ValueError, match="sequila_dupspans takes"):
        sequila_sql(spark, "SELECT * FROM sequila_dupspans('dup_docs')")


def test_remove_duplicate_spans_python_parity(spark):
    """The removal pass (r7) against the independent Python reference,
    incl. null text, empty text, internal repeats, and full removal."""
    from sequila_native_spark.functions import remove_duplicate_spans
    from sequila_native_spark.functions.dupspans import remove_duplicate_spans_py

    rows = [
        (0, "a b c d e f g h x y z"),
        (1, "a b c d e f q r s"),
        (2, "unique text only here nothing shared at all"),
        (3, None),
        (4, ""),
        (5, "a b c d a b c d a b c d"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_duplicate_spans(docs, n=4, min_count=2)
    got = {r["doc_id"]: r["kept_text"] for r in out.collect()}
    assert got == remove_duplicate_spans_py(rows, n=4, min_count=2)


def test_remove_duplicate_spans_conservation_vs_stats(spark):
    """n_kept_tokens == n_tokens - dup_tokens against the ORACLE-checked
    stats operator at the same (n, min_count) — on the real corpus."""
    from sequila_native_spark.functions import (
        duplicated_span_stats,
        remove_duplicate_spans,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    stats = duplicated_span_stats(docs, n=4)
    rem = remove_duplicate_spans(docs, n=4).select(
        "doc_id", "n_kept_tokens", "kept_text"
    )
    joined = stats.join(rem, "doc_id")
    bad = joined.where(
        F.col("n_kept_tokens") != F.col("n_tokens") - F.col("dup_tokens")
    ).count()
    assert bad == 0
    # the kept text's own token count agrees (splice really removed them);
    # fully-removed docs produce '' whose single-space split is [''] -> 1
    n_mismatch = joined.where(
        (F.col("n_kept_tokens") > 0)
        & (F.size(F.split(F.col("kept_text"), " ")) != F.col("n_kept_tokens"))
    ).count()
    assert n_mismatch == 0
    assert joined.where(F.col("dup_tokens") > 0).count() > 0, "inert fixture"


def test_remove_duplicate_spans_validation_and_collisions(spark):
    from sequila_native_spark.functions import remove_duplicate_spans

    docs = spark.createDataFrame([(0, "a b", "x")],
                                 "doc_id long, text string, kept_text string")
    with pytest.raises(ValueError, match="collide"):
        remove_duplicate_spans(docs)
    clean = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_count"):
        remove_duplicate_spans(clean, min_count=1)
    with pytest.raises(ValueError, match="n must"):
        remove_duplicate_spans(clean, n=0)


def test_span_removal_tvf_matches_api(spark):
    from sequila_native_spark.functions import remove_duplicate_spans
    from sequila_native_spark.sql import sequila_sql

    docs = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b c d x y")],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("span_docs")
    got = {
        (r["doc_id"], r["kept_text"], r["n_kept_tokens"])
        for r in sequila_sql(
            spark,
            "SELECT doc_id, kept_text, n_kept_tokens FROM "
            "sequila_span_removal('span_docs', 'text', 'doc_id', 4)",
        ).collect()
    }
    want = {
        (r["doc_id"], r["kept_text"], r["n_kept_tokens"])
        for r in remove_duplicate_spans(docs, n=4).select(
            "doc_id", "kept_text", "n_kept_tokens").collect()
    }
    assert got == want
    with pytest.raises(ValueError, match="sequila_span_removal takes"):
        sequila_sql(spark, "SELECT * FROM sequila_span_removal('span_docs')")


def test_shared_starts_bit_identical(spark):
    """stats/removal fed a precomputed duplicated_span_starts frame (the
    r12 shared-subtree path used by q_doc_span_removal) return EXACTLY the
    rows of the independent computations — on the real corpus."""
    from sequila_native_spark.functions import (
        duplicated_span_starts,
        remove_duplicate_spans,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    starts = duplicated_span_starts(docs, n=4).localCheckpoint()

    solo_stats = duplicated_span_stats(docs, n=4)
    shared_stats = duplicated_span_stats(docs, n=4, starts=starts)
    assert sorted(map(tuple, solo_stats.collect())) == sorted(
        map(tuple, shared_stats.collect())
    )

    solo_rem = remove_duplicate_spans(docs, n=4)
    shared_rem = remove_duplicate_spans(docs, n=4, starts=starts)
    cols = ["doc_id", "kept_text", "n_tokens", "n_kept_tokens"]
    assert sorted(map(tuple, solo_rem.select(cols).collect())) == sorted(
        map(tuple, shared_rem.select(cols).collect())
    )
    assert shared_stats.where(F.col("dup_tokens") > 0).count() > 0, "inert"

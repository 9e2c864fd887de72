"""TF-IDF / BM25 — exact term stats vs DuckDB, scores vs an independent
Python reference, plan purity."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from sequila_native_spark.functions.ranking import (
    bm25_score_py,
    bm25_topk,
    term_stats,
    term_stats_sql,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown cat sleeps"),
    (3, "a lazy dog and a lazy cat nap in the sun"),
    (4, "foxes and dogs are not cats"),
    (5, "sun sun sun nothing but sun"),
]
QUERIES = [(100, "lazy dog"), (200, "quick cat sun")]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(QUERIES, "query_id int, query string")


def _py_stats():
    toks = {i: t.lower().split(" ") for i, t in DOCS}
    df = Counter()
    for i, ts in toks.items():
        for t in set(ts):
            df[t] += 1
    return toks, df


def test_term_stats_matches_duckdb(spark, corpus):
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"])
        for r in term_stats(corpus, min_df=2, max_df_ratio=0.8).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            term_stats_sql("documents", min_df=2, max_df_ratio=0.8)
        ).fetchall()
    }
    assert got == want
    # max_df_ratio=0.8 over 5 docs drops df>4 terms: 'the' (df 3) survives,
    # nothing hits df 5 here; min_df=2 drops hapaxes like 'jumps'
    assert all(df >= 2 for _, df in got.values())


def test_bm25_scores_match_reference(spark, corpus, queries):
    out = bm25_topk(corpus, queries, k=3)
    got = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["score"]) for r in out.collect()
    }
    toks, df = _py_stats()
    n_docs = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    for (qid, qtext) in QUERIES:
        qterms = set(qtext.lower().split(" "))
        scores = {
            d: bm25_score_py(toks[d], qterms, df, n_docs, avgdl) for d in toks
        }
        ranked = sorted(
            ((s, d) for d, s in scores.items() if s > 0),
            key=lambda x: (-x[0], x[1]),
        )[:3]
        for rank, (s, d) in enumerate(ranked, 1):
            assert (qid, d) in got, (qid, d, got)
            grank, gscore = got[(qid, d)]
            assert grank == rank
            assert abs(gscore - s) < 1e-9
    # no query returns more than k rows
    assert out.groupBy("query_id").count().agg(F.max("count")).collect()[0][0] <= 3


def test_bm25_prunes_to_query_terms_and_stays_jvm(spark, corpus, queries):
    from sequila_native_spark.plans.explain import formatted_plan

    out = bm25_topk(corpus, queries, k=2)
    plan = formatted_plan(out)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker
    assert "BroadcastHashJoin" in plan  # query terms broadcast to postings


def test_ranking_validation(spark, corpus, queries):
    with pytest.raises(ValueError, match="k must be positive"):
        bm25_topk(corpus, queries, k=0)
    with pytest.raises(ValueError, match="max_df_ratio"):
        term_stats(corpus, max_df_ratio=0.0)


def test_bm25_empty_docs_share_one_corpus_size(spark, queries):
    """Advisor finding (r5): with empty/whitespace-only documents, idf's N
    and the max_df_ratio ceiling must use the SAME corpus size (all docs),
    and empty docs enter avgdl with length 0."""
    rows = DOCS + [(6, ""), (7, "   ")]
    corpus7 = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_topk(corpus7, queries, k=10).collect()
    }
    toks, df = _py_stats()
    # whitespace-only doc 7 tokenizes to nothing under the engine's
    # tokenizer; both 6 and 7 count toward N with length 0
    n_docs = 7
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    for (qid, qtext) in QUERIES:
        qterms = set(qtext.lower().split(" "))
        for d, ts in toks.items():
            want = bm25_score_py(ts, qterms, df, n_docs, avgdl)
            if want > 0:
                assert abs(out[(qid, d)] - want) < 1e-9, (qid, d)


def test_bm25_rank_set_partition_invariant(spark):
    """VERDICT r5 item 7: the (query_id, doc_id, rank) SET must not depend
    on physical layout. Perturb partition count, row order, and shuffle
    width; every variant must produce the identical rank set (scores are
    float sums — the docstring's near-tie caveat — but for non-adversarial
    corpora the set is stable, and this pins it)."""
    import random

    rng = random.Random(13)
    words = ["alpha", "beta", "gamma", "delta", "sun", "dog", "cat", "fox",
             "lazy", "quick", "brown", "jumps", "river", "stone", "cloud"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(5, 40))))
        for i in range(120)
    ]
    queries = spark.createDataFrame(
        [(1, "lazy dog sun"), (2, "quick brown fox river"), (3, "cloud stone")],
        "query_id int, query string",
    )

    def rank_set(docs_df):
        return {
            (r["query_id"], r["doc_id"], r["rank"])
            for r in bm25_topk(docs_df, queries, k=7).collect()
        }

    base_df = spark.createDataFrame(rows, "doc_id int, text string")
    base = rank_set(base_df)
    assert len(base) == 21  # 3 queries x k=7 on a corpus this dense

    # partition-count perturbations
    for nparts in (1, 7, 64):
        assert rank_set(base_df.repartition(nparts)) == base, nparts
    # row-order perturbation (reversed insert order + random shuffle)
    shuffled = list(rows)
    rng.shuffle(shuffled)
    assert rank_set(spark.createDataFrame(shuffled, "doc_id int, text string")) == base
    # shuffle-width perturbation
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for width in ("5", "61"):
            spark.conf.set("spark.sql.shuffle.partitions", width)
            assert rank_set(base_df) == base, width
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)

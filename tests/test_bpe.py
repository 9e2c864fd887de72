"""BPE tokenizer: bounded-sample training + Arrow-batched application."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sequila_native_spark.functions import (
    bpe_token_count,
    bpe_tokenize,
    train_bpe,
)
from _testdata import SF0_001

SF = SF0_001


@pytest.fixture(scope="module")
def toy(spark):
    # classic BPE toy: 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3
    rows = [(0, " ".join(["low"] * 5 + ["lower"] * 2
                         + ["newest"] * 6 + ["widest"] * 3))]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_bpe_golden_merges(spark, toy):
    """First merges on the Sennrich toy corpus: ('e','s') 9, ('es','t') 9,
    ('est','</w>') 9 dominate; tie-breaks are lexicographic so the list is
    fully deterministic."""
    merges = train_bpe(toy, n_merges=4, id_col="doc_id")
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]
    # 4th: 'l','o' appears in low(5)+lower(2)=7, the max remaining
    assert merges[3] == ("l", "o")


def test_tokenize_matches_training_segmentation(spark, toy):
    """Applying the merge table reproduces training-time segmentation for
    every training word (the replay property of BPE)."""
    merges = train_bpe(toy, n_merges=10, id_col="doc_id")
    out = toy.select(bpe_tokenize(F.col("text"), merges).alias("toks")).first()
    toks = out["toks"]
    # reconstruct words: split token stream at </w> boundaries
    words, cur = [], ""
    for t in toks:
        cur += t
        if cur.endswith("</w>"):
            words.append(cur[: -len("</w>")])
            cur = ""
    assert words == ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3


def test_unseen_word_no_unk(spark, toy):
    merges = train_bpe(toy, n_merges=10, id_col="doc_id")
    df = spark.createDataFrame([(1, "lowest zzz")], "doc_id long, text string")
    toks = df.select(bpe_tokenize(F.col("text"), merges).alias("t")).first()["t"]
    assert "".join(toks) == "lowest</w>zzz</w>"  # lossless, no UNK
    # 'lowest' reuses learned units — lowest-rank-first application gives
    # the canonical ['low', 'est</w>'] split
    assert toks[:2] == ["low", "est</w>"]


def test_token_count_law_and_compression(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges = train_bpe(docs, n_merges=64, id_col="doc_id")
    got = docs.select(
        bpe_token_count(F.col("text"), merges).alias("n"),
        F.size(bpe_tokenize(F.col("text"), merges)).alias("m"),
        F.size(F.split(F.lower(F.col("text")), " ")).alias("words"),
    )
    bad = got.where("n != m").count()
    assert bad == 0
    agg = got.agg(F.sum("n"), F.sum("words")).first()
    # subword tokens >= words (every word is >= 1 token) but far below
    # character count; with 64 merges on a 30-word vocab corpus the common
    # words collapse to single units
    assert agg[0] >= agg[1]


def test_training_repartition_stable(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = train_bpe(docs, n_merges=32, id_col="doc_id")
    b = train_bpe(docs.repartition(7), n_merges=32, id_col="doc_id")
    assert a == b


def test_min_pair_count_stops_memorization(spark):
    # every pair occurs once: nothing reaches min_pair_count=2
    frame = spark.createDataFrame(
        [(0, "abcdefg hijklmn")], "doc_id long, text string"
    )
    assert train_bpe(frame, n_merges=10, id_col="doc_id") == []


def test_validation(spark, toy):
    with pytest.raises(ValueError, match="n_merges"):
        train_bpe(toy, n_merges=-1)
    with pytest.raises(ValueError, match="sample_size"):
        train_bpe(toy, sample_size=0)


def test_tvf_bpe_count_matches_api(spark, toy):
    from sequila_native_spark.sql import sequila_sql

    merges = train_bpe(toy, n_merges=6, id_col="doc_id")
    spark.createDataFrame(
        [(a, b, i) for i, (a, b) in enumerate(merges)],
        "left string, right string, rank int",
    ).createOrReplaceTempView("bpe_merges")
    toy.createOrReplaceTempView("bpe_docs")
    got = sequila_sql(
        spark,
        "SELECT * FROM sequila_bpe_count('bpe_docs', 'bpe_merges', "
        "'text', 'doc_id')",
    ).first()
    want = toy.select(
        bpe_token_count(F.col("text"), merges).alias("n_bpe_tokens")
    ).first()
    assert got["n_bpe_tokens"] == want["n_bpe_tokens"]
    with pytest.raises(ValueError, match="sequila_bpe_count takes"):
        sequila_sql(spark, "SELECT * FROM sequila_bpe_count('bpe_docs')")


def test_pack_documents_accepts_bpe_counts(spark, toy):
    from sequila_native_spark.functions import pack_documents

    docs = spark.createDataFrame(
        [(1, "low low newest"), (2, "widest lower")],
        "doc_id long, text string",
    )
    merges = train_bpe(toy, n_merges=6, id_col="doc_id")
    with_counts = docs.withColumn(
        "bpe_n", bpe_token_count(F.col("text"), merges)
    )
    out = pack_documents(
        with_counts, capacity=8, shards=1, n_tokens_col="bpe_n"
    ).collect()
    got = {r["doc_id"]: r["n_tokens"] for r in out}
    want = {r["doc_id"]: r["bpe_n"] for r in with_counts.collect()}
    assert got == want  # packing arithmetic runs on the subword counts


def test_null_and_empty_text_semantics(spark, toy):
    """NULL text → NULL count/tokens (not 0/[]); empty text → 0/[] — the
    same null footing as split()-derived word counts (advisor, r6)."""
    merges = train_bpe(toy, n_merges=6, id_col="doc_id")
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "low  low")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["n"], r["t"])
        for r in df.select(
            "doc_id",
            bpe_token_count(F.col("text"), merges).alias("n"),
            bpe_tokenize(F.col("text"), merges).alias("t"),
        ).collect()
    }
    assert rows[1] == (None, None)
    assert rows[2] == (0, [])
    assert rows[3] == (0, [])  # whitespace-only collapses like str.split()
    assert rows[4][0] == len(rows[4][1]) > 0


def test_tvf_bpe_count_rejects_duplicate_ranks(spark, toy):
    from sequila_native_spark.sql import sequila_sql

    spark.createDataFrame(
        [("e", "s", 0), ("l", "o", 0)],
        "left string, right string, rank int",
    ).createOrReplaceTempView("bpe_dup_merges")
    toy.createOrReplaceTempView("bpe_docs")
    with pytest.raises(ValueError, match="duplicate rank"):
        sequila_sql(
            spark,
            "SELECT * FROM sequila_bpe_count('bpe_docs', 'bpe_dup_merges', "
            "'text', 'doc_id')",
        )


def test_pack_documents_validates_n_tokens_col(spark):
    from pyspark.errors import PySparkRuntimeError
    from sequila_native_spark.functions import pack_documents

    docs = spark.createDataFrame(
        [(1, "a b", 2), (2, "c", None)], "doc_id long, text string, n int"
    )
    with pytest.raises(ValueError, match="n_tokens_col"):
        pack_documents(docs, n_tokens_col="missing")
    with pytest.raises(Exception, match="NULL in n_tokens_col"):
        pack_documents(docs, shards=1, n_tokens_col="n").collect()

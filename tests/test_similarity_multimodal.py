"""Similarity search + multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sequila_native_spark.functions import (
    attach_binary,
    cosine_topk,
    decode_media_meta,
    lsh_ann_topk,
    near_dup_pairs,
    sample_chunks,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.999, 0.01, 0.0, 0.0], 0),   # near dup of 1
        (3, [0.0, 1.0, 0.0, 0.0], 0),
        (4, [0.0, 0.0, 1.0, 0.0], 1),
        (5, [1.0, 0.0, 0.0, 0.0], 1),      # same direction as 1, other block
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_cosine_topk_exact(spark, vecs):
    q = vecs.where(F.col("vec_id") == 1)
    out = cosine_topk(vecs, q, k=3).collect()
    ranked = sorted((r["rank"], r["neighbor_id"]) for r in out)
    # rank1 tie between self (1) and identical (5) → min id first
    assert ranked == [(1, 1), (2, 5), (3, 2)]


def test_near_dup_pairs_blocked(spark, vecs):
    out = near_dup_pairs(vecs, threshold_milli=990).collect()
    got = {(r["id_a"], r["id_b"]): r["cos_milli"] for r in out}
    assert (1, 2) in got and got[(1, 2)] >= 990
    # (1,5) identical but in different blocks → not compared
    assert (1, 5) not in got


def test_lsh_ann_recall_on_real_embeddings(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 8)
    exact = cosine_topk(emb, queries, k=5).collect()
    # moderate-similarity neighbors (cos ≈ 0.3-0.5 → collision prob per
    # plane ≈ 2/3): few planes + many tables is the right end of the dial
    approx = lsh_ann_topk(emb, queries, k=5, n_planes=4, n_tables=8).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"LSH recall too low: {recall}"
    # self-match always survives (identical vector shares every bucket)
    assert all((q, q) in approx_set for q in range(8))


def test_multimodal_plumbing(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    with_bin = attach_binary(docs)
    assert dict(with_bin.dtypes)["payload"] == "binary"
    meta = decode_media_meta(with_bin).collect()
    for r in meta:
        assert r["n_bytes"] == r["n_chars"]  # ascii text: bytes == chars
        assert len(r["header_hex"]) == 8
    chunks = sample_chunks(with_bin, id_col="doc_id", n_chunks=4)
    out = chunks.collect()
    assert set(chunks.columns) == {"doc_id", "chunk_idx", "chunk_bytes", "chunk"}
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["chunk_idx"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in per_doc.values())


def test_multimodal_strict_decode_raises(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(2)
    with_bin = attach_binary(docs, media_type="image/png")
    with pytest.raises(Exception, match="no media decoder available"):
        decode_media_meta(with_bin, strict_decode=True).collect()

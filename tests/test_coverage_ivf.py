"""Coverage operator + IVF ANN tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sequila_native_spark import coverage
from sequila_native_spark.functions import cosine_topk, ivf_ann_topk
from _testdata import SF0_001

SF = SF0_001


@pytest.mark.parametrize("algorithm", ["naive", "binning", "index"])
def test_coverage_golden(spark, reads, targets, algorithm):
    out = coverage(
        reads, targets, on="contig",
        left_start="pos_start", left_end="pos_end",
        right_start="pos_start", right_end="pos_end",
        algorithm=algorithm, bin_width=1000,
    )
    got = {
        (r["contig"], r["pos_start"]): (r["n_overlaps"], r["bases_covered"])
        for r in out.collect()
    }
    assert len(got) == 10  # every target survives
    # chr1 100-190: overlapped by reads (150,250) and (190,300):
    # clip(150..190)=41 bases, clip(190..190)=1 base
    assert got[("chr1", 100)] == (2, 42)
    # chr1 22100-22100: 1-base target inside read 22000-22300 → 1 base
    assert got[("chr1", 22100)] == (1, 1)
    # chr1 10000-20000: read 15000-15000 is a point → 1 base
    assert got[("chr1", 10000)] == (1, 1)
    # chr2 400-600 covered by (300,500) → 101 and (500,700) → 101
    assert got[("chr2", 400)] == (2, 202)


def test_union_coverage(spark):
    from sequila_native_spark import union_coverage

    # reads: [10,20] and [15,30] overlap each other; [50,60] disjoint
    build = spark.createDataFrame(
        [("c", 10, 20), ("c", 15, 30), ("c", 50, 60)],
        "contig string, start int, end int",
    )
    probe = spark.createDataFrame(
        [("c", 1, 100), ("c", 18, 55), ("c", 200, 300)],
        "contig string, start int, end int",
    )
    out = union_coverage(
        build, probe, on="contig",
        left_start="start", left_end="end",
        right_start="start", right_end="end",
        bin_width=16,
    )
    got = {(r["contig"], r["start"]): r["bases_union"] for r in out.collect()}
    # probe [1,100]: union of [10,30] (21 bases) + [50,60] (11) = 32
    assert got[("c", 1)] == 32
    # probe [18,55]: clips → [18,20]∪[18,30]=[18,30] (13) + [50,55] (6) = 19
    assert got[("c", 18)] == 19
    # probe [200,300]: nothing → 0 (row survives)
    assert got[("c", 200)] == 0


def test_union_vs_depth_coverage(spark, reads, targets):
    from sequila_native_spark import union_coverage

    depth = coverage(
        reads, targets, on="contig",
        left_start="pos_start", left_end="pos_end",
        right_start="pos_start", right_end="pos_end", bin_width=1000,
    )
    union = union_coverage(
        reads, targets, on="contig",
        left_start="pos_start", left_end="pos_end",
        right_start="pos_start", right_end="pos_end", bin_width=1000,
    )
    d = {(r["contig"], r["pos_start"]): r["bases_covered"] for r in depth.collect()}
    u = {(r["contig"], r["pos_start"]): r["bases_union"] for r in union.collect()}
    assert set(d) == set(u)
    for k in d:
        assert u[k] <= d[k]  # union never exceeds depth sum
    # chr1 100-190 overlapped by (150,250),(190,300): union [150,190] = 41
    # (depth counts 41 + 1 = 42 because base 190 is under two reads)
    assert u[("chr1", 100)] == 41 and d[("chr1", 100)] == 42


def test_coverage_index_matches_binning_randomized(spark):
    """r12: the index algorithm's prefix-sum identity must reproduce the
    pair join exactly — randomized intervals incl. zero-length (inverted
    after strict), null keys/bounds, both strict modes, and keyless."""
    import random

    random.seed(7)
    rows_l = []
    for _ in range(600):
        c = f"chr{random.randint(0, 2)}" if random.random() > 0.02 else None
        s = random.randint(0, 800)
        e = s + (random.randint(0, 60) if random.random() > 0.1 else 0)
        rows_l.append((c, s if random.random() > 0.02 else None, e))
    rows_r = []
    for i in range(400):
        c = f"chr{random.randint(0, 2)}" if random.random() > 0.02 else None
        s = random.randint(0, 800)
        e = s + random.randint(0, 60)
        rows_r.append((i, c, s, e if random.random() > 0.02 else None))
    L = spark.createDataFrame(rows_l, "contig string, pos_start int, pos_end int")
    R = spark.createDataFrame(
        rows_r, "rid int, contig string, pos_start int, pos_end int"
    )
    for strict in (False, True):
        a = coverage(L, R, on="contig", strict=strict, algorithm="binning")
        b = coverage(L, R, on="contig", strict=strict, algorithm="index")
        assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
    a = coverage(L.drop("contig"), R.drop("contig"), on=None, algorithm="binning")
    b = coverage(L.drop("contig"), R.drop("contig"), on=None, algorithm="index")
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_coverage_zero_rows_survive(spark):
    build = spark.createDataFrame([("c1", 1, 5)], "contig string, start int, end int")
    probe = spark.createDataFrame([("cX", 1, 5)], "contig string, start int, end int")
    out = coverage(
        build, probe, on="contig",
        left_start="start", left_end="end",
        right_start="start", right_end="end",
        bin_width=10,
    )
    row = out.collect()[0]
    assert (row["n_overlaps"], row["bases_covered"]) == (0, 0)


def test_ivf_ann_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 8)
    exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, queries, k=5).collect()}
    approx_df = ivf_ann_topk(emb, queries, k=5, n_cells=16, n_probe=8)
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_df.collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall}"
    assert all((q, q) in approx for q in range(8))  # self always in own cell


def _skewed_embeddings(spark, frac_dense=0.6, mix=0.7):
    """Embeddings with a dense region: ``frac_dense`` of the vectors pulled
    toward one anchor (``mix·anchor + (1-mix)·v``, JVM-side zip_with) —
    internal variance survives, so the region is geometrically splittable,
    but an unguarded coarse quantizer concentrates it in ~1 cell."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    anchor = emb.orderBy("vec_id").first()["embedding"]
    lit_anchor = F.array(*[F.lit(float(v)) for v in anchor])
    dense_ids = F.col("vec_id") % 10 < int(frac_dense * 10)
    mixed = F.zip_with(
        lit_anchor, F.col("embedding").cast("array<double>"),
        lambda a, v: F.lit(mix) * a + F.lit(1.0 - mix) * v,
    )
    return emb.select(
        "vec_id",
        F.when(dense_ids, mixed)
        .otherwise(F.col("embedding").cast("array<double>"))
        .alias("embedding"),
    )


def test_ivf_skew_guard_splits_dense_region(spark):
    """max_cell_frac (VERDICT r8 item 2): on a corpus with 60% of the mass
    in one dense region, the unguarded quantizer concentrates it in a
    giant cell; the guarded build must spread it so no corpus cell exceeds
    the cap with modest sample-vs-corpus slack — and the stats report must
    expose both (conservation law: fractions sum to ~1000)."""
    from sequila_native_spark.functions import build_ivf_index, ivf_cell_stats

    skewed = _skewed_embeddings(spark)
    n = skewed.count()

    def max_frac(cells):
        stats = ivf_cell_stats(cells).collect()
        assert sum(r["n_vectors"] for r in stats) == n
        tot = sum(r["frac_milli"] for r in stats)
        assert 1000 - len(stats) <= tot <= 1000  # floor rounding
        return max(r["frac_milli"] for r in stats)

    cells_raw, cent_raw = build_ivf_index(skewed, n_cells=16, seed=11)
    cells_g, cent_g = build_ivf_index(
        skewed, n_cells=16, seed=11, max_cell_frac=0.10
    )
    raw_max = max_frac(cells_raw)
    g_max = max_frac(cells_g)
    assert raw_max >= 300, raw_max   # the skew is real
    assert g_max <= 200, g_max       # cap 100 milli + 2x corpus-drift slack
    assert cent_g.count() > cent_raw.count()  # splitting added cells


def test_ivf_skew_guard_unsplittable_terminates(spark):
    """A region of IDENTICAL vectors cannot be split by geometry — the
    guard must terminate (no-progress break) and leave a working
    quantizer, not loop or explode the cell count."""
    from sequila_native_spark.functions import build_ivf_index, ivf_cell_stats

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    anchor = emb.orderBy("vec_id").first()["embedding"]
    lit_anchor = F.array(*[F.lit(float(v)) for v in anchor])
    df = emb.select(
        "vec_id",
        F.when(F.col("vec_id") % 10 < 6, lit_anchor)
        .otherwise(F.col("embedding").cast("array<double>"))
        .alias("embedding"),
    )
    cells, cent = build_ivf_index(df, n_cells=8, seed=11, max_cell_frac=0.10)
    stats = ivf_cell_stats(cells).collect()
    assert sum(r["n_vectors"] for r in stats) == df.count()
    assert cent.count() <= 8 + 41  # hard budget: n_cells + ceil(4/cap)


def test_ivf_skew_guard_validation(spark):
    from sequila_native_spark.functions import build_ivf_index

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(40)
    with pytest.raises(ValueError, match="max_cell_frac"):
        build_ivf_index(emb, n_cells=4, max_cell_frac=0.0)
    with pytest.raises(ValueError, match="max_cell_frac"):
        build_ivf_index(emb, n_cells=4, max_cell_frac=1.5)


def test_ivf_cell_stats_table_name_and_errors(spark):
    import uuid

    from sequila_native_spark.functions import (
        append_ivf_index,
        build_ivf_index,
        ivf_cell_stats,
    )
    from sequila_native_spark.functions.similarity import _train_centroids

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    centers = _train_centroids(emb, "embedding", 8, 11, stable_id_col="vec_id")
    t = f"sq_ivf_stats_{uuid.uuid4().hex[:8]}"
    try:
        append_ivf_index(emb, t, centers, buckets=4)
        by_name = {(r["cell"], r["n_vectors"])
                   for r in ivf_cell_stats(t, spark=spark).collect()}
        cells, _ = build_ivf_index(emb, n_cells=8, seed=11)
        by_frame = {(r["cell"], r["n_vectors"])
                    for r in ivf_cell_stats(cells).collect()}
        assert by_name == by_frame and by_name
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    with pytest.raises(ValueError, match="spark="):
        ivf_cell_stats("some_table")
    with pytest.raises(ValueError, match="__sq_cell"):
        ivf_cell_stats(emb)


def test_guarded_ivf_serving_equals_inplan(spark):
    """The skew bench row's correctness chain: serving off a PERSISTED
    pair built with max_cell_frac must equal the in-plan ivf_ann_topk at
    the same (seed, cap) on the same skewed corpus — the guarded twin of
    the r8 serving-equality pin (same quantizer seed ⇒ same split ⇒ same
    cells ⇒ same neighbors)."""
    import uuid

    from sequila_native_spark.functions import (
        append_ivf_index,
        ivf_topk_against_index,
    )
    from sequila_native_spark.functions.similarity import (
        _train_centroids,
        centroids_to_table,
        ivf_ann_topk,
    )

    skewed = _skewed_embeddings(spark)
    queries = skewed.where(F.col("vec_id") % 37 == 0)
    corpus = skewed.where(F.col("vec_id") % 37 != 0)
    centers = _train_centroids(corpus, "embedding", 8, 11,
                               stable_id_col="vec_id", max_cell_frac=0.10)
    assert len(centers) > 8  # the skew forced a split
    t = f"sq_ivf_guard_{uuid.uuid4().hex[:8]}"
    try:
        append_ivf_index(corpus, t, centers, buckets=4)
        served = {tuple(r) for r in ivf_topk_against_index(
            queries, t, centroids_to_table(spark, centers), 5, n_probe=3,
        ).collect()}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    inplan = {tuple(r) for r in ivf_ann_topk(
        corpus, queries, 5, n_cells=8, n_probe=3, seed=11,
        max_cell_frac=0.10,
    ).collect()}
    assert served == inplan and served

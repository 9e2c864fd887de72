"""bedtools-merge semantics: overlapping/bookended runs flatten."""

from __future__ import annotations

import pytest

from sequila_native_spark import merge_intervals


def test_merge_basic(spark):
    df = spark.createDataFrame(
        [
            ("c1", 1, 5), ("c1", 6, 10),    # bookended → merge
            ("c1", 8, 20),                   # overlaps → same run
            ("c1", 30, 40),                  # gap → new run
            ("c2", 1, 3),                    # other key
        ],
        "contig string, pos_start int, pos_end int",
    )
    out = {
        (r["contig"], r["pos_start"], r["pos_end"]): r["n_merged"]
        for r in merge_intervals(df).collect()
    }
    assert out == {("c1", 1, 20): 3, ("c1", 30, 40): 1, ("c2", 1, 3): 1}


def test_merge_max_gap(spark):
    df = spark.createDataFrame(
        [("c", 1, 5), ("c", 9, 12)], "contig string, pos_start int, pos_end int"
    )
    assert merge_intervals(df).count() == 2          # gap of 3 > 0
    merged = merge_intervals(df, max_gap=3).collect()
    assert len(merged) == 1
    assert (merged[0]["pos_start"], merged[0]["pos_end"]) == (1, 12)


def test_merge_contained_and_duplicates(spark):
    df = spark.createDataFrame(
        [("c", 1, 100), ("c", 10, 20), ("c", 10, 20), ("c", 100, 100)],
        "contig string, pos_start int, pos_end int",
    )
    out = merge_intervals(df).collect()
    assert len(out) == 1
    assert (out[0]["pos_start"], out[0]["pos_end"], out[0]["n_merged"]) == (1, 100, 4)


def test_merge_union_coverage_consistency(spark, reads, targets):
    # union coverage of a probe == sum of clipped merged-run lengths
    from pyspark.sql import functions as F
    from sequila_native_spark import union_coverage

    merged = merge_intervals(reads)
    probe = targets
    uc = union_coverage(
        reads, probe, on="contig",
        left_start="pos_start", left_end="pos_end",
        right_start="pos_start", right_end="pos_end", bin_width=1000,
    )
    uc2 = union_coverage(
        merged.drop("n_merged"), probe, on="contig",
        left_start="pos_start", left_end="pos_end",
        right_start="pos_start", right_end="pos_end", bin_width=1000,
    )
    a = {(r["contig"], r["pos_start"]): r["bases_union"] for r in uc.collect()}
    b = {(r["contig"], r["pos_start"]): r["bases_union"] for r in uc2.collect()}
    assert a == b  # merging the build side never changes union coverage


@pytest.mark.parametrize("chunk_width", [1, 7, 100, None])
def test_chunked_merge_equals_single_pass(spark, reads, chunk_width):
    # tiny chunk widths force many boundary crossings (every run spans
    # chunks); results must be identical to the one-pass sweep
    base = merge_intervals(reads, on="contig", chunk_width=None)
    got = merge_intervals(reads, on="contig", chunk_width=chunk_width)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, base.collect()))


def test_chunked_merge_long_interval_swallows_later_chunks(spark):
    # [0, 1000] spans every chunk; locally-unmergeable later rows must still
    # be absorbed by the phase-2 sweep
    df = spark.createDataFrame(
        [("c", 0, 1000), ("c", 50, 60), ("c", 500, 510), ("c", 2000, 2010)],
        "contig string, s int, e int",
    )
    out = merge_intervals(df, on="contig", start="s", end="e", chunk_width=100)
    got = sorted(map(tuple, out.collect()))
    assert got == [("c", 0, 1000, 3), ("c", 2000, 2010, 1)]


def test_chunked_merge_parallelism_exceeds_key_cardinality(spark, reads):
    # the phase-1 exchange hashes on (keys, chunk), not keys alone — the
    # one-task-per-contig sort cap is gone
    plan = merge_intervals(
        reads, on="contig", chunk_width=1000
    )._jdf.queryExecution().executedPlan().toString()
    assert "__sq_chunk" in plan.split("Exchange")[1]


# ---------------------------------------------------------------------------
# depth_histogram (genomecov analogue)
# ---------------------------------------------------------------------------

def _brute_depth_hist(rows):
    """Per-position depth counting, the obvious O(n * len) oracle."""
    from collections import Counter

    depth = Counter()
    for contig, s, e in rows:
        for p in range(s, e + 1):
            depth[(contig, p)] += 1
    hist = Counter()
    for (contig, _), d in depth.items():
        hist[(contig, d)] += 1
    return {(c, d, n) for (c, d), n in hist.items()}


def test_depth_histogram_matches_brute_force(spark, reads):
    from sequila_native_spark import depth_histogram

    rows = [(r["contig"], r["pos_start"], int(r["pos_end"])) for r in reads.collect()]
    want = _brute_depth_hist(rows)
    got = {
        (r["contig"], r["depth"], r["n_bases"])
        for r in depth_histogram(reads).collect()
    }
    assert got == want


def test_depth_histogram_chunked_equals_single_sweep(spark, reads):
    from sequila_native_spark import depth_histogram
    from tests.conftest import rows_set

    # tiny chunk width forces many cross-chunk segments and empty chunks
    chunked = depth_histogram(reads, chunk_width=64)
    single = depth_histogram(reads, chunk_width=None)
    assert rows_set(chunked) == rows_set(single)
    assert chunked.count() > 0


def test_depth_histogram_counts_every_covered_base(spark, reads):
    from sequila_native_spark import depth_histogram
    from sequila_native_spark import union_coverage  # noqa: F401  (doc pairing)
    from pyspark.sql import functions as F

    # sum(depth * n_bases) == total aligned bases == sum of interval lengths
    hist = depth_histogram(reads)
    got = hist.agg(
        F.sum(F.col("depth") * F.col("n_bases")).alias("aligned")
    ).first()["aligned"]
    want = reads.agg(
        F.sum(F.col("pos_end") - F.col("pos_start") + 1).alias("len")
    ).first()["len"]
    assert got == want


def test_depth_histogram_adjacent_and_point_intervals(spark):
    from sequila_native_spark import depth_histogram
    from tests.conftest import rows_set

    df = spark.createDataFrame(
        [("c", 1, 5), ("c", 6, 10), ("c", 5, 6), ("c", 8, 8), ("d", 3, 3)],
        "contig string, pos_start int, pos_end int",
    )
    rows = [(r["contig"], r["pos_start"], r["pos_end"]) for r in df.collect()]
    got = {
        (r["contig"], r["depth"], r["n_bases"])
        for r in depth_histogram(df, chunk_width=4).collect()
    }
    assert got == _brute_depth_hist(rows)


def test_complement_intervals_basic(spark):
    from sequila_native_spark import complement_intervals

    df = spark.createDataFrame(
        [("c", 1, 5), ("c", 10, 12), ("c", 20, 30), ("c", 11, 14), ("d", 2, 3)],
        "contig string, pos_start int, pos_end int",
    )
    got = {
        (r["contig"], r["pos_start"], r["pos_end"])
        for r in complement_intervals(df, chunk_width=8).collect()
    }
    # c runs: [1,5] [10,14] [20,30] -> gaps [6,9], [15,19]; d: single run, none
    assert got == {("c", 6, 9), ("c", 15, 19)}


def test_complement_roundtrip_with_merge(spark, reads):
    """merged runs + complement gaps tile the per-key span exactly once."""
    from pyspark.sql import functions as F
    from sequila_native_spark import complement_intervals, merge_intervals

    merged = merge_intervals(reads)
    gaps = complement_intervals(reads)
    span = reads.groupBy("contig").agg(
        (F.max("pos_end") - F.min("pos_start") + 1).alias("span")
    )
    covered = merged.groupBy("contig").agg(
        F.sum(F.col("pos_end") - F.col("pos_start") + 1).alias("c")
    )
    gap_sum = gaps.groupBy("contig").agg(
        F.sum(F.col("pos_end") - F.col("pos_start") + 1).alias("g")
    )
    j = span.join(covered, "contig").join(gap_sum, "contig", "left").na.fill(0)
    for r in j.collect():
        assert r["c"] + r["g"] == r["span"], r


# ---------------------------------------------------------------------------
# slop / shift / flank / jaccard
# ---------------------------------------------------------------------------

def test_slop_shift_flank(spark):
    from sequila_native_spark import flank_intervals, shift_intervals, slop_intervals

    df = spark.createDataFrame(
        [("c", 10, 20), ("c", 0, 5)], "contig string, pos_start int, pos_end int"
    )
    got = {(r["pos_start"], r["pos_end"])
           for r in slop_intervals(df, both=3, clamp_max=21).collect()}
    assert got == {(7, 21), (0, 8)}

    got = {(r["pos_start"], r["pos_end"])
           for r in shift_intervals(df, -8).collect()}
    assert got == {(2, 12), (0, 0)}  # second interval clamps then collapses

    got = {(r["pos_start"], r["pos_end"])
           for r in flank_intervals(df, 4).collect()}
    # (10,20): left [6,9], right [21,24]; (0,5): left clamps away, right [6,9]
    assert got == {(6, 9), (21, 24)}
    # left-only: (10,20) -> [6,9]; (0,5)'s left flank clamps away entirely
    assert flank_intervals(df, 4, side="left").count() == 1

def test_flank_left_clamp_drops_empty(spark):
    from sequila_native_spark import flank_intervals

    df = spark.createDataFrame([("c", 0, 5)], "contig string, pos_start int, pos_end int")
    assert flank_intervals(df, 4, side="left").count() == 0  # [−4,−1]→clamped empty


def _brute_jaccard(a_rows, b_rows):
    cov_a, cov_b = {}, {}
    for c, s, e in a_rows:
        cov_a.setdefault(c, set()).update(range(s, e + 1))
    for c, s, e in b_rows:
        cov_b.setdefault(c, set()).update(range(s, e + 1))
    out = {}
    for c in set(cov_a) | set(cov_b):
        inter = len(cov_a.get(c, set()) & cov_b.get(c, set()))
        union = len(cov_a.get(c, set()) | cov_b.get(c, set()))
        out[c] = (inter, union, (inter * 1000) // union if union else 0)
    return out


def test_interval_jaccard_matches_brute_force(spark, reads, targets):
    from sequila_native_spark import interval_jaccard

    a_rows = [(r["contig"], r["pos_start"], int(r["pos_end"])) for r in reads.collect()]
    b_rows = [(r["contig"], r["pos_start"], int(r["pos_end"])) for r in targets.collect()]
    want = _brute_jaccard(a_rows, b_rows)
    got = {
        r["contig"]: (r["inter_bases"], r["union_bases"], r["jaccard_milli"])
        for r in interval_jaccard(reads, targets).collect()
    }
    assert got == want


def test_interval_jaccard_disjoint_and_onesided(spark):
    from sequila_native_spark import interval_jaccard

    a = spark.createDataFrame([("c", 0, 9), ("d", 0, 4)],
                              "contig string, pos_start int, pos_end int")
    b = spark.createDataFrame([("c", 20, 29), ("e", 0, 4)],
                              "contig string, pos_start int, pos_end int")
    got = {r["contig"]: (r["inter_bases"], r["union_bases"], r["jaccard_milli"])
           for r in interval_jaccard(a, b).collect()}
    assert got == {"c": (0, 20, 0), "d": (0, 5, 0), "e": (0, 5, 0)}


# ---------------------------------------------------------------------------
# multi_intersect (bedtools multiinter)
# ---------------------------------------------------------------------------

def test_multi_intersect_golden(spark):
    from sequila_native_spark import multi_intersect

    a = spark.createDataFrame([("c", 1, 10), ("c", 3, 5)],  # overlap inside a itself
                              "contig string, pos_start int, pos_end int")
    b = spark.createDataFrame([("c", 5, 15), ("d", 0, 2)],
                              "contig string, pos_start int, pos_end int")
    c = spark.createDataFrame([("c", 8, 12)],
                              "contig string, pos_start int, pos_end int")
    out = multi_intersect({"a": a, "b": b, "c": c}, chunk_width=4)
    got = {
        (r["contig"], r["pos_start"], r["pos_end"], r["cover_mask"],
         r["n_sets"], tuple(r["set_names"]))
        for r in out.collect()
    }
    want = {
        ("c", 1, 4, 1, 1, ("a",)),          # a only
        ("c", 5, 7, 3, 2, ("a", "b")),      # a+b
        ("c", 8, 10, 7, 3, ("a", "b", "c")),
        ("c", 11, 12, 6, 2, ("b", "c")),
        ("c", 13, 15, 2, 1, ("b",)),
        ("d", 0, 2, 2, 1, ("b",)),
    }
    assert got == want


def test_multi_intersect_matches_brute_force(spark, reads, targets):
    from collections import defaultdict

    from sequila_native_spark import multi_intersect

    sets = {
        "reads": [(r["contig"], r["pos_start"], int(r["pos_end"]))
                  for r in reads.collect()],
        "targets": [(r["contig"], r["pos_start"], int(r["pos_end"]))
                    for r in targets.collect()],
    }
    cover = defaultdict(set)  # (contig, pos) -> covering set names
    for name, rows in sets.items():
        for cg, s, e in rows:
            for p in range(s, e + 1):
                cover[(cg, p)].add(name)
    # collapse per-position cover into maximal segments
    want = set()
    by_contig = defaultdict(list)
    for (cg, p), names in cover.items():
        by_contig[cg].append((p, tuple(sorted(names))))
    for cg, pts in by_contig.items():
        pts.sort()
        seg_s, seg_names = pts[0]
        prev = pts[0][0]
        for p, names in pts[1:]:
            if p != prev + 1 or names != seg_names:
                want.add((cg, seg_s, prev, seg_names))
                seg_s, seg_names = p, names
            prev = p
        want.add((cg, seg_s, prev, seg_names))
    got = {
        (r["contig"], r["pos_start"], r["pos_end"], tuple(r["set_names"]))
        for r in multi_intersect(
            {"reads": reads, "targets": targets}, chunk_width=512
        ).collect()
    }
    assert got == want


def test_multi_intersect_validation(spark, reads):
    import pytest

    from sequila_native_spark import multi_intersect

    with pytest.raises(ValueError, match="at least one"):
        multi_intersect([])
    with pytest.raises(ValueError, match="at most 63"):
        multi_intersect([reads] * 64)


# ---------------------------------------------------------------------------
# subtract_intervals (bedtools subtract)
# ---------------------------------------------------------------------------

def _brute_subtract(reads_rows, target_rows):
    """Per-base brute force: for each read, the maximal uncovered runs."""
    out = []
    for contig, rs, re_ in reads_rows:
        covered = set()
        for tc, ts, te in target_rows:
            if tc == contig:
                covered.update(range(max(ts, rs), min(te, re_) + 1))
        run = None
        for p in range(rs, re_ + 1):
            if p in covered:
                if run is not None:
                    out.append((contig, run, p - 1))
                    run = None
            elif run is None:
                run = p
        if run is not None:
            out.append((contig, run, re_))
    return sorted(out)


def test_subtract_matches_brute_force(spark):
    from sequila_native_spark import subtract_intervals

    reads_rows = [
        ("chr1", 100, 200),   # covered in the middle -> two pieces
        ("chr1", 300, 400),   # fully covered -> vanishes
        ("chr1", 500, 600),   # untouched -> passes whole
        ("chr1", 150, 340),   # straddles two targets
        ("chr2", 100, 200),   # other key: chr1 targets must not apply
    ]
    target_rows = [
        ("chr1", 140, 160), ("chr1", 290, 410), ("chr1", 155, 170),
        ("chr2", 90, 105),
    ]
    reads = spark.createDataFrame(reads_rows, "contig string, s int, e int")
    targets = spark.createDataFrame(target_rows, "contig string, s int, e int")
    got = sorted(
        (r["contig"], r["s"], r["e"])
        for r in subtract_intervals(
            reads, targets, "contig", "s", "e", "s", "e"
        ).collect()
    )
    assert got == _brute_subtract(reads_rows, target_rows)


def test_subtract_carries_extra_columns_and_duplicates(spark):
    from sequila_native_spark import subtract_intervals

    reads = spark.createDataFrame(
        [("chr1", 10, 30, "readA"), ("chr1", 10, 30, "readA")],  # dup row
        "contig string, s int, e int, name string",
    )
    targets = spark.createDataFrame(
        [("chr1", 15, 20)], "contig string, s int, e int"
    )
    got = sorted(
        map(tuple, subtract_intervals(
            reads, targets, "contig", "s", "e", "s", "e"
        ).collect())
    )
    # each duplicate input row splits independently into the same two pieces
    assert got == [
        ("chr1", 10, 14, "readA"), ("chr1", 10, 14, "readA"),
        ("chr1", 21, 30, "readA"), ("chr1", 21, 30, "readA"),
    ]


@pytest.mark.parametrize("seed", [0, 1])
def test_subtract_random_matches_brute_force(spark, seed):
    import random

    from sequila_native_spark import subtract_intervals

    rnd = random.Random(seed)
    reads_rows = [
        (f"chr{rnd.randrange(2)}", s := rnd.randrange(1000), s + rnd.randrange(60))
        for _ in range(120)
    ]
    target_rows = [
        (f"chr{rnd.randrange(2)}", s := rnd.randrange(1000), s + rnd.randrange(80))
        for _ in range(40)
    ]
    reads = spark.createDataFrame(reads_rows, "contig string, s int, e int")
    targets = spark.createDataFrame(target_rows, "contig string, s int, e int")
    got = sorted(
        (r["contig"], r["s"], r["e"])
        for r in subtract_intervals(
            reads, targets, "contig", "s", "e", "s", "e"
        ).collect()
    )
    assert got == _brute_subtract(reads_rows, target_rows)


def test_subtract_tvf_sql(spark):
    from sequila_native_spark import subtract_intervals
    from sequila_native_spark.sql import sequila_sql

    reads = spark.createDataFrame(
        [("chr1", 100, 200)], "contig string, s int, e int"
    )
    targets = spark.createDataFrame(
        [("chr1", 140, 160)], "contig string, s int, e int"
    )
    reads.createOrReplaceTempView("sub_reads")
    targets.createOrReplaceTempView("sub_targets")
    got = sequila_sql(spark, """
        SELECT * FROM sequila_subtract('sub_reads', 'sub_targets', 'contig',
                                       's', 'e', 's', 'e')
    """)
    want = subtract_intervals(reads, targets, "contig", "s", "e", "s", "e")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


# ---------------------------------------------------------------------------
# make_windows (bedtools makewindows) + cluster_intervals (bedtools cluster)
# ---------------------------------------------------------------------------

def test_make_windows_tiles_and_clips(spark):
    from sequila_native_spark import make_windows

    spans = spark.createDataFrame(
        [("chr1", 100, 349), ("chr1", 500, 520), ("chr2", 0, 99)],
        "contig string, s int, e int",
    )
    got = sorted(
        map(tuple, make_windows(spans, "contig", "s", "e", window=100).collect())
    )
    assert got == [
        ("chr1", 100, 199, 0), ("chr1", 200, 299, 1), ("chr1", 300, 349, 2),
        ("chr1", 500, 520, 0),
        ("chr2", 0, 99, 0),
    ]
    # sliding windows: step < window
    from pyspark.sql import functions as F

    slid = sorted(map(tuple, make_windows(
        spans.where(F.col("s") == 100), "contig", "s", "e",
        window=100, step=50,
    ).collect()))
    assert slid == [
        ("chr1", 100, 199, 0), ("chr1", 150, 249, 1), ("chr1", 200, 299, 2),
        ("chr1", 250, 349, 3), ("chr1", 300, 349, 4),
    ]
    with pytest.raises(ValueError, match="window"):
        make_windows(spans, "contig", "s", "e", window=0)


def test_make_windows_composes_with_count_overlaps(spark):
    # the windowed-depth recipe: tile the span, count reads per tile
    from sequila_native_spark import count_overlaps, make_windows

    spans = spark.createDataFrame([("chr1", 0, 299)], "contig string, s int, e int")
    reads = spark.createDataFrame(
        [("chr1", 10, 20), ("chr1", 150, 260), ("chr1", 250, 260)],
        "contig string, s int, e int",
    )
    wins = make_windows(spans, "contig", "s", "e", window=100)
    got = {
        (r["s"], r["e"]): r["n"]
        for r in count_overlaps(
            reads, wins, "contig", "s", "e", "s", "e", count_col="n"
        ).collect()
    }
    assert got == {(0, 99): 1, (100, 199): 1, (200, 299): 2}


def test_cluster_intervals_labels_transitive_overlaps(spark):
    from sequila_native_spark import cluster_intervals

    rows = [
        ("chr1", 1, 10, "a"), ("chr1", 8, 20, "b"), ("chr1", 19, 30, "c"),
        ("chr1", 50, 60, "d"),
        ("chr2", 1, 10, "e"),
    ]
    df = spark.createDataFrame(rows, "contig string, s int, e int, name string")
    got = {
        r["name"]: (r["cluster_id"], r["cluster_start"], r["cluster_end"])
        for r in cluster_intervals(df, "contig", "s", "e").collect()
    }
    assert got["a"] == got["b"] == got["c"] == (1, 1, 30)
    assert got["d"] == (2, 50, 60)
    assert got["e"] == (1, 1, 10)
    # -d 25: chr1's two clusters fuse
    fused = {
        r["name"]: r["cluster_id"]
        for r in cluster_intervals(df, "contig", "s", "e", max_gap=25).collect()
    }
    assert fused["a"] == fused["d"] == 1


def test_cluster_intervals_every_row_exactly_once(spark):
    import random

    from sequila_native_spark import cluster_intervals

    rnd = random.Random(7)
    rows = []
    for _ in range(150):
        st = rnd.randrange(500)
        rows.append((f"chr{rnd.randrange(2)}", st, st + rnd.randrange(40)))
    df = spark.createDataFrame(rows, "contig string, s int, e int")
    out = cluster_intervals(df, "contig", "s", "e").collect()
    assert len(out) == 150  # containment join adds no fan-out, drops nothing
    # labels consistent with a brute-force union-find over overlaps
    by_key = {}
    for r in out:
        by_key.setdefault(r["contig"], []).append(r)
    for contig, rs in by_key.items():
        for x in rs:
            for y in rs:
                if x["s"] <= y["e"] and x["e"] >= y["s"]:
                    assert x["cluster_id"] == y["cluster_id"]

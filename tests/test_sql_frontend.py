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

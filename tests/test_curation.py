"""Token-budget curation (`functions/curation.py`).

Pins the two-level global cumulative sum against a brute-force Python
greedy, the partitioned variant against the same, DuckDB twin parity,
repartition invariance, and the edge cases (budget 0, first row over
budget, exact boundary, constant priority → one bucket).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sequila_native_spark.functions import (
    select_top_fraction,
    select_top_fraction_sql,
    select_within_budget,
    select_within_budget_sql,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id int, grp string, score int, cost int")


ROWS = [
    # (id, grp, score, cost) — scores with ties, mixed groups
    (1, "a", 90, 10), (2, "a", 80, 25), (3, "a", 80, 5), (4, "a", 10, 50),
    (5, "b", 95, 40), (6, "b", 60, 10), (7, "b", 60, 10), (8, "b", 5, 1),
    (9, "c", 50, 100), (10, "c", 40, 1),
]


def _greedy(rows, budget, key=None, ascending=False):
    """Brute-force reference: order by (score dir, id), keep while cum<=B."""
    out = {}
    groups = sorted({r[1] for r in rows}) if key else [None]
    for g in groups:
        sub = [r for r in rows if key is None or r[1] == g]
        sub.sort(key=lambda r: (r[2] if ascending else -r[2], r[0]))
        cum, kept = 0, []
        for r in sub:
            cum += r[3]
            if cum <= budget:
                kept.append((r[0], cum))
        out[g] = kept
    return out if key else out[None]


def test_global_matches_bruteforce(spark):
    df = _docs(spark, ROWS)
    for budget in [0, 5, 39, 40, 41, 100, 251, 252, 1000]:
        got = {
            (r["id"], r["cum_cost"])
            for r in select_within_budget(
                df, budget, "cost", "score", "id", buckets=4
            ).collect()
        }
        assert got == set(_greedy(ROWS, budget)), budget


def test_global_ascending(spark):
    df = _docs(spark, ROWS)
    got = {
        (r["id"], r["cum_cost"])
        for r in select_within_budget(
            df, 60, "cost", "score", "id", ascending=True, buckets=3
        ).collect()
    }
    assert got == set(_greedy(ROWS, 60, ascending=True))


def test_partitioned_matches_bruteforce(spark):
    df = _docs(spark, ROWS)
    for budget in [0, 10, 40, 55, 1000]:
        got = {}
        res = select_within_budget(
            df, budget, "cost", "score", "id", partition_by="grp"
        ).collect()
        for r in res:
            got.setdefault(r["grp"], set()).add((r["id"], r["cum_cost"]))
        want = _greedy(ROWS, budget, key="grp")
        want = {g: set(v) for g, v in want.items() if v}
        assert got == want, budget


def test_repartition_invariance(spark):
    df = _docs(spark, ROWS)
    a = {
        (r["id"], r["cum_cost"])
        for r in select_within_budget(
            df.repartition(7), 100, "cost", "score", "id", buckets=5
        ).collect()
    }
    b = {
        (r["id"], r["cum_cost"])
        for r in select_within_budget(
            df.coalesce(1), 100, "cost", "score", "id", buckets=1
        ).collect()
    }
    assert a == b


def test_order_bounds_shape_only(spark):
    """Bounds shape the bucket grid, never the result — even wildly wrong
    bounds clamp to edge buckets and keep the cumulative sums exact."""
    df = _docs(spark, ROWS)
    want = {
        (r["id"], r["cum_cost"])
        for r in select_within_budget(df, 100, "cost", "score", "id").collect()
    }
    for bounds in [(0, 100), (40, 60), (-5, -1), (90, 90)]:
        got = {
            (r["id"], r["cum_cost"])
            for r in select_within_budget(
                df, 100, "cost", "score", "id", order_bounds=bounds, buckets=8
            ).collect()
        }
        assert got == want, bounds


def test_constant_priority_single_bucket(spark):
    rows = [(i, "x", 7, 10) for i in range(1, 9)]
    got = sorted(
        (r["id"], r["cum_cost"])
        for r in select_within_budget(
            _docs(spark, rows), 35, "cost", "score", "id", buckets=16
        ).collect()
    )
    # ties broken by id ascending: ids 1..3 fit (30 <= 35), id 4 would hit 40
    assert got == [(1, 10), (2, 20), (3, 30)]


def test_null_rows_excluded(spark):
    rows = [(1, "a", None, 10), (2, "a", 50, None), (3, "a", 50, 10)]
    df = spark.createDataFrame(rows, "id int, grp string, score int, cost int")
    got = [
        (r["id"], r["cum_cost"])
        for r in select_within_budget(df, 100, "cost", "score", "id").collect()
    ]
    assert got == [(3, 10)]


def test_duckdb_twin_parity(spark):
    df = _docs(spark, ROWS)
    spark_rows = sorted(
        (r["id"], r["cum_cost"])
        for r in select_within_budget(df, 70, "cost", "score", "id", buckets=4).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i},'{g}',{s},{c})" for i, g, s, c in ROWS)
        + ") v(id, grp, score, cost)"
    )
    sql = select_within_budget_sql(
        "t", 70, "cost", "score", "id", select="id"
    )
    duck = sorted(tuple(r) for r in con.execute(f"SELECT * FROM {sql}").fetchall())
    assert spark_rows == duck


def test_validation(spark):
    df = _docs(spark, ROWS)
    with pytest.raises(ValueError, match="budget"):
        select_within_budget(df, -1, "cost", "score", "id")
    with pytest.raises(ValueError, match="not found"):
        select_within_budget(df, 10, "nope", "score", "id")
    with pytest.raises(ValueError, match="already exists"):
        select_within_budget(df, 10, "cost", "score", "id", cum_col="cost")
    with pytest.raises(ValueError, match="buckets"):
        select_within_budget(df, 10, "cost", "score", "id", buckets=0)
    with pytest.raises(ValueError, match="order_bounds"):
        select_within_budget(df, 10, "cost", "score", "id", order_bounds=(5, 1))


def test_top_fraction_matches_derived_budget(spark):
    """select_top_fraction == select_within_budget at budget
    floor(frac * total), globally and per group."""
    df = _docs(spark, ROWS)
    total = sum(r[3] for r in ROWS)
    for frac in [0.0, 0.25, 0.5, 1.0]:
        got = {
            (r["id"], r["cum_cost"])
            for r in select_top_fraction(
                df, frac, "cost", "score", "id", buckets=4
            ).collect()
        }
        want = {
            (r["id"], r["cum_cost"])
            for r in select_within_budget(
                df, int(frac * total), "cost", "score", "id", buckets=4
            ).collect()
        }
        assert got == want, frac
    # per-group: each group's threshold from its own total
    got = {}
    for r in select_top_fraction(
        df, 0.5, "cost", "score", "id", partition_by="grp"
    ).collect():
        got.setdefault(r["grp"], set()).add((r["id"], r["cum_cost"]))
    for g in ["a", "b", "c"]:
        g_total = sum(r[3] for r in ROWS if r[1] == g)
        want = set(_greedy([r for r in ROWS if r[1] == g], int(0.5 * g_total)))
        assert got.get(g, set()) == want, g


def test_top_fraction_duckdb_twin(spark):
    df = _docs(spark, ROWS)
    spark_rows = sorted(
        (r["id"], r["cum_cost"])
        for r in select_top_fraction(
            df, 0.4, "cost", "score", "id", buckets=4
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i},'{g}',{s},{c})" for i, g, s, c in ROWS)
        + ") v(id, grp, score, cost)"
    )
    sql = select_top_fraction_sql("t", 0.4, "cost", "score", "id", select="id")
    duck = sorted(
        (r[0], int(r[1])) for r in con.execute(f"SELECT * FROM {sql}").fetchall()
    )
    assert spark_rows == duck


def test_top_fraction_validation(spark):
    df = _docs(spark, ROWS)
    with pytest.raises(ValueError, match="fraction"):
        select_top_fraction(df, 1.5, "cost", "score", "id")
    with pytest.raises(ValueError, match="fraction"):
        select_top_fraction_sql("t", -0.1, "cost", "score", "id")


def test_budget_tvf(spark):
    """sequila_budget table function agrees with the Python API, global and
    partitioned, and validates its arity."""
    from sequila_native_spark.sql import sequila_sql

    df = _docs(spark, ROWS)
    df.createOrReplaceTempView("tvf_budget_docs")
    got = sequila_sql(
        spark,
        "SELECT id, cum_cost FROM "
        "sequila_budget('tvf_budget_docs', 70, 'cost', 'score', 'id')",
    ).collect()
    want = select_within_budget(df, 70, "cost", "score", "id").collect()
    assert sorted((r["id"], r["cum_cost"]) for r in got) == sorted(
        (r["id"], r["cum_cost"]) for r in want
    )
    got = sequila_sql(
        spark,
        "SELECT id, cum_cost FROM "
        "sequila_budget('tvf_budget_docs', 40, 'cost', 'score', 'id', 'grp')",
    ).collect()
    want = select_within_budget(
        df, 40, "cost", "score", "id", partition_by="grp"
    ).collect()
    assert sorted((r["id"], r["cum_cost"]) for r in got) == sorted(
        (r["id"], r["cum_cost"]) for r in want
    )
    with pytest.raises(ValueError, match="sequila_budget takes"):
        sequila_sql(spark, "SELECT * FROM sequila_budget('tvf_budget_docs', 9)")


def test_no_global_single_partition_window(spark):
    """The scale claim, plan-asserted: the big-side window must be
    partitioned (by bucket); only the per-bucket-totals window (≤ buckets
    rows) may be unpartitioned."""
    df = _docs(spark, ROWS)
    plan = select_within_budget(
        df, 100, "cost", "score", "id", buckets=8
    )._jdf.queryExecution().optimizedPlan().toString()
    row_windows = [
        l for l in plan.splitlines()
        if l.lstrip(" :+-").startswith("Window") and "__sq_tot" not in l
    ]
    assert row_windows, plan
    for l in row_windows:
        # the window over the row stream must be partitioned by the bucket
        assert "__sq_bucket" in l, l

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship interval overlap join at sf0.001;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (+ the LLM-pipeline extensions); ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL for each.

Design rules for oracle comparability (the driver hash-compares values):

- every computed column is aliased identically in Spark and SQL;
- no raw floating-point aggregates — money/value sums are integer-scaled
  (``floor(x * 100)`` per row, then summed as BIGINT) so both engines
  produce bit-identical results regardless of summation order;
- the interval views derive deterministically from the driver tables
  (FIXTURES.md F7 pattern): integer modulo arithmetic only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sequila_native_spark import count_overlaps, nearest_join, overlap_join

# ---------------------------------------------------------------------------
# Derived interval views (FIXTURES.md F7): reads from lineitem, targets from
# orders. Closed intervals over a 100 kb coordinate domain, 8 contigs.
# ---------------------------------------------------------------------------

READS_SQL = """
    SELECT 'chr' || CAST(l_orderkey % 8 AS VARCHAR) AS contig,
           CAST(l_partkey % 100000 AS INT) AS r_start,
           CAST(l_partkey % 100000 + (l_suppkey % 500) AS INT) AS r_end,
           l_orderkey * 10 + l_linenumber AS r_id
    FROM lineitem
"""

TARGETS_SQL = """
    SELECT 'chr' || CAST(o_orderkey % 8 AS VARCHAR) AS contig,
           CAST((o_custkey * 37) % 100000 AS INT) AS t_start,
           CAST((o_custkey * 37) % 100000 + (o_orderkey % 2000) AS INT) AS t_end,
           o_orderkey AS t_id
    FROM orders
"""


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _reads(spark: SparkSession, sf_dir: str, with_id: bool = True) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    cols = [
        F.concat(F.lit("chr"), (F.col("l_orderkey") % 8).cast("string")).alias("contig"),
        (F.col("l_partkey") % 100000).cast("int").alias("r_start"),
        ((F.col("l_partkey") % 100000) + (F.col("l_suppkey") % 500)).cast("int").alias("r_end"),
    ]
    if with_id:
        cols.append((F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("r_id"))
    return li.select(*cols)


def _targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    start = (F.col("o_custkey") * 37) % 100000
    return o.select(
        F.concat(F.lit("chr"), (F.col("o_orderkey") % 8).cast("string")).alias("contig"),
        start.cast("int").alias("t_start"),
        (start + F.col("o_orderkey") % 2000).cast("int").alias("t_end"),
        F.col("o_orderkey").alias("t_id"),
    )


_IVL = dict(left_start="r_start", left_end="r_end", right_start="t_start", right_end="t_end")

# cents-scaled revenue: identical double expression in both engines, floored
# per row to an exact integer before summing ⇒ order-insensitive totals
def _rev():
    return F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("bigint")


_REV_SQL = "CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# Interval operator queries (SURVEY.md §2A)
# ---------------------------------------------------------------------------

def q_overlap_count_per_contig(spark: SparkSession, sf_dir: str) -> DataFrame:
    oj = overlap_join(_reads(spark, sf_dir, with_id=False), _targets(spark, sf_dir),
                      on="contig", **_IVL, algorithm="binning")
    return oj.groupBy("contig").agg(F.count(F.lit(1)).alias("n_pairs"))


def q_overlap_pairs_chr0(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = _reads(spark, sf_dir).where((F.col("contig") == "chr0") & (F.col("r_id") % 7 == 0))
    targets = _targets(spark, sf_dir).where(F.col("contig") == "chr0")
    oj = overlap_join(reads, targets, on="contig", **_IVL, algorithm="binning")
    return oj.select("r_id", "r_start", "r_end", "t_id", "t_start", "t_end", "contig")


def q_overlap_count_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    oj = overlap_join(_reads(spark, sf_dir, with_id=False), _targets(spark, sf_dir),
                      on="contig", **_IVL, algorithm="index")
    return oj.agg(F.count(F.lit(1)).alias("n_pairs"))


def q_overlap_small_build_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the index algorithm's design point (reference CollectLeft mode):
    # small build side broadcast as per-key sorted arrays, large probe
    # streamed through mapInPandas with zero shuffle
    build = _targets(spark, sf_dir).where(F.col("t_id") % 101 == 0)
    probe = _reads(spark, sf_dir, with_id=False)
    oj = overlap_join(
        build, probe, on="contig",
        left_start="t_start", left_end="t_end",
        right_start="r_start", right_end="r_end",
        algorithm="index",
    )
    return oj.groupBy("contig").agg(F.count(F.lit(1)).alias("n_pairs"))


def q_overlap_count_vanilla(spark: SparkSession, sf_dir: str) -> DataFrame:
    # prefer_interval_join=false analogue: the plain Catalyst predicate join
    oj = overlap_join(_reads(spark, sf_dir, with_id=False), _targets(spark, sf_dir),
                      on="contig", **_IVL, algorithm="naive")
    return oj.agg(F.count(F.lit(1)).alias("n_pairs"))


def q_range_only_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A2: interval-only join, no equi-keys (reference injects lit(1)=lit(1))
    reads = _reads(spark, sf_dir).where(F.col("r_id") % 97 == 0).drop("r_id", "contig")
    targets = _targets(spark, sf_dir).where(F.col("t_id") % 101 == 0).drop("t_id", "contig")
    oj = overlap_join(reads, targets, on=None, **_IVL, algorithm="binning")
    return oj.agg(F.count(F.lit(1)).alias("n_pairs"))


def q_overlap_strict_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A3: strict < / > predicates, normalized to closed via bound-1
    oj = overlap_join(_reads(spark, sf_dir, with_id=False), _targets(spark, sf_dir),
                      on="contig", **_IVL, strict=True, algorithm="binning")
    return oj.groupBy("contig").agg(F.count(F.lit(1)).alias("n_pairs"))


def q_count_overlaps_per_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A6 intent, corrected: every probe row kept, 0 when no overlap
    return count_overlaps(
        _reads(spark, sf_dir, with_id=False), _targets(spark, sf_dir),
        on="contig", **_IVL, algorithm="binning", count_col="n_overlaps",
    )


def q_nearest_target_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A5: for each target exactly one read — overlapping else nearest,
    # deterministic (distance, start, end) tie-break
    return nearest_join(
        _reads(spark, sf_dir, with_id=False), _targets(spark, sf_dir),
        on="contig", **_IVL, algorithm="index",
    )


# ---------------------------------------------------------------------------
# Inherited relational surface (SURVEY.md §2B) — stock Spark
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.floor(F.col("l_quantity")).cast("bigint")).alias("sum_qty"),
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint")).alias("sum_base_price_cents"),
            F.sum(_rev()).alias("sum_disc_price_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(_rev()).alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.floor(F.col("l_quantity")).cast("bigint")).alias("total_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("p_brand")
    )


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized reader
    # rejects; read nanos as long and convert to a microsecond timestamp.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = _t(spark, sf_dir, "events")
    return ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("sum_value_cents"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.groupBy("event_type")
        .agg(F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n_events"))
    )


# ---------------------------------------------------------------------------
# Contract surface
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-contig interval overlap counts at sf0.001."""
    return q_overlap_count_per_contig(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "overlap_count_per_contig": q_overlap_count_per_contig,
        "overlap_pairs_chr0": q_overlap_pairs_chr0,
        "overlap_count_index": q_overlap_count_index,
        "overlap_small_build_index": q_overlap_small_build_index,
        "overlap_count_vanilla": q_overlap_count_vanilla,
        "range_only_count": q_range_only_count,
        "overlap_strict_count": q_overlap_strict_count,
        "count_overlaps_per_target": q_count_overlaps_per_target,
        "nearest_target_read": q_nearest_target_read,
        "pricing_summary": q_pricing_summary,
        "top_orders": q_top_orders,
        "brand_volume": q_brand_volume,
        "events_hourly": q_events_hourly,
        "events_json": q_events_json,
    }


def oracle_sql() -> dict[str, str]:
    reads = f"reads AS ({READS_SQL})"
    targets = f"targets AS ({TARGETS_SQL})"
    overlap = "r.contig = t.contig AND r.r_start <= t.t_end AND r.r_end >= t.t_start"
    return {
        "overlap_count_per_contig": f"""
            WITH {reads}, {targets}
            SELECT r.contig AS contig, count(*) AS n_pairs
            FROM reads r JOIN targets t ON {overlap}
            GROUP BY r.contig
        """,
        "overlap_pairs_chr0": f"""
            WITH {reads}, {targets}
            SELECT r.r_id, r.r_start, r.r_end, t.t_id, t.t_start, t.t_end,
                   r.contig AS contig
            FROM reads r JOIN targets t ON {overlap}
            WHERE r.contig = 'chr0' AND r.r_id % 7 = 0
        """,
        "overlap_count_index": f"""
            WITH {reads}, {targets}
            SELECT count(*) AS n_pairs FROM reads r JOIN targets t ON {overlap}
        """,
        "overlap_small_build_index": f"""
            WITH {reads}, {targets}
            SELECT r.contig AS contig, count(*) AS n_pairs
            FROM reads r JOIN (SELECT * FROM targets WHERE t_id % 101 = 0) t
            ON {overlap}
            GROUP BY r.contig
        """,
        "overlap_count_vanilla": f"""
            WITH {reads}, {targets}
            SELECT count(*) AS n_pairs FROM reads r JOIN targets t ON {overlap}
        """,
        "range_only_count": f"""
            WITH {reads}, {targets}
            SELECT count(*) AS n_pairs
            FROM (SELECT * FROM reads WHERE r_id % 97 = 0) r
            JOIN (SELECT * FROM targets WHERE t_id % 101 = 0) t
            ON r.r_start <= t.t_end AND r.r_end >= t.t_start
        """,
        "overlap_strict_count": f"""
            WITH {reads}, {targets}
            SELECT r.contig AS contig, count(*) AS n_pairs
            FROM reads r JOIN targets t
            ON r.contig = t.contig AND r.r_start < t.t_end AND r.r_end > t.t_start
            GROUP BY r.contig
        """,
        "count_overlaps_per_target": f"""
            WITH {reads}, {targets}
            SELECT t.contig, t.t_start, t.t_end, t.t_id,
                   count(r.contig) AS n_overlaps
            FROM targets t LEFT JOIN reads r ON {overlap}
            GROUP BY t.contig, t.t_start, t.t_end, t.t_id
        """,
        "nearest_target_read": f"""
            WITH {reads}, {targets},
            j AS (
                SELECT r.contig AS contig, r.r_start, r.r_end,
                       t.contig AS contig_r, t.t_start, t.t_end, t.t_id,
                       CASE WHEN r.r_start > t.t_end THEN r.r_start - t.t_end
                            WHEN r.r_end < t.t_start THEN t.t_start - r.r_end
                            ELSE 0 END AS dist
                FROM targets t LEFT JOIN reads r ON r.contig = t.contig
            )
            SELECT contig, r_start, r_end, contig_r, t_start, t_end, t_id
            FROM j
            QUALIFY row_number() OVER (
                PARTITION BY t_id
                ORDER BY dist ASC NULLS LAST, r_start ASC NULLS LAST, r_end ASC NULLS LAST
            ) = 1
        """,
        "pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
                   CAST(sum({_REV_SQL}) AS BIGINT) AS sum_disc_price_cents,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "top_orders": f"""
            SELECT o.o_orderkey, o.o_orderdate,
                   CAST(sum({_REV_SQL}) AS BIGINT) AS revenue_cents
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
            GROUP BY o.o_orderkey, o.o_orderdate
            ORDER BY revenue_cents DESC, o.o_orderkey
            LIMIT 10
        """,
        "brand_volume": """
            SELECT p.p_brand,
                   CAST(sum(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT) AS total_qty,
                   count(*) AS n_lines
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_brand
            ORDER BY p.p_brand
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n_events,
                   CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
                   count(DISTINCT user_id) AS n_users
            FROM events
            GROUP BY 1, 2
        """,
        "events_json": """
            SELECT event_type,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                   count(*) AS n_events
            FROM events
            GROUP BY event_type
        """,
    }

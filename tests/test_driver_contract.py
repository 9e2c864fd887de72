"""Driver-contract invariants for `__spark_entry__.py` (no Spark needed).

The driver's correctness gate checks a 50-query prefix of `queries()`
against `oracle_sql()` twins — slot engineering (composites, promotions)
must never push an oracle-bearing query past the cap or leave an
oracle-less row inside it. These checks are static and instant, so a
restructure that breaks the layout fails fast instead of one round later
in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import __spark_entry__ as entry

DRIVER_CAP = 50


def test_oracle_prefix_is_exactly_the_cap():
    qs = list(entry.queries().keys())
    osql = entry.oracle_sql()
    assert len(qs) >= DRIVER_CAP
    prefix = qs[:DRIVER_CAP]
    missing = [k for k in prefix if k not in osql]
    assert not missing, (
        f"queries inside the driver's {DRIVER_CAP}-slot oracle prefix "
        f"without an oracle_sql twin: {missing}"
    )
    # past-cap entries are rows-only by design; an oracle there means a
    # promotion was forgotten (or the composite absorbing it regressed)
    stranded = [k for k in qs[DRIVER_CAP:] if k in osql]
    assert not stranded, f"oracle-bearing queries past the cap: {stranded}"


def test_every_query_is_callable():
    for name, fn in entry.queries().items():
        assert callable(fn), name


def test_orphan_oracles_are_known_composite_members():
    """Oracles whose standalone query key was absorbed into a composite
    row keep their SQL around for tooling; anything else unexplained in
    oracle_sql() is a typo waiting to ship."""
    qs = set(entry.queries().keys())
    known_absorbed = {
        # interval_set_ops composite (r6)
        "reads_minus_targets", "read_coverage_gaps", "merged_read_runs",
        # doc_feature_stats carries per-doc lang_pred (r6)
        "doc_lang_dist",
        # overlap_outer_joins composite (r6)
        "overlap_left_outer", "overlap_full_outer",
    }
    orphans = {k for k in entry.oracle_sql() if k not in qs}
    assert orphans <= known_absorbed, orphans - known_absorbed


def test_bench_table_staleness_guard(spark):
    """Advisor r8: bench index tables were reused purely on tableExists; a
    warehouse persisting across runs with a different sf_dir would silently
    serve a stale corpus in the *_probe floor rows. The guard keys reuse on
    the recorded sf_dir stamp and treats missing/unstamped/mismatched
    tables as stale (dropping them so the caller rebuilds)."""
    t = "sq_test_stale_tbl"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    assert entry._bench_table_stale(spark, t, "/dirA")  # missing → stale
    spark.range(3).write.saveAsTable(t)
    entry._stamp_bench_table(spark, t, "/dirA")
    assert not entry._bench_table_stale(spark, t, "/dirA")  # fresh
    assert entry._bench_table_stale(spark, t, "/dirB")  # other corpus
    assert not spark.catalog.tableExists(t)  # stale table dropped
    # an UNSTAMPED table (crash between build and stamp) is stale too
    spark.range(3).write.saveAsTable(t)
    assert entry._bench_table_stale(spark, t, "/dirA")
    assert not spark.catalog.tableExists(t)


def test_nearest_oracle_soundness_guard_branches():
    """The bounded nearest oracle (r10) must keep BOTH branches live: the
    generator emits the in-window aggregate, the <k fallback, and the
    union/assembly for k=1 and k>1 — and W stays a fixed literal (an
    engine-derived bound would break oracle independence)."""
    import __spark_entry__ as e

    for kwargs, probes in [
        (dict(tfilter="t_id % 10 = 0"), ["min(struct_pack", "agg.n < 1"]),
        (dict(tfilter="t_id % 50 = 0", k=3),
         ["list(struct_pack", "[:3]", "agg.n < 3", "unnest(top)"]),
        (dict(tfilter="t_id % 25 = 0", exclude_overlap=True, with_dist=True),
         ["r.r_end < t.t_start OR r.r_start > t.t_end", "AS dist"]),
    ]:
        sql = e._nearest_oracle_sql(**kwargs)
        for p in probes + ["t_end + 256", "t_start - 256",
                           "LEFT JOIN reads r ON r.contig = t.contig"]:
            assert p in sql, (kwargs, p)

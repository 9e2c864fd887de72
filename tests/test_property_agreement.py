"""Property-based cross-algorithm agreement (beyond the reference's fixed
fixtures): random interval tables with dense/touching/point/nested intervals
must produce identical results under every algorithm, with the naive
predicate join as ground truth.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sequila_native_spark import nearest_join, overlap_join
from tests.conftest import rows_set

# small coordinate domain → lots of overlaps, touching bounds, point
# intervals, duplicates — the adversarial regime for bin/dedup logic;
# negative starts exercise floor-division binning across zero
interval = st.tuples(
    st.sampled_from(["c1", "c2"]),
    st.integers(min_value=-40, max_value=40),
    st.integers(min_value=0, max_value=15),
)

tables = st.tuples(
    st.lists(interval, min_size=1, max_size=25),
    st.lists(interval, min_size=1, max_size=25),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tables)
def test_all_algorithms_agree_with_naive(spark, tabs):
    lrows = [(c, s, s + ln) for c, s, ln in tabs[0]]
    rrows = [(c, s, s + ln) for c, s, ln in tabs[1]]
    left = spark.createDataFrame(lrows, "contig string, start int, end int")
    right = spark.createDataFrame(rrows, "contig string, start int, end int")

    def run(algo, **kw):
        return rows_set(
            overlap_join(
                left, right, on="contig",
                left_start="start", left_end="end",
                right_start="start", right_end="end",
                algorithm=algo, **kw,
            )
        )

    truth = run("naive")
    assert run("binning", bin_width=7) == truth
    assert run("binning", bin_width=1) == truth  # bin width must not matter
    assert run("index") == truth
    assert run("partitioned") == truth


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tables)
def test_nearest_algorithms_agree_with_naive(spark, tabs):
    # nearest is deterministic ((distance, start, end) tie-break), so exact
    # row-multiset equality must hold across every algorithm — including the
    # batch-partial + global-reduce path (broadcast_probe), whose correctness
    # rests on the argmin being associative across build batches
    lrows = [(c, s, s + ln) for c, s, ln in tabs[0]]
    rrows = [(c, s, s + ln) for c, s, ln in tabs[1]]
    left = spark.createDataFrame(lrows, "contig string, start int, end int")
    right = spark.createDataFrame(rrows, "contig string, start int, end int")

    def run(algo):
        return rows_set(
            nearest_join(
                left, right, on="contig",
                left_start="start", left_end="end",
                right_start="start", right_end="end",
                algorithm=algo,
            )
        )

    truth = run("naive")
    assert run("index") == truth
    assert run("partitioned") == truth
    assert run("broadcast_probe") == truth

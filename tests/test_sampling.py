"""Deterministic sampling / splits / mixtures — engine-portable by md5."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from sequila_native_spark.functions import (
    deterministic_sample,
    mix_datasets,
    sample_hash,
    sample_hash_sql,
    split_dataset,
    split_thresholds,
)
from sequila_native_spark.functions.sampling import HASH_SPACE


def _py_hash(seed: int, v) -> int:
    return int(hashlib.md5(f"{seed}:{v}".encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).select(F.col("id").alias("doc_id"))


def test_sample_hash_matches_python_and_duckdb(spark, ids):
    got = {r["doc_id"]: r["h"] for r in
           ids.select("doc_id", sample_hash(F.col("doc_id"), 7).alias("h"))
           .where(F.col("doc_id") < 50).collect()}
    assert got == {i: _py_hash(7, i) for i in range(50)}
    con = duckdb.connect()
    want = dict(con.execute(
        f"SELECT i, {sample_hash_sql('i', 7)} FROM range(50) t(i)"
    ).fetchall())
    assert got == want


def test_deterministic_sample_rate_and_stability(spark, ids):
    s = deterministic_sample(ids, 0.25, key="doc_id", seed=3)
    got = sorted(r["doc_id"] for r in s.collect())
    want = sorted(i for i in range(2000) if _py_hash(3, i) < HASH_SPACE // 4)
    assert got == want
    # stable under repartition (the property df.sample lacks)
    got2 = sorted(
        r["doc_id"]
        for r in deterministic_sample(
            ids.repartition(7), 0.25, key="doc_id", seed=3
        ).collect()
    )
    assert got2 == got
    # approximate rate
    assert 0.2 < len(got) / 2000 < 0.3


def test_sample_nesting(spark, ids):
    small = {r["doc_id"] for r in deterministic_sample(ids, 0.1, seed=5).collect()}
    big = {r["doc_id"] for r in deterministic_sample(ids, 0.3, seed=5).collect()}
    assert small <= big


def test_split_dataset_partition(spark, ids):
    s = split_dataset(ids, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=11)
    rows = s.collect()
    assert len(rows) == 2000  # exhaustive
    counts = {k: 0 for k in ("train", "val", "test")}
    ths = split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    for r in rows:
        h = _py_hash(11, r["doc_id"])
        expected = next(name for name, ub in ths if h < ub)
        assert r["split"] == expected
        counts[r["split"]] += 1
    assert counts["train"] > counts["val"] > 0 and counts["test"] > 0


def test_split_validation(spark, ids):
    with pytest.raises(ValueError, match="sum to 1"):
        split_dataset(ids, {"a": 0.5, "b": 0.1})
    with pytest.raises(ValueError, match="rate"):
        deterministic_sample(ids, 1.5)
    with pytest.raises(ValueError, match="not found"):
        deterministic_sample(ids, 0.5, key="nope")
    with pytest.raises(ValueError, match="already exists"):
        split_dataset(ids.withColumn("split", F.lit("x")), {"a": 1.0})


def test_mix_datasets(spark, ids):
    a = ids.where(F.col("doc_id") < 1000)
    b = ids.where(F.col("doc_id") >= 1000)
    m = mix_datasets({"full": (a, 1.0), "webby": (b, 0.3)}, seed=2)
    rows = m.collect()
    n_full = sum(1 for r in rows if r["source"] == "full")
    n_web = sum(1 for r in rows if r["source"] == "webby")
    assert n_full == 1000  # rate 1.0 keeps everything
    assert 200 < n_web < 400
    # schema mismatch rejected
    with pytest.raises(ValueError, match="columns"):
        mix_datasets({"x": (a, 1.0), "y": (b.withColumn("extra", F.lit(1)), 0.5)})


def test_sampling_is_pure_catalyst(spark, ids):
    from sequila_native_spark.plans.explain import formatted_plan

    plan = formatted_plan(deterministic_sample(ids, 0.5))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "Exchange"):
        assert marker not in plan, marker


def test_mix_oversampling_weights(spark, ids):
    # weight 2.3: every row twice + a 0.3-rate third copy, deterministic
    m = mix_datasets({"hq": (ids, 2.3)}, seed=1, epoch_col="epoch")
    rows = m.collect()
    per_key = {}
    for r in rows:
        per_key.setdefault(r["doc_id"], []).append(r["epoch"])
    assert set(per_key) == set(range(2000))  # nothing lost
    n3 = 0
    for k, eps in per_key.items():
        assert sorted(eps) in ([0, 1], [0, 1, 2])
        n3 += len(eps) == 3
    # ~30% get the third copy; repeated run identical
    assert 0.2 < n3 / 2000 < 0.4
    again = {r["doc_id"]: r["epoch"] for r in
             mix_datasets({"hq": (ids, 2.3)}, seed=1, epoch_col="epoch").collect()
             if r["epoch"] == 2}
    assert set(again) == {k for k, e in per_key.items() if len(e) == 3}
    with pytest.raises(ValueError, match="positive"):
        mix_datasets({"x": (ids, 0.0)})


def test_stratified_sample(spark, ids):
    from sequila_native_spark.functions import stratified_sample

    labeled = ids.withColumn(
        "lang", F.when(F.col("doc_id") % 10 == 0, "rare").otherwise("common")
    )
    out = stratified_sample(
        labeled, {"rare": 1.0, "common": 0.1}, stratum_col="lang", seed=6
    )
    rows = out.collect()
    n_rare = sum(1 for r in rows if r["lang"] == "rare")
    n_common = sum(1 for r in rows if r["lang"] == "common")
    assert n_rare == 200          # rate 1.0 keeps all
    assert 100 < n_common < 280   # ~10% of 1800
    # per-row decisions match deterministic_sample at the same seed
    want_common = {
        r["doc_id"] for r in deterministic_sample(
            labeled.where(F.col("lang") == "common"), 0.1, seed=6
        ).collect()
    }
    assert {r["doc_id"] for r in rows if r["lang"] == "common"} == want_common
    # unknown strata use default_rate (0 = drop)
    out2 = stratified_sample(
        labeled, {"rare": 1.0}, stratum_col="lang", seed=6
    )
    assert {r["lang"] for r in out2.collect()} == {"rare"}
    with pytest.raises(ValueError, match="stratum column"):
        stratified_sample(labeled, {"a": 1.0}, stratum_col="nope")


def test_split_dataset_rejects_nonpositive_weights(spark):
    from sequila_native_spark.functions import split_dataset

    df = spark.range(10).withColumnRenamed("id", "doc_id")
    import pytest
    with pytest.raises(ValueError, match="must be > 0"):
        split_dataset(df, {"a": 1.5, "b": -0.5})
    with pytest.raises(ValueError, match="must be > 0"):
        split_dataset(df, {"a": 1.0, "b": 0.0})


def test_bounded_sample_rejects_reserved_hash_column(spark):
    from sequila_native_spark.functions.sampling import bounded_sample_pandas

    df = spark.createDataFrame([(1, 5)], "doc_id long, __sq_h long")
    with pytest.raises(ValueError, match="__sq_h"):
        bounded_sample_pandas(df, ["doc_id"], id_col="doc_id")


def test_temperature_weights_laws(spark):
    from sequila_native_spark.functions.sampling import temperature_weights

    sizes = {"web": 1_000_000, "books": 10_000, "code": 100_000}
    w = temperature_weights(sizes, tau=0.7)
    # expected row total is preserved: sum(w_i * n_i) == sum(n_i)
    assert abs(sum(w[k] * sizes[k] for k in sizes) - sum(sizes.values())) < 1e-6
    # temperature up-weights small sources: books gets w > 1, web w < 1
    assert w["books"] > 1 > w["web"]
    # tau=1 is the identity mixture (all weights 1)
    w1 = temperature_weights(sizes, tau=1.0)
    assert all(abs(v - 1.0) < 1e-9 for v in w1.values())
    # monotone: lower tau pushes the small source harder
    w3 = temperature_weights(sizes, tau=0.3)
    assert w3["books"] > w["books"]
    with pytest.raises(ValueError, match="tau"):
        temperature_weights(sizes, tau=0)
    with pytest.raises(ValueError, match="positive"):
        temperature_weights({"a": 0})


def test_temperature_weights_drive_mixer(spark):
    """The weights drive mix_datasets end-to-end: realized counts sit near
    the temperature-scaled proportions (hash selection is exact-rate in
    expectation; oversample repeats are deterministic)."""
    from sequila_native_spark.functions.sampling import temperature_weights

    big = spark.range(0, 20000).select(F.col("id").alias("doc_id"))
    small = spark.range(100000, 101000).select(F.col("id").alias("doc_id"))
    sizes = {"big": 20000, "small": 1000}
    w = temperature_weights(sizes, tau=0.5)
    mixed = mix_datasets(
        {"big": (big, w["big"]), "small": (small, w["small"])},
        key="doc_id",
    )
    counts = {r["source"]: r["n"] for r in
              mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for k in sizes:
        assert abs(counts[k] - w[k] * sizes[k]) / (w[k] * sizes[k]) < 0.12, (
            k, counts[k], w[k] * sizes[k])

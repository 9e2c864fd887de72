"""Sources (BED/CSV) + streaming batch-equivalence tests."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sequila_native_spark.sources import read_bed, read_interval_csv
from sequila_native_spark.streaming import (
    hourly_event_aggregates,
    read_event_stream,
    sessionize,
)
from tests.conftest import rows_set
from _testdata import SF0_001

SF = SF0_001


def test_read_bed(spark, tmp_path):
    p = str(tmp_path / "x.bed")
    with open(p, "w") as f:
        f.write("chr1\t100\t190\nchr1\t200\t290\nchr2\t1\t5\n")
    df = read_bed(spark, p)
    assert df.schema.simpleString() == "struct<contig:string,pos_start:bigint,pos_end:bigint>"
    assert df.count() == 3
    assert df.where(F.col("contig") == "chr2").first()["pos_end"] == 5


def test_read_bed6(spark, tmp_path):
    p = str(tmp_path / "x6.bed")
    with open(p, "w") as f:
        f.write("chr1\t100\t190\tfeat1\t960\t+\n")
    df = read_bed(spark, p, columns=6)
    row = df.first()
    assert row["name"] == "feat1" and row["score"] == 960 and row["strand"] == "+"


def test_read_interval_csv(spark, tmp_path):
    p = str(tmp_path / "reads.csv")
    with open(p, "w") as f:
        f.write("contig,pos_start,pos_end\nchr1,150,250\nchr1,190,300\n")
    df = read_interval_csv(spark, p)
    assert dict(df.dtypes) == {"contig": "string", "pos_start": "int", "pos_end": "bigint"}
    assert df.count() == 2


@pytest.fixture(scope="module")
def events_batch(spark):
    from sequila_native_spark.sources import read_events

    return read_events(spark, f"{SF}/events.parquet")


def _run_stream(spark, transformed_builder, batch_df, tmpdir):
    """Write batch events to parquet, stream them back with availableNow,
    apply the same transformation, and collect the complete result."""
    src = os.path.join(tmpdir, "src")
    batch_df.write.mode("overwrite").parquet(src)
    stream = read_event_stream(spark, src)
    assert stream.isStreaming
    out = transformed_builder(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("stream_test_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table("stream_test_out")


def test_hourly_aggregates_stream_equals_batch(spark, events_batch):
    batch_out = hourly_event_aggregates(events_batch)
    tmpdir = tempfile.mkdtemp()
    try:
        stream_out = _run_stream(spark, hourly_event_aggregates, events_batch, tmpdir)
        assert rows_set(batch_out) == rows_set(stream_out)
        assert batch_out.count() > 0
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def test_stream_static_overlap_join(spark, events_batch, tmp_path):
    """The interval join runs on a STREAM probe against a static build side
    (stream-static inner join — the streaming enrichment shape), producing
    the same rows as the batch run."""
    from sequila_native_spark import overlap_join

    # static annotation intervals
    build = spark.createDataFrame(
        [("u0", 0, 20000), ("u1", 5000, 15000), ("u2", 0, 5000), ("u3", 30000, 49000)],
        "contig string, pos_start int, pos_end int",
    )

    def to_intervals(ev):
        return ev.select(
            F.concat(F.lit("u"), (F.col("user_id") % 4).cast("string")).alias("contig"),
            (F.col("event_id") % 50000).cast("int").alias("pos_start"),
            ((F.col("event_id") % 50000) + 100).cast("int").alias("pos_end"),
        )

    src = str(tmp_path / "ev_stream")
    events_batch.write.mode("overwrite").parquet(src)

    batch_out = overlap_join(
        build, to_intervals(events_batch), on="contig", bin_width=4096
    )
    stream = read_event_stream(spark, src)
    stream_joined = overlap_join(
        build, to_intervals(stream), on="contig", bin_width=4096
    )
    assert stream_joined.isStreaming
    q = (
        stream_joined.writeStream.format("memory")
        .queryName("stream_overlap_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = rows_set(spark.table("stream_overlap_out"))
    want = rows_set(batch_out)
    assert got == want and sum(want.values()) > 0


def test_sessionize_batch_sanity(spark, events_batch):
    sess = sessionize(events_batch, gap="30 minutes")
    out = sess.limit(2000).collect()
    assert len(out) > 0
    ev_total = events_batch.count()
    n_events_total = sessionize(events_batch).agg(F.sum("n_events")).first()[0]
    assert n_events_total == ev_total  # every event lands in exactly one session
    for r in out:
        assert r["session_start"] <= r["session_end"]


def test_running_user_totals_stream_equals_batch(spark, events_batch, tmp_path):
    """applyInPandasWithState per-event state machine == batch window twin.

    Single micro-batch (one source file) so arrival order == event-time
    order and the streaming ordinals match the batch window exactly."""
    from sequila_native_spark.streaming import running_user_totals

    keep = ["event_id", "user_id", "ordinal", "run_cents"]
    batch_out = running_user_totals(events_batch).select(*keep)

    src = str(tmp_path / "ev_state_src")
    events_batch.coalesce(1).write.mode("overwrite").parquet(src)
    stream = read_event_stream(spark, src, max_files_per_trigger=10)
    out = running_user_totals(stream)
    assert out.isStreaming
    q = (
        out.select(*keep)
        .writeStream.format("memory")
        .queryName("stream_state_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = rows_set(spark.table("stream_state_out"))
    want = rows_set(batch_out)
    assert got == want and sum(want.values()) > 0
    # per-user invariants: ordinals dense from 1, run_cents non-decreasing
    import collections
    per_user = collections.defaultdict(list)
    for (eid, uid, ordinal, rc), n in want.items():
        per_user[uid].append((ordinal, rc))
    some_multi = 0
    for uid, rows in per_user.items():
        rows.sort()
        assert [o for o, _ in rows] == list(range(1, len(rows) + 1))
        some_multi += len(rows) > 1
    assert some_multi > 0


def test_write_bed_round_trip(spark, tmp_path):
    from sequila_native_spark.sources import write_bed

    df = spark.createDataFrame(
        [("chr2", 1, 5, "x"), ("chr1", 100, 190, "y")],
        "contig string, pos_start long, pos_end long, name string",
    )
    p = str(tmp_path / "out_bed")
    write_bed(df, p, extra=["name"], single_file=True)
    back = read_bed(spark, p, columns=4)
    assert rows_set(back) == rows_set(df)

    with pytest.raises(ValueError, match="missing columns"):
        write_bed(df.drop("pos_end"), str(tmp_path / "nope"))


def test_stream_stream_funnel_join(spark, events_batch, tmp_path):
    """correlate_event_streams: stream-stream watermarked join equals its
    batch twin (same function body both ways)."""
    from sequila_native_spark.streaming import correlate_event_streams

    views = events_batch.where(F.col("event_type") == "view")
    buys = events_batch.where(F.col("event_type") == "purchase")
    batch_out = correlate_event_streams(views, buys, tolerance_seconds=21600)
    expected = rows_set(batch_out)
    assert len(expected) > 0, "fixture must produce at least one pair"

    src_a = str(tmp_path / "views")
    src_b = str(tmp_path / "buys")
    views.write.mode("overwrite").parquet(src_a)
    buys.write.mode("overwrite").parquet(src_b)
    sa = read_event_stream(spark, src_a)
    sb = read_event_stream(spark, src_b)
    out = correlate_event_streams(sa, sb, tolerance_seconds=21600)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert rows_set(spark.table("funnel_out")) == expected


def test_read_events_leaves_session_conf_alone(spark):
    """VERDICT r2 #8: native-timestamp events reads must not leak
    nanosAsLong into the session (a later read of genuine TIMESTAMP(NANOS)
    data would silently get longs)."""
    from sequila_native_spark.sources import read_events

    key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(key, None)
    ev = read_events(spark, f"{SF}/events.parquet")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.count() > 0
    assert spark.conf.get(key, None) == before
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_normalize_event_ts_legacy_bigint(spark):
    """The legacy nanos-as-long branch truncates to micro precision."""
    from sequila_native_spark.sources import normalize_event_ts

    df = spark.createDataFrame(
        [(1, 1_700_000_000_123_456_789)], "event_id long, ts long"
    )
    out = normalize_event_ts(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    micros = out.select(F.unix_micros("ts").alias("us")).first()["us"]
    assert micros == 1_700_000_000_123_456


def test_dedup_events_stream_equals_batch(spark, events_batch, tmp_path):
    """dropDuplicatesWithinWatermark suppresses replayed events: stream over
    a doubled source == batch dedup of the same doubled frame."""
    from sequila_native_spark.streaming import dedup_events

    sample = events_batch.where(F.col("user_id") % 25 == 0)
    doubled = sample.unionAll(sample.where(F.col("event_id") % 2 == 0))
    want = rows_set(dedup_events(doubled, "event_id"))
    assert sum(want.values()) == sample.count()  # duplicates collapsed

    src = os.path.join(str(tmp_path), "dedup_src")
    # two files so the replayed copies arrive in a later micro-batch too
    sample.coalesce(1).write.mode("overwrite").parquet(src)
    sample.where(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    out = dedup_events(stream, "event_id", watermark="10 days")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("stream_dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = rows_set(spark.table("stream_dedup_out"))
    assert got == want


def test_stateless_pipeline_ops_stream_equal_batch(spark, tmp_path):
    # deterministic_sample / split_dataset / filter_documents are stateless
    # projections+filters, so they run on streaming frames unchanged and
    # select EXACTLY the batch row set (hash selection has no RNG state —
    # df.sample would not even be allowed on a stream without state caveats)
    import os

    from sequila_native_spark.functions import (
        deterministic_sample,
        split_dataset,
    )
    from sequila_native_spark.functions.text import filter_documents

    docs = spark.createDataFrame(
        [(i, ("the quick brown fox jumps over the lazy dog and keeps on "
              "running through the field " * 2) if i % 3 else "x y")
         for i in range(90)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs_src")
    docs.write.mode("overwrite").parquet(src)

    def transform(df):
        kept = filter_documents(df, "text", min_ttr_milli=50)
        kept = deterministic_sample(kept, 0.5, key="doc_id", seed=9)
        return split_dataset(kept, {"train": 0.9, "heldout": 0.1},
                             key="doc_id", seed=4)

    batch = {(r["doc_id"], r["split"]) for r in transform(docs).collect()}

    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(src)
    )
    assert stream.isStreaming
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName("stateless_ops_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["doc_id"], r["split"])
           for r in spark.table("stateless_ops_out").collect()}
    assert got == batch and len(batch) > 0


def test_prep_ops_stream_equal_batch(spark, tmp_path):
    # r6 prep ops on streams: redact_pii and chunk_documents are stateless
    # (project + generate) and run on streaming frames unchanged;
    # decontamination flags a stream against a STATIC benchmark (the
    # production shape: eval sets are static, the corpus streams in) via the
    # same broadcast gram join. All three select exactly the batch row set.
    from sequila_native_spark.functions import (
        chunk_documents,
        match_contaminated,
        redact_pii,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 5 + j) % 11}" for j in range(i % 20 + 3))
          + (f" mail u{i}@x.io" if i % 4 == 0 else ""))
         for i in range(80)],
        "doc_id long, text string",
    )
    bench = docs.where("doc_id % 9 = 0")
    corpus = docs.where("doc_id % 9 != 0")
    src = str(tmp_path / "prep_src")
    corpus.write.mode("overwrite").parquet(src)

    def transform(df):
        # match_contaminated is the aggregation-free (hence watermark-free)
        # streaming variant; contamination_report would need a watermark
        flagged = match_contaminated(df, bench, n=3, how="left_semi")
        return chunk_documents(
            flagged.select("doc_id", redact_pii(F.col("text")).alias("text")),
            size=6, overlap=2,
        )

    batch = {tuple(r) for r in transform(corpus).collect()}

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    assert stream.isStreaming
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName("prep_ops_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.table("prep_ops_out").collect()}
    assert got == batch and len(batch) > 0
    # redaction really happened on the stream
    assert all("@" not in r[3] for r in got)  # chunk_text is col 4


def test_read_documents_jsonl(spark, tmp_path):
    import json as _json

    from sequila_native_spark.sources import (
        read_documents_jsonl,
        read_documents_parquet,
    )

    src = tmp_path / "corpus"
    src.mkdir()
    recs = [
        {"doc_id": 1, "text": "hello world", "lang": "en", "url": "http://a"},
        {"doc_id": 2, "text": "", "lang": "de", "url": "http://b"},
        {"doc_id": 3, "text": "drei vier fünf", "url": "http://c"},
    ]
    with open(src / "part0.jsonl", "w") as fh:
        for r in recs:
            fh.write(_json.dumps(r) + "\n")

    out = read_documents_jsonl(
        spark, str(src), extra_fields={"lang": "lang", "url": "source"}
    ).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == [1, 2, 3]
    assert out[0]["text"] == "hello world" and out[0]["n_chars"] == 11
    assert out[2]["lang"] is None and out[2]["source"] == "http://c"

    # id derivation from a unique field: deterministic and distinct
    derived = read_documents_jsonl(
        spark, str(src), id_field=None, id_from="url"
    ).collect()
    ids = sorted(r["doc_id"] for r in derived)
    assert len(set(ids)) == 3 and all(i >= 0 for i in ids)
    again = sorted(
        r["doc_id"]
        for r in read_documents_jsonl(
            spark, str(src), id_field=None, id_from="url"
        ).collect()
    )
    assert ids == again

    with pytest.raises(ValueError):
        read_documents_jsonl(spark, str(src), id_field=None)

    # canonical parquet reader round-trips the driver shape
    docs = read_documents_parquet(spark, f"{SF0_001}/documents.parquet")
    assert docs.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert docs.count() > 0

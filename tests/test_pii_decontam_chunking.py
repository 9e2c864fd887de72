"""PII redaction, benchmark decontamination, document chunking —
cross-engine (Spark vs DuckDB) parity plus semantics pins."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sequila_native_spark.functions import (
    chunk_documents,
    chunk_documents_sql,
    contamination_report,
    contamination_report_sql,
    decontaminate,
    pii_stats,
    pii_stats_sql,
    redact_pii,
    redact_pii_sql,
)
from sequila_native_spark.functions.pii import PII_PATTERNS
from _testdata import SF0_001

PII_TEXTS = [
    (0, "reach me at john.doe+spam@mail.example.com or 10.0.42.7 thanks"),
    (1, "card 1234-5678-9012-3456 ssn 123-45-6789 call +1 415-555-1234"),
    (2, "no pii here just words 1.2 and ver 1.2.3"),
    (3, "two mails a@b.co x@y.org ips 255.255.255.255 999.999.999.999"),
    (4, ""),
    (5, "edge .@a.bc 1.2.3.4.5 12-34-5678 +12 345-678-9012 end"),
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    c.executemany("INSERT INTO docs VALUES (?,?)", PII_TEXTS)
    return c


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(PII_TEXTS, "doc_id long, text string")


def test_pii_stats_parity(spark, docs, con):
    stats = pii_stats(F.col("text"))
    got = [
        tuple(r)
        for r in docs.select(
            "doc_id",
            *[v.alias(k) for k, v in stats.items()],
            redact_pii(F.col("text")).alias("red"),
        )
        .orderBy("doc_id")
        .collect()
    ]
    cols = ", ".join(f"{v} AS {k}" for k, v in pii_stats_sql("text").items())
    want = con.execute(
        f"SELECT doc_id, {cols}, {redact_pii_sql('text')} AS red "
        f"FROM docs ORDER BY doc_id"
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_pii_semantics_pinned(spark, docs):
    rows = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id", *[v.alias(k) for k, v in pii_stats(F.col("text")).items()]
        ).collect()
    }
    assert rows[0]["n_email"] == 1 and rows[0]["n_ipv4"] == 1
    assert (
        rows[1]["n_credit_card"] == 1
        and rows[1]["n_ssn"] == 1
        and rows[1]["n_phone"] == 1
    )
    assert rows[2]["n_pii"] == 0 and rows[2]["redact_delta"] == 0
    assert rows[3]["n_email"] == 2 and rows[3]["n_ipv4"] == 2
    assert rows[4]["n_pii"] == 0


def test_redaction_masks_every_match(spark, docs):
    red = docs.select(redact_pii(F.col("text")).alias("t"))
    for kind, pat in PII_PATTERNS.items():
        leftover = red.where(
            F.size(F.regexp_extract_all(F.col("t"), F.lit(pat), F.lit(0))) > 0
        ).count()
        assert leftover == 0, f"{kind} still present after redaction"


DOC_TEXTS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
    (2, "the quick brown fox sleeps all day long"),       # shares 4-gram w/ 0
    (3, "jumps over the lazy dog every single morning"),  # shares 5-gram w/ 0
    (4, "completely unrelated words without any overlap at all"),
    (5, ""),
]


@pytest.fixture(scope="module")
def con2():
    c = duckdb.connect()
    c.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    c.executemany("INSERT INTO docs VALUES (?,?)", DOC_TEXTS)
    return c


@pytest.fixture(scope="module")
def docs2(spark):
    return spark.createDataFrame(DOC_TEXTS, "doc_id long, text string")


def test_contamination_report_parity(spark, docs2, con2):
    bench = docs2.where("doc_id = 0")
    corpus = docs2.where("doc_id > 0")
    got = [
        tuple(r)
        for r in contamination_report(corpus, bench, n=4)
        .orderBy("doc_id")
        .collect()
    ]
    want = con2.execute(
        contamination_report_sql(
            "(SELECT * FROM docs WHERE doc_id > 0)",
            "(SELECT * FROM docs WHERE doc_id = 0)",
            n=4,
        )
        + " ORDER BY doc_id"
    ).fetchall()
    assert got == [tuple(w) for w in want]
    assert {g[0] for g in got} == {2, 3}  # the two constructed overlaps


def test_decontaminate_drops_flagged_only(spark, docs2):
    bench = docs2.where("doc_id = 0")
    corpus = docs2.where("doc_id > 0")
    clean = sorted(
        r["doc_id"] for r in decontaminate(corpus, bench, n=4).collect()
    )
    assert clean == [1, 4, 5]
    # benchmark doc shares every n-gram with itself: self-check
    assert decontaminate(bench, bench, n=4).count() == 0


def test_contamination_ngram_width_monotone(spark, docs2):
    bench = docs2.where("doc_id = 0")
    corpus = docs2.where("doc_id > 0")
    flagged = {
        n: {r["doc_id"] for r in contamination_report(corpus, bench, n=n).collect()}
        for n in (3, 4, 5, 6)
    }
    # wider n-grams can only shrink the flagged set
    assert flagged[6] <= flagged[5] <= flagged[4] <= flagged[3]
    assert flagged[5] == {3}  # "jumps over the lazy dog"


CHUNK_TEXTS = [
    (0, " ".join(f"t{i}" for i in range(10))),
    (1, "one two three"),
    (2, ""),
    (3, " ".join(f"w{i % 7}" for i in range(23))),
    (4, " ".join(f"x{i}" for i in range(8))),  # exactly one window
]


def test_chunk_documents_parity(spark):
    sdf = spark.createDataFrame(CHUNK_TEXTS, "doc_id long, text string")
    got = [
        tuple(r)
        for r in chunk_documents(sdf, size=8, overlap=4)
        .orderBy("doc_id", "chunk_id")
        .collect()
    ]
    c = duckdb.connect()
    c.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    c.executemany("INSERT INTO docs VALUES (?,?)", CHUNK_TEXTS)
    want = c.execute(
        chunk_documents_sql("docs", size=8, overlap=4)
        + " ORDER BY doc_id, chunk_id"
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_chunk_semantics(spark):
    sdf = spark.createDataFrame(CHUNK_TEXTS, "doc_id long, text string")
    rows = chunk_documents(sdf, size=8, overlap=4).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # len<=size -> exactly one chunk; empty text -> one 1-token ('' token) chunk
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_tokens"] == 3
    assert len(by_doc[4]) == 1 and by_doc[4][0]["n_tokens"] == 8
    assert len(by_doc[2]) == 1
    # 23 tokens, size 8 stride 4 -> starts 0,4,8,12,16 -> 5 chunks, last short
    assert [r["chunk_id"] for r in sorted(by_doc[3], key=lambda r: r["chunk_id"])] == [0, 1, 2, 3, 4]
    assert sorted(by_doc[3], key=lambda r: r["chunk_id"])[-1]["n_tokens"] == 7
    # every token of the doc appears in some chunk; consecutive chunks overlap by 4
    c0, c1 = (
        sorted(by_doc[0], key=lambda r: r["chunk_id"])[0]["chunk_text"].split(" "),
        sorted(by_doc[0], key=lambda r: r["chunk_id"])[1]["chunk_text"].split(" "),
    )
    assert c0[4:] == c1[:4]


def test_chunk_validation():
    with pytest.raises(ValueError):
        chunk_documents_sql("docs", size=0, overlap=0)
    with pytest.raises(ValueError):
        chunk_documents_sql("docs", size=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_documents_sql("docs", size=8, overlap=-1)


def test_pack_documents_parity_and_laws(spark):
    from sequila_native_spark.functions import pack_documents, pack_documents_sql

    texts = [(i, " ".join(f"w{j}" for j in range((i * 37) % 90 + 1)))
             for i in range(200)]
    sdf = spark.createDataFrame(texts, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in pack_documents(sdf, capacity=100, shards=4).collect()
    )
    c = duckdb.connect()
    c.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    c.executemany("INSERT INTO docs VALUES (?,?)", texts)
    want = sorted(
        tuple(w)
        for w in c.execute(
            pack_documents_sql("docs", capacity=100, shards=4)
        ).fetchall()
    )
    assert got == want

    rows = pack_documents(sdf, capacity=100, shards=4).collect()
    # token conservation per shard: max(start_tok + n_tokens) == sum(n_tokens)
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        total = sum(r["n_tokens"] for r in rs)
        assert max(r["start_tok"] + r["n_tokens"] for r in rs) == total
        # stream is gapless: sorted start_toks tile exactly
        spans = sorted((r["start_tok"], r["n_tokens"]) for r in rs)
        pos = 0
        for s, n in spans:
            assert s == pos
            pos += n
        # pack math consistent with offsets
        for r in rs:
            assert r["first_pack"] == r["start_tok"] // 100
            assert r["last_pack"] == (r["start_tok"] + r["n_tokens"] - 1) // 100
            assert r["pack_offset"] == r["start_tok"] % 100


def test_pack_documents_stability_and_validation(spark):
    from sequila_native_spark.functions import pack_documents

    texts = [(i, " ".join("x" for _ in range(i % 30 + 1))) for i in range(100)]
    sdf = spark.createDataFrame(texts, "doc_id long, text string")
    a = sorted(tuple(r) for r in pack_documents(sdf, capacity=64).collect())
    b = sorted(
        tuple(r) for r in pack_documents(sdf.repartition(7), capacity=64).collect()
    )
    assert a == b  # repartition-stable (md5 order, not physical order)
    with pytest.raises(ValueError):
        pack_documents(sdf, capacity=0)
    with pytest.raises(ValueError):
        pack_documents(sdf, capacity=64, shards=0)


def test_llm_tvfs(spark):
    """sequila_chunk / sequila_pack / sequila_redact / sequila_decontaminate
    table functions agree with their Python APIs."""
    from sequila_native_spark.functions import (
        chunk_documents,
        decontaminate,
        pack_documents,
        pii_stats,
        redact_pii,
    )
    from sequila_native_spark.sql import sequila_sql

    texts = [(i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(i % 25 + 1)))
             for i in range(60)]
    sdf = spark.createDataFrame(texts, "doc_id long, text string")
    sdf.createOrReplaceTempView("tvf_docs")
    sdf.where("doc_id % 9 = 0").createOrReplaceTempView("tvf_bench")
    sdf.where("doc_id % 9 != 0").createOrReplaceTempView("tvf_corpus")

    got = sequila_sql(
        spark, "SELECT * FROM sequila_chunk('tvf_docs', 'text', 'doc_id', 8, 4)"
    ).collect()
    want = chunk_documents(sdf, size=8, overlap=4).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    got = sequila_sql(
        spark, "SELECT * FROM sequila_pack('tvf_docs', 'text', 'doc_id', 64, 4)"
    ).collect()
    want = pack_documents(sdf, capacity=64, shards=4).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    got = sequila_sql(
        spark,
        "SELECT count(*) AS n FROM "
        "sequila_decontaminate('tvf_corpus', 'tvf_bench', 'text', 'doc_id', 3)",
    ).collect()[0]["n"]
    want = decontaminate(
        sdf.where("doc_id % 9 != 0"), sdf.where("doc_id % 9 = 0"), n=3
    ).count()
    assert got == want

    pii_df = spark.createDataFrame(
        [(0, "mail a@b.co here"), (1, "clean")], "doc_id long, text string"
    )
    pii_df.createOrReplaceTempView("tvf_pii")
    red = sequila_sql(
        spark, "SELECT text FROM sequila_redact('tvf_pii', 'text') ORDER BY doc_id"
    ).collect()
    assert red[0]["text"] == "mail <EMAIL> here"
    assert red[1]["text"] == "clean"

    with pytest.raises(ValueError):
        sequila_sql(spark, "SELECT * FROM sequila_redact('tvf_pii', 'nope')")
    with pytest.raises(ValueError):
        sequila_sql(spark, "SELECT * FROM sequila_chunk('tvf_docs')")


def test_match_contaminated_agrees_with_report(spark, docs2):
    from sequila_native_spark.functions import match_contaminated

    bench = docs2.where("doc_id = 0")
    corpus = docs2.where("doc_id > 0")
    for n in (3, 4, 5):
        via_join = {
            r["doc_id"]
            for r in match_contaminated(corpus, bench, n=n).collect()
        }
        via_report = {
            r["doc_id"]
            for r in contamination_report(corpus, bench, n=n).collect()
        }
        assert via_join == via_report
        kept = {
            r["doc_id"]
            for r in match_contaminated(
                corpus, bench, n=n, how="left_anti"
            ).collect()
        }
        assert kept == {r["doc_id"] for r in corpus.collect()} - via_report
    with pytest.raises(ValueError):
        match_contaminated(corpus, bench, how="inner")


def test_api_guards(spark):
    from sequila_native_spark.functions import redact_pii_sql
    from sequila_native_spark.functions.pii import pii_count

    with pytest.raises(ValueError):
        redact_pii_sql("text", kinds=["email", "nope"])
    with pytest.raises(KeyError):
        pii_count(F.lit("x"), "nope")


def test_id_col_collision_guards(spark):
    from sequila_native_spark.functions import chunk_documents, pack_documents

    df = spark.createDataFrame([(1, "a b")], "chunk_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, id_col="chunk_id")
    df2 = spark.createDataFrame([(1, "a b")], "shard long, text string")
    with pytest.raises(ValueError):
        pack_documents(df2, id_col="shard")


# --- write_training_shards (r6: materialized training order) ---------------


def test_write_training_shards_deterministic_order(spark, tmp_path):
    import hashlib

    from sequila_native_spark.functions import write_training_shards

    docs = spark.read.parquet(f"{SF0_001}/documents.parquet")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs, p1, shards=4, seed=3)
    # same data, different upstream partitioning -> identical shard order
    write_training_shards(docs.repartition(13), p2, shards=4, seed=3)

    def shard_rows(path, s):
        pdf = spark.read.parquet(f"{path}/shard={s}").toPandas()
        return list(pdf["doc_id"])

    key = lambda i: int(hashlib.md5(f"3:{i}".encode()).hexdigest()[:8], 16)  # noqa: E731
    all_ids = []
    for s in range(4):
        a, b = shard_rows(p1, s), shard_rows(p2, s)
        assert a == b  # row order, not just row set
        assert all(key(i) % 4 == s for i in a)  # shard assignment law
        hashes = [key(i) for i in a]
        assert hashes == sorted(hashes)  # within-shard training order
        all_ids += a
    assert sorted(all_ids) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )  # exhaustive partition


def test_write_training_shards_validation(spark):
    from sequila_native_spark.functions import write_training_shards

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="shards"):
        write_training_shards(docs, "/tmp/never", shards=0)
    with pytest.raises(ValueError, match="collide"):
        write_training_shards(
            docs.withColumnRenamed("doc_id", "shard"), "/tmp/never",
            id_col="shard",
        )
    with pytest.raises(ValueError, match="collide"):
        # pre-existing 'shard' DATA column would be silently overwritten
        write_training_shards(
            docs.withColumn("shard", docs["doc_id"] % 2), "/tmp/never",
        )

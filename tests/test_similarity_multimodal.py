"""Similarity search + multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sequila_native_spark.functions import (
    attach_binary,
    cosine_topk,
    decode_media_meta,
    lsh_ann_topk,
    near_dup_pairs,
    sample_chunks,
)
from _testdata import SF0_001

SF = SF0_001


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.999, 0.01, 0.0, 0.0], 0),   # near dup of 1
        (3, [0.0, 1.0, 0.0, 0.0], 0),
        (4, [0.0, 0.0, 1.0, 0.0], 1),
        (5, [1.0, 0.0, 0.0, 0.0], 1),      # same direction as 1, other block
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_cosine_topk_exact(spark, vecs):
    q = vecs.where(F.col("vec_id") == 1)
    out = cosine_topk(vecs, q, k=3).collect()
    ranked = sorted((r["rank"], r["neighbor_id"]) for r in out)
    # rank1 tie between self (1) and identical (5) → min id first
    assert ranked == [(1, 1), (2, 5), (3, 2)]


def test_near_dup_pairs_blocked(spark, vecs):
    out = near_dup_pairs(vecs, threshold_milli=990).collect()
    got = {(r["id_a"], r["id_b"]): r["cos_milli"] for r in out}
    assert (1, 2) in got and got[(1, 2)] >= 990
    # (1,5) identical but in different blocks → not compared
    assert (1, 5) not in got


def test_lsh_ann_recall_on_real_embeddings(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 8)
    exact = cosine_topk(emb, queries, k=5).collect()
    # moderate-similarity neighbors (cos ≈ 0.3-0.5 → collision prob per
    # plane ≈ 2/3): few planes + many tables is the right end of the dial
    approx = lsh_ann_topk(emb, queries, k=5, n_planes=4, n_tables=8).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"LSH recall too low: {recall}"
    # self-match always survives (identical vector shares every bucket)
    assert all((q, q) in approx_set for q in range(8))


def test_multimodal_plumbing(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    with_bin = attach_binary(docs)
    assert dict(with_bin.dtypes)["payload"] == "binary"
    meta = decode_media_meta(with_bin).collect()
    for r in meta:
        assert r["n_bytes"] == r["n_chars"]  # ascii text: bytes == chars
        assert len(r["header_hex"]) == 8
    chunks = sample_chunks(with_bin, id_col="doc_id", n_chunks=4)
    out = chunks.collect()
    assert set(chunks.columns) == {"doc_id", "chunk_idx", "chunk_bytes", "chunk"}
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["chunk_idx"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in per_doc.values())


def test_multimodal_strict_decode_raises(spark):
    # image/png has no registered decoder in this container (PIL absent)
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(2)
    with_bin = attach_binary(docs, media_type="image/png")
    with pytest.raises(Exception, match="no decoder registered"):
        decode_media_meta(with_bin, strict_decode=True).collect()
    # non-strict: rows flow through with null typed fields
    rows = decode_media_meta(with_bin).collect()
    assert len(rows) == 2
    assert all(r["media_format"] is None and r["width"] is None for r in rows)


def test_fake_image_codec_strict_decode(spark):
    from sequila_native_spark.functions import encode_fake_image
    from sequila_native_spark.functions.multimodal import FAKE_IMAGE_TYPE

    rows = [
        (1, encode_fake_image(640, 480, b"pixels")),
        (2, encode_fake_image(32, 1024)),
    ]
    df = spark.createDataFrame(rows, "doc_id int, payload binary").withColumn(
        "media_type", F.lit(FAKE_IMAGE_TYPE)
    )
    got = {
        r["doc_id"]: (r["media_format"], r["width"], r["height"], r["duration_ms"])
        for r in decode_media_meta(df, strict_decode=True).collect()
    }
    assert got == {
        1: ("fake-image", 640, 480, None),
        2: ("fake-image", 32, 1024, None),
    }


def test_fake_image_codec_bad_payload(spark):
    from sequila_native_spark.functions.multimodal import FAKE_IMAGE_TYPE

    df = spark.createDataFrame(
        [(1, b"not an image")], "doc_id int, payload binary"
    ).withColumn("media_type", F.lit(FAKE_IMAGE_TYPE))
    # strict: decode failure surfaces; lax: null typed fields
    with pytest.raises(Exception, match="not a fake image"):
        decode_media_meta(df, strict_decode=True).collect()
    r = decode_media_meta(df).collect()[0]
    assert r["media_format"] is None and r["n_bytes"] == 12


def test_custom_registered_decoder_roundtrip(spark):
    from sequila_native_spark.functions import register_decoder, unregister_decoder

    def wav_decoder(raw: bytes) -> dict:
        return {"format": "wav", "duration_ms": len(raw) * 10}

    register_decoder("audio/wav", wav_decoder)
    try:
        df = spark.createDataFrame(
            [(1, b"abcd")], "doc_id int, payload binary"
        ).withColumn("media_type", F.lit("audio/wav"))
        r = decode_media_meta(df, strict_decode=True).collect()[0]
        assert (r["media_format"], r["duration_ms"], r["width"]) == ("wav", 40, None)
    finally:
        unregister_decoder("audio/wav")


def test_driver_recall_queries_pinned_floors(spark):
    """q_lsh_recall / q_ivf_recall (VERDICT r2 item 5): driver-visible recall
    against the in-engine exact cosine_topk, floors pinned here."""
    import __spark_entry__ as entry

    lsh = entry.queries()["lsh_recall"](spark, SF).first()
    assert lsh["n_queries"] == 50 and lsh["n_exact"] == 250
    assert lsh["recall_milli"] >= 650  # measured 756 at sf0.001
    ivf = entry.queries()["ivf_recall"](spark, SF).first()
    assert ivf["n_queries"] == 50 and ivf["n_exact"] == 250
    assert ivf["recall_milli"] >= 750  # measured 892 at sf0.001


def test_resize_media_fake_codec(spark):
    from sequila_native_spark.functions import (
        attach_binary,
        decode_media_meta,
        encode_fake_image,
        resize_media,
    )
    from sequila_native_spark.functions.multimodal import FAKE_IMAGE_TYPE

    rows = [(1, encode_fake_image(100, 80, bytes(range(200)))),
            (2, encode_fake_image(10, 10, b"abcdef"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary").withColumn(
        "media_type", F.lit(FAKE_IMAGE_TYPE)
    )
    out = decode_media_meta(resize_media(df, 50, 40))
    got = {r["doc_id"]: (r["width"], r["height"], r["n_bytes"]) for r in out.collect()}
    assert got[1][:2] == (50, 40) and got[2][:2] == (50, 40)
    # downscale 100x80 -> 50x40 quarters the body sample: 200 -> 50 bytes (+8 header)
    assert got[1][2] == 58
    # resize is deterministic: same input twice -> identical payloads
    p1 = resize_media(df, 50, 40).orderBy("doc_id").collect()
    p2 = resize_media(df, 50, 40).orderBy("doc_id").collect()
    assert [bytes(r["payload"]) for r in p1] == [bytes(r["payload"]) for r in p2]


def test_resize_media_missing_transformer_raises(spark):
    from sequila_native_spark.functions import resize_media

    df = spark.createDataFrame([(1, b"xx")], "doc_id long, payload binary").withColumn(
        "media_type", F.lit("video/x-unknown")
    )
    with pytest.raises(Exception, match="no transformer registered"):
        resize_media(df, 2, 2).collect()


def test_extract_features_feeds_similarity(spark):
    """Media -> features -> ANN composition: the featurizer output is a unit
    vector consumable by cosine_topk directly."""
    import math

    from sequila_native_spark.functions import attach_binary, cosine_topk, extract_features

    # three byte-distribution classes (lowercase / uppercase / punctuation —
    # distinct high nibbles), so same-class docs are cosine-1 to each other
    classes = ["aaaa bbbb cccc", "AAAA BBBB CCCC", "!!!! #### $$$$"]
    docs = spark.createDataFrame(
        [(i, classes[i % 3]) for i in range(12)],
        "doc_id long, text string",
    )
    feats = extract_features(attach_binary(docs)).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    rows = feats.collect()
    assert all(len(r["embedding"]) == 16 for r in rows)
    for r in rows:
        assert abs(math.fsum(v * v for v in r["embedding"]) - 1.0) < 1e-5
    topk = cosine_topk(feats, feats.where(F.col("vec_id") < 2), k=3)
    got = topk.collect()
    assert len(got) == 6  # 2 queries x k=3
    # rank 1 is the query itself (cosine 1.0, deterministic id tie-break)
    best = {r["query_id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
    assert best[0] in (0, 3, 6, 9) and best[1] in (1, 4, 7, 10)


# ---------------------------------------------------------------------------
# Perceptual-hash dedup (round 6)
# ---------------------------------------------------------------------------

def _fake_images():
    """Deterministic fake-image corpus: three content families (gradient,
    sine-ish, blocky) + small perturbations + a resized copy per family."""
    from sequila_native_spark.functions.multimodal import (
        encode_fake_image,
        fake_image_resize,
    )

    def gradient(n):
        return bytes(i * 255 // (n - 1) for i in range(n))

    def wave(n):
        return bytes((128 + int(120 * __import__("math").sin(i / 7.0))) % 256
                     for i in range(n))

    def blocky(n):
        return bytes((0 if (i // 50) % 2 else 230) for i in range(n))

    rows = []
    for fam, body_fn in enumerate([gradient, wave, blocky]):
        base = encode_fake_image(40, 30, body_fn(1200))
        rows.append((fam * 10, base))
        # light perturbation: flip a few bytes mid-body
        b = bytearray(base)
        for p in range(300, 306):
            b[p] = (b[p] + 90) % 256
        rows.append((fam * 10 + 1, bytes(b)))
        # resized to half dimensions through the codec
        rows.append((fam * 10 + 2, fake_image_resize(base, {"width": 20, "height": 15})))
    return rows


def test_perceptual_pairs_match_bruteforce(spark):
    from sequila_native_spark.functions.multimodal import (
        FAKE_IMAGE_TYPE,
        fake_image_phash,
        perceptual_dup_pairs,
    )

    rows = _fake_images()
    df = spark.createDataFrame(
        [(i, bytearray(p), FAKE_IMAGE_TYPE) for i, p in rows],
        "doc_id long, payload binary, media_type string",
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in perceptual_dup_pairs(df, max_hamming=12).collect()}

    hashes = {i: fake_image_phash(p) for i, p in rows}
    want = {}
    ids = sorted(hashes)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            d = bin(hashes[ids[x]] ^ hashes[ids[y]]).count("1")
            if d <= 12:
                want[(ids[x], ids[y])] = d
    assert got == want
    # the banded join must find every same-family (perturbed/resized) pair
    assert all((f * 10, f * 10 + 2) in got or
               bin(hashes[f * 10] ^ hashes[f * 10 + 2]).count("1") > 12
               for f in range(3))


def test_perceptual_hash_resize_invariance(spark):
    """aHash through the codec must be stable under the codec's own resize:
    same content, different encoded size, small Hamming distance."""
    from sequila_native_spark.functions.multimodal import (
        encode_fake_image,
        fake_image_phash,
        fake_image_resize,
    )

    body = bytes(i * 255 // 999 for i in range(1000))
    orig = encode_fake_image(50, 20, body)
    for w, h in [(25, 10), (10, 4), (100, 40)]:
        resized = fake_image_resize(orig, {"width": w, "height": h})
        d = bin(fake_image_phash(orig) ^ fake_image_phash(resized)).count("1")
        assert d <= 8, (w, h, d)


def test_perceptual_hash_null_for_unregistered_type(spark):
    from sequila_native_spark.functions.multimodal import (
        perceptual_dup_pairs,
        perceptual_hash,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"abcd" * 50), "application/x-unknown"),
         (2, bytearray(b"abcd" * 50), "application/x-unknown"),
         (3, bytearray(b"abcd" * 50), "text/plain"),
         (4, bytearray(b"abcd" * 50), "text/plain")],
        "doc_id long, payload binary, media_type string",
    )
    hashed = perceptual_hash(df).collect()
    by_id = {r["doc_id"]: r["phash"] for r in hashed}
    assert by_id[1] is None and by_id[2] is None
    assert by_id[3] is not None and by_id[3] == by_id[4]
    # null-hash rows never appear in pairs
    pairs = {(r["id_a"], r["id_b"]) for r in
             perceptual_dup_pairs(df, max_hamming=4).collect()}
    assert pairs == {(3, 4)}


def test_perceptual_strict_raises(spark):
    from sequila_native_spark.functions.multimodal import perceptual_hash

    df = spark.createDataFrame(
        [(1, bytearray(b"x"), "application/x-unknown")],
        "doc_id long, payload binary, media_type string",
    )
    with pytest.raises(Exception, match="no perceptual hasher"):
        perceptual_hash(df, strict=True).collect()


# ---------------------------------------------------------------- r6: delta + SemDeDup


def test_embedding_dups_against_corpus_exact_vs_brute_force(spark):
    from sequila_native_spark.functions import embedding_dups_against_corpus
    import numpy as np

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    batch = emb.where(F.col("vec_id") % 5 == 0)
    corpus = emb.where(F.col("vec_id") % 5 != 0)
    out = embedding_dups_against_corpus(batch, corpus, threshold_milli=300)
    got = {(r["batch_id"], r["corpus_id"]): r["cos_milli"] for r in out.collect()}

    pdf = emb.toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    want = {}
    for i in range(len(ids)):
        if ids[i] % 5 != 0:
            continue
        for j in range(len(ids)):
            if ids[j] % 5 == 0:
                continue
            cm = int(np.floor(sims[i, j] * 1000))
            if cm >= 300:
                want[(int(ids[i]), int(ids[j]))] = cm
    assert set(got) == set(want)
    # milli scores may differ ±1 at ULP boundaries between numpy's fused
    # order and Spark's aggregate fold — pin within one
    assert all(abs(got[k] - want[k]) <= 1 for k in got)
    # asymmetry: no batch x batch, no corpus x corpus pair can appear
    assert all(a % 5 == 0 and b % 5 != 0 for a, b in got)


def test_embedding_dups_against_corpus_blocked_path(spark, vecs):
    from sequila_native_spark.functions import embedding_dups_against_corpus

    batch = vecs.where(F.col("vec_id").isin(1, 4))
    corpus = vecs.where(~F.col("vec_id").isin(1, 4))
    exact = embedding_dups_against_corpus(batch, corpus, threshold_milli=990)
    blocked = embedding_dups_against_corpus(
        batch, corpus, threshold_milli=990, block_col="label"
    )
    e = {(r["batch_id"], r["corpus_id"]) for r in exact.collect()}
    b = {(r["batch_id"], r["corpus_id"]) for r in blocked.collect()}
    # exact finds the cross-block identical pair (1, 5); label-blocking hides it
    assert (1, 5) in e and (1, 2) in e
    assert b == {(1, 2)}
    assert b <= e  # blocking only ever loses pairs


def test_semantic_dedup_single_cell_matches_brute_force(spark):
    """n_cells=1 ⇒ every pair is compared: the keep set must equal the
    Python brute-force of the same greedy rule (drop the higher-centroid-sim
    member of every duplicate pair, ties to higher id)."""
    from sequila_native_spark.functions import semantic_dedup
    import numpy as np

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(200)
    out = semantic_dedup(emb, n_cells=1, threshold_milli=900, seed=7).collect()
    got_keep = {r["vec_id"] for r in out if r["keep"]}
    cent = {r["vec_id"]: r["cent_sim_milli"] for r in out}
    assert len(out) == emb.count()  # one row per input, always

    pdf = emb.toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = matn @ matn.T
    drops = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            ia, ib = int(ids[i]), int(ids[j])
            if ia >= ib:
                continue
            if int(np.floor(sims[i, j] * 1000)) >= 900:
                ca, cb = cent[ia], cent[ib]
                drops.add(ia if ca > cb else ib if cb > ca else max(ia, ib))
    want_keep = {int(x) for x in ids} - drops
    assert got_keep == want_keep
    assert drops == {int(r["vec_id"]) for r in out if not r["keep"]}


def test_semantic_dedup_keeps_low_centroid_sim_member(spark):
    """The SemDeDup policy on a clean duplicate group: the member farthest
    from the centroid survives, all closer duplicates drop."""
    from sequila_native_spark.functions import semantic_dedup

    # group A: three near-identical vectors + one offset copy (farther from
    # the centroid of the cluster); group B: a lone orthogonal vector
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9999, 0.002, 0.0, 0.0]),
        (3, [0.9998, 0.004, 0.0, 0.0]),
        (10, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in semantic_dedup(
        df, n_cells=1, threshold_milli=999, seed=3
    ).collect()}
    dup_group = [out[i] for i in (1, 2, 3)]
    keepers = [r["vec_id"] for r in dup_group if r["keep"]]
    assert len(keepers) == 1
    min_cent = min(r["cent_sim_milli"] for r in dup_group)
    kept = out[keepers[0]]
    assert kept["cent_sim_milli"] == min_cent
    assert out[10]["keep"]  # lone vector untouched


def test_stream_embedding_gate_batch_equals_lsh_candidate_brute_force(spark):
    """On batch input the gate must emit EXACTLY the pairs that (a) share a
    bucket in >=1 LSH table (same deterministic planes) and (b) clear the
    cosine threshold — each pair once."""
    import numpy as np
    from sequila_native_spark.functions import stream_embedding_gate
    from sequila_native_spark.functions.similarity import _hyperplanes

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    batch = emb.where(F.col("vec_id") % 5 == 0)
    corpus = emb.where(F.col("vec_id") % 5 != 0)
    out = stream_embedding_gate(
        batch, corpus, threshold_milli=300, n_planes=6, n_tables=4, seed=11
    ).collect()
    got = {(r["batch_id"], r["corpus_id"]) for r in out}
    assert len(got) == len(out), "pair emitted more than once"

    pdf = emb.toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    dim = mat.shape[1]
    planes = [_hyperplanes(dim, 6, 11 + t) for t in range(4)]
    w = 1 << np.arange(6, dtype=np.int64)
    bkts = np.stack([(((mat @ p.T) > 0) * w).sum(axis=1) for p in planes])
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = matn @ matn.T
    want = set()
    for i in range(len(ids)):
        if ids[i] % 5 != 0:
            continue
        for j in range(len(ids)):
            if ids[j] % 5 == 0:
                continue
            if not any(bkts[t, i] == bkts[t, j] for t in range(4)):
                continue
            if int(np.floor(sims[i, j] * 1000)) >= 300:
                want.add((int(ids[i]), int(ids[j])))
    assert got == want


def test_stream_embedding_gate_stream_equals_batch(spark, tmp_path):
    from sequila_native_spark.functions import (
        stream_embedding_gate, vector_bucket_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    batch = emb.where(F.col("vec_id") % 5 == 0)
    corpus = emb.where(F.col("vec_id") % 5 != 0)
    idx = vector_bucket_index(corpus, n_planes=6, n_tables=4, seed=11)
    want = {
        (r["batch_id"], r["corpus_id"], r["cos_milli"])
        for r in stream_embedding_gate(
            batch, corpus_index=idx, threshold_milli=300,
            n_planes=6, n_tables=4, seed=11,
        ).collect()
    }

    src = str(tmp_path / "emb_gate_src")
    # several files => several micro-batch splits under availableNow
    batch.repartition(3).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>, label int"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    out = stream_embedding_gate(
        stream, corpus_index=idx, threshold_milli=300,
        n_planes=6, n_tables=4, seed=11,
    )
    q = (out.writeStream.format("memory").queryName("emb_gate")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {
        (r["batch_id"], r["corpus_id"], r["cos_milli"])
        for r in spark.table("emb_gate").collect()
    }
    assert got == want and want
    progresses = [p for p in q.recentProgress if p is not None]
    assert progresses
    for p in progresses:  # the statelessness claim, from the engine
        assert not p["stateOperators"], p["stateOperators"]


def test_stream_embedding_gate_validation(spark, vecs):
    from sequila_native_spark.functions import stream_embedding_gate

    with pytest.raises(ValueError, match="corpus or corpus_index"):
        stream_embedding_gate(vecs)
    with pytest.raises(ValueError, match="missing columns"):
        stream_embedding_gate(vecs, corpus_index=vecs.select("vec_id"))


def test_semdedup_and_embedding_gate_tvfs(spark, vecs):
    from sequila_native_spark.sql import sequila_sql
    from sequila_native_spark.functions import (
        embedding_dups_against_corpus, semantic_dedup,
    )

    vecs.createOrReplaceTempView("sem_vecs")
    got = sequila_sql(
        spark,
        "SELECT * FROM sequila_semdedup('sem_vecs', 'vec_id', 'embedding', "
        "1, 999, 3) ORDER BY vec_id",
    ).collect()
    want = semantic_dedup(
        vecs, n_cells=1, threshold_milli=999, seed=3
    ).orderBy("vec_id").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    vecs.where(F.col("vec_id") == 1).createOrReplaceTempView("gate_b")
    vecs.where(F.col("vec_id") != 1).createOrReplaceTempView("gate_c")
    got2 = {
        tuple(r) for r in sequila_sql(
            spark,
            "SELECT * FROM sequila_embedding_gate('gate_b', 'gate_c', "
            "'vec_id', 'embedding', 990)",
        ).collect()
    }
    want2 = {
        tuple(r) for r in embedding_dups_against_corpus(
            spark.table("gate_b"), spark.table("gate_c"), threshold_milli=990
        ).collect()
    }
    assert got2 == want2 and want2
    with pytest.raises(ValueError, match="sequila_semdedup takes"):
        sequila_sql(spark, "SELECT * FROM sequila_semdedup('sem_vecs')")
    with pytest.raises(ValueError, match="sequila_embedding_gate takes"):
        sequila_sql(spark, "SELECT * FROM sequila_embedding_gate('gate_b')")


# --- cluster-balanced sampling (r6: topic-diversity budget allocation) -----


def test_cluster_balanced_sample_quotas_and_nesting(spark):
    from sequila_native_spark.functions.similarity import cluster_balanced_sample

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = cluster_balanced_sample(emb, n_cells=4, per_cell=3, seed=7)
    # one audit row per input, quota honored per cluster
    assert out.count() == emb.count()
    per = {r["cluster"]: r["n"] for r in
           out.where("selected").groupBy("cluster")
              .agg(F.count("*").alias("n")).collect()}
    assert per and all(n <= 3 for n in per.values()), per
    # raising the budget only ADDS rows (hash order independent of quota)
    small = {r["vec_id"] for r in
             out.where("selected").select("vec_id").collect()}
    big = {r["vec_id"] for r in
           cluster_balanced_sample(emb, n_cells=4, per_cell=5, seed=7)
           .where("selected").select("vec_id").collect()}
    assert small <= big


@pytest.mark.parametrize("weighting", ["equal", "sqrt", "proportional"])
def test_cluster_balanced_sample_total_budget(spark, weighting):
    from sequila_native_spark.functions.similarity import cluster_balanced_sample

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    total = 40
    out = cluster_balanced_sample(
        emb, n_cells=4, total=total, weighting=weighting, seed=7
    )
    n_sel = out.where("selected").count()
    # floor allocation never exceeds the budget and leaves < n_cells unspent
    # (unless cells run out of rows entirely)
    assert n_sel <= total
    assert n_sel > total - 8, n_sel


def test_cluster_balanced_sample_repartition_stable(spark):
    from sequila_native_spark.functions.similarity import cluster_balanced_sample

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = {r["vec_id"] for r in
         cluster_balanced_sample(emb, n_cells=4, per_cell=4, seed=3)
         .where("selected").collect()}
    b = {r["vec_id"] for r in
         cluster_balanced_sample(emb.repartition(7), n_cells=4, per_cell=4, seed=3)
         .where("selected").collect()}
    assert a == b


def test_cluster_balanced_sample_single_cell_is_hash_topn(spark):
    """n_cells=1 degenerates to the deterministic global hash-order top-n —
    pinned against an independent Python md5 computation."""
    import hashlib

    from sequila_native_spark.functions.similarity import cluster_balanced_sample

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    seed, n = 11, 9
    key = lambda i: (int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16), i)  # noqa: E731
    want = set(sorted(ids, key=key)[:n])
    got = {r["vec_id"] for r in
           cluster_balanced_sample(emb, n_cells=1, per_cell=n, seed=seed)
           .where("selected").collect()}
    assert got == want


def test_cluster_balanced_sample_validation(spark, vecs):
    from sequila_native_spark.functions.similarity import cluster_balanced_sample

    with pytest.raises(ValueError, match="exactly one"):
        cluster_balanced_sample(vecs, per_cell=1, total=5)
    with pytest.raises(ValueError, match="exactly one"):
        cluster_balanced_sample(vecs)
    with pytest.raises(ValueError, match="weighting"):
        cluster_balanced_sample(vecs, total=5, weighting="nope")
    with pytest.raises(ValueError, match="per_cell"):
        cluster_balanced_sample(vecs, per_cell=0)


def test_tvf_balanced_matches_api(spark):
    from sequila_native_spark.functions.similarity import cluster_balanced_sample
    from sequila_native_spark.sql import sequila_sql

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    emb.createOrReplaceTempView("bal_vecs")
    got = sequila_sql(
        spark,
        "SELECT * FROM sequila_balanced('bal_vecs', 'vec_id', 'embedding', "
        "4, 50, 'sqrt', 7) WHERE selected ORDER BY vec_id",
    ).collect()
    want = (
        cluster_balanced_sample(
            emb, n_cells=4, total=50, weighting="sqrt", seed=7
        ).where("selected").orderBy("vec_id").collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    with pytest.raises(ValueError, match="sequila_balanced takes"):
        sequila_sql(spark, "SELECT * FROM sequila_balanced('bal_vecs')")


def test_stream_gate_recall_dial_floors(spark):
    """The driver's stream_gate_recall row (r7, VERDICT r6 item 5): gate ⊆
    exact (precision 1 — n_hit == n_gate), and the finer 4-plane × 8-table
    dial must recall well over half of the exact pairs at the 0.3
    threshold while the gate row's own 6×4 stays a strict subset. Pinned
    floors from the deterministic seeded planes at sf0.001."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rows = {
        (r["n_planes"], r["n_tables"], r["flips"]): r
        for r in mod.q_stream_gate_recall(spark, SF).collect()
    }
    assert len(rows) == 4
    for r in rows.values():
        assert r["n_hit"] == r["n_gate"], "gate must be a subset of exact"
        assert r["n_exact"] > 0
    assert rows[(4, 8, 0)]["recall_milli"] > rows[(6, 4, 0)]["recall_milli"]
    assert rows[(4, 8, 0)]["recall_milli"] >= 500
    # r10: the multi-probe dial on the SAME 6x4 index — recall monotone
    # in flips (candidate nesting) with no rebuild and no state
    assert (rows[(6, 4, 0)]["recall_milli"]
            <= rows[(6, 4, 1)]["recall_milli"]
            <= rows[(6, 4, 2)]["recall_milli"])
    assert rows[(6, 4, 2)]["recall_milli"] > rows[(6, 4, 0)]["recall_milli"]


def test_training_prep_pipeline_laws(spark):
    """The composed training-prep row (r7, VERDICT r6 item 7): every
    conservation law must hold at test scale."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    row = mod.q_training_prep_pipeline(spark, SF).collect()
    assert len(row) == 1
    r = row[0]
    assert r["tokens_match"] and r["rows_match"]
    assert r["shards_match"] and r["shard_tokens_match"]
    assert 0 < r["sel_tokens"] <= 9000
    assert r["n_selected"] > 0 and r["n_packs"] > 0


# --- r7 hardening (reviewer findings) --------------------------------------


def test_zero_vector_cosine_is_zero_not_null(spark):
    from sequila_native_spark.functions import cosine_topk

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = cosine_topk(corpus, q, k=1).collect()
    got = {r["query_id"]: r["neighbor_id"] for r in rows}
    # the real query finds its true neighbor; the zero query scores every
    # neighbor 0.0 (defined, not NULL) and falls back to the id tie-break
    assert got[10] == 1 and got[11] == 1


def test_dim_inference_skips_null_vectors(spark):
    from sequila_native_spark.functions.similarity import (
        _infer_dim,
        add_lsh_bucket,
    )

    df = spark.createDataFrame(
        [(1, None), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    assert _infer_dim(df, "embedding") == 3
    out = add_lsh_bucket(df.where("embedding IS NOT NULL"), n_planes=4)
    assert out.count() == 1
    with pytest.raises(ValueError, match="non-null"):
        _infer_dim(df.where("vec_id < 0"), "embedding")


def test_stream_gate_rejects_mismatched_index_tables(spark):
    from sequila_native_spark.functions import (
        stream_embedding_gate,
        vector_bucket_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(40)
    idx = vector_bucket_index(emb, n_planes=4, n_tables=2, seed=11)
    with pytest.raises(ValueError, match="n_tables=2"):
        stream_embedding_gate(
            emb, threshold_milli=300, n_planes=4, n_tables=4, seed=11,
            corpus_index=idx,
        ).collect()


def test_ivf_topk_partitioning_stable(spark):
    """stable_id_col on the coarse quantizer: same corpus under different
    partitioning must give identical IVF results (reviewer, r7)."""
    from sequila_native_spark.functions import ivf_ann_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.limit(10)
    a = {tuple(r) for r in ivf_ann_topk(emb, q, k=3, n_cells=8,
                                        n_probe=4).collect()}
    b = {tuple(r) for r in ivf_ann_topk(emb.repartition(13), q, k=3,
                                        n_cells=8, n_probe=4).collect()}
    assert a == b and a


def test_ann_topk_against_index_equals_lsh_ann_topk(spark):
    """ANN serving off the at-rest index (r8): identical (query, neighbor,
    rank) rows to lsh_ann_topk at the same parameters — same planes, same
    candidate rule (bucket collision in ANY table), same exact re-rank —
    through both the frame and the persisted-table path, with the table
    path validating the recorded hashing parameters."""
    import uuid

    from sequila_native_spark.functions import (
        ann_topk_against_index,
        append_vector_bucket_index,
        lsh_ann_topk,
        vector_bucket_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") % 10 != 0)
    queries = emb.where(F.col("vec_id") % 10 == 0).limit(20)
    opts = dict(n_planes=6, n_tables=4, seed=11)
    want = {tuple(r) for r in lsh_ann_topk(corpus, queries, 5, **opts).collect()}

    idx = vector_bucket_index(corpus, **opts)
    got = {tuple(r) for r in
           ann_topk_against_index(queries, idx, 5, **opts).collect()}
    assert got == want and got

    t = f"sq_ann_idx_{uuid.uuid4().hex[:8]}"
    try:
        append_vector_bucket_index(corpus, t, buckets=8, **opts)
        got_t = {tuple(r) for r in
                 ann_topk_against_index(queries, t, 5, **opts).collect()}
        assert got_t == want
        with pytest.raises(ValueError, match="mismatch"):
            ann_topk_against_index(queries, t, 5, n_planes=6, n_tables=4,
                                   seed=99)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    with pytest.raises(ValueError, match="n_tables=4"):
        ann_topk_against_index(queries, idx, 5, n_planes=6, n_tables=2,
                               seed=11)
    with pytest.raises(ValueError, match="missing columns"):
        ann_topk_against_index(queries, emb, 5, **opts)


def test_ivf_topk_against_index_equals_ivf_ann_topk(spark):
    """IVF serving off the at-rest cells table (r8): identical rows to
    ivf_ann_topk at the same quantizer seed — same trained centroids, same
    cell assignment, same probe cells, same exact re-rank — through both
    the frame and the persisted-table path (bootstrap + daily append),
    with the table path validating the quantizer's content fingerprint."""
    import uuid

    import numpy as np

    from sequila_native_spark.functions import (
        append_ivf_index,
        build_ivf_index,
        centroids_from_table,
        centroids_to_table,
        ivf_topk_against_index,
    )
    from sequila_native_spark.functions.similarity import ivf_ann_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") % 10 != 0)
    queries = emb.where(F.col("vec_id") % 10 == 0).limit(15)
    want = {tuple(r) for r in ivf_ann_topk(
        corpus, queries, 5, n_cells=8, n_probe=3, seed=11).collect()}

    cells, cents = build_ivf_index(corpus, n_cells=8, seed=11)
    got = {tuple(r) for r in ivf_topk_against_index(
        queries, cells, cents, 5, n_probe=3).collect()}
    assert got == want and got

    # centroids round-trip is identity
    assert np.array_equal(
        centroids_from_table(cents),
        centroids_from_table(centroids_to_table(
            spark, centroids_from_table(cents))),
    )

    t = f"sq_ivf_idx_{uuid.uuid4().hex[:8]}"
    try:
        old = corpus.where(F.col("vec_id") % 3 != 0)
        new = corpus.where(F.col("vec_id") % 3 == 0)
        append_ivf_index(old, t, cents, buckets=8)
        append_ivf_index(new, t, cents, buckets=8)
        got_t = {tuple(r) for r in ivf_topk_against_index(
            queries, t, cents, 5, n_probe=3).collect()}
        assert got_t == want
        # a different quantizer (other seed) must be refused by fingerprint
        _, cents2 = build_ivf_index(corpus, n_cells=8, seed=12)
        with pytest.raises(ValueError, match="centroid_md5"):
            append_ivf_index(new, t, cents2, buckets=8)
        with pytest.raises(ValueError, match="centroid_md5"):
            ivf_topk_against_index(queries, t, cents2, 5, n_probe=3)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    with pytest.raises(ValueError, match="missing columns"):
        ivf_topk_against_index(queries, emb, cents, 5)
    with pytest.raises(ValueError, match="missing columns"):
        centroids_from_table(emb)


def test_serving_broadcast_queries_dial(spark):
    """broadcast_queries=False must produce identical results through an
    unhinted join (the larger-than-broadcast batch escape hatch — the
    perplexity-filter hazard class, preempted)."""
    from sequila_native_spark.functions import (
        ann_topk_against_index,
        build_ivf_index,
        ivf_topk_against_index,
        vector_bucket_index,
    )
    from sequila_native_spark.plans.explain import formatted_plan

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") % 10 != 0)
    queries = emb.where(F.col("vec_id") % 10 == 0).limit(10)
    idx = vector_bucket_index(corpus, n_planes=6, n_tables=4, seed=11)
    cells, cents = build_ivf_index(corpus, n_cells=8, seed=11)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for hinted, unhinted in (
            (ann_topk_against_index(queries, idx, 5, n_planes=6,
                                    n_tables=4, seed=11),
             ann_topk_against_index(queries, idx, 5, n_planes=6,
                                    n_tables=4, seed=11,
                                    broadcast_queries=False)),
            (ivf_topk_against_index(queries, cells, cents, 5, n_probe=3),
             ivf_topk_against_index(queries, cells, cents, 5, n_probe=3,
                                    broadcast_queries=False)),
        ):
            got_h = {tuple(r) for r in hinted.collect()}
            got_u = {tuple(r) for r in unhinted.collect()}
            assert got_h == got_u and got_h
            # under threshold=-1 the hinted plan still broadcasts (hints
            # override), the unhinted one must not broadcast the probe join
            assert "BroadcastHashJoin" in formatted_plan(hinted)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_serving_null_query_ids_dropped_both_paths(spark):
    """Null-id query rows are filtered upfront on BOTH serving paths
    (advisor, r11): previously the strip-vec rejoin (broadcast+multiprobe)
    would drop them while the unhinted path kept them under a null key —
    now the paths stay row-identical and null ids never reach the output."""
    from sequila_native_spark.functions import (
        ann_topk_against_index,
        vector_bucket_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") % 10 != 0)
    queries = emb.where(F.col("vec_id") % 10 == 0).limit(6).withColumn(
        "vec_id",
        F.when(F.col("vec_id") == 0, F.lit(None)).otherwise(F.col("vec_id")),
    )
    opts = dict(n_planes=6, n_tables=4, seed=11, multiprobe_flips=1)
    idx = vector_bucket_index(corpus, n_planes=6, n_tables=4, seed=11)
    got_b = {tuple(r) for r in
             ann_topk_against_index(queries, idx, 5, **opts).collect()}
    got_u = {tuple(r) for r in
             ann_topk_against_index(queries, idx, 5, broadcast_queries=False,
                                    **opts).collect()}
    assert got_b == got_u and got_b
    assert all(r[0] is not None for r in got_b)


def test_ann_index_recall_dial_floors(spark):
    """The r9 serving-recall row (VERDICT r8 item 3): dial monotonicity —
    multiprobe recall ≥ plain, IVF probe8 ≥ probe2, under-k non-increasing
    in the dial — plus pinned floors from the deterministic seeded planes /
    k-means at sf0.001 (measured: ann 250 → 650 milli with one Hamming-1
    flip, ivf 200 → 800 milli from 2 → 8 of 16 cells)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for t in ("sq_bench_ann_idx", "sq_bench_ivf_idx", "sq_bench_ivf_cent"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    rows = {
        (r["method"], r["dial"]): r
        for r in mod.q_ann_index_recall(spark, SF).collect()
    }
    for r in rows.values():
        assert r["n_exact"] == r["n_queries"] * 5
        assert r["n_hit"] <= min(r["n_served"], r["n_exact"])
        assert 0 <= r["n_underk"] <= r["n_queries"]
    ann0, ann1 = rows[("ann", 0)], rows[("ann_multiprobe", 1)]
    ann2, annb = rows[("ann_multiprobe", 2)], rows[("ann_mp2_budget", 8)]
    ivf2, ivf8 = rows[("ivf", 2)], rows[("ivf", 8)]
    assert ann1["recall_milli"] >= max(ann0["recall_milli"], 600)
    assert ann1["n_underk"] <= ann0["n_underk"]
    # r10: the 2-flip depth dials past the one-flip ceiling (measured
    # 650 → 900 milli at the bench index), and the query-directed budget
    # sits between plain and full-depth BY LAW (candidate-set nesting:
    # plain ⊆ budgeted ⊆ full) with a pinned floor (measured 700)
    assert ann2["recall_milli"] >= max(ann1["recall_milli"], 850)
    assert ann2["n_underk"] <= ann1["n_underk"]
    assert (ann0["recall_milli"] <= annb["recall_milli"]
            <= ann2["recall_milli"])
    assert annb["recall_milli"] >= 650
    assert annb["n_underk"] <= ann0["n_underk"]
    assert ivf8["recall_milli"] >= max(ivf2["recall_milli"], 700)
    assert ivf8["n_underk"] <= ivf2["n_underk"]
    for t in ("sq_bench_ann_idx", "sq_bench_ivf_idx", "sq_bench_ivf_cent"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ann_multiprobe_candidates_superset_and_validation(spark):
    """Multi-probe laws at k ≥ |corpus| (no rank truncation, so the pair
    set IS the candidate set): plain ⊆ flips=1 ⊆ flips=2 (each depth
    probes every shallower bucket too), each pair emitted exactly once
    (the stateless min-meeting-table rule); a probe_budget keeps a subset of the
    same-depth full set that still contains the exact bucket (plain ⊆
    budgeted ⊆ full); budget=1 keeps ONLY the exact bucket (the margin
    sort's score-0-first law) and so equals the plain pair set exactly;
    depth/budget validation errors fire."""
    from sequila_native_spark.functions import ann_topk_against_index
    from sequila_native_spark.functions.similarity import vector_bucket_index

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") % 10 != 0)
    queries = emb.where(F.col("vec_id") % 137 == 0)
    idx = vector_bucket_index(corpus, n_planes=6, n_tables=4, seed=11)
    k = corpus.count()
    kw = dict(n_planes=6, n_tables=4, seed=11)

    def pairs(**extra):
        rows = [(r["query_id"], r["neighbor_id"]) for r in
                ann_topk_against_index(queries, idx, k, **kw,
                                       **extra).collect()]
        assert len(set(rows)) == len(rows)  # emitted exactly once
        return set(rows)

    plain = pairs()
    m1 = pairs(multiprobe_flips=1)
    m2 = pairs(multiprobe_flips=2)
    assert plain and plain <= m1 <= m2
    b1 = pairs(multiprobe_flips=2, probe_budget=1)
    b8 = pairs(multiprobe_flips=2, probe_budget=8)
    assert b1 == plain
    assert plain <= b8 <= m2
    with pytest.raises(ValueError, match="multiprobe_flips"):
        ann_topk_against_index(queries, idx, 5, multiprobe_flips=3, **kw)
    with pytest.raises(ValueError, match="probe_budget only applies"):
        ann_topk_against_index(queries, idx, 5, probe_budget=4, **kw)
    with pytest.raises(ValueError, match="probe_budget must be"):
        ann_topk_against_index(queries, idx, 5, multiprobe_flips=1,
                               probe_budget=0, **kw)


def test_ann_multiprobe_vector_stripped_from_broadcast(spark):
    """r11 (advisor): the broadcast probe side must not duplicate the
    query vector across the probe fan-out — probe rows built
    ``keep_vec=False`` omit the ``{out_id}_vec`` column entirely, and the
    served result on the broadcast path (vector re-joined post-dedup)
    stays IDENTICAL to the unhinted path (vector inline), at full depth
    and under a truncating budget."""
    from sequila_native_spark.functions import ann_topk_against_index
    from sequila_native_spark.functions.similarity import (
        _multi_table_probes, vector_bucket_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") % 10 != 0)
    queries = emb.where(F.col("vec_id") % 137 == 0)
    dim = emb.select(F.size("embedding")).first()[0]
    sign_kw = dict(id_col="vec_id", vec_col="embedding", n_planes=6,
                   n_tables=4, seed=11, dim=dim)
    stripped = _multi_table_probes(queries, "query_id", flips=1,
                                   budget=None, with_maskset=False,
                                   keep_vec=False, **sign_kw)
    assert "query_id_vec" not in stripped.columns
    assert "query_id_bkts" in stripped.columns  # dedup input stays
    kept = _multi_table_probes(queries, "query_id", flips=1, budget=None,
                               with_maskset=False, keep_vec=True, **sign_kw)
    assert "query_id_vec" in kept.columns
    # same (row, table, bucket) probes either way
    cols = ["query_id", "__sq_table", "__sq_bkt"]
    assert (sorted(map(tuple, stripped.select(*cols).collect()))
            == sorted(map(tuple, kept.select(*cols).collect())))

    idx = vector_bucket_index(corpus, n_planes=6, n_tables=4, seed=11)
    kw = dict(n_planes=6, n_tables=4, seed=11)
    for extra in (dict(multiprobe_flips=2),
                  dict(multiprobe_flips=2, probe_budget=8)):
        hinted = {tuple(r) for r in ann_topk_against_index(
            queries, idx, 5, broadcast_queries=True, **kw, **extra
        ).collect()}
        unhinted = {tuple(r) for r in ann_topk_against_index(
            queries, idx, 5, broadcast_queries=False, **kw, **extra
        ).collect()}
        assert hinted and hinted == unhinted


def test_ann_multiprobe_recovers_underk_queries(spark):
    """The under-k story made concrete (r9): with fine buckets and ONE
    table (10 planes — misses likely by construction), the plain serving
    path leaves most queries under k; one Hamming-1 flip must strictly
    add served rows and strictly reduce the under-k query count
    (measured at sf0.001: 5 -> 18 rows, 4/4 -> 2/4 under-k)."""
    from sequila_native_spark.functions import ann_topk_against_index
    from sequila_native_spark.functions.similarity import vector_bucket_index

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    corpus = emb.where(F.col("vec_id") % 10 != 0)
    queries = emb.where(F.col("vec_id") % 137 == 0)
    nq = queries.count()
    idx = vector_bucket_index(corpus, n_planes=10, n_tables=1, seed=11)

    def serve(flips):
        served = ann_topk_against_index(
            queries, idx, 5, n_planes=10, n_tables=1, seed=11,
            multiprobe_flips=flips)
        per_q = {r["query_id"]: r["cnt"] for r in
                 served.groupBy("query_id")
                 .agg(F.count("*").alias("cnt")).collect()}
        n_rows = sum(per_q.values())
        n_underk = nq - sum(1 for v in per_q.values() if v >= 5)
        return n_rows, n_underk

    rows0, underk0 = serve(0)
    rows1, underk1 = serve(1)
    rows2, underk2 = serve(2)
    assert underk0 > 0  # the miss mode is real at this dial
    assert rows1 > rows0
    assert underk1 < underk0
    # r10: the second flip keeps dialing — more served rows, no new misses
    assert rows2 > rows1
    assert underk2 <= underk1


def test_probe_masks_and_margin_ordering(spark):
    """Direct pins on the probe expander (r10): mask inventory per depth
    (1, 1+P, 1+P+C(P,2)); exact bucket first at any budget (score 0,
    stable sort); flips=1 budget=None probe set == {bucket} ∪ Hamming-1
    (the r9 explode semantics, preserved by construction)."""
    import numpy as np

    from sequila_native_spark.functions.similarity import (
        _multi_table_probes,
        _probe_masks,
    )

    P = 6
    assert len(_probe_masks(P, 0)) == 1
    assert len(_probe_masks(P, 1)) == 1 + P
    assert len(_probe_masks(P, 2)) == 1 + P + P * (P - 1) // 2
    m2 = _probe_masks(P, 2)
    assert m2[0] == 0 and len(set(m2.tolist())) == len(m2)
    assert all(bin(int(m)).count("1") <= 2 for m in m2)

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") % 137 == 0).select("vec_id", "embedding")
    dim = len(q.first()["embedding"])
    kw = dict(id_col="vec_id", vec_col="embedding", n_planes=P,
              n_tables=2, seed=11, dim=dim)
    full1 = _multi_table_probes(q, "query_id", flips=1, budget=None, **kw)
    rows = full1.collect()
    per = {}
    for r in rows:
        per.setdefault((r["query_id"], r["__sq_table"]), []).append(
            (r["__sq_bkt"], r["query_id_bkts"][r["__sq_table"]]))
    for (qid, t), probes in per.items():
        assert len(probes) == 1 + P
        native = probes[0][1]
        assert probes[0][0] == native  # exact bucket FIRST
        assert {b ^ native for b, _ in probes} == {0} | {1 << i
                                                         for i in range(P)}
    # budget=1 keeps exactly the native bucket
    b1 = _multi_table_probes(q, "query_id", flips=2, budget=1, **kw)
    for r in b1.collect():
        assert r["__sq_bkt"] == r["query_id_bkts"][r["__sq_table"]]


def test_gate_multiprobe_superset_and_stateless_dedup(spark):
    """The gate's r10 recall dial: pair sets nest with flips (candidate
    nesting at a fixed verify threshold), every pair is emitted exactly
    once at every dial (the generalized smallest-meeting-table rule —
    no dropDuplicates anywhere in the gate), budget=1 == plain, and the
    validation errors fire."""
    from sequila_native_spark.functions import stream_embedding_gate

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    b = emb.where(F.col("vec_id") % 5 == 0)
    c = emb.where(F.col("vec_id") % 5 != 0)
    kw = dict(threshold_milli=300, n_planes=6, n_tables=4, seed=11)

    def pairs(**extra):
        rows = [(r["batch_id"], r["corpus_id"]) for r in
                stream_embedding_gate(b, c, **kw, **extra).collect()]
        assert len(set(rows)) == len(rows), "pair emitted more than once"
        return set(rows)

    p0 = pairs()
    p1 = pairs(multiprobe_flips=1)
    p2 = pairs(multiprobe_flips=2)
    assert p0 and p0 <= p1 <= p2 and p2 > p0
    assert pairs(multiprobe_flips=2, probe_budget=1) == p0
    b8 = pairs(multiprobe_flips=2, probe_budget=8)
    assert p0 <= b8 <= p2
    with pytest.raises(ValueError, match="multiprobe_flips"):
        stream_embedding_gate(b, c, multiprobe_flips=3, **kw)
    with pytest.raises(ValueError, match="probe_budget only applies"):
        stream_embedding_gate(b, c, probe_budget=4, **kw)
    with pytest.raises(ValueError, match="probe_budget must be"):
        stream_embedding_gate(b, c, multiprobe_flips=1, probe_budget=0, **kw)


def test_gate_multiprobe_streaming_equals_batch(spark, tmp_path):
    """The dial is STREAMING-SAFE by construction: the multiprobe gate on
    a readStream source in append mode with availableNow must emit
    exactly the batch pairs — possible only because dedup is the
    stateless meeting-table rule (a dropDuplicates would need a state
    store + watermark and could not run append-mode exactly-once)."""
    import os

    from sequila_native_spark.functions import stream_embedding_gate

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    b = emb.where(F.col("vec_id") % 5 == 0).select("vec_id", "embedding")
    c = emb.where(F.col("vec_id") % 5 != 0)
    kw = dict(threshold_milli=300, n_planes=6, n_tables=4, seed=11,
              multiprobe_flips=2, probe_budget=8)
    want = {tuple(r) for r in stream_embedding_gate(b, c, **kw).collect()}

    src = os.path.join(str(tmp_path), "gate_mp_src")
    b.coalesce(2).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(b.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = stream_embedding_gate(stream, c, **kw)
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("gate_mp_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.table("gate_mp_out").collect()}
    assert got == want and want

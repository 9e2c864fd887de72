"""Bounded-sample bigram LM + perplexity scoring (CCNet-style filter)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sequila_native_spark.functions import (
    perplexity_filter,
    perplexity_score,
    train_bigram_lm,
)
from _testdata import SF0_001

SF = SF0_001


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def model(corpus):
    return train_bigram_lm(corpus, id_col="doc_id", seed=3)


def test_python_reference_parity(spark, corpus, model):
    from sequila_native_spark.functions.lm import perplexity_score_py

    docs = corpus.select("doc_id", "text").unionByName(
        spark.createDataFrame(
            [(10**9, None), (10**9 + 1, ""), (10**9 + 2, "single"),
             (10**9 + 3, "zz qq xx totally unseen words here")],
            "doc_id long, text string",
        )
    )
    got = {
        r["doc_id"]: (r["n_transitions"], r["nll_milli_per_token"])
        for r in perplexity_score(docs, model).collect()
    }
    for doc_id, text in docs.collect():
        assert got[doc_id] == perplexity_score_py(text, model), doc_id
    # scoreable docs exist and every finite score is positive (probs < 1)
    finite = [v for _, v in got.values() if v is not None]
    assert finite and all(v > 0 for v in finite)


def test_training_repartition_stable(corpus):
    a = train_bigram_lm(corpus, id_col="doc_id", seed=3)
    b = train_bigram_lm(corpus.repartition(7), id_col="doc_id", seed=3)
    assert a == b


def test_fluent_scores_below_shuffled(spark, corpus, model):
    """In-domain text must score lower NLL than the same tokens shuffled:
    the bigram table is doing the work, not the unigram floor."""
    import random

    rows = [r["text"] for r in corpus.limit(20).collect() if r["text"]]
    rng = random.Random(5)
    shuffled = []
    for t in rows:
        toks = t.lower().split(" ")
        rng.shuffle(toks)
        shuffled.append(" ".join(toks))
    both = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)]
        + [(1000 + i, t) for i, t in enumerate(shuffled)],
        "doc_id long, text string",
    )
    s = {r["doc_id"]: r["nll_milli_per_token"]
         for r in perplexity_score(both, model).collect()}
    orig = sum(s[i] for i in range(len(rows))) / len(rows)
    shuf = sum(s[1000 + i] for i in range(len(rows))) / len(rows)
    assert orig < shuf


def test_filter_keeps_low_nll(spark, corpus, model):
    scores = perplexity_score(corpus, model)
    thr = int(scores.agg(
        F.expr("percentile_approx(nll_milli_per_token, 0.5)")).first()[0])
    kept = perplexity_filter(corpus, model, thr)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    want = {r["doc_id"] for r in scores.where(
        F.col("nll_milli_per_token") <= thr).collect()}
    assert kept_ids == want and 0 < len(kept_ids)
    assert set(kept.columns) == set(corpus.columns)


def test_validation(spark, corpus):
    with pytest.raises(ValueError, match="lam"):
        train_bigram_lm(corpus, lam=1.0)
    empty = spark.createDataFrame([(0, "")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no tokens"):
        train_bigram_lm(empty.where("doc_id < 0"))


def test_perplexity_plan_broadcasts_model(spark, corpus, model):
    """The scoring plan must broadcast BOTH model tables (never shuffle
    the corpus against them) and reduce transitions with a partial
    (map-side-combinable) aggregation."""
    from sequila_native_spark.plans.explain import formatted_plan

    plan = formatted_plan(perplexity_score(corpus, model))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin LeftOuter" in plan or "BroadcastHashJoin LeftOuter" in plan
    # partial + final HashAggregate pair around one exchange
    assert plan.count("HashAggregate") >= 2, plan


def test_filter_plan_never_broadcasts_keep_set(spark, corpus, model):
    """The keep set is corpus-sized in the CCNet use case (head+middle =
    majority of docs), so perplexity_filter must NOT hint it broadcast.
    With autoBroadcastJoinThreshold=-1 a hinted side would still broadcast
    (hints override the threshold); an unhinted one must shuffle — so the
    LeftSemi join planning as SortMergeJoin/ShuffledHashJoin here proves
    no hint is attached, while the sample-bounded model joins (which ARE
    hinted) keep broadcasting."""
    from sequila_native_spark.plans.explain import formatted_plan

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = formatted_plan(perplexity_filter(corpus, model, 10_000))
        assert "BroadcastHashJoin LeftSemi" not in plan, plan
        assert (
            "SortMergeJoin LeftSemi" in plan
            or "ShuffledHashJoin LeftSemi" in plan
        ), plan
        # the model tables stay broadcast — their hint survives the -1
        assert plan.count("BroadcastHashJoin") >= 2, plan
    finally:
        if old is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_model_table_round_trip_and_tvf(spark, corpus, model):
    """Model-as-data: serialize → persist-shape relation → rehydrate must
    be identity, and the sequila_perplexity TVF scores through the table
    form identically to the in-memory model."""
    from sequila_native_spark.functions import (
        bigram_lm_from_table,
        bigram_lm_to_table,
    )
    from sequila_native_spark.sql import sequila_sql

    tbl = bigram_lm_to_table(spark, model)
    assert bigram_lm_from_table(tbl) == model
    tbl.createOrReplaceTempView("lm_model")
    corpus.limit(50).createOrReplaceTempView("lm_docs")
    got = {
        (r["doc_id"], r["n_transitions"], r["nll_milli_per_token"])
        for r in sequila_sql(
            spark,
            "SELECT * FROM sequila_perplexity('lm_docs', 'lm_model', "
            "'text', 'doc_id')",
        ).collect()
    }
    want = {
        (r["doc_id"], r["n_transitions"], r["nll_milli_per_token"])
        for r in perplexity_score(corpus.limit(50), model).collect()
    }
    assert got == want
    with pytest.raises(ValueError, match="sequila_perplexity takes"):
        sequila_sql(spark, "SELECT * FROM sequila_perplexity('lm_docs')")
    with pytest.raises(ValueError, match="missing columns"):
        bigram_lm_from_table(corpus)


@pytest.fixture(scope="module")
def tri_model(corpus):
    from sequila_native_spark.functions import train_trigram_lm

    return train_trigram_lm(corpus, id_col="doc_id", seed=3)


def test_trigram_python_reference_parity(spark, corpus, tri_model):
    from sequila_native_spark.functions import trigram_perplexity_score
    from sequila_native_spark.functions.lm import trigram_perplexity_score_py

    docs = corpus.select("doc_id", "text").unionByName(
        spark.createDataFrame(
            [(10**9, None), (10**9 + 1, ""), (10**9 + 2, "one two"),
             (10**9 + 3, "zz qq xx totally unseen words here")],
            "doc_id long, text string",
        )
    )
    got = {
        r["doc_id"]: (r["n_transitions"], r["nll_milli_per_token"])
        for r in trigram_perplexity_score(docs, tri_model).collect()
    }
    for doc_id, text in docs.collect():
        assert got[doc_id] == trigram_perplexity_score_py(text, tri_model), doc_id
    finite = [v for _, v in got.values() if v is not None]
    assert finite and all(v > 0 for v in finite)


def test_trigram_training_repartition_stable(corpus):
    from sequila_native_spark.functions import train_trigram_lm

    a = train_trigram_lm(corpus, id_col="doc_id", seed=3)
    b = train_trigram_lm(corpus.repartition(7), id_col="doc_id", seed=3)
    assert a == b


def test_trigram_separates_fluent_from_shuffled_more_than_bigram(
    spark, corpus, model, tri_model
):
    """The extra order must buy discrimination: in-domain text scores
    lower NLL than the same tokens shuffled, and the trigram model's
    relative separation is at least the bigram model's (longer context =
    sharper fluency signal — the reason CCNet uses a 5-gram model)."""
    import random

    from sequila_native_spark.functions import trigram_perplexity_score

    rows = [r["text"] for r in corpus.limit(20).collect() if r["text"]]
    rng = random.Random(5)
    shuffled = []
    for t in rows:
        toks = t.lower().split(" ")
        rng.shuffle(toks)
        shuffled.append(" ".join(toks))
    both = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)]
        + [(1000 + i, t) for i, t in enumerate(shuffled)],
        "doc_id long, text string",
    )

    def sep(scores):
        s = {r["doc_id"]: r["nll_milli_per_token"] for r in scores.collect()}
        orig = sum(s[i] for i in range(len(rows))) / len(rows)
        shuf = sum(s[1000 + i] for i in range(len(rows))) / len(rows)
        return orig, shuf

    t_orig, t_shuf = sep(trigram_perplexity_score(both, tri_model))
    b_orig, b_shuf = sep(perplexity_score(both, model))
    assert t_orig < t_shuf
    assert (t_shuf - t_orig) / t_orig >= (b_shuf - b_orig) / b_orig


def test_trigram_plan_scores_in_scan_no_transition_shuffle(spark, corpus, tri_model):
    """r12 shape: the model rides a broadcast VARIABLE into one Arrow pass
    over the corpus scan (no transition explode, no string-keyed joins);
    the only exchanges are the doc-sized partial aggregation and the
    broadcast of the per-doc stats back onto the base — the corpus is
    still never shuffled against the model, and nothing transition-sized
    ever crosses an exchange."""
    from sequila_native_spark.functions import trigram_perplexity_score
    from sequila_native_spark.plans.explain import formatted_plan

    plan = formatted_plan(trigram_perplexity_score(corpus, tri_model))
    tree = plan[: plan.find("\n\n(")]
    # exactly ONE scoring pass: a filter over the UDF column would make the
    # optimizer duplicate the ArrowEvalPython node (guide §4.4)
    assert tree.count("ArrowEvalPython") == 1, plan
    assert "Generate" not in plan, plan  # no transition explode anywhere
    assert plan.count("HashAggregate") >= 2, plan  # partial + final agg
    # corpus scan feeds the scoring pass directly — no exchange below it
    arrow_seen = False
    for line in tree.splitlines():
        if "ArrowEvalPython" in line:
            arrow_seen = True
        elif arrow_seen and "Scan" in line:
            break
        elif arrow_seen and "Exchange" in line:
            raise AssertionError(f"exchange below the scoring pass:\n{plan}")
    assert arrow_seen, plan


def test_trigram_validation(spark, corpus):
    from sequila_native_spark.functions import train_trigram_lm

    with pytest.raises(ValueError, match="lam2"):
        train_trigram_lm(corpus, lam2=1.0)
    with pytest.raises(ValueError, match="lam1"):
        train_trigram_lm(corpus, lam1=0.0)


def test_trigram_model_table_round_trip(spark, tri_model):
    from sequila_native_spark.functions import (
        trigram_lm_from_table,
        trigram_lm_to_table,
    )

    tbl = trigram_lm_to_table(spark, tri_model)
    assert trigram_lm_from_table(tbl) == tri_model
    with pytest.raises(ValueError, match="missing columns"):
        trigram_lm_from_table(tbl.drop("ctx2"))


def test_trigram_tvf_matches_function(spark, corpus, tri_model):
    """sequila_trigram_perplexity scores through the persisted-model table
    form identically to the in-memory model (and must not be shadowed by
    the shorter sequila_perplexity TVF in the rewriter)."""
    from sequila_native_spark.functions import (
        trigram_lm_to_table,
        trigram_perplexity_score,
    )
    from sequila_native_spark.sql import sequila_sql

    trigram_lm_to_table(spark, tri_model).createOrReplaceTempView("tri_model")
    corpus.limit(50).createOrReplaceTempView("tri_docs")
    got = {
        (r["doc_id"], r["n_transitions"], r["nll_milli_per_token"])
        for r in sequila_sql(
            spark,
            "SELECT * FROM sequila_trigram_perplexity('tri_docs', "
            "'tri_model', 'text', 'doc_id')",
        ).collect()
    }
    want = {
        (r["doc_id"], r["n_transitions"], r["nll_milli_per_token"])
        for r in trigram_perplexity_score(corpus.limit(50), tri_model).collect()
    }
    assert got == want
    with pytest.raises(ValueError, match="sequila_trigram_perplexity takes"):
        sequila_sql(spark, "SELECT * FROM sequila_trigram_perplexity('tri_docs')")


def test_perplexity_buckets_laws(spark, corpus, model):
    """CCNet bucketing laws: buckets partition the scoreable docs; within
    each language every head score ≤ every middle score ≤ every tail score
    (cutoff monotonicity); tertile-ish sizes; unscoreable docs get NULL."""
    from sequila_native_spark.functions import perplexity_buckets

    docs = corpus.select("doc_id", "text", "lang").unionByName(
        spark.createDataFrame([(10**9, None, "en"), (10**9 + 1, "one", "en")],
                              "doc_id long, text string, lang string")
    )
    out = perplexity_buckets(docs, model, lang_col="lang").collect()
    assert len(out) == docs.count()
    by_lang = {}
    for r in out:
        if r["nll_milli_per_token"] is None:
            assert r["bucket"] is None
            continue
        by_lang.setdefault(r["lang"], {}).setdefault(
            r["bucket"], []).append(r["nll_milli_per_token"])
    for lang, bk in by_lang.items():
        assert set(bk) <= {"head", "middle", "tail"}, (lang, set(bk))
        if {"head", "middle"} <= set(bk):
            assert max(bk["head"]) <= min(bk["middle"]), lang
        if {"middle", "tail"} <= set(bk):
            assert max(bk["middle"]) <= min(bk["tail"]), lang
        n = sum(len(v) for v in bk.values())
        # percentile_approx tertiles: head holds roughly a third
        assert len(bk.get("head", [])) >= n // 6, (lang, {k: len(v) for k, v in bk.items()})
    # single-distribution mode (no lang) runs and partitions too
    one = perplexity_buckets(corpus, model).collect()
    assert {r["bucket"] for r in one if r["bucket"]} <= {"head", "middle", "tail"}
    with pytest.raises(ValueError, match="head_pct"):
        perplexity_buckets(corpus, model, head_pct=0.9, middle_pct=0.5)


def test_perplexity_buckets_accepts_trigram_model(spark, corpus, tri_model):
    """Model-type dispatch: a TrigramLM routes through the trigram scorer
    (3-token docs score; 2-token docs are unscoreable under trigrams)."""
    from sequila_native_spark.functions import perplexity_buckets

    docs = spark.createDataFrame(
        [(1, "only two"), (2, "now three tokens here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["bucket"]
           for r in perplexity_buckets(docs, tri_model).collect()}
    assert got[1] is None and got[2] is not None


def test_filter_accepts_precomputed_scores(spark, corpus, model, tri_model):
    """scores= reuse: identical keep set to the self-scoring path, works
    with a trigram scores frame (model=None), and validates the frame."""
    from sequila_native_spark.functions import trigram_perplexity_score

    scores = perplexity_score(corpus, model)
    want = {r["doc_id"] for r in
            perplexity_filter(corpus, model, 3000).select("doc_id").collect()}
    got = {r["doc_id"] for r in perplexity_filter(
        corpus, None, 3000, scores=scores).select("doc_id").collect()}
    assert got == want
    tri = perplexity_filter(
        corpus, None, 3000,
        scores=trigram_perplexity_score(corpus, tri_model),
    )
    assert set(tri.columns) == set(corpus.columns)
    assert 0 < tri.count() <= corpus.count()
    with pytest.raises(ValueError, match="either model or scores"):
        perplexity_filter(corpus, None, 3000)
    with pytest.raises(ValueError, match="missing columns"):
        perplexity_filter(corpus, None, 3000, scores=corpus)


def test_perplexity_buckets_null_lang_not_dropped(spark, corpus, model):
    """NULL-lang docs form their own distribution group and must come
    back out bucketed — a plain equi-join on the lang key silently
    dropped them (found in round-8 self-review)."""
    from sequila_native_spark.functions import perplexity_buckets

    docs = corpus.select("doc_id", "text").withColumn(
        "lang", F.when(F.col("doc_id") % 4 == 0, F.lit(None)).otherwise(
            F.lit("en"))
    )
    out = perplexity_buckets(docs, model, lang_col="lang").collect()
    assert len(out) == docs.count()
    nulls = [r for r in out if r["lang"] is None]
    assert nulls and all(
        r["bucket"] in ("head", "middle", "tail") for r in nulls
        if r["nll_milli_per_token"] is not None)

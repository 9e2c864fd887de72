"""N-gram language-model perplexity scoring — the CCNet-style quality
signal (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", arXiv:1911.00359): score each document by
its per-token negative log-likelihood under a small LM trained on trusted
text, then keep the low-perplexity (fluent) tail. Production pipelines use
a KenLM model; the distributed shape is identical for any table-backed
n-gram model, so this module trains an interpolated bigram LM from a
bounded sample and applies it as a pure-JVM plan.

Design mirrors the house split for learned artifacts (classifier, IVF,
BPE): **the model is data, application is a plan.**

- **Training is a bounded driver-side job** (:func:`train_bigram_lm`):
  unigram/bigram counts over a deterministic hash-order sample
  (``sampling.bounded_sample_pandas``), interpolated with add-one-smoothed
  unigrams — ``p(w|v) = λ·c(vw)/c(v) + (1−λ)·(c(w)+1)/(N+V)``. Log-probs
  are rounded to INTEGER milli-nats at train time, so scoring is
  integer-exact, repartition-stable, and python-parity testable (the only
  ``ln`` lives in training, like DSIR).
- **Scoring is a Catalyst plan** (:func:`perplexity_score`): bigrams via a
  ``zip_with`` over the token array (in-scan, no UDF), one explode, a
  broadcast join against the bigram table with a broadcast unigram-backoff
  join for unseen contexts, then a map-side-combinable ``groupBy(doc)``
  sum. Corpus-cardinality shuffles: the per-doc aggregation of transition
  rows, plus the final join of the aggregated scores back onto the
  ``(id, n_tokens)`` projection (needed to null-pad docs with < 2 tokens
  — two compact columns, but a real second doc-keyed exchange; size plans
  from the plan test in tests/test_lm.py, not from this summary alone).

Scoring convention: transitions only — ``nll_milli_per_token`` is
``−Σ log p(w_i | w_{i−1}) / (n_tokens − 1)`` in milli-nats. Documents with
fewer than 2 tokens have no transitions and score NULL. Out-of-vocabulary
words fall to the smoothed-unigram floor, so every transition has a finite
log-prob (no −inf, unlike an unsmoothed LM).

Reference context: no counterpart in the reference engine; companion
LLM-data-pipeline layer (SURVEY.md §2C).
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sequila_native_spark.functions.text import tokens


@dataclass(frozen=True)
class BigramLM:
    """A trained interpolated bigram LM in integer milli-nats.

    ``bigram``: (prev, word) → log-prob milli; ``backoff``: word →
    interpolated-unigram-only log-prob milli (the unseen-context score);
    ``oov_milli``: the floor for words outside the sample vocabulary.
    """

    bigram: dict[tuple[str, str], int]
    backoff: dict[str, int]
    oov_milli: int
    lam_milli: int
    n_tokens: int
    vocab_size: int


def train_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    *,
    lam: float = 0.7,
    sample_size: int = 16384,
    seed: int = 0,
    id_col: str | None = None,
) -> BigramLM:
    """Train the interpolated bigram LM on a bounded deterministic sample.

    With ``id_col`` the sample is hash-order selected (repartition/
    retry-stable ⇒ the model, and therefore every downstream score, is a
    pure function of the data). Tokenization is the house single-space
    split, matching :func:`text.tokens` exactly.
    """
    from .sampling import bounded_sample_pandas

    if not (0.0 < lam < 1.0):
        raise ValueError(f"lam must be in (0, 1), got {lam}")
    rows = bounded_sample_pandas(
        df, [text_col], sample_size=sample_size, seed=seed, id_col=id_col
    )
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in rows[text_col]:
        if not t:
            continue
        toks = t.lower().split(" ")
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    n = sum(uni.values())
    v = len(uni)
    if n == 0:
        raise ValueError("training sample has no tokens")

    def uni_part(w: str) -> float:
        return (1.0 - lam) * (uni.get(w, 0) + 1) / (n + v)

    bigram = {
        (p, w): round(1000.0 * math.log(lam * c / uni[p] + uni_part(w)))
        for (p, w), c in bi.items()
    }
    backoff = {w: round(1000.0 * math.log(uni_part(w))) for w in uni}
    oov = round(1000.0 * math.log((1.0 - lam) / (n + v)))
    return BigramLM(
        bigram=bigram,
        backoff=backoff,
        oov_milli=oov,
        lam_milli=round(lam * 1000),
        n_tokens=n,
        vocab_size=v,
    )


def _bigram_col(toks: Column) -> Column:
    """``array<struct<prev,word>>`` of consecutive token pairs, in order."""
    rest = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    return F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        rest,
        lambda a, b: F.struct(a.alias("prev"), b.alias("word")),
    )


def perplexity_score(
    docs: DataFrame,
    model: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document LM score: ``(id_col, n_tokens, n_transitions,
    nll_milli_per_token)`` — integer token counts plus the mean negative
    log-likelihood per transition in milli-nats (bigint; lower = more
    fluent under the model). Documents with < 2 tokens (incl. NULL text)
    emit NULL ``nll_milli_per_token`` and 0 transitions.

    Plan: in-scan ``zip_with`` bigram assembly → one explode → broadcast
    bigram-table join, broadcast unigram-backoff join for missed contexts,
    OOV floor for the rest → map-side-combinable ``groupBy(doc)``. Model
    size is sample-bounded (vocab² worst case, Zipf-bounded in practice);
    the corpus is scanned once and shuffled only by the per-doc sum.
    """
    spark = docs.sparkSession
    bi_rows = [(p, w, m) for (p, w), m in model.bigram.items()]
    uni_rows = list(model.backoff.items())
    bi_tbl = F.broadcast(
        spark.createDataFrame(
            bi_rows or [("", "", 0)],
            "prev string, word string, __sq_bi bigint",
        ).where(F.lit(bool(bi_rows)))
    )
    uni_tbl = F.broadcast(
        spark.createDataFrame(
            uni_rows or [("", 0)], "word string, __sq_uni bigint"
        ).where(F.lit(bool(uni_rows)))
    )
    toks = tokens(F.col(text_col))
    exploded = docs.select(
        F.col(id_col), F.explode(_bigram_col(toks)).alias("__sq_bg")
    ).select(
        id_col,
        F.col("__sq_bg.prev").alias("prev"),
        F.col("__sq_bg.word").alias("word"),
    )
    scored = (
        exploded.join(bi_tbl, ["prev", "word"], "left")
        .join(uni_tbl, "word", "left")
        .select(
            id_col,
            F.coalesce(
                "__sq_bi", "__sq_uni", F.lit(int(model.oov_milli))
            ).alias("__sq_lp"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
            F.sum("__sq_lp").cast("bigint").alias("__sq_sum"),
        )
    )
    base = docs.select(
        F.col(id_col),
        F.when(F.col(text_col).isNull(), F.lit(None).cast("bigint"))
        .otherwise(F.size(toks).cast("bigint"))
        .alias("n_tokens"),
    )
    return base.join(scored, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("n_transitions", F.lit(0)).cast("bigint").alias(
            "n_transitions"
        ),
        F.when(
            F.coalesce("n_transitions", F.lit(0)) > 0,
            F.floor(-F.col("__sq_sum") / F.col("n_transitions")).cast("bigint"),
        ).alias("nll_milli_per_token"),
    )


def perplexity_filter(
    docs: DataFrame,
    model: BigramLM | None,
    max_nll_milli: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    scores: DataFrame | None = None,
) -> DataFrame:
    """Keep documents whose mean transition NLL clears the threshold —
    the CCNet 'head/middle' keep rule as one scored semi-join.
    Unscoreable documents (< 2 tokens) are dropped (no evidence of
    fluency).

    ``scores``: pass a precomputed :func:`perplexity_score` (or trigram)
    frame to skip re-scoring — the CCNet pipeline scores once and reuses
    the frame for threshold selection, bucketing, AND this filter; without
    it each consumer re-scans the corpus through the scoring plan.

    Scale note: the keep set is the *majority* of the corpus in the CCNet
    use case (head + middle), so it must NOT be broadcast — a hash
    semi-join on the doc key is the only corpus-safe shape; AQE may still
    downgrade it to broadcast at runtime when the keep side measures
    small. Plan pinned in tests/test_lm.py (keep side never hinted)."""
    if scores is None:
        if model is None:
            raise ValueError("pass either model or scores")
        scores = perplexity_score(docs, model, text_col, id_col)
    else:
        need = {id_col, "nll_milli_per_token"}
        if not need <= set(scores.columns):
            raise ValueError(
                f"scores frame missing columns "
                f"{sorted(need - set(scores.columns))} — build it with "
                f"perplexity_score()/trigram_perplexity_score()"
            )
    keep = scores.where(
        F.col("nll_milli_per_token") <= F.lit(int(max_nll_milli))
    ).select(id_col)
    return docs.join(keep, id_col, "left_semi")


@dataclass(frozen=True)
class TrigramLM:
    """A trained interpolated trigram LM in integer milli-nats (VERDICT r7
    item 7 — one order closer to CCNet's 5-gram KenLM at bounded size).

    Three-level backoff chain, all log-probs precomputed at train time:
    ``trigram``: (u, v, w) → log(λ₂·c(uvw)/c(uv) + (1−λ₂)·inner(v,w));
    ``bigram``: (v, w) → log((1−λ₂)·inner(v,w)) — the unseen-trigram score;
    ``backoff``: w → log((1−λ₂)·(1−λ₁)·uni⁺(w)) — the unseen-bigram score;
    ``oov_milli`` — the out-of-vocabulary floor. ``inner(v,w) =
    λ₁·c(vw)/c(v) + (1−λ₁)·uni⁺(w)`` with add-one-smoothed unigrams, the
    same interpolation the bigram model uses. Model size is bounded by the
    SAMPLE token count (a trigram type needs an occurrence), not vocab³.
    """

    trigram: dict[tuple[str, str, str], int]
    bigram: dict[tuple[str, str], int]
    backoff: dict[str, int]
    oov_milli: int
    lam1_milli: int
    lam2_milli: int
    n_tokens: int
    vocab_size: int


def train_trigram_lm(
    df: DataFrame,
    text_col: str = "text",
    *,
    lam1: float = 0.7,
    lam2: float = 0.6,
    sample_size: int = 16384,
    seed: int = 0,
    id_col: str | None = None,
) -> TrigramLM:
    """Train the interpolated trigram LM on a bounded deterministic sample
    (same sampling, tokenization, and integer milli-nat convention as
    :func:`train_bigram_lm` — ``ln`` lives only here)."""
    from .sampling import bounded_sample_pandas

    for name, lam in (("lam1", lam1), ("lam2", lam2)):
        if not (0.0 < lam < 1.0):
            raise ValueError(f"{name} must be in (0, 1), got {lam}")
    rows = bounded_sample_pandas(
        df, [text_col], sample_size=sample_size, seed=seed, id_col=id_col
    )
    uni: Counter = Counter()
    bi: Counter = Counter()
    tri: Counter = Counter()
    for t in rows[text_col]:
        if not t:
            continue
        toks = t.lower().split(" ")
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
        tri.update(zip(toks, toks[1:], toks[2:]))
    n = sum(uni.values())
    v = len(uni)
    if n == 0:
        raise ValueError("training sample has no tokens")

    def uni_part(w: str) -> float:
        return (1.0 - lam1) * (uni.get(w, 0) + 1) / (n + v)

    def inner(p: str, w: str) -> float:
        c = bi.get((p, w), 0)
        return (lam1 * c / uni[p] if c else 0.0) + uni_part(w)

    trigram = {
        (u, p, w): round(
            1000.0 * math.log(lam2 * c / bi[(u, p)] + (1.0 - lam2) * inner(p, w))
        )
        for (u, p, w), c in tri.items()
    }
    bigram = {
        (p, w): round(1000.0 * math.log((1.0 - lam2) * inner(p, w)))
        for (p, w) in bi
    }
    backoff = {
        w: round(1000.0 * math.log((1.0 - lam2) * uni_part(w))) for w in uni
    }
    oov = round(1000.0 * math.log((1.0 - lam2) * (1.0 - lam1) / (n + v)))
    return TrigramLM(
        trigram=trigram,
        bigram=bigram,
        backoff=backoff,
        oov_milli=oov,
        lam1_milli=round(lam1 * 1000),
        lam2_milli=round(lam2 * 1000),
        n_tokens=n,
        vocab_size=v,
    )


def _trigram_col(toks: Column) -> Column:
    """``array<struct<ctx2,prev,word>>`` of consecutive token triples."""
    m = F.greatest(F.size(toks) - 2, F.lit(0))
    return F.zip_with(
        F.zip_with(
            F.slice(toks, 1, m),
            F.slice(toks, 2, m),
            lambda a, b: F.struct(a.alias("ctx2"), b.alias("prev")),
        ),
        F.slice(toks, 3, m),
        lambda ab, c: F.struct(
            ab["ctx2"].alias("ctx2"), ab["prev"].alias("prev"), c.alias("word")
        ),
    )


def trigram_perplexity_score(
    docs: DataFrame,
    model: TrigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document trigram-LM score — schema and conventions identical to
    :func:`perplexity_score` (``nll_milli_per_token`` = mean NLL per
    transition in milli-nats; a transition here is ``w_i | w_{i−2},
    w_{i−1}``, so docs with < 3 tokens score NULL with 0 transitions).

    Plan (r12, guide §4.2): the model is still broadcast and the corpus
    still never shuffles a transition — but the per-transition work runs
    in ONE Arrow pass against the broadcast model DICTS (exactly the
    pinned reference logic, :func:`trigram_perplexity_score_py`) instead
    of a 3-token struct explode through three string-keyed broadcast
    joins. Only (doc, n_transitions, Σ lp) integer partials leave the
    pass; the ``groupBy(doc)`` then aggregates doc-sized rows, not
    transition-sized ones. Integer sums are order-independent, so every
    output value is identical to the join plan's.
    """
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(
        (model.trigram, model.bigram, model.backoff, int(model.oov_milli))
    )

    @F.pandas_udf("n_transitions bigint, lp_sum bigint")
    def _score(texts: pd.Series) -> pd.DataFrame:
        tri, bi, uni, oov = bc.value
        ns: list[int] = []
        sums: list[int | None] = []
        for t in texts:
            if t is None or (isinstance(t, float) and pd.isna(t)):
                ns.append(0)
                sums.append(None)
                continue
            toks = t.lower().split(" ")
            if len(toks) < 3:
                ns.append(0)
                sums.append(None)
                continue
            total = 0
            for u, p, w in zip(toks, toks[1:], toks[2:]):
                lp = tri.get((u, p, w))
                if lp is None:
                    lp = bi.get((p, w))
                if lp is None:
                    lp = uni.get(w, oov)
                total += lp
            ns.append(len(toks) - 2)
            sums.append(total)
        return pd.DataFrame({"n_transitions": ns, "lp_sum": sums})

    # No filter on the UDF output here: a predicate over a UDF-computed
    # column makes the optimizer DUPLICATE the ArrowEvalPython node (one
    # copy under the pushed filter, one in the projection — guide §4.4),
    # scoring every document twice. Unscoreable docs aggregate to
    # (n_transitions=0, lp_sum=NULL), which the final projection maps to
    # the same NULL row the old filtered plan produced.
    scored = (
        docs.select(F.col(id_col), _score(F.col(text_col)).alias("__sq_sc"))
        .groupBy(id_col)
        .agg(
            F.sum("__sq_sc.n_transitions").cast("bigint").alias("n_transitions"),
            F.sum("__sq_sc.lp_sum").cast("bigint").alias("__sq_sum"),
        )
    )
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        F.when(F.col(text_col).isNull(), F.lit(None).cast("bigint"))
        .otherwise(F.size(toks).cast("bigint"))
        .alias("n_tokens"),
    )
    return base.join(scored, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("n_transitions", F.lit(0)).cast("bigint").alias(
            "n_transitions"
        ),
        F.when(
            F.coalesce("n_transitions", F.lit(0)) > 0,
            F.floor(-F.col("__sq_sum") / F.col("n_transitions")).cast("bigint"),
        ).alias("nll_milli_per_token"),
    )


def trigram_perplexity_score_py(
    text: str | None, model: TrigramLM
) -> tuple[int, int | None]:
    """Independent reference implementation for tests (not a Spark path)."""
    if text is None:
        return 0, None
    toks = text.lower().split(" ")
    if len(toks) < 3:
        return 0, None
    total = 0
    for u, p, w in zip(toks, toks[1:], toks[2:]):
        lp = model.trigram.get((u, p, w))
        if lp is None:
            lp = model.bigram.get((p, w))
        if lp is None:
            lp = model.backoff.get(w, model.oov_milli)
        total += lp
    n_tr = len(toks) - 2
    return n_tr, math.floor(-total / n_tr)


def perplexity_score_py(
    text: str | None, model: BigramLM
) -> tuple[int, int | None]:
    """Independent reference implementation for tests (not a Spark path):
    returns ``(n_transitions, nll_milli_per_token)``."""
    if text is None:
        return 0, None
    toks = text.lower().split(" ")
    if len(toks) < 2:
        return 0, None
    total = 0
    for p, w in zip(toks, toks[1:]):
        lp = model.bigram.get((p, w))
        if lp is None:
            lp = model.backoff.get(w, model.oov_milli)
        total += lp
    n_tr = len(toks) - 1
    return n_tr, math.floor(-total / n_tr)


_LM_SCHEMA = "kind string, prev string, word string, milli bigint"


def bigram_lm_to_table(spark, model: BigramLM) -> DataFrame:
    """Serialize the LM as a relation — the house model-as-data form (cf.
    the classifier's weights table, the BPE merges table): persist it once
    (parquet/table) and score any later corpus without retraining.

    Rows: ``('bigram', prev, word, milli)``, ``('backoff', NULL, word,
    milli)``, and ``('meta', <name>, NULL, value)`` for the scalars."""
    rows = (
        [("bigram", p, w, m) for (p, w), m in model.bigram.items()]
        + [("backoff", None, w, m) for w, m in model.backoff.items()]
        + [
            ("meta", "oov_milli", None, model.oov_milli),
            ("meta", "lam_milli", None, model.lam_milli),
            ("meta", "n_tokens", None, model.n_tokens),
            ("meta", "vocab_size", None, model.vocab_size),
        ]
    )
    return spark.createDataFrame(rows, _LM_SCHEMA)


_TRI_LM_SCHEMA = "kind string, ctx2 string, prev string, word string, milli bigint"


def trigram_lm_to_table(spark, model: TrigramLM) -> DataFrame:
    """Serialize the trigram LM as a relation (the bigram form plus a
    context column): ``('trigram', u, v, w, milli)``, ``('bigram', NULL,
    v, w, milli)``, ``('backoff', NULL, NULL, w, milli)``, and ``('meta',
    NULL, <name>, NULL, value)`` rows."""
    rows = (
        [("trigram", u, p, w, m) for (u, p, w), m in model.trigram.items()]
        + [("bigram", None, p, w, m) for (p, w), m in model.bigram.items()]
        + [("backoff", None, None, w, m) for w, m in model.backoff.items()]
        + [
            ("meta", None, "oov_milli", None, model.oov_milli),
            ("meta", None, "lam1_milli", None, model.lam1_milli),
            ("meta", None, "lam2_milli", None, model.lam2_milli),
            ("meta", None, "n_tokens", None, model.n_tokens),
            ("meta", None, "vocab_size", None, model.vocab_size),
        ]
    )
    return spark.createDataFrame(rows, _TRI_LM_SCHEMA)


def trigram_lm_from_table(df: DataFrame) -> TrigramLM:
    """Rehydrate a :func:`trigram_lm_to_table` relation (bounded collect —
    sample-sized by construction)."""
    need = {"kind", "ctx2", "prev", "word", "milli"}
    if not need <= set(df.columns):
        raise ValueError(
            f"model table missing columns {sorted(need - set(df.columns))}"
            f" — build it with trigram_lm_to_table()"
        )
    rows = df.select("kind", "ctx2", "prev", "word", "milli").collect()
    trigram: dict[tuple[str, str, str], int] = {}
    bigram: dict[tuple[str, str], int] = {}
    backoff: dict[str, int] = {}
    meta: dict[str, int] = {}
    for r in rows:
        if r["kind"] == "trigram":
            trigram[(r["ctx2"], r["prev"], r["word"])] = int(r["milli"])
        elif r["kind"] == "bigram":
            bigram[(r["prev"], r["word"])] = int(r["milli"])
        elif r["kind"] == "backoff":
            backoff[r["word"]] = int(r["milli"])
        elif r["kind"] == "meta":
            meta[r["prev"]] = int(r["milli"])
        else:
            raise ValueError(f"unknown model-row kind {r['kind']!r}")
    missing = {
        "oov_milli", "lam1_milli", "lam2_milli", "n_tokens", "vocab_size"
    } - set(meta)
    if missing:
        raise ValueError(f"model table missing meta rows {sorted(missing)}")
    return TrigramLM(
        trigram=trigram,
        bigram=bigram,
        backoff=backoff,
        oov_milli=meta["oov_milli"],
        lam1_milli=meta["lam1_milli"],
        lam2_milli=meta["lam2_milli"],
        n_tokens=meta["n_tokens"],
        vocab_size=meta["vocab_size"],
    )


def bigram_lm_from_table(df: DataFrame) -> BigramLM:
    """Rehydrate a :func:`bigram_lm_to_table` relation (bounded collect —
    the model is sample-sized by construction, never corpus-sized)."""
    need = {"kind", "prev", "word", "milli"}
    if not need <= set(df.columns):
        raise ValueError(
            f"model table missing columns {sorted(need - set(df.columns))}"
            f" — build it with bigram_lm_to_table()"
        )
    rows = df.select("kind", "prev", "word", "milli").collect()
    bigram: dict[tuple[str, str], int] = {}
    backoff: dict[str, int] = {}
    meta: dict[str, int] = {}
    for r in rows:
        if r["kind"] == "bigram":
            bigram[(r["prev"], r["word"])] = int(r["milli"])
        elif r["kind"] == "backoff":
            backoff[r["word"]] = int(r["milli"])
        elif r["kind"] == "meta":
            meta[r["prev"]] = int(r["milli"])
        else:
            raise ValueError(f"unknown model-row kind {r['kind']!r}")
    missing = {"oov_milli", "lam_milli", "n_tokens", "vocab_size"} - set(meta)
    if missing:
        raise ValueError(f"model table missing meta rows {sorted(missing)}")
    return BigramLM(
        bigram=bigram,
        backoff=backoff,
        oov_milli=meta["oov_milli"],
        lam_milli=meta["lam_milli"],
        n_tokens=meta["n_tokens"],
        vocab_size=meta["vocab_size"],
    )


def perplexity_buckets(
    docs: DataFrame,
    model: "BigramLM | TrigramLM",
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = None,
    *,
    head_pct: float = 1.0 / 3.0,
    middle_pct: float = 2.0 / 3.0,
) -> DataFrame:
    """The CCNet production artifact (Wenzek et al. 2020 §4.4): bucket every
    document ``head`` / ``middle`` / ``tail`` by its LM score's position in
    the PER-LANGUAGE score distribution — cutoffs are language-relative
    because absolute perplexity is not comparable across languages.

    Distributed shape: one scoring pass (:func:`perplexity_score` or the
    trigram scorer, chosen by the model type), a per-language
    ``percentile_approx`` pair (output = 2 numbers × n_languages — a
    broadcast-sized cutoffs relation), then a broadcast join + two
    comparisons. The corpus is scanned once for scoring and once for the
    final projection; no corpus-sized shuffle beyond the scorer's own
    per-doc aggregation. With ``lang_col=None`` the whole corpus is one
    distribution (single-language crawls).

    Output: ``(id_col, [lang], n_tokens, nll_milli_per_token, bucket)``;
    unscoreable docs (< 2/3 tokens) get bucket NULL. Laws pinned in
    tests and the ``ccnet_buckets`` driver row: buckets partition the
    scoreable docs, and every head score ≤ every tail score within a
    language (cutoff monotonicity).
    """
    if not (0.0 < head_pct < middle_pct < 1.0):
        raise ValueError(
            f"need 0 < head_pct < middle_pct < 1, got {head_pct}, {middle_pct}"
        )
    score_fn = (
        trigram_perplexity_score if isinstance(model, TrigramLM)
        else perplexity_score
    )
    scores = score_fn(docs, model, text_col, id_col)
    if lang_col is not None:
        scores = scores.join(docs.select(id_col, lang_col), id_col)
        grp = scores.groupBy(lang_col)
        join_keys = [lang_col]
    else:
        grp = scores.groupBy()
        join_keys = None
    cuts = grp.agg(
        F.expr(
            f"percentile_approx(nll_milli_per_token, {float(head_pct)})"
        ).alias("__sq_cut_head"),
        F.expr(
            f"percentile_approx(nll_milli_per_token, {float(middle_pct)})"
        ).alias("__sq_cut_mid"),
    )
    if join_keys:
        # NULL-safe on the language key: NULL-lang docs form their own
        # distribution group, and a plain equi-join would silently DROP
        # them (NULL never equals NULL) — every doc must come back out
        cuts_r = cuts.withColumnRenamed(lang_col, "__sq_cut_lang")
        joined = scores.join(
            F.broadcast(cuts_r),
            F.col(lang_col).eqNullSafe(F.col("__sq_cut_lang")),
        ).drop("__sq_cut_lang")
    else:
        joined = scores.crossJoin(F.broadcast(cuts))
    bucket = (
        F.when(F.col("nll_milli_per_token").isNull(), F.lit(None))
        .when(F.col("nll_milli_per_token") <= F.col("__sq_cut_head"), "head")
        .when(F.col("nll_milli_per_token") <= F.col("__sq_cut_mid"), "middle")
        .otherwise("tail")
    )
    out_cols = [id_col] + ([lang_col] if lang_col else []) + [
        "n_tokens", "n_transitions", "nll_milli_per_token",
    ]
    return joined.select(*out_cols, bucket.alias("bucket"))

"""Deterministic sampling, splits and mixtures for training-data pipelines.

At 100 TB, ``df.sample()`` is the wrong tool: Spark's sampler draws from a
per-partition RNG stream, so the selected set changes under repartitioning,
task retries, and AQE re-planning — a training/validation split computed
that way is not reproducible, and rows can migrate between splits across
runs. The standard production answer is HASH-based selection: a row's fate
is a pure function of (seed, key), so it is

- reproducible across runs, engines and cluster layouts;
- stable under retries/repartition (no RNG state);
- consistent across tables (sampling ``documents`` and a feature table by
  the same key keeps them joinable);
- exactly mirrorable in SQL for oracle checks.

Everything here is pure Catalyst (one md5 + substring + conv per row,
whole-stage codegen, zero shuffle) with DuckDB twins that produce
bit-identical decisions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Selection space: the first 8 hex digits of md5 as an integer — uniform on
# [0, 2^32). 32 bits keeps the threshold arithmetic exact in every engine.
HASH_SPACE = 1 << 32


def sample_hash(col: Column, seed: int = 0) -> Column:
    """Deterministic uniform value in ``[0, 2**32)`` from ``(seed, value)``:
    ``int(md5(seed ':' value)[:8], 16)``. The DuckDB twin is
    :func:`sample_hash_sql`.

    CROSS-ENGINE GUARANTEE SCOPE: bit-identical Spark/DuckDB selection
    holds for INTEGER and STRING keys, where ``CAST(x AS STRING)`` and
    ``CAST(x AS VARCHAR)`` format identically. Double/decimal/timestamp
    keys can format differently per engine (trailing zeros, exponent form,
    timezone rendering) and would hash differently — normalize such keys to
    a canonical string (or an integer, e.g. epoch micros) BEFORE hashing.
    Within Spark alone, any key type is reproducible."""
    digest = F.md5(F.concat(F.lit(f"{int(seed)}:"), col.cast("string")))
    return F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint")


def sample_hash_sql(expr: str, seed: int = 0) -> str:
    """DuckDB twin of :func:`sample_hash` (bit-identical)."""
    return (
        f"CAST(concat('0x', substr(md5('{int(seed)}:' || "
        f"CAST({expr} AS VARCHAR)), 1, 8)) AS BIGINT)"
    )


def _check_rate(rate: float) -> int:
    if not (0.0 <= float(rate) <= 1.0):
        raise ValueError(f"sampling rate must be in [0, 1], got {rate}")
    return int(float(rate) * HASH_SPACE)


def deterministic_sample(
    df: DataFrame, rate: float, key: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Keep rows whose ``sample_hash(key, seed)`` falls below
    ``rate * 2**32`` — an exact-rate-in-expectation, reproducible sample.

    Nested property: ``deterministic_sample(df, 0.1, ...)`` is a subset of
    ``deterministic_sample(df, 0.2, ...)`` at the same seed — growing a
    sample never discards previously selected rows (useful for scaling
    ablations).
    """
    if key not in df.columns:
        raise ValueError(f"sample key {key!r} not found in {df.columns}")
    return df.where(sample_hash(F.col(key), seed) < F.lit(_check_rate(rate)))


def split_dataset(
    df: DataFrame,
    weights: dict[str, float],
    key: str = "doc_id",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (train/val/test shape) by
    cumulative hash-threshold ranges — a partition of the key space, so the
    splits are disjoint, exhaustive, and stable under everything
    ``deterministic_sample`` is stable under.

    ``weights`` must sum to 1 (±1e-9); thresholds are exact integers, the
    last split absorbs the rounding remainder.
    """
    if key not in df.columns:
        raise ValueError(f"split key {key!r} not found in {df.columns}")
    if split_col in df.columns:
        raise ValueError(f"output column {split_col!r} already exists")
    if not weights:
        raise ValueError("weights must name at least one split")
    bad = {k: v for k, v in weights.items() if not float(v) > 0.0}
    if bad:
        # a negative weight would pass the sum check yet yield an
        # out-of-range threshold with silently empty splits (advisor, r5)
        raise ValueError(f"split weights must be > 0, got {bad}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = sample_hash(F.col(key), seed)
    names = list(weights)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        bound = int(cum * HASH_SPACE)
        cond = h < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """(name, exclusive upper bound) pairs for mirroring
    :func:`split_dataset` in SQL — the same integer arithmetic."""
    out = []
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        out.append((name, int(cum * HASH_SPACE)))
    out.append((names[-1], HASH_SPACE))
    return out


def mix_datasets(
    sources: dict[str, tuple[DataFrame, float]],
    key: str = "doc_id",
    seed: int = 0,
    source_col: str = "source",
    epoch_col: str | None = None,
) -> DataFrame:
    """Weighted mixture: include each source at its weight and union with a
    ``source_col`` tag — the dataset-mixing step of a training pipeline
    (e.g. 100% curated + 30% web crawl + 2.5 epochs of a small high-quality
    set), deterministic end to end.

    Weights ≤ 1 subsample (``deterministic_sample``). Weights > 1
    OVERSAMPLE deterministically: every row repeats ``floor(w)`` times and
    one extra copy is included at rate ``w − floor(w)`` by the same hash
    selection — expectation exactly ``w``, reproducible, no RNG state. The
    repeat is a ``sequence``+``explode`` projection inside the scan tasks —
    no shuffle. Pass ``epoch_col`` to expose the 0-based copy ordinal
    (training loaders commonly shuffle by (epoch, key) downstream).

    Column contract: every source must share the same schema (the usual
    normalized-document shape); mismatches raise immediately rather than
    producing a silently misaligned union. Each source hashes with
    ``seed + its index`` so identical keys in different sources draw
    independently.
    """
    if not sources:
        raise ValueError("sources must name at least one dataset")
    frames = []
    base_cols = None
    for i, (name, (df, weight)) in enumerate(sources.items()):
        if base_cols is None:
            base_cols = list(df.columns)
        elif list(df.columns) != base_cols:
            raise ValueError(
                f"source {name!r} columns {df.columns} != first source's "
                f"{base_cols}; align schemas before mixing"
            )
        w = float(weight)
        if w <= 0:
            raise ValueError(f"source {name!r} weight must be positive, got {weight}")
        if w <= 1.0:
            part = deterministic_sample(df, w, key=key, seed=seed + i)
            part = part.withColumn("__sq_epoch", F.lit(0).cast("int"))
        else:
            if key not in df.columns:
                raise ValueError(f"sample key {key!r} not found in {df.columns}")
            whole = int(w)
            frac = w - whole
            extra = (
                sample_hash(F.col(key), seed + i) < F.lit(_check_rate(frac))
            ).cast("int")
            n_copies = (F.lit(whole) + extra).cast("int")
            # explode must be the top-level expression of the projection
            part = df.withColumn(
                "__sq_epoch",
                F.explode(F.sequence(F.lit(0).cast("int"), n_copies - 1)),
            )
        if epoch_col:
            part = part.withColumnRenamed("__sq_epoch", epoch_col)
        else:
            part = part.drop("__sq_epoch")
        frames.append(part.withColumn(source_col, F.lit(name)))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out


def stratified_sample(
    df: DataFrame,
    rates: dict,
    stratum_col: str,
    key: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling rates (class rebalancing: e.g.
    keep 100% of a rare language, 5% of the dominant one). A row keeps its
    stratum's rate threshold; strata missing from ``rates`` use
    ``default_rate`` (0 = drop). Same hash selection as
    :func:`deterministic_sample`, so all its stability properties hold,
    per stratum — one codegen'd WHERE, zero shuffle.
    """
    if key not in df.columns:
        raise ValueError(f"sample key {key!r} not found in {df.columns}")
    if stratum_col not in df.columns:
        raise ValueError(f"stratum column {stratum_col!r} not found in {df.columns}")
    if not rates:
        raise ValueError("rates must name at least one stratum")
    thr = F.lit(_check_rate(default_rate))
    expr = None
    for value, rate in rates.items():
        cond = F.col(stratum_col) == F.lit(value)
        bound = F.lit(_check_rate(rate))
        expr = F.when(cond, bound) if expr is None else expr.when(cond, bound)
    thr = expr.otherwise(thr)
    return df.where(sample_hash(F.col(key), seed) < thr)


def bounded_sample_pandas(
    df: DataFrame,
    cols: list[str],
    *,
    sample_size: int = 16384,
    seed: int = 0,
    id_col: str | None = None,
):
    """Bounded driver-side sample of ``cols`` as a pandas frame — the one
    recipe every sample-trained artifact shares (k-means quantizers, BPE
    merges): with ``id_col``, the ``sample_size`` smallest
    ``sample_hash(id, seed)`` rows, sorted within the sample so the local
    order is total — deterministic AND repartition/retry-stable, compiled
    to TakeOrderedAndProject; without an id, a seeded ``df.sample`` (NOT
    partitioning-stable — per-partition RNG) with a 1.3x oversample +
    limit.
    """
    if sample_size < 1:
        raise ValueError(f"sample_size must be >= 1, got {sample_size}")
    if id_col is not None:
        if "__sq_h" in df.columns:
            # same guard write_training_shards carries: a pre-existing
            # __sq_h would make the orderBy reference ambiguous (advisor,
            # r6). Only the id_col path creates the helper column — the
            # df.sample path below is unaffected (reviewer, r7).
            raise ValueError(
                "input already has a __sq_h column (reserved helper name); "
                "rename it before sampling"
            )
        h = sample_hash(F.col(id_col), seed)
        sel = list(dict.fromkeys([*cols, id_col]))
        return (
            df.select(*sel, h.alias("__sq_h"))
            .orderBy("__sq_h", id_col)
            .limit(sample_size)
            .toPandas()[cols]
        )
    n = df.count()
    frac = min(1.0, (sample_size * 1.3) / max(n, 1))
    return (
        df.select(*cols)
        .sample(withReplacement=False, fraction=frac, seed=seed)
        .limit(sample_size)
        .toPandas()[cols]
    )


def temperature_weights(
    sizes: dict[str, int | float],
    tau: float = 0.7,
    *,
    total: float | None = None,
) -> dict[str, float]:
    """Temperature-scaled mixture proportions (the multilingual/LLaMA-style
    sampling exponent): source ``i`` is drawn with probability
    ``sizes[i]^tau / Σ_j sizes[j]^tau`` — ``tau=1`` is proportional,
    ``tau→0`` uniform; values in between up-weight small sources.

    Returns per-source EXPECTED ROW COUNT weights for
    :func:`mix_datasets` — i.e. ``p_i · total / sizes[i]`` with ``total``
    defaulting to the input row total (a pure size-preserving reshuffle of
    the mixture). Weights may exceed 1 (small sources oversample; the
    mixer repeats rows deterministically) or fall below 1 (large sources
    subsample). Driver-side arithmetic on a dict of sizes — sizes come
    from cheap ``count()``s or catalog stats, never a data pass here.
    """
    if not sizes:
        raise ValueError("sizes must name at least one source")
    if any(float(v) <= 0 for v in sizes.values()):
        raise ValueError(f"sizes must be positive, got {sizes}")
    if not (0.0 < float(tau) <= 1.0):
        raise ValueError(f"tau must be in (0, 1], got {tau}")
    powed = {k: float(v) ** float(tau) for k, v in sizes.items()}
    z = sum(powed.values())
    n_total = float(total) if total is not None else float(sum(sizes.values()))
    return {
        k: (powed[k] / z) * n_total / float(sizes[k]) for k in sizes
    }

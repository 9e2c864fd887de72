"""PII detection and redaction for training-data pipelines.

Pure Catalyst column expressions (whole-stage codegen, zero Python in the
hot path), each with a direct ANSI-SQL twin so results are
oracle-comparable between Spark and DuckDB.

Pattern dialect: every regex here is written in the common subset of Java
``java.util.regex`` (Spark) and RE2 (DuckDB) — no backreferences, no
lookaround, explicit ``[0-9]`` instead of ``\\d``. Both engines match these
patterns identically (leftmost match, greedy quantifiers over
non-alternating atoms), which the cross-engine unit tests pin.

100 TB design: detection and redaction are single-scan ``regexp_extract_all``
/ ``regexp_replace`` chains — no shuffle, no UDF, trivially partition-
parallel. The pattern set is a plain dict so pipelines can extend it
without touching the scan shape.

Reference context: the reference engine (sequila-native) has no PII
surface; this is part of the companion LLM-data-pipeline layer
(SURVEY.md §6) alongside dedup/quality/sampling.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered dict: redaction applies in this order, so earlier patterns win
# where matches could overlap (an email contains no IP by construction, but
# phone/card digit runs can nest — card before phone keeps 16-digit groups
# whole).
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "credit_card": r"[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}",
    "phone": r"\+[0-9]{1,2}[ -][0-9]{3}[ -][0-9]{3}[ -][0-9]{4}",
}


def pii_count(col: Column, kind: str) -> Column:
    """Number of matches of one PII class in ``col`` (on the ORIGINAL text —
    counts are independent per class, not redaction-order dependent)."""
    pat = PII_PATTERNS[kind]
    return F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))


def pii_counts(col: Column) -> dict[str, Column]:
    """One count column per PII class, e.g. ``{"email": Column, ...}``."""
    return {kind: pii_count(col, kind) for kind in PII_PATTERNS}


def pii_count_sql(expr: str, kind: str) -> str:
    """DuckDB twin of :func:`pii_count` (RE2 engine)."""
    pat = PII_PATTERNS[kind].replace("'", "''")
    return f"len(regexp_extract_all({expr}, '{pat}'))"


def _check_kinds(kinds: list[str] | None) -> list[str]:
    if kinds is None:
        return list(PII_PATTERNS)
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(
            f"unknown PII kind(s) {unknown}; known: {list(PII_PATTERNS)}"
        )
    return list(kinds)


def redact_pii(col: Column, kinds: list[str] | None = None) -> Column:
    """Replace each PII match with ``<KIND>`` (e.g. ``<EMAIL>``), applying
    classes in :data:`PII_PATTERNS` order. A chained ``regexp_replace`` —
    one codegen stage, no UDF."""
    out = col
    for kind in _check_kinds(kinds):
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def redact_pii_sql(expr: str, kinds: list[str] | None = None) -> str:
    """DuckDB twin of :func:`redact_pii`. DuckDB's ``regexp_replace`` only
    replaces the first match unless passed the ``'g'`` flag; Spark's is
    global by default — the twin pins the global behavior."""
    out = expr
    for kind in _check_kinds(kinds):
        pat = PII_PATTERNS[kind].replace("'", "''")
        out = f"regexp_replace({out}, '{pat}', '<{kind.upper()}>', 'g')"
    return out


def pii_stats(col: Column) -> dict[str, Column]:
    """Per-document PII profile: one count per class, the total, and the
    redacted length delta (chars removed by redaction, net of the
    ``<KIND>`` placeholders)."""
    counts = pii_counts(col)
    stats: dict[str, Column] = {f"n_{k}": v for k, v in counts.items()}
    total = None
    for v in counts.values():
        total = v if total is None else total + v
    stats["n_pii"] = total
    stats["redact_delta"] = F.length(col) - F.length(redact_pii(col))
    return stats


def pii_stats_sql(expr: str) -> dict[str, str]:
    """DuckDB twins of :func:`pii_stats`, same key order."""
    stats = {f"n_{k}": pii_count_sql(expr, k) for k in PII_PATTERNS}
    stats["n_pii"] = " + ".join(pii_count_sql(expr, k) for k in PII_PATTERNS)
    stats["redact_delta"] = f"length({expr}) - length({redact_pii_sql(expr)})"
    return stats

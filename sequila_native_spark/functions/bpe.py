"""Byte-pair-encoding tokenization — learned subword units, so token
counts/budgets/packing can use a real tokenizer's arithmetic instead of
whitespace counts.

Design mirrors the house split for learned artifacts (cf. the IVF
quantizer and the quality classifier): **the model is data, application is
a plan.**

- **Training is a bounded driver-side job** (`train_bpe`): classic BPE
  (Sennrich et al. 2016, arXiv:1508.07909) over the word-frequency table
  of a deterministic sample. Production tokenizers are trained on a
  sample, not the corpus — a 100 TB scan would change nothing but the
  cost — and the per-merge loop is inherently sequential, so driving it
  from numpy-speed Python beats a 1000-job Spark loop. The sample is
  hash-order selected when ``id_col`` is given (repartition/retry-stable,
  the ``sampling.sample_hash`` space), else ``df.sample``.
- **Application is an Arrow-batched pandas UDF** (`bpe_tokenize` /
  `bpe_token_count`): the merge table rides into the closure; each batch
  memoizes per unique word, so natural-language Zipf distributions pay
  the merge loop once per TYPE, not per token. Embarrassingly parallel,
  no shuffle, no state.

Determinism: merge selection breaks frequency ties lexicographically, so
the merge list is a pure function of the sample's word-frequency table;
with ``id_col`` the whole train→apply chain is repartition/retry-stable.

Conventions (Sennrich-style): words are whitespace-split and lowercased
(matching :func:`text.tokens`); a word ends with the ``</w>`` sentinel so
end-of-word units are distinct; tokenization of an unseen word falls out
of the same merge procedure (no UNK — every character is a base unit).

Reference context: no counterpart in the reference engine; companion
LLM-data-pipeline layer (SURVEY.md §2C).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 256,
    sample_size: int = 16384,
    seed: int = 0,
    id_col: str | None = None,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from a bounded corpus sample.

    Returns ``[(left, right), ...]`` — applying the merges in order to a
    character-split word reproduces training-time segmentation. Stops
    early when no pair reaches ``min_pair_count`` (merging singletons
    memorizes the sample).
    """
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    from .sampling import bounded_sample_pandas

    rows = bounded_sample_pandas(
        df, [text_col], sample_size=sample_size, seed=seed, id_col=id_col
    )
    word_freq: Counter = Counter()
    for t in rows[text_col]:
        if t:
            word_freq.update(t.lower().split())

    # vocabulary as tuples of current units per word type
    vocab = {w: tuple(w) + (_EOW,) for w in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, units in vocab.items():
            f = word_freq[w]
            for a, b in zip(units, units[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # deterministic argmax: max count, then lexicographic min pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab = {}
        for w, units in vocab.items():
            out = []
            i = 0
            while i < len(units):
                if i + 1 < len(units) and units[i] == a and units[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(units[i])
                    i += 1
            new_vocab[w] = tuple(out)
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply the merge table to one word (lowest-rank pair first — the
    standard BPE application order, equivalent to replaying training)."""
    units = list(word) + [_EOW]
    while len(units) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(units) - 1):
            r = ranks.get((units[i], units[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        units[best_i:best_i + 2] = [units[best_i] + units[best_i + 1]]
    return units


def _bpe_udf(merges: list[tuple[str, str]], count_only: bool):
    from pyspark.sql.types import ArrayType, IntegerType, StringType

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def run(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}
        out = []
        for t in texts:
            # NULL in → NULL out (not 0 / []): keeps n_bpe_tokens on the
            # same null footing as any split()-derived word count, so the
            # tokens >= words invariant can't flip on null docs (advisor, r6)
            if t is None or (isinstance(t, float) and pd.isna(t)):
                out.append(None)
                continue
            toks: list[str] = []
            if t:
                for w in t.lower().split():
                    enc = memo.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        memo[w] = enc
                    toks.extend(enc)
            out.append(len(toks) if count_only else toks)
        if count_only:
            return pd.Series(out, dtype="Int32")
        return pd.Series(out, dtype="object")

    if count_only:
        return F.pandas_udf(IntegerType())(run)
    return F.pandas_udf(ArrayType(StringType()))(run)


def bpe_tokenize(col: Column, merges: list[tuple[str, str]]) -> Column:
    """Subword tokens of a text column under a trained merge table
    (``array<string>``; word-final units carry the ``</w>`` sentinel)."""
    return _bpe_udf(merges, count_only=False)(col)


def bpe_token_count(col: Column, merges: list[tuple[str, str]]) -> Column:
    """Token count under the merge table — the number packing/budget
    arithmetic should use when the training tokenizer is subword."""
    return _bpe_udf(merges, count_only=True)(col)

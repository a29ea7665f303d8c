"""Repetition-based quality signals (the Gopher/MassiveText filters).

Excessive internal repetition is the strongest cheap predictor of
low-quality web text (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", App. A1.1: filters
on duplicate-line fraction and top/duplicate n-gram share). This module
computes the n-gram family of those signals per document:

- ``top_ngram_share``  — fraction of all n-grams taken by the single
  most frequent n-gram (Gopher filters 2-grams at > 0.20 etc.);
- ``dup_ngram_fraction`` — fraction of n-gram OCCURRENCES that are
  repeats of an already-seen n-gram (= 1 − distinct/total);
- ``n_ngrams`` / ``n_distinct_ngrams`` — the raw counters.

Plan shape: tokenize (regexp codegen) → n-gram build (array
``transform`` over an index ``sequence`` — no Python) → one explode +
two-level aggregate keyed on (doc, gram) then (doc). The (doc, gram)
aggregate map-side-combines, so shuffle volume is bounded by DISTINCT
n-grams per document, not token count. One shuffle; scan-speed
otherwise — the same shape as term frequencies (ranking.py), which is
what lets it run next to BM25/dedup in a single pipeline pass at
100 TB.

Reference parity: no quality operators in the reference (bank ETL);
part of the LLM-pipeline extension surface beside functions/text.py's
quality_score (which scores characters/tokens; this scores repetition —
the two compose into the full Gopher-style gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import bpe_ish_tokens


def ngram_array(text_col, n: int = 2):
    """array<string> of space-joined word n-grams of the BPE-ish tokens.

    Pure column expression: sequence(1, len-n+1) index array →
    transform → concat of the token slice. Documents with fewer than
    ``n`` tokens yield an empty array.
    """
    toks = bpe_ish_tokens(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    # sequence(1, x) DESCENDS when x < 1 (it never yields an empty
    # array), so short documents need an explicit empty branch.
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Per-document repetition signals over word ``n``-grams.

    Output: ``id_col``, ``n_ngrams``, ``n_distinct_ngrams``,
    ``top_ngram_share``, ``dup_ngram_fraction`` (shares rounded to 6
    decimals — the repo's cross-engine float-rendering contract).
    Documents with zero n-grams (< n tokens) get counters 0 and shares
    0.0 (kept, not dropped: the LENGTH gate is a different filter's
    job).
    """
    grams = df.select(
        F.col(id_col), F.explode_outer(ngram_array(F.col(text_col), n)).alias("g")
    )
    per_gram = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    out = per_gram.groupBy(id_col).agg(
        F.sum(F.when(F.col("g").isNull(), 0).otherwise(F.col("c"))).alias(
            "n_ngrams"
        ),
        F.sum(
            F.when(F.col("g").isNull(), 0).otherwise(1)
        ).alias("n_distinct_ngrams"),
        F.max(
            F.when(F.col("g").isNull(), 0).otherwise(F.col("c"))
        ).alias("_top"),
    )
    from .normalize import portable_round

    # portable_round, not engine round(): these shares are exactly the
    # small-denominator rationals (1/3, k/n ties) on which Spark's and
    # DuckDB's round() diverge — the contract the docstring claims and
    # F.round did not deliver (r8 review; normalize.portable_round's
    # docstring records the round-4 flake this prevents)
    n_tot = F.col("n_ngrams")
    return out.select(
        id_col,
        "n_ngrams",
        "n_distinct_ngrams",
        portable_round(
            F.when(n_tot > 0, F.col("_top") / n_tot).otherwise(F.lit(0.0)), 6
        ).alias("top_ngram_share"),
        portable_round(
            F.when(
                n_tot > 0, (n_tot - F.col("n_distinct_ngrams")) / n_tot
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_ngram_fraction"),
    )

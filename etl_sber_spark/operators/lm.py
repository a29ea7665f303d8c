"""Bigram language-model surprisal: the CCNet-style quality signal.

Production corpus filters (CCNet, LLaMA's quality stage) score each
document by an n-gram LM's perplexity over it: fluent text scores low,
boilerplate/gibberish scores high, and thresholding on the score is one
of the strongest cheap quality gates known. A full KenLM is a binary
artifact; the relational core of the idea — train count statistics on
the corpus (or a reference corpus), score each document by its mean
per-token surprisal — expresses directly in DataFrame algebra:

- :func:`bigram_counts` — one pass: explode consecutive token pairs,
  two hash-aggregates (bigram counts + unigram context counts). A
  ``min_count`` prune keeps the model table bounded: at 100 TB the raw
  bigram universe is corpus-sized, but Zipf concentrates mass in the
  head, and the tail below ``min_count`` is exactly what smoothing is
  for.
- :func:`surprisal_scores` — per-document mean of
  ``-log2 P(w_i | w_{i-1})`` with add-k smoothing:
  ``P = (c(w1,w2) + k) / (c(w1) + k*V)``. Unseen bigrams/contexts fall
  back to the same formula with zero counts — the score is total, no
  NULLs.

Scoring shape at scale: explode the document's bigrams (linear in
tokens), LEFT join the model tables on the bigram/context key (the
model is head-pruned — broadcast when it fits, shuffle join otherwise;
AQE decides), one aggregate back to documents. Determinism: every
per-bigram contribution is rounded to 9 decimals and summed as
DECIMAL(28,9) — exact, order-independent (the BM25 rule,
operators/ranking.py) — so the same corpus always yields bit-identical
scores and a DuckDB oracle can replay the arithmetic.

Reference parity: no LM surface in the reference (bank ETL, main.py);
extends the text-quality stack (functions/text.quality_score,
functions/repetition.py) with the statistical signal those heuristics
approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import tokens_expr
from ..operators.materialize import pin
from ..operators.spread import spread

DEFAULT_K = 0.1


def _bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) consecutive lowercase whitespace-token pairs."""
    toks = spread(df).select(
        F.col(id_col), tokens_expr(text_col).alias("toks")
    ).filter(F.size("toks") >= 2)
    return toks.select(
        id_col,
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks)-1), i -> "
                "struct(element_at(toks, i) as w1, "
                "element_at(toks, i+1) as w2))"
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))


def bigram_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame, int]:
    """Train the count model: returns ``(bigrams, contexts, vocab_size)``.

    ``bigrams`` = (w1, w2, c); ``contexts`` = (w1, c1) — unigram counts
    in CONTEXT position (all tokens but each document's last), which is
    the correct conditional-probability denominator; ``vocab_size`` =
    distinct tokens (the smoothing V). ``min_count`` prunes rare
    bigrams from the model (contexts are kept unpruned: the denominator
    must stay exact or smoothed probabilities exceed 1).
    """
    bg = pin(_bigrams(df, id_col, text_col))
    bigrams = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
    )
    contexts = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        bg.select(F.col("w1").alias("w"))
        .union(bg.select(F.col("w2").alias("w")))
        .distinct()
        .count()
    )
    return bigrams, contexts, int(vocab)


def surprisal_scores(
    df: DataFrame,
    bigrams: DataFrame,
    contexts: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = DEFAULT_K,
) -> DataFrame:
    """Per-document mean bigram surprisal in bits.

    Output: (``id_col``, ``n_bigrams``, ``surprisal``) — documents with
    fewer than 2 tokens are omitted (no bigram to score; a corpus gate
    treats them via the length filter, not the LM). Lower = more like
    the training corpus. ``surprisal`` is rounded to 4 decimals; the
    per-bigram terms accumulate exactly in DECIMAL (order-independent,
    engine-portable).
    """
    if vocab_size <= 0:
        raise ValueError("vocab_size must be positive")
    if k <= 0:
        # k=0 (plain ML) makes P zero for unseen bigrams: log2(0) is a
        # DIVIDE_BY_ZERO/NULL mid-job and NULL bits silently fall out of
        # the sum while the count keeps the bigram — a corrupted mean.
        # Smoothing is load-bearing here, so reject up front.
        raise ValueError("k must be > 0 (unsmoothed surprisal is undefined on unseen bigrams)")
    doc_bg = _bigrams(df, id_col, text_col)
    joined = (
        doc_bg.join(bigrams, ["w1", "w2"], "left")
        .join(contexts, "w1", "left")
        .select(
            id_col,
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
            F.coalesce(F.col("c1"), F.lit(0)).alias("c1"),
        )
    )
    p = (F.col("c").cast("double") + F.lit(k)) / (
        F.col("c1").cast("double") + F.lit(k * vocab_size)
    )
    bits = F.round(-F.log2(p), 9).cast(T.DecimalType(28, 9))
    # mean = exact decimal sum -> double, / count as DOUBLE division:
    # both engines divide the identical IEEE operands, so the quotient
    # is bit-identical (decimal division would hit engine-specific
    # precision/scale rules instead)
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.sum(bits).cast("double") / F.count(F.lit(1)).cast("double"), 4
        ).alias("surprisal"),
    )

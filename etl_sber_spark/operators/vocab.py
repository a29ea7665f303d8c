"""Vocabulary building and out-of-vocabulary statistics.

The precursor step of tokenizer training and the coverage check every
corpus handoff runs: pick the top-``max_size`` tokens by corpus
frequency, then measure what fraction of each document (and of the
corpus) falls outside that vocabulary. High OOV rate on a new increment
is the canonical drift alarm — it fires when a crawl shifts language,
domain, or encoding before any model ever trains on it.

Shapes (the 100 TB discipline):

- :func:`build_vocab` — one explode + hash-aggregate over the corpus,
  then a TOTAL-ORDER top-K. K (vocab sizes: 10⁴-10⁶) is far too big
  for a driver-side collect to matter but far too small for a full
  sort to be acceptable — so the top-K is a window ``row_number`` over
  a single ordering, which Spark 4 plans as WindowGroupLimit (partial
  per-partition top-K before the final ranking — the same two-phase
  shape q_topk pins in tests/test_plans.py). Deterministic tie-break:
  (count DESC, token ASC).
- :func:`oov_stats` — per-document OOV fraction: explode tokens, LEFT
  join the vocab (broadcast when it fits — it is top-K by
  construction), one aggregate back to documents. Corpus-level rate =
  one further aggregate (:func:`oov_summary`).

Reference parity: no vocabulary surface in the reference (bank ETL,
main.py); extends the text/tokenizer stack (functions/text.py,
operators/lm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens_expr
from .spread import spread


def token_frequencies(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(token, n) corpus frequencies — one explode + one aggregate."""
    return (
        spread(df)
        .select(F.explode(tokens_expr(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def build_vocab(
    df: DataFrame,
    max_size: int,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Top-``max_size`` tokens by (count DESC, token ASC).

    Output: (token, n, rank) with rank 1..max_size — rank is the
    conventional id-assignment order (most frequent = smallest id).
    ``min_count`` drops the long tail before ranking (cheap pre-filter;
    does not change the selected set unless it cuts into the top-K,
    in which case the vocab is legitimately smaller).
    """
    if max_size <= 0:
        raise ValueError(f"max_size must be positive, got {max_size}")
    freq = token_frequencies(df, text_col).filter(F.col("n") >= min_count)
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return (
        freq.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= max_size)
    )


def oov_stats(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document OOV: (``id_col``, n_tokens, n_oov, oov_rate).

    Documents with zero tokens are omitted (no rate to define — the
    length gate owns them). The vocab side joins on the token; Spark
    broadcasts it when it fits (top-K by construction).
    """
    toks = spread(df).select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("token")
    ).filter(F.col("token") != "")
    joined = toks.join(
        vocab.select("token").withColumn("_in", F.lit(True)), "token", "left"
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("oov_rate"),
    )


def oov_summary(per_doc: DataFrame) -> DataFrame:
    """Corpus-level rollup of :func:`oov_stats`: one row with
    (n_docs, n_tokens, n_oov, oov_rate)."""
    return per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_oov").alias("n_oov"),
        F.round(
            F.sum("n_oov") / F.sum("n_tokens").cast("double"), 6
        ).alias("oov_rate"),
    )

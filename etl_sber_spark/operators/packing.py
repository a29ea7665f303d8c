"""Sequence chunking and token-budget packing for LLM training pipelines.

Two preprocessing primitives every large-scale pretraining data pipeline
needs between "curated documents" and "training batches":

- :func:`chunk_tokens` — split each document into fixed-size token
  windows with overlap (context-window chunking for training/embedding).
- :func:`pack_documents` — assign documents to fixed token-budget bins
  ("sequence packing"): concatenate-and-split packing, the standard
  at-scale strategy (GPT-3/T5 style), where a document may straddle a
  bin boundary rather than leaving tail padding.

Both are pure Catalyst column algebra (sequence/explode/window) — no
Python UDFs — and both are differentially tested against DuckDB SQL
(plans/llm_queries.py q_seq_packing).

100 TB design
-------------
A *global* greedy first-fit pack is inherently sequential (each bin
decision depends on every prior document), so it cannot distribute.
Instead :func:`pack_documents` hash-partitions documents into
``n_buckets`` independent streams (portable md5 hash64 of the id, no
RNG) and packs each bucket with a running token sum — one shuffle, one
window per bucket partition, fully parallel. Packing quality is
unaffected at scale: with concat-and-split semantics every bin except
the last of each bucket is filled to exactly ``budget`` tokens, so the
padding waste is ≤ ``n_buckets``·``budget`` tokens over the whole
corpus — noise at 100 TB. (A greedy no-split packer would instead need
per-bin headroom and a documented overflow bound; concat-and-split is
both simpler and tighter, which is why the big pretraining pipelines
use it.)

Reference parity: the reference has no packing operator (its domain is
bank ETL, main.py) — this extends the engine for the LLM-pipeline
surface required alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64
from ..functions.text import bpe_ish_token_count, bpe_ish_tokens


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split each document into token windows of ``chunk_size`` tokens,
    consecutive windows overlapping by ``overlap`` tokens.

    Output: one row per (document, chunk): ``id_col``, ``chunk_idx``
    (0-based), ``start`` (0-based token offset), ``n_chunk_tokens``
    (== chunk_size except possibly the last), ``chunk_text`` (the
    space-joined token slice). Empty documents yield no rows.

    Plan shape: tokenize (regexp, codegen) → ``sequence`` of window
    starts → ``posexplode`` → ``slice`` + ``array_join``. One narrow
    stage, no shuffle, no Python — scan-speed over 100 TB.
    """
    if not (0 <= overlap < chunk_size):
        raise ValueError("need 0 <= overlap < chunk_size")
    step = chunk_size - overlap
    toks = bpe_ish_tokens(F.col(text_col))
    # Window starts: 0, step, 2*step, … while start < n (so the final
    # short window is kept; a document shorter than chunk_size yields
    # exactly one chunk).
    n = F.col("_n")
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.ceil((n - F.lit(chunk_size)) / F.lit(step)).cast("int"), F.lit(0)
        )
        * F.lit(step),
        F.lit(step),
    )
    e = (
        df.select(F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n"))
        .filter(F.col("_n") > 0)
        .select(
            id_col,
            "_toks",
            "_n",
            F.posexplode(starts).alias("chunk_idx", "start"),
        )
    )
    return e.select(
        id_col,
        "chunk_idx",
        "start",
        F.least(F.lit(chunk_size), F.col("_n") - F.col("start")).alias(
            "n_chunk_tokens"
        ),
        F.array_join(
            F.slice(F.col("_toks"), F.col("start") + 1, F.lit(chunk_size)), " "
        ).alias("chunk_text"),
    )


def pack_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    n_buckets: int = 64,
    tokens_col: Column | None = None,
) -> DataFrame:
    """Assign each document a (bucket, bin, offset) under concat-and-split
    packing: within a bucket, documents are laid end-to-end in
    deterministic id order and cut into ``budget``-token bins.

    Output: ``id_col``, ``n_tokens``, ``bucket``, ``bin_id`` (bin of the
    document's FIRST token, globally unique = bucket * 2^32 + local bin),
    ``bin_offset`` (token offset of the document within that bin),
    ``spans_bins`` (true iff the document straddles a bin boundary and
    will be split across sequences at materialization time).

    ``tokens_col`` overrides the token counter (default: BPE-ish regex
    token count of ``text_col``).

    One shuffle (the per-bucket window sort on the id); everything else
    is codegen. Buckets pack independently — see module docstring for
    why this is the scalable shape.
    """
    n_toks = (
        tokens_col
        if tokens_col is not None
        else bpe_ish_token_count(F.col(text_col))
    )
    base = df.select(
        F.col(id_col),
        n_toks.cast("long").alias("n_tokens"),
        F.pmod(hash64(F.col(id_col)), F.lit(n_buckets)).cast("int").alias("bucket"),
    )
    return _assign_bins(base, id_col, budget)


def _assign_bins(base: DataFrame, id_col: str, budget: int) -> DataFrame:
    """The single implementation of the concat-and-split assignment
    algebra, shared by :func:`pack_documents` and
    :func:`materialize_bins` (so the two can never drift): ``base``
    must carry ``id_col``, ``n_tokens``, ``bucket``; every other
    column rides along (materialize_bins passes the token arrays
    through the window shuffle instead of paying a join later)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        *base.columns,
        (
            F.col("bucket").cast("long") * F.lit(2**32)
            + F.floor(cum_before / F.lit(budget))
        ).alias("bin_id"),
        F.pmod(cum_before, F.lit(budget)).alias("bin_offset"),
        (
            # n_tokens > 0 guard: a zero-token document occupies nothing
            # and spans nothing, but floor((cum_before - 1)/budget) on a
            # bin boundary (including cum_before = 0) drops to the
            # PREVIOUS bin and would flag it as spanning
            (F.col("n_tokens") > 0)
            & (
                F.floor(cum_before / F.lit(budget))
                != F.floor(
                    (cum_before + F.col("n_tokens") - 1) / F.lit(budget)
                )
            )
        ).alias("spans_bins"),
    )


def materialize_bins(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    n_buckets: int = 64,
) -> DataFrame:
    """Emit the actual packed training sequences: one row per bin with
    the concatenated token array and the document-boundary metadata a
    trainer needs for attention masking / loss boundaries.

    Output: ``bin_id``, ``tokens`` (array<string>, exactly ``budget``
    long for every bin except the last of each bucket), ``docs``
    (array<struct<doc_id, start, n>> — where each document's fragment
    sits inside the bin, in order).

    Mechanics: tokenize ONCE and run the shared assignment algebra
    (:func:`_assign_bins` — the same window :func:`pack_documents`
    uses, so the two cannot drift) with the token arrays riding
    through the window shuffle; then explode each document into its
    bin FRAGMENTS — a doc starting at ``bin_offset`` o with T tokens
    occupies ceil((o+T)/budget) consecutive bins of its bucket, each
    fragment a ``slice`` of the token array — and reassemble per bin
    with one groupBy (sort by offset, flatten). Exactly TWO shuffles
    (plan-pinned in test_packing.py): the pack window and the bin
    groupBy — carrying tokens through the window is strictly cheaper
    than the earlier assignment⋈tokens join, which cost two extra
    corpus-sized exchanges. Fragments are ``sequence``/``transform``
    — no Python, no driver data.

    Zero-token documents occupy no bin and are absent from the output
    (consistent with ``pack_documents``'s n_tokens > 0 span guard).
    """
    base = df.select(
        F.col(id_col),
        bpe_ish_tokens(F.col(text_col)).alias("_toks"),
    ).select(
        F.col(id_col),
        F.col("_toks"),
        F.size("_toks").cast("long").alias("n_tokens"),
        F.pmod(hash64(F.col(id_col)), F.lit(n_buckets)).cast("int").alias("bucket"),
    )
    j = _assign_bins(base, id_col, budget).filter(F.col("n_tokens") > 0)
    b = F.lit(budget)
    # fragment i of a doc: tokens [s_i, e_i) land in bin_id + i at
    # in-bin offset (bin_offset if i == 0 else 0)
    frags = j.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.floor(
                        (F.col("bin_offset") + F.col("n_tokens") - 1) / b
                    ).cast("int"),
                ),
                lambda i: F.struct(
                    (F.col("bin_id") + i).alias("bin_id"),
                    F.when(i == 0, F.col("bin_offset"))
                    .otherwise(F.lit(0))
                    .alias("at"),
                    # token slice bounds within the doc (0-based)
                    F.when(i == 0, F.lit(0))
                    .otherwise(b * i - F.col("bin_offset"))
                    .alias("s"),
                    F.least(
                        F.col("n_tokens"), b * (i + 1) - F.col("bin_offset")
                    ).alias("e"),
                ),
            )
        ).alias("_i", "f"),
        "_toks",
    ).select(
        F.col("f.bin_id").alias("bin_id"),
        F.col("f.at").alias("at"),
        F.col(id_col),
        F.slice(
            "_toks", F.col("f.s").cast("int") + 1, (F.col("f.e") - F.col("f.s")).cast("int")
        ).alias("frag"),
    )
    return (
        frags.groupBy("bin_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("at"), F.col(id_col), F.col("frag"))
                )
            ).alias("_frags")
        )
        .select(
            "bin_id",
            F.flatten(F.col("_frags").getField("frag")).alias("tokens"),
            F.transform(
                F.col("_frags"),
                lambda s: F.struct(
                    s[id_col].alias("doc_id"),
                    s["at"].cast("int").alias("start"),
                    F.size(s["frag"]).alias("n"),
                ),
            ).alias("docs"),
        )
    )

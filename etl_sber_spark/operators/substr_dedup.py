"""Exact-substring deduplication: remove repeated token spans corpus-wide.

Document-level dedup (exact_duplicates, LSH near-dup, SemDeDup) leaves
the *sub-document* repeats that training-data audits flag hardest:
boilerplate headers, license blocks, quoted passages pasted into
thousands of otherwise-distinct pages. Lee et al., "Deduplicating
Training Data Makes Language Models Better" (2021, arXiv:2107.06499)
remove every substring ≥ 50 tokens that occurs more than once in the
corpus, keeping one occurrence; this operator is that policy as
DataFrame algebra:

1. every length-``window`` token span hashes to a 60-bit content hash
   (the portable md5-based hash64 — the same function DuckDB oracles
   replicate), one row per position;
2. one hash-aggregate finds each span's FIRST occurrence — the
   lexicographic minimum (doc_id, pos) — and its occurrence count;
3. positions of spans seen ≥ 2 times, except the first occurrence,
   become removal intervals [pos, pos+window); per doc the sorted
   interval starts fold-merge into disjoint intervals (pure array
   aggregate, no Python), and covered tokens drop;
4. surviving tokens re-join with single spaces.

Differences from the paper, stated:

- The paper's suffix array finds *maximal* repeats of any length ≥ L;
  fixed-length windows approximate that: a repeat of length ≥ window
  is always detected (it contains a repeated window), and the removed
  region snaps to window granularity (trailing w−1 tokens of a repeat
  stay, bounded by one window). ``window`` IS the paper's L knob.
- 60-bit content hashes stand in for exact suffix comparison: a false
  merge needs an md5-60 collision (~n²/2⁶¹ over distinct spans).
- Removal can join previously-distant tokens, so new windows can
  appear across cut seams (the paper has the same property and trains
  on the result regardless).

Scale: tokenize+hash are projections over the scan (spread() guards
few-split inputs); the span table is corpus-token-sized but carries
only (hash, doc, pos) — ONE shuffle to aggregate first-occurrences,
one join back keyed on the hash, one per-doc aggregate to build
intervals. Duplicate-span volume, not corpus volume, drives everything
after the first aggregate. No driver-side data, no UDFs, no windows
over the corpus.

Reference parity: the reference engine has no sub-document operators;
this is part of the LLM-pipeline extension surface (SURVEY.md §7.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64
from .dedup import tokens_expr
from .materialize import pin
from .spread import spread

#: Default minimum duplicated-span length in tokens (the paper uses 50;
#: the synthetic test corpus is short-doc, so tests pass smaller).
SPAN_WINDOW = 20


def span_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = SPAN_WINDOW,
) -> DataFrame:
    """(id, pos, span_hash): hash64 of every length-``window`` token
    span, pos 1-based. Documents shorter than ``window`` emit nothing
    (they cannot contain a removable span)."""
    toks = (
        spread(df)
        .select(F.col(id_col), tokens_expr(text_col).alias("toks"))
        .filter(F.size("toks") >= window)
    )
    spans = toks.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (window - 1)),
                lambda i: hash64(
                    F.array_join(F.slice("toks", i, window), " ")
                ),
            )
        ).alias("pos0", "span_hash"),
    )
    return spans.select(
        id_col, (F.col("pos0") + 1).alias("pos"), "span_hash"
    )


def duplicate_span_starts(
    spans: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, pos) of every span occurrence that is NOT its hash's first
    (lexicographic min (id, pos)) occurrence — the removal set."""
    firsts = spans.groupBy("span_hash").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    return (
        spans.join(firsts.filter(F.col("n_occ") >= 2), "span_hash")
        .filter(
            F.struct(F.col(id_col), F.col("pos")) != F.col("first")
        )
        .select(id_col, "pos")
    )


def _merged_intervals(starts_col, window: int):
    """Fold sorted interval starts into disjoint [s, e) intervals:
    array<struct<s,e>> built by one F.aggregate pass."""
    empty = F.expr("CAST(array() AS array<struct<s: int, e: int>>)")
    w = F.lit(window)

    def step(acc, p):
        last = F.element_at(acc, -1)
        grown = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(
                F.struct(
                    last["s"].alias("s"),
                    F.greatest(last["e"], p + w).alias("e"),
                )
            ),
        )
        fresh = F.concat(
            acc, F.array(F.struct(p.alias("s"), (p + w).alias("e")))
        )
        return F.when(
            (F.size(acc) > 0) & (p <= last["e"]), grown
        ).otherwise(fresh)

    return F.aggregate(starts_col, empty, step)


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = SPAN_WINDOW,
) -> DataFrame:
    """``df`` with two added columns: ``<text_col>_dedup`` (the text
    with every non-first duplicated span removed, tokens re-joined with
    single spaces — whitespace normalizes as everywhere in the text
    pipeline) and ``n_tokens_removed``. Rows with no duplicated span
    pass through with the normalized text and 0 removed.

    Spans MATCH case-insensitively (span_hashes hashes the lowercased
    tokens — case variants of boilerplate collapse, as in
    :func:`remove_duplicate_lines`), but the rebuilt text keeps each
    surviving token's ORIGINAL case (review finding: reconstructing
    from the match-side tokens silently case-folded the whole corpus,
    including documents with no duplicated span at all)."""
    spans = pin(span_hashes(df, id_col, text_col, window))
    dup = duplicate_span_starts(spans, id_col)
    per_doc = dup.groupBy(id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("starts")
    )
    out = df.join(per_doc, id_col, "left").withColumn(
        "_iv",
        F.when(
            F.col("starts").isNotNull(),
            _merged_intervals(F.col("starts"), window),
        ),
    )
    # case-PRESERVING tokens for reconstruction: same split on the same
    # trimmed text as tokens_expr (identical length/positions — lower()
    # never changes whitespace), minus the lower() the hash side needs.
    # The coverage scan runs over INT INDICES, not (token, idx) structs
    # (r5: the struct zip_with allocated an InternalRow per token and
    # re-evaluated a coalesce(cast(array()…)) per element inside the
    # interpreted HOF — measured 31 → 2.7 s on the 50k-doc dup-heavy
    # smoke corpus), and clean documents (NULL _iv — the common case on
    # a real corpus) skip the scan entirely.
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    staged = out.select(*df.columns, toks.alias("_toks"), "_iv")
    kept_idx = F.filter(
        F.sequence(F.lit(1), F.size("_toks")),
        lambda j: ~F.exists(
            F.col("_iv"), lambda iv: (iv["s"] <= j) & (j < iv["e"])
        ),
    )
    # Staged projections ON PURPOSE: `_ki` feeds both output columns,
    # and CollapseProject declines to inline a non-trivial expression
    # referenced twice — so the scan evaluates once per row.
    staged2 = staged.select(
        *df.columns,
        "_toks",
        "_iv",
        F.when(F.col("_iv").isNotNull(), kept_idx).alias("_ki"),
    )
    return staged2.select(
        *df.columns,
        F.when(F.col("_iv").isNull(), F.array_join("_toks", " "))
        .otherwise(
            F.array_join(
                F.transform(
                    F.col("_ki"), lambda j: F.element_at(F.col("_toks"), j)
                ),
                " ",
            )
        )
        .alias(f"{text_col}_dedup"),
        F.when(F.col("_iv").isNull(), F.lit(0))
        .otherwise(F.size("_toks") - F.size("_ki"))
        .alias("n_tokens_removed"),
    )


def line_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_chars: int = 1,
) -> DataFrame:
    """(id, pos, line_hash) for every line (newline-split) of at least
    ``min_line_chars`` after trimming — the paragraph-level analog of
    :func:`span_hashes` (CCNet, Wenzek et al. 2020, dedups crawls at
    the paragraph level before any document-level stage). Hashes are
    over the lowercased trimmed line, so indentation/case variants of
    boilerplate collapse; reconstruction keeps the original line."""
    # trim() strips SPACES only: CRLF corpora leave '\r' on every line
    # and tab indentation survives, so 'footer\r' and 'footer' would
    # hash apart — normalize with the full-whitespace regexp
    norm = F.lower(
        F.regexp_replace(F.col("line"), r"^\s+|\s+$", "")
    )
    lines = spread(df).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos0", "line"),
    )
    return lines.select(
        F.col(id_col),
        (F.col("pos0") + 1).alias("pos"),
        norm.alias("_norm"),
    ).filter(F.length("_norm") >= min_line_chars).select(
        id_col, "pos", hash64(F.col("_norm")).alias("span_hash")
    )


def remove_duplicate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_chars: int = 1,
) -> DataFrame:
    """``df`` + ``<text_col>_dedup`` (every line whose normalized form
    already appeared earlier in the corpus — lexicographically first
    (doc, pos) occurrence — is removed) + ``n_lines_removed``. The
    CCNet boilerplate remedy: navigation bars, cookie banners and
    footers repeat verbatim across a domain's pages and survive
    document-level dedup because the surrounding text differs; at the
    line level they are exact duplicates.

    Same shuffle shape as :func:`remove_duplicate_spans` (one
    first-occurrence aggregate, join back, duplicate-sized rebuild);
    no interval merge — lines are removed independently. Lines shorter
    than ``min_line_chars`` (after trim) are never candidates (blank
    lines and stray characters are structure, not boilerplate).
    """
    spans = pin(line_hashes(df, id_col, text_col, min_line_chars))
    dup = duplicate_span_starts(spans, id_col)
    per_doc = dup.groupBy(id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("_rm")
    )
    out = df.join(per_doc, id_col, "left")
    # kept line indices = array_except over ints (order-preserving),
    # no (line, idx) struct zip (same r5 interpreted-HOF finding as
    # remove_duplicate_spans); clean docs (NULL _rm) pass through
    lines = F.split(F.col(text_col), "\n")
    staged = out.select(*df.columns, lines.alias("_lines"), "_rm")
    kept_idx = F.array_except(
        F.sequence(F.lit(1), F.size("_lines")), F.col("_rm")
    )
    staged2 = staged.select(
        *df.columns,
        "_lines",
        "_rm",
        F.when(F.col("_rm").isNotNull(), kept_idx).alias("_ki"),
    )
    return staged2.select(
        *df.columns,
        F.when(F.col("_rm").isNull(), F.col(text_col))
        .otherwise(
            F.array_join(
                F.transform(
                    F.col("_ki"), lambda j: F.element_at(F.col("_lines"), j)
                ),
                "\n",
            )
        )
        .alias(f"{text_col}_dedup"),
        F.when(F.col("_rm").isNull(), F.lit(0))
        .otherwise(F.size("_lines") - F.size("_ki"))
        .alias("n_lines_removed"),
    )

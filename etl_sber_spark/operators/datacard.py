"""Corpus datacard: one JSON "datasheet" describing a document corpus.

Datasheets-for-datasets (Gebru et al., 2021) made a machine-readable
summary of composition part of shipping a training set; every corpus
this engine exports should carry one next to the shard manifest. The
card reports totals, language and source composition, token-length
percentiles, and mean quality — the numbers a consumer checks before
training, and the numbers a drift monitor diffs between crawls.

Spark-first mechanics: the document-level signals (token count,
quality, language) are one annotation projection over the scan, and
ALL composition rows — the global totals, the per-language slices, and
the per-source slices — come from a single ``GROUPING SETS`` aggregate:
one shuffle for the whole card (Catalyst's Expand feeds three grouping
layouts through one exchange), not one job per breakdown. Percentiles
use ``percentile_approx`` (the t-digest-style mergeable sketch), so the
aggregate stays a streaming combine at any scale.

The returned dict is JSON-serializable; pass ``path`` to write
``datacard.json`` (e.g. next to a sinks/export.py shard manifest).

Reference parity: reporting surface of the LLM-pipeline extension, no
reference counterpart (the bank ETL reports via its mart tables).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import lang_id, quality_score, token_count
from .spread import spread

#: Token-length percentiles reported per slice.
PCTS = (0.5, 0.9, 0.99)

#: percentile_approx accuracy (1/eps); 10_000 keeps the sketch tiny
#: while bounding rank error to ~0.01%.
PCT_ACCURACY = 10_000


def corpus_datacard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = None,
    source_col: str | None = None,
    path: str | None = None,
) -> dict:
    """Build the datacard dict (and optionally write ``datacard.json``).

    ``lang_col``/``source_col``: use an existing metadata column, or
    None to derive language via :func:`functions.text.lang_id` (source
    breakdown is skipped when ``source_col`` is None).

    Card schema::

        {"n_docs": N, "n_tokens": T, "n_chars": C,
         "mean_quality": q, "token_p50": …, "token_p90": …,
         "token_p99": …,
         "by_lang":   {lang:   {same per-slice fields}, …},
         "by_source": {source: {…}} | None}
    """
    annotated = spread(df).select(
        F.col(id_col),
        # coalesce: a NULL-text doc has 0 tokens/chars — an all-NULL
        # slice would otherwise sum to NULL and crash the card build
        F.coalesce(token_count(text_col), F.lit(0)).alias("_n_tokens"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("_n_chars"),
        quality_score(text_col).alias("_quality"),
        (
            F.col(lang_col) if lang_col else lang_id(text_col)
        ).alias("_lang"),
        (
            F.col(source_col) if source_col else F.lit(None).cast("string")
        ).alias("_source"),
    )
    grouped = annotated.groupingSets(
        [[], [F.col("_lang")]]
        + ([[F.col("_source")]] if source_col else []),
        "_lang",
        "_source",
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_n_tokens").alias("n_tokens"),
        F.sum("_n_chars").alias("n_chars"),
        F.round(F.avg("_quality"), 4).alias("mean_quality"),
        F.percentile_approx(
            "_n_tokens", list(PCTS), PCT_ACCURACY
        ).alias("pcts"),
        # grouping() distinguishes "slice where the key is NULL" from
        # "row not grouped by that key at all"
        F.grouping("_lang").alias("g_lang"),
        F.grouping("_source").alias("g_source"),
    )

    def slice_dict(r) -> dict:
        # quality may be all-NULL in a slice (NULL-text docs): the mean
        # and sketch come back NULL — report null, don't crash
        d = {
            "n_docs": int(r["n_docs"]),
            "n_tokens": int(r["n_tokens"]),
            "n_chars": int(r["n_chars"]),
            "mean_quality": (
                float(r["mean_quality"])
                if r["mean_quality"] is not None
                else None
            ),
        }
        pcts = r["pcts"] or []
        for i, p in enumerate(PCTS):
            v = pcts[i] if i < len(pcts) else None
            d[f"token_p{int(p * 100)}"] = int(v) if v is not None else None
        return d

    card: dict = {"by_lang": {}, "by_source": {} if source_col else None}
    for r in grouped.collect():
        if r["g_lang"] and r["g_source"]:  # the global () set
            card.update(slice_dict(r))
        elif not r["g_lang"]:
            card["by_lang"][str(r["_lang"])] = slice_dict(r)
        else:
            card["by_source"][str(r["_source"])] = slice_dict(r)
    if path:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "datacard.json"), "w") as f:
            json.dump(card, f, indent=1, sort_keys=True)
    return card


def datacard_diff(old: dict, new: dict, rel_threshold: float = 0.1) -> dict:
    """Drift report between two datacards (e.g. consecutive crawls):
    per-field relative deltas for the global totals and per-slice
    composition shifts, plus slices that appeared or vanished. Pure
    driver-side dict arithmetic — cards are metadata.

    Output::

        {"fields": {name: {"old": x, "new": y, "rel": (y-x)/x|null}},
         "by_lang":   {"added": [...], "removed": [...],
                       "shifted": {lang: {"old_share": s0, "new_share": s1}}},
         "by_source": {... same ...} | None}

    ``shifted`` lists slices whose share of n_docs moved by more than
    ``rel_threshold`` (absolute difference of shares) — the alarm
    condition a cron wrapper alerts on.
    """

    def rel(a, b):
        if a is None or b is None:
            return None  # incomparable (field missing on one side)
        if a == 0:
            # 0 -> X is maximal drift, not "incomparable": report inf
            # (json.dumps renders Infinity — non-strict JSON, stated)
            return float("inf") if b != 0 else 0.0
        return (b - a) / a

    fields = {}
    for k in ("n_docs", "n_tokens", "n_chars", "mean_quality"):
        fields[k] = {"old": old.get(k), "new": new.get(k), "rel": rel(old.get(k), new.get(k))}

    def slices(key):
        o, n = old.get(key), new.get(key)
        if o is None or n is None:
            return None
        out = {
            "added": sorted(set(n) - set(o)),
            "removed": sorted(set(o) - set(n)),
            "shifted": {},
        }
        o_total = sum(s["n_docs"] for s in o.values()) or 1
        n_total = sum(s["n_docs"] for s in n.values()) or 1
        for name in set(o) & set(n):
            s0 = o[name]["n_docs"] / o_total
            s1 = n[name]["n_docs"] / n_total
            if abs(s1 - s0) > rel_threshold:
                out["shifted"][name] = {"old_share": s0, "new_share": s1}
        return out

    return {
        "fields": fields,
        "by_lang": slices("by_lang"),
        "by_source": slices("by_source"),
    }

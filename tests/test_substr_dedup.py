"""Exact-substring dedup: planted-passage fixtures + a full pure-Python
differential on the real documents table."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from etl_sber_spark.operators.substr_dedup import (
    remove_duplicate_spans,
    span_hashes,
)

from .conftest import SF_SMALL

PASSAGE = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens


def _docs(spark):
    rows = [
        (1, f"intro one two three {PASSAGE} outro four five"),
        (2, f"totally different words here {PASSAGE} and a tail"),
        (3, "no repeats in this document at all whatsoever"),
        (4, f"self repeat case {PASSAGE} middle filler words {PASSAGE} end"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_planted_passage_removed_from_later_docs(spark):
    out = {
        r.doc_id: r
        for r in remove_duplicate_spans(_docs(spark), window=8).collect()
    }
    # doc 1 holds the first occurrence -> untouched
    assert out[1].n_tokens_removed == 0
    assert PASSAGE in out[1].text_dedup
    # doc 2's copy is removed wholesale (interval merge covers the
    # whole repeat), unique words stay
    assert PASSAGE not in out[2].text_dedup
    assert out[2].text_dedup == "totally different words here and a tail"
    assert out[2].n_tokens_removed == 8
    # doc 3 untouched
    assert out[3].n_tokens_removed == 0
    # doc 4: BOTH its copies are non-first occurrences (doc 1 owns the
    # span), so both vanish
    assert PASSAGE not in out[4].text_dedup
    assert out[4].text_dedup == "self repeat case middle filler words end"
    assert out[4].n_tokens_removed == 16


def test_self_repeat_keeps_first_occurrence(spark):
    df = spark.createDataFrame(
        [(7, f"{PASSAGE} bridge words in between {PASSAGE}")],
        "doc_id int, text string",
    )
    r = remove_duplicate_spans(df, window=8).collect()[0]
    assert r.text_dedup == f"{PASSAGE} bridge words in between"
    assert r.n_tokens_removed == 8


def test_short_docs_emit_no_spans(spark):
    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id int, text string"
    )
    assert span_hashes(df, window=8).count() == 0
    out = remove_duplicate_spans(df, window=8).collect()
    assert all(r.n_tokens_removed == 0 for r in out)


def _h60(s: str) -> int:
    return int(hashlib.md5((s + ":0").encode()).hexdigest()[:15], 16)


def _py_dedup(docs: dict[int, str], window: int):
    """Reference implementation: first-occurrence rule + interval
    removal, mirroring the operator's contract exactly."""
    toks = {d: re.split(r"\s+", t.strip().lower()) for d, t in docs.items()}
    occ: dict[int, list[tuple[int, int]]] = {}
    for d in sorted(toks):
        ts = toks[d]
        if len(ts) < window:
            continue
        for i in range(len(ts) - window + 1):
            h = _h60(" ".join(ts[i : i + window]))
            occ.setdefault(h, []).append((d, i + 1))
    removal: dict[int, list[int]] = {}
    for h, places in occ.items():
        if len(places) < 2:
            continue
        first = min(places)
        for d, p in places:
            if (d, p) != first:
                removal.setdefault(d, []).append(p)
    out = {}
    for d, ts in toks.items():
        ivs = []
        for p in sorted(removal.get(d, [])):
            if ivs and p <= ivs[-1][1]:
                ivs[-1] = (ivs[-1][0], max(ivs[-1][1], p + window))
            else:
                ivs.append((p, p + window))
        kept = [
            t
            for j, t in enumerate(ts, start=1)
            if not any(s <= j < e for s, e in ivs)
        ]
        out[d] = (" ".join(kept), len(ts) - len(kept))
    return out


def test_python_differential_real_corpus(spark):
    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    got = {
        r.doc_id: (r.text_dedup, r.n_tokens_removed)
        for r in remove_duplicate_spans(df, window=8).collect()
    }
    docs = {r.doc_id: r.text for r in df.collect()}
    want = _py_dedup(docs, window=8)
    assert got == want
    # the small-vocab synthetic corpus genuinely repeats 8-grams, so
    # this differential exercises real removals
    assert sum(n for _, n in want.values()) > 0


def test_deterministic_under_repartition(spark):
    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    key = lambda d: sorted(
        (r.doc_id, r.text_dedup, r.n_tokens_removed)
        for r in remove_duplicate_spans(d, window=8).collect()
    )
    assert key(df) == key(df.repartition(7))


def test_plan_no_corpus_window_no_pair_product(spark):
    """Everything is aggregates + equi-joins: no window function over
    the corpus, no nested-loop join anywhere in the plan."""
    import contextlib, io

    df = remove_duplicate_spans(
        spark.read.parquet(f"{SF_SMALL}/documents.parquet"), window=8
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window\n" not in plan.split("\n\n")[0]


BOILER_TOP = "Home | About | Contact"
BOILER_BOT = "(c) 2024 Example Corp - All Rights Reserved"


def test_line_dedup_removes_boilerplate(spark):
    from etl_sber_spark.operators.substr_dedup import remove_duplicate_lines

    rows = [
        (1, f"{BOILER_TOP}\nfirst page body text\n\n{BOILER_BOT}"),
        (2, f"  {BOILER_TOP.upper()}  \nsecond page different body\n{BOILER_BOT}"),
        (3, "a page with no boilerplate at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in remove_duplicate_lines(df).collect()}
    # first occurrence keeps everything (blank line included)
    assert out[1].text_dedup == rows[0][1]
    assert out[1].n_lines_removed == 0
    # case/indent variants hash identically -> page 2 loses both
    assert out[2].text_dedup == "second page different body"
    assert out[2].n_lines_removed == 2
    assert out[3].n_lines_removed == 0


def _py_line_dedup(docs: dict[int, str], min_chars: int = 1):
    occ: dict[int, list[tuple[int, int]]] = {}
    for d in sorted(docs):
        for i, line in enumerate(docs[d].split("\n"), start=1):
            norm = line.strip().lower()
            if len(norm) < min_chars:
                continue
            occ.setdefault(_h60(norm), []).append((d, i))
    removal: dict[int, set] = {}
    for places in occ.values():
        if len(places) < 2:
            continue
        first = min(places)
        for d, p in places:
            if (d, p) != first:
                removal.setdefault(d, set()).add(p)
    out = {}
    for d, t in docs.items():
        lines = t.split("\n")
        kept = [
            ln
            for j, ln in enumerate(lines, start=1)
            if j not in removal.get(d, set())
        ]
        out[d] = ("\n".join(kept), len(lines) - len(kept))
    return out


def test_line_dedup_python_differential(spark):
    from etl_sber_spark.operators.substr_dedup import remove_duplicate_lines

    # multi-line fixture + the real (single-line) corpus in one frame
    real = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    extra = spark.createDataFrame(
        [
            (100001, f"{BOILER_TOP}\nalpha\n{BOILER_BOT}"),
            (100002, f"{BOILER_TOP}\nbeta\n{BOILER_BOT}"),
            (100003, "alpha"),  # whole-line dup of 100001's body
        ],
        "doc_id bigint, text string",
    )
    df = real.union(extra)
    got = {
        r.doc_id: (r.text_dedup, r.n_lines_removed)
        for r in remove_duplicate_lines(df).collect()
    }
    want = _py_line_dedup({r.doc_id: r.text for r in df.collect()})
    assert got == want
    assert got[100002] == ("beta", 2)
    assert sum(n for _, n in got.values()) > 2  # real corpus dedups too


def test_line_dedup_crlf_and_tabs_collapse(spark):
    """CRLF line endings and tab indentation are normalization noise —
    'footer\\r' and '\\tfooter' must hash with 'footer'."""
    from etl_sber_spark.operators.substr_dedup import remove_duplicate_lines

    rows = [
        (1, "unique one\nfooter"),
        (2, "unique two\r\nfooter\r"),   # CRLF doc
        (3, "unique three\n\tFooter  "),  # tab + case + trailing spaces
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in remove_duplicate_lines(df).collect()}
    assert out[1].n_lines_removed == 0
    assert out[2].n_lines_removed == 1
    assert out[3].n_lines_removed == 1
    assert "ooter" not in out[2].text_dedup + out[3].text_dedup


def test_line_dedup_idempotent_real_corpus(spark):
    """After one pass every normalized line is unique corpus-wide, so a
    second pass removes nothing (unlike span dedup, where cut seams may
    form new windows — documented there)."""
    from etl_sber_spark.operators.substr_dedup import remove_duplicate_lines

    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    once = remove_duplicate_lines(df).select(
        "doc_id", F.col("text_dedup").alias("text")
    )
    twice = remove_duplicate_lines(once)
    assert twice.filter(F.col("n_lines_removed") > 0).count() == 0


def test_span_dedup_preserves_original_case(spark):
    """Review regression: reconstruction must use case-PRESERVING
    tokens. Matching stays case-insensitive (lowercased hashes), but a
    document's surviving text keeps its original capitalization — the
    old code rebuilt from the lowercased match-side tokens and silently
    case-folded the entire corpus, including untouched documents."""
    upper_passage = PASSAGE.upper()
    rows = [
        (1, "Mixed CASE Document with No duplicates AT all"),
        (2, f"first occurrence here {PASSAGE} tail words"),
        # case variant of the passage -> still matches (insensitive),
        # but the SURVIVING tokens keep their case
        (3, f"Second COPY follows {upper_passage} Ending Words"),
    ]
    out = {
        r.doc_id: r
        for r in remove_duplicate_spans(
            spark.createDataFrame(rows, "doc_id int, text string"), window=8
        ).collect()
    }
    assert out[1].n_tokens_removed == 0
    assert out[1].text_dedup == "Mixed CASE Document with No duplicates AT all"
    assert out[2].n_tokens_removed == 0
    assert PASSAGE in out[2].text_dedup
    # the case-variant copy was detected and removed...
    assert out[3].n_tokens_removed == 8
    # ...and what survives is the ORIGINAL casing of doc 3's own tokens
    assert out[3].text_dedup == "Second COPY follows Ending Words"

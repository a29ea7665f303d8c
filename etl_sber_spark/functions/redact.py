"""PII detection and redaction column expressions.

Pretraining corpora must be scrubbed of emails, payment-card numbers,
phone numbers and government-id patterns before training. These are
pure ``regexp_replace``/``regexp_count`` column expressions — codegen,
zero shuffles, scan-speed at 100 TB — with patterns restricted to the
syntax subset that Java regex (Spark) and RE2 (DuckDB) interpret
identically, so the operator is differentially gradable
(plans/llm_queries.py q_pii_redact).

The pattern set is deliberately conservative (high precision): a
production pipeline composes this with an ML NER pass for recall; the
regex tier is the cheap always-on scrub. Patterns are applied in a
fixed order (card → id → email → phone) so overlapping matches resolve
deterministically — a 16-digit card is never half-eaten by the phone
pattern.

Domain tie-in: the reference pipeline's blacklist keys on passport
numbers (main.py:218-235, '1234 567890' format) — ID_RE matches
exactly that shape, so the redactor can scrub the reference's own PII
column type.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Each class: (placeholder, pattern). Java-regex ∩ RE2 common subset:
#: char classes, bounded repeats, \b ASCII word boundaries — no
#: lookaround, no backrefs.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
CARD_RE = r"\b[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}\b"
ID_RE = r"\b[0-9]{4} [0-9]{6}\b"
PHONE_RE = r"\+[0-9]{7,15}\b"

#: Application order matters: card (16 digits) before id (4+6 digits)
#: before email before phone, so longer matches win.
PII_CLASSES: tuple[tuple[str, str], ...] = (
    ("card", CARD_RE),
    ("id", ID_RE),
    ("email", EMAIL_RE),
    ("phone", PHONE_RE),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def redact_pii(col: Column | str) -> Column:
    """Text with every PII match replaced by ``<CLASS>`` placeholders."""
    out = _c(col)
    for name, pat in PII_CLASSES:
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def pii_count(col: Column | str, cls: str) -> Column:
    """Match count for one PII class — counted on the text with all
    *earlier* classes already redacted, mirroring redact_pii's
    precedence (an id inside a card number is counted as card only)."""
    out = _c(col)
    for name, pat in PII_CLASSES:
        if name == cls:
            return F.regexp_count(out, F.lit(pat))
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    raise KeyError(cls)


def pii_total(col: Column | str) -> Column:
    """Total PII matches across all classes (precedence-aware)."""
    expr = None
    for name, _ in PII_CLASSES:
        c = pii_count(col, name)
        expr = c if expr is None else expr + c
    return expr

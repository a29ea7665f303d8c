"""Fill-in-the-middle (FIM) transformation for pretraining corpora.

Bavarian et al., "Efficient Training of Language Models to Fill in the
Middle" (2022, arXiv:2207.14255): rearrange a fraction of training
documents from ``prefix middle suffix`` to ``<PRE> prefix <SUF> suffix
<MID> middle`` (PSM) so an autoregressive model learns infilling for
free. Standard in code-model pipelines; applied document-level here.

Spark-first: everything is a projection over the scan — the apply
decision and the two split points derive from the portable hash64 of
the doc id (no RNG, the repo-wide determinism rule), the splits are
array ``slice``s over the token array. Zero shuffles, zero Python.

Split-point policy: two independent hash draws over [0, n] are sorted
to give (a, b); prefix = tokens[:a], middle = tokens[a:b], suffix =
tokens[b:]. Empty spans are legal (the paper trains on them — the
model must learn degenerate infills); documents shorter than
``min_tokens`` and the (1 - ``fim_rate``) remainder pass through
unchanged with ``fim_applied = false``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64
from .dedup import tokens_expr
from .spread import spread

#: Sentinel tokens (the paper's PSM ordering). Plain strings so the
#: output stays a token array; a tokenizer maps them to special ids.
PRE, MID, SUF = "<|fim_pre|>", "<|fim_mid|>", "<|fim_suf|>"

#: Resolution of the hash-derived rate / split draws.
_RES = 1_000_000


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fim_rate: float = 0.5,
    min_tokens: int = 4,
    seed: int = 0,
) -> DataFrame:
    """``df`` + ``fim_tokens`` (array<string>: PSM rearrangement with
    sentinels, or the plain token array when not applied) +
    ``fim_applied``.

    ``fim_rate`` selects documents by hash-Bernoulli on (id, seed) —
    deterministic, stable as the corpus grows, re-seedable per epoch
    (the same knob contract as the mixture builder's fractional
    epochs). Split points are a second and third independent draw, so
    rate and position never correlate. The three hash salts STRIDE by
    3×seed: with consecutive salts, epoch e's third draw would equal
    epoch e+1's second for every doc (the natural seed=epoch usage
    would repeat one split endpoint between every consecutive epoch
    pair — review finding).

    NULL and whitespace-only text yields an EMPTY token array and
    ``fim_applied = false`` — never a NULL flag (a NULL predicate
    silently drops rows from downstream filters) and never a phantom
    empty-string token.
    """
    if not (0.0 <= fim_rate <= 1.0):
        raise ValueError(f"fim_rate must be in [0, 1], got {fim_rate}")
    toks = F.coalesce(
        F.filter(tokens_expr(text_col), lambda t: t != ""),
        F.expr("CAST(array() AS array<string>)"),
    )
    sid = F.col(id_col).cast("string")
    pick = (
        F.pmod(hash64(sid, 3 * seed), F.lit(_RES))
        < F.lit(int(round(fim_rate * _RES)))
    )
    n = F.size(toks)
    d1 = F.pmod(hash64(sid, 3 * seed + 1), n + 1)
    d2 = F.pmod(hash64(sid, 3 * seed + 2), n + 1)
    a, b = F.least(d1, d2), F.greatest(d1, d2)
    psm = F.concat(
        F.array(F.lit(PRE)),
        F.slice(toks, 1, a),
        F.array(F.lit(SUF)),
        F.slice(toks, b + 1, n - b),
        F.array(F.lit(MID)),
        F.slice(toks, a + 1, b - a),
    )
    applied = pick & (n >= min_tokens)
    return spread(df).select(
        "*",
        F.when(applied, psm).otherwise(toks).alias("fim_tokens"),
        applied.alias("fim_applied"),
    )

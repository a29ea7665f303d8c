"""Token-budget corpus mixture builder (training-data recipes).

A pretraining run consumes a MIXTURE: per-source weights over a token
budget ("40% web, 30% code, 3 epochs of wikipedia, ..."), not the raw
corpus proportions. Public recipes (GPT-3 Table 2.2, The Pile, LLaMA)
all work this way, and the operator every large-scale data pipeline
needs is: given measured per-source token counts and target weights,
emit each document the right number of times — UP-sampling small
high-quality sources by integer epoch repeats plus a fractional
hash-sampled extra epoch, DOWN-sampling large sources by the same
hash filter. ``operators/sampling.py`` covers the down-only case; this
module adds the repeat direction and the budget arithmetic.

Three stages, split so the cluster does only data-scale work:

- :func:`source_token_stats` — one hash-aggregate over the corpus:
  per-source document and token totals (result is sources-sized, i.e.
  metadata).
- :func:`mixture_plan` — pure driver arithmetic on those totals:
  target tokens per source = budget x weight_i / sum(weights); repeat
  factor r_i = target_i / available_i, split into ``epochs = floor(r)``
  full copies plus a ``frac_rate = r - floor(r)`` hash-sampled extra
  copy. No Spark involvement.
- :func:`build_mixture` — one projection + ``explode(sequence(...))``
  over the corpus: each row carries its source's literal (epochs,
  frac_threshold) via a CASE chain, emits ``epochs + (hash-bucket <
  threshold)`` copies tagged with an ``epoch`` ordinal. Zero shuffles,
  zero driver data moves; the explode fan-out is the *output* size,
  which is exactly the requested budget.

Determinism: the fractional-epoch decision reuses the portable 60-bit
md5 hash (functions/hashing.py) with a per-epoch seed, so reruns are
bit-identical, the same document keeps its fate as the corpus grows,
and a DuckDB oracle can replay the identical arithmetic (the
differential test in tests/test_mixture.py hash-verifies membership
and epoch multiplicity, not just counts).

Expected-value contract: the emitted token total per source is
``epochs x available + E[frac_rate x available]`` — exact in the
integer part, hash-Bernoulli in the fractional part (quantized to
1/10000 like sampling.py). An exact-to-the-document knapsack would
need a global sort and is deliberately not the default at 100 TB.

Reference parity: the reference (bank ETL, main.py) has no mixture
operator; this extends the LLM-pipeline surface alongside
sampling/packing (SURVEY.md §7.5).
"""

from __future__ import annotations

from collections.abc import Mapping
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64
from .sampling import RESOLUTION


def source_token_stats(
    df: DataFrame,
    source_col: str = "source",
    token_count: Column | None = None,
) -> DataFrame:
    """Per-source ``(source, n_docs, n_tokens)`` — one hash-aggregate.

    ``token_count`` defaults to the whitespace token count of ``text``
    (functions/text.token_count — 0 for empty/whitespace-only documents;
    a bare split-size would count 1 and let all-empty sources through
    mixture_plan's no-tokens guard); pass a column (e.g. a precomputed
    ``n_tokens``) to avoid retokenizing.
    """
    from ..functions.text import token_count as _tc

    tc = token_count if token_count is not None else _tc("text")
    return df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tc.cast("long")).alias("n_tokens"),
    )


@dataclass(frozen=True)
class SourcePlan:
    """Repeat recipe for one source: ``epochs`` full copies plus one
    extra copy for rows whose hash bucket falls below
    ``frac_threshold`` (in 1/RESOLUTION units)."""

    epochs: int
    frac_threshold: int

    @property
    def repeat_factor(self) -> float:
        return self.epochs + self.frac_threshold / RESOLUTION


def mixture_plan(
    stats: Mapping[str, int],
    weights: Mapping[str, float],
    budget_tokens: int,
    max_epochs: int = 100,
) -> dict[str, SourcePlan]:
    """Driver-side budget arithmetic (inputs are sources-sized).

    ``stats`` maps source -> available tokens (collect
    :func:`source_token_stats` for it); ``weights`` maps source ->
    relative weight (normalized here; sources absent from ``weights``
    get repeat factor 0 = excluded). Raises if a requested source has
    no tokens, or if a source would need more than ``max_epochs``
    repeats (a fat-finger guard: a 1000-epoch repeat of a tiny source
    is almost always a recipe bug, not intent).
    """
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("mixture weights must sum to a positive value")
    plan: dict[str, SourcePlan] = {}
    for src, w in sorted(weights.items()):
        avail = stats.get(src, 0)
        if avail <= 0:
            raise ValueError(f"mixture source {src!r} has no tokens in stats")
        r = (budget_tokens * w / total_w) / avail
        if r > max_epochs:
            raise ValueError(
                f"source {src!r} needs repeat factor {r:.1f} > "
                f"max_epochs={max_epochs}; raise max_epochs if intended"
            )
        epochs = int(r)
        frac = int(round((r - epochs) * RESOLUTION))
        if frac == RESOLUTION:  # r rounded up to a whole epoch
            epochs, frac = epochs + 1, 0
        plan[src] = SourcePlan(epochs, frac)
    return plan


def build_mixture(
    df: DataFrame,
    plan: Mapping[str, SourcePlan],
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: int = 0,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Emit each row ``epochs(+1)`` times per its source's plan, with a
    0-based ``epoch_col`` ordinal distinguishing the copies.

    The fractional extra copy is taken by rows whose hash bucket (per
    ``seed``) is below the source's threshold — the same hash-stable
    membership rule as sampling.py, so a document's extra-epoch fate
    never flips as other sources change. Rows of sources absent from
    ``plan`` are excluded (0 copies). Pure projection + explode: no
    shuffle, no driver data.
    """
    # literal MAP lookups, not a nested CASE chain: a real mixture can
    # have thousands of sources (per-domain recipes) and a depth-n WHEN
    # tree makes analysis/codegen quadratic-ish; a map is one flat
    # expression and one hash probe per row.
    epochs_map = F.create_map(
        *[l for src, sp in sorted(plan.items()) for l in (F.lit(src), F.lit(sp.epochs))]
    )
    frac_map = F.create_map(
        *[
            l
            for src, sp in sorted(plan.items())
            for l in (F.lit(src), F.lit(sp.frac_threshold))
        ]
    )
    epochs_expr: Column = F.coalesce(
        F.element_at(epochs_map, F.col(source_col)), F.lit(0)
    )
    frac_expr: Column = F.coalesce(
        F.element_at(frac_map, F.col(source_col)), F.lit(0)
    )
    bucket = F.pmod(hash64(F.col(id_col).cast("string"), seed), F.lit(RESOLUTION))
    n_copies = epochs_expr + F.when(bucket < frac_expr, 1).otherwise(0)
    return (
        df.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") > 0)
        .withColumn(
            epoch_col,
            F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)),
        )
        .drop("_n_copies")
    )


def temperature_weights(
    stats: Mapping[str, int], temperature: float = 1.0
) -> dict[str, float]:
    """Temperature-scaled sampling weights from measured token counts —
    the standard multilingual/multi-source rebalancing knob (mBERT /
    XLM-R exponent-smoothed sampling; T=1 reproduces natural
    proportions, T→∞ approaches uniform, T<1 sharpens toward the big
    sources). w_i ∝ (n_i / N) ** (1/T), normalized to sum to 1.

    Driver arithmetic on sources-sized input; feed the result straight
    into :func:`mixture_plan`:

        stats = {r["source"]: r["n_tokens"] for r in
                 source_token_stats(df).collect()}
        plan = mixture_plan(stats, temperature_weights(stats, 3.0),
                            budget_tokens=10**9)

    Deterministic: plain float arithmetic over a sorted dict — no RNG,
    no order dependence.
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    total = float(sum(stats.values()))
    if total <= 0:
        raise ValueError("stats must contain at least one token")
    raw = {
        src: (n / total) ** (1.0 / temperature)
        for src, n in sorted(stats.items())
        if n > 0
    }
    z = sum(raw.values())
    return {src: w / z for src, w in raw.items()}

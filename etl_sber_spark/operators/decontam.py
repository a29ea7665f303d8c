"""Benchmark decontamination: flag training documents that overlap an
evaluation set.

Before training, every serious pipeline sweeps the corpus for
documents containing benchmark/eval text (the GPT-3 paper's 13-gram
overlap sweep, Brown et al. 2020 App. C; the standard since). The
contract: a document is contaminated if it shares at least
``min_hits`` distinct word ``n``-grams with any probe document.

Mechanics (all relational, no Python):

- Both sides are reduced to DISTINCT hashed word n-grams
  (portable hash64 so results are engine-checkable).
- The probe side (benchmarks: thousands of items, not terabytes) is
  aggregated to distinct gram hashes and BROADCAST — the corpus-side
  scan is then one broadcast semi-join + one aggregate keyed on
  doc_id: no corpus shuffle at all until the (small) hit set.
- Output is hit-documents only (``doc_id``, ``n_hit_ngrams``,
  ``n_probe_docs``): at 100 TB, emitting a row per CLEAN document
  would itself be a corpus-sized write; callers anti-join the hit
  list to drop contaminated docs.

The n-gram granularity (default 8) is the precision/recall knob: long
grams make accidental overlap vanishingly rare (GPT-3 used 13-gram
word overlap), short ones catch paraphrase-ish copies at the cost of
false hits on idioms.

Reference parity: no decontamination in the reference (bank ETL);
LLM-pipeline extension surface, composed from the same n-gram+hash
primitives as dedup (operators/dedup.py) and repetition
(functions/repetition.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64
from ..functions.repetition import ngram_array


def _gram_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int, dedup: bool = True
) -> DataFrame:
    """(id, gram_hash) pairs; ``dedup`` makes them DISTINCT.

    The CORPUS side passes ``dedup=False``: dropDuplicates is a
    corpus-sized shuffle executed before the broadcast join, and the
    hit aggregate already counts with count_distinct, so duplicate
    grams cannot change any output (review finding — the shuffle
    contradicted the module's "no corpus shuffle" contract). The probe
    side keeps the dedup: it shrinks the broadcast table.
    """
    grams = df.select(
        F.col(id_col),
        F.explode(ngram_array(F.col(text_col), n)).alias("g"),
    ).select(id_col, hash64(F.col("g")).alias("gh"))
    return grams.dropDuplicates([id_col, "gh"]) if dedup else grams


def contaminated_docs(
    corpus: DataFrame,
    probes: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_id_col: str = "probe_id",
    probe_text_col: str = "text",
    broadcast_probes: bool = True,
) -> DataFrame:
    """Documents sharing ≥ ``min_hits`` distinct ``n``-grams with the
    probe set.

    Output: ``id_col``, ``n_hit_ngrams`` (distinct corpus-side grams
    that appear in ANY probe), ``n_probe_docs`` (distinct probes hit —
    the audit column: which benchmark leaked, not just that one did).

    ``broadcast_probes``: default True — the benchmark-sweep shape
    (probes are thousands of items; forcing the broadcast keeps the
    corpus shuffle-free). Pass False when the probe side is itself
    corpus-scale (e.g. a percent-sized holdout split in
    :func:`leakage_guarded_split`): AQE then picks broadcast only if
    the gram table actually fits, degrading to a shuffle join instead
    of blowing the broadcast cap.
    """
    corpus_grams = _gram_hashes(corpus, id_col, text_col, n, dedup=False)
    probe_grams = _gram_hashes(probes, probe_id_col, probe_text_col, n)
    if broadcast_probes:
        probe_grams = F.broadcast(probe_grams)
    hits = corpus_grams.join(probe_grams, "gh")
    return (
        hits.groupBy(id_col)
        .agg(
            F.count_distinct("gh").alias("n_hit_ngrams"),
            F.count_distinct(probe_id_col).alias("n_probe_docs"),
        )
        .filter(F.col("n_hit_ngrams") >= min_hits)
    )


def decontaminate(
    corpus: DataFrame,
    probes: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_id_col: str = "probe_id",
    probe_text_col: str = "text",
) -> DataFrame:
    """The clean corpus: ``corpus`` minus contaminated documents
    (left_anti against the hit list).

    The hit list is NOT force-broadcast: on a heavily contaminated
    corpus it is O(corpus) rows, and a forced broadcast would OOM the
    driver or hit the broadcast cap instead of degrading — the same
    hazard ngram_jaccard documents (operators/dedup.py). AQE broadcasts
    it when it actually fits (the common case), else shuffles (review
    finding)."""
    hits = contaminated_docs(
        corpus, probes, n, min_hits, id_col, text_col, probe_id_col, probe_text_col
    )
    return corpus.join(hits.select(id_col), id_col, "left_anti")


def leakage_guarded_split(
    df: DataFrame,
    weights,
    *,
    n: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Train/val/test split with a TEST-SET-LEAKAGE guard: split 0 is
    train, every other split is holdout, and any train document sharing
    ≥ ``min_hits`` distinct ``n``-grams with ANY holdout document gets
    ``leaks_holdout = true`` — filter it out of training and the
    holdout is textually disjoint from what the model sees, the same
    contract the benchmark sweep (:func:`contaminated_docs`) enforces
    against external eval sets, applied to the pipeline's own splits.

    Output: ``df`` + ``split_col`` (hash_split: deterministic,
    growth-stable) + ``leaks_holdout`` (never true on holdout rows).
    Dropping flagged docs instead of reassigning them is deliberate:
    moving a leaky doc INTO holdout would correlate holdout content
    with corpus duplication, a selection bias; the paper-standard
    remedy is removal from train.

    Scale: the probe side is a real split (percent-scale, not
    benchmark-scale), so the gram join is NOT force-broadcast — AQE
    decides (see ``contaminated_docs(broadcast_probes=False)``). Work
    is two gram projections + one equi-join + one aggregate.
    """
    from .sampling import hash_split

    split = hash_split(df, weights, id_col=id_col, seed=seed, split_col=split_col)
    train = split.filter(F.col(split_col) == 0)
    # probe id renamed: contaminated_docs joins the two gram tables, so
    # identical id column names would collide in the hit aggregate
    holdout = split.filter(F.col(split_col) != 0).select(
        F.col(id_col).alias("_probe_id"), F.col(text_col)
    )
    hits = contaminated_docs(
        train,
        holdout,
        n=n,
        min_hits=min_hits,
        id_col=id_col,
        text_col=text_col,
        probe_id_col="_probe_id",
        probe_text_col=text_col,
        broadcast_probes=False,
    )
    return split.join(
        hits.select(id_col, F.lit(True).alias("leaks_holdout")), id_col, "left"
    ).withColumn(
        "leaks_holdout",
        F.when(F.col(split_col) == 0, F.coalesce("leaks_holdout", F.lit(False))).otherwise(
            F.lit(False)
        ),
    )


def semantic_contamination(
    corpus_emb: DataFrame,
    probe_emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-level decontamination: corpus documents semantically
    close to any evaluation probe.

    The n-gram sweep (:func:`contaminated_docs`) misses paraphrased or
    translated benchmark leakage; the standard complement scores each
    corpus embedding against the probe set and flags cosine ≥
    ``threshold``. Same scale shape as the n-gram sweep: probes
    (benchmarks — thousands, not terabytes) BROADCAST against the
    corpus scan, exact cosine evaluated in place, ONE aggregate keyed
    on the corpus id — the corpus never shuffles; only the (small) hit
    set does.

    Output: hit documents only — (``id_col``, ``n_probe_hits``,
    ``max_sim`` rounded to 6, ``nearest_probe`` = probe id of the max,
    ties to the smaller probe id). Callers anti-join to drop. Documents
    with a zero-norm embedding never match (NULL cosine — the semdedup
    convention).
    """
    from ..functions.normalize import portable_round
    from ..functions.vectors import dot_product, l2_norm
    from .spread import spread

    # norms precomputed ONCE per side: the join evaluates O(n·p) pairs,
    # and recomputing each row's norm p times (and each probe's n
    # times) would triple the dominant in-scan arithmetic — the pair
    # expression is a single dot product + one multiply (review
    # finding). try_divide keeps the zero-norm → NULL contract of
    # semdedup._safe_cosine.
    p = probe_emb.select(
        F.col(id_col).alias("_probe_id"),
        F.col(vec_col).alias("_p_vec"),
        l2_norm(F.col(vec_col)).alias("_p_norm"),
    )
    c = spread(corpus_emb).select(
        id_col,
        F.col(vec_col).alias("_a_vec"),
        l2_norm(F.col(vec_col)).alias("_a_norm"),
    )
    sim = portable_round(
        F.try_divide(
            dot_product(F.col("_a_vec"), F.col("_p_vec")),
            F.col("_a_norm") * F.col("_p_norm"),
        ),
        6,
    )
    scored = (
        c.join(F.broadcast(p), F.col("_probe_id").isNotNull())
        .select(id_col, "_probe_id", sim.alias("_sim"))
        .filter(F.col("_sim") >= threshold)
    )
    # min_by on (-sim, probe_id): highest similarity wins, ties to the
    # SMALLEST probe id — deterministic across partitionings. The
    # negation sits on _sim (always numeric); negating _probe_id would
    # crash (ANSI) or NULL out (non-ANSI) on string probe ids, which
    # id_col explicitly permits (review finding).
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_probe_hits"),
        F.max("_sim").alias("max_sim"),
        F.min_by(
            "_probe_id", F.struct((-F.col("_sim")), F.col("_probe_id"))
        ).alias("nearest_probe"),
    )

"""pin(): materialize an operator-internal frame once, without leaking.

Operators here sometimes build an intermediate that several downstream
joins consume (LSH bands, shingle sets, candidate pairs, term
frequencies). Left lazy, Catalyst re-plans the whole subtree per
consumer — plan audits showed the LSH band join re-running four times
inside the Jaccard verify. The two materialization primitives differ in
lifecycle, and the difference matters for a library:

- ``df.cache()`` registers the plan in the session's CacheManager,
  which holds it until an EXPLICIT ``unpersist()`` — impossible for a
  caller to issue on a frame that never escapes the operator. A
  long-lived session (service, notebook, grading loop) calling such an
  operator repeatedly accumulates pinned executor memory until the
  session dies (curate.py documented this hazard in round 2; round-3
  review flagged that new internal caches reintroduced it).
- ``df.localCheckpoint(eager=False)`` materializes the same way
  (MEMORY_AND_DISK blocks, computed at first use, reused by every
  consumer) but the blocks are owned by the RDD, so the ContextCleaner
  frees them as soon as the returned frame is garbage-collected — the
  lifecycle a library-internal temporary actually wants.

Trade-off, stated: checkpoint blocks are not recomputable — on a real
cluster, losing an executor that held a block fails the job instead of
recomputing the partition (and dynamic allocation can reap such
executors). For the short-lived frames pinned here that risk window is
one job; the alternative is unbounded CacheManager growth across a
session. Callers that prefer recomputable caching can still cache the
frame THEY pass in (e.g. the ``sh=`` argument of ``ngram_jaccard``)
and unpersist it themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pin(df: DataFrame) -> DataFrame:
    """Materialize-once with automatic release (lazy localCheckpoint)."""
    return df.localCheckpoint(eager=False)

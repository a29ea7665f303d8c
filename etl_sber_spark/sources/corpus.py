"""JSONL corpus ingestion with schema pinning and quarantine.

The import twin of sinks/export.py: crawls and vendor drops arrive as
JSONL (one document per line), and the two ingestion rules that keep a
100 TB corpus pipeline debuggable are the same ones the bank CSV reader
applies (sources/io.py, SURVEY §1.4):

- NEVER infer the schema: a malformed batch would silently retype the
  whole corpus (and schema inference is an extra full scan at scale);
- NEVER drop malformed rows silently: parse failures land in a
  quarantine frame with the raw line preserved for forensics, and the
  caller decides (alert, re-fetch, ignore).

Rows quarantine when the JSON does not parse against the schema
(PERMISSIVE corrupt-record capture) or when a required column is NULL
(missing key, JSON null, or type mismatch on a required field). Both
frames come from ONE scan-level split — no second read of the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical corpus schema: matches the documents fixture table; n_chars
#: is derived (not trusted from the producer).
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

#: columns that must be non-NULL for a row to be usable downstream
REQUIRED = ("doc_id", "text")

_CORRUPT = "_corrupt_record"


def corrupt_capture_schema(schema: T.StructType = DOCUMENT_SCHEMA) -> T.StructType:
    """Schema + the corrupt-record capture column (a COPY — never
    ``schema.add(...)``: StructType.add mutates and returns self)."""
    return T.StructType(
        [*schema.fields, T.StructField(_CORRUPT, T.StringType())]
    )


def split_documents(
    raw: DataFrame,
    schema: T.StructType = DOCUMENT_SCHEMA,
    required: tuple[str, ...] = REQUIRED,
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine) split of a frame read with
    :func:`corrupt_capture_schema` — the ONE place the validity rules
    live, shared by the batch reader and the streaming landing zone
    (streaming/corpus.py) so batch and stream can never drift.

    ``good`` carries the schema's columns plus derived ``n_chars``;
    ``quarantine`` carries ``raw`` (the offending line verbatim — for
    unparseable lines Spark preserves it in the corrupt-record column;
    for required-NULL rows it is the row re-serialized to JSON) and
    ``reason`` (``'unparseable'`` or ``'missing:<col>'``).
    """
    missing_reason = F.coalesce(
        *[
            F.when(F.col(c).isNull(), F.lit(f"missing:{c}"))
            for c in required
        ]
    )
    cols = [f.name for f in schema.fields]
    good = raw.filter(F.col(_CORRUPT).isNull() & missing_reason.isNull()).select(
        *cols
    )
    if "text" in cols:  # derived, never trusted from the producer;
        # schemas without a text column (e.g. the raw-page landing
        # zone, streaming/crawl.py) skip it
        good = good.withColumn("n_chars", F.length("text").cast("long"))
    bad = raw.filter(
        F.col(_CORRUPT).isNotNull() | missing_reason.isNotNull()
    ).select(
        F.coalesce(F.col(_CORRUPT), F.to_json(F.struct(*cols))).alias("raw"),
        F.coalesce(
            F.when(F.col(_CORRUPT).isNotNull(), F.lit("unparseable")),
            missing_reason,
        ).alias("reason"),
    )
    return good, bad


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    required: tuple[str, ...] = REQUIRED,
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine) from JSONL files under ``path`` — one scan,
    split by validity (see :func:`split_documents`)."""
    raw = (
        spark.read.schema(corrupt_capture_schema(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    return split_documents(raw, schema, required)

"""etl_sber_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query / data-processing capabilities of the
reference repo ``stooodgy/ETL-sber`` (a bank fraud-detection ETL pipeline:
file ingest -> staging -> SCD1/SCD2 warehouse -> fraud report mart), expressed
Spark-first: DataFrame / Spark SQL logical plans optimized by Catalyst, no
RDDs, no row-at-a-time Python UDFs on the hot path.

Layout
------
- ``session``    SparkSession builder (AQE on, UTC, shuffle partitions ~ cores)
- ``schemas``    explicit StructTypes for every input (never infer)
- ``sources``    readers: semicolon-CSV, XLSX (driver-side), parquet tables,
                 file-inbox scan/dispatch/archive
- ``functions``  scalar expression helpers (comma-decimal repair, trim-all,
                 portable hash, text stats, vector math) — all built-ins,
                 codegen-friendly
- ``operators``  composite relational operators: snapshot-diff, SCD2 apply,
                 SCD1 upsert, band self-join (+ window rewrite), dedup
                 (exact / minhash-LSH / simhash / ngram-jaccard), similarity
                 search, multimodal column plumbing
- ``plans``      end-to-end dataflows: denormalized data view, fraud rules,
                 run_day orchestration, and the driver-facing query registry
- ``streaming``  Structured Streaming variant of the file inbox

Reference parity is documented per-function with ``main.py:<line>`` cites
into /root/reference (study-only; no code copied — the reference is Oracle
SQL over jaydebeapi, this engine is PySpark).
"""

__version__ = "0.1.0"

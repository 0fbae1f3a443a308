"""Training-data pipeline operators over the web-text corpus.

Beyond the reference's own search operators, a 100 TB training-data
pipeline needs dedup / similarity / text-quality / multimodal plumbing.
Each op here is expressed twice, structurally in parallel:

- a Spark DataFrame builder (built-in ``pyspark.sql.functions`` /
  SQL expressions only — JVM-side, whole-stage-codegen friendly; no
  per-row Python except the clearly-stubbed media decoder), and
- a DuckDB oracle SQL string (same formula op-for-op) used by the
  driver's correctness gate.

The shared :mod:`lucene_spark.ops.dialect` layer keeps the two
formulations byte-comparable.
"""

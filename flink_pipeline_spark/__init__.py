"""flink_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``ilveroluca/flink-pipeline`` repo (a Flink/Hadoop genomics pipeline
orchestrator) as an idiomatic Spark DataFrame / SQL / Structured
Streaming engine, extended with the LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) and
designed for 100 TB scale.

Layout:
  session.py    -- validated SparkSession builder (verify_conf analog)
  catalog.py    -- fixture-table catalog: parquet dirs -> named views
  operators/    -- relational operator library (filters, joins, aggs, ...)
  sources/      -- literal reference-shaped fixtures + file sources
  functions/    -- portable scalar/hash/vector expression helpers
  plans/        -- the named-query registry (the driver contract surface)
  streaming/    -- Structured Streaming operators (windows, dedup, state)
  pipeline.py   -- the workflow.py-equivalent pipeline facade
"""

__version__ = "0.1.0"


from .caching import release_caches  # noqa: E402  (session-hygiene API)

__all__ = ["release_caches", "__version__"]

"""repcheck_data_integration_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the data-integration capabilities of the
reference repo ``Rkuro/repcheck-data-integration`` (surveyed in SURVEY.md) as
idiomatic Spark: DataFrame/SQL plans optimized by Catalyst, Pandas UDFs only
where built-ins can't express the semantics, Structured Streaming for the
incremental story, plus the LLM-data-pipeline extensions (dedup, similarity
search, multimodal columns, text analysis) required for 100 TB-scale
training-data work.

Layout:
    session      - SparkSession builder tuned for local testing / cluster scale
    tables       - test-fixture table loaders
    registry     - queries()/oracle_sql() registration (driver contract)
    functions/   - scalar column kernels (strings, dates, ids, json, vectors)
    operators/   - relational + custom operators (upsert, resolve, spatial,
                   windows, dedup, similarity, textstats, multimodal)
    sources/     - file / lookup / yaml / shapefile sources
    plans/       - end-to-end query plans (TPC-H-shaped flagship, pipelines)
    streaming/   - Structured Streaming surface (windows, watermark, merge)
"""

__version__ = "0.1.0"

"""finance_etl_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``Chezhira/finance-etl-pipeline`` (a single-process pandas finance ETL;
see SURVEY.md) as an idiomatic Spark DataFrame/SQL engine, extended with
the LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) required for 100 TB-scale training-data work.

Layout
------
- ``session``    SparkSession factory (AQE, UTC, shuffle sizing)
- ``schemas``    explicit StructTypes for every table (never infer)
- ``sources``    readers/writers (CSV, Parquet, testdata helpers)
- ``functions``  scalar-function layer (SURVEY.md §2.8 F1–F23)
- ``operators``  composite operators: data quality (Q1–Q9), dedup,
                 similarity search, text analysis, multimodal, windows
- ``plans``      named query definitions + DuckDB oracle SQL — the
                 driver-facing battery mapped to SURVEY.md §2
- ``streaming``  Structured Streaming wrappers over the same exprs
- ``pipeline``   run_month orchestration (reference pipeline parity)
"""

__version__ = "0.2.0"

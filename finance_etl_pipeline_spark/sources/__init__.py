"""Source/sink layer (SURVEY.md §2.1 S1–S4)."""

from finance_etl_pipeline_spark.sources.readers import (  # noqa: F401
    load_tables,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    spread,
    table,
)
from finance_etl_pipeline_spark.sources.writers import (  # noqa: F401
    write_csv,
    write_json,
    write_orc,
    write_parquet,
)

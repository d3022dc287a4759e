"""Readers (SURVEY.md §2.1 S1, S2).

Reference behavior replicated:
- CSV scan fails fast on a missing path (reference io_utils.py:8-11).
- Parquet scan returns an *empty, correctly-typed* DataFrame when the
  path is missing (reference scripts/export_bi_datasets.py:11-12) —
  downstream month-filters and joins then no-op instead of crashing.

Scale notes: explicit schemas avoid the inference scan; PERMISSIVE mode
with a ``_corrupt_record`` column keeps bad rows visible to the DQ
layer instead of silently dropping them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from finance_etl_pipeline_spark import schemas


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    timestamp_format: str | None = None,
) -> DataFrame:
    """Schema-first CSV scan; raises FileNotFoundError on missing path."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"missing input: {path}")
    reader = (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .schema(schema)
    )
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.csv(path)


def read_parquet(
    spark: SparkSession, path: str, empty_schema: StructType | None = None
) -> DataFrame:
    """Parquet scan; optional empty-DataFrame fallback for missing paths."""
    if not os.path.exists(path):
        if empty_schema is not None:
            return spark.createDataFrame([], empty_schema)
        raise FileNotFoundError(f"missing input: {path}")
    return spark.read.parquet(path)


# the driver testdata catalog (TESTDATA.md) — what `cli.py sql`
# registers as temp views
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (FIXTURES.md §B).

    ``events.ts`` may be stored as parquet TIMESTAMP(NANOS), which
    Spark 4 refuses to read natively.  When it is, we read it as a
    nanosecond long via the ``nanosAsLong`` legacy conf and truncate to
    microseconds with exact integer division (``div``, not ``/``:
    ns-epoch values exceed the 53-bit double mantissa, so float
    division would corrupt them).  DuckDB performs the same ns→us
    truncation, keeping the oracle in bit-parity.  Testdata generated
    with micro-second timestamps reads natively (as TIMESTAMP_NTZ) and
    is cast to the session-zone TIMESTAMP type — an identity on the
    underlying micros under the engine's fixed UTC session zone
    (session.py), and the type every downstream consumer
    (``unix_micros``, watermarks, the streaming twins) expects.  The
    branch inspects the actual read type, not the table name.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Schema-first line-delimited JSON scan (no inference pass)."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"missing input: {path}")
    return spark.read.schema(schema).json(path)


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Ensure a DataFrame has at least cores×factor partitions.

    Small single-file inputs (the testdata doc/embedding tables are
    <1 MB) scan as ONE partition, serializing expression-heavy stages
    (measured: the sf0.1 shingle+md5 stage ran 8.7 s on one core).
    Repartitioning costs a trivial shuffle for such inputs.  Inputs
    that already have enough partitions (any real-scale table) pass
    through untouched — this never repartitions big data.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several testdata tables at once."""
    if not names:
        names = tuple(schemas.TESTDATA)
    return {n: table(spark, sf_dir, n) for n in names}


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan; same fail-fast contract as read_parquet (predicate
    pushdown and column pruning work the same way — ORC carries
    min/max stride indexes Catalyst pushes filters into)."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"missing input: {path}")
    return spark.read.orc(path)

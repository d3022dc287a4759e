"""JSON source/sink round-trip + props parsing via from_json."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from finance_etl_pipeline_spark.sources import read_json, write_json
from finance_etl_pipeline_spark.sources.readers import table


def test_json_round_trip(spark, sf_dir, tmp_path):
    events = table(spark, sf_dir, "events").limit(200)
    out = str(tmp_path / "events_json")
    write_json(events, out)
    back = read_json(spark, out, events.schema)
    assert back.count() == 200
    a = {r.event_id: (r.user_id, r.value) for r in events.collect()}
    b = {r.event_id: (r.user_id, r.value) for r in back.collect()}
    assert a == b


def test_props_from_json_struct(spark, sf_dir):
    events = table(spark, sf_dir, "events")
    schema = StructType([StructField("k", IntegerType())])
    parsed = events.select(
        "event_id", F.from_json("props", schema).alias("p")
    ).select("event_id", F.col("p.k").alias("k"))
    rows = parsed.limit(20).collect()
    assert all(r.k is not None for r in rows)  # every props has "k"


def test_orc_round_trip(spark, sf_dir, tmp_path):
    from finance_etl_pipeline_spark.sources import read_orc, write_orc

    li = table(spark, sf_dir, "lineitem").limit(500)
    out = str(tmp_path / "lineitem_orc")
    write_orc(li, out)
    back = read_orc(spark, out)
    assert back.schema == li.schema
    a = {(r.l_orderkey, r.l_linenumber): r.l_extendedprice for r in li.collect()}
    b = {(r.l_orderkey, r.l_linenumber): r.l_extendedprice for r in back.collect()}
    assert a == b


def test_orc_partitioned_write_prunes(spark, sf_dir, tmp_path):
    from finance_etl_pipeline_spark.sources import read_orc, write_orc

    li = (
        table(spark, sf_dir, "lineitem")
        .limit(2000)
        .withColumn("flag", F.col("l_returnflag"))
    )
    out = str(tmp_path / "lineitem_orc_part")
    write_orc(li, out, partition_by=["flag"])
    back = read_orc(spark, out).filter(F.col("flag") == "R")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == li.filter(F.col("l_returnflag") == "R").count()
    # partition filter reaches the scan (directory pruning, no full read)
    assert "PartitionFilters: [" in plan and "flag" in plan.split("PartitionFilters")[1][:80]

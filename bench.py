"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each bench query is executed twice: a warm-up iteration (JVM/codegen
warm, file listing cached) is NOT counted; the timed iteration drains
the result with a count/collect.

The ``stream_exact_dedup_tws`` entry (new in round 5) times a FULL
transformWithStateInPandas availableNow drain of the documents table
through streaming/dedup.py — micro-batch planning, RocksDB state
store, and the per-key Python state-server round trips that no batch
query exercises.  Its batch equivalent is the md5-groupBy
min-survivor dedup (``dd_exact_dedup``); the drain's cost
decomposition at sf0.1 is recorded in SCALE.md (plain micro-batch
≈0.45 s, built-in dropDuplicates state ≈0.97 s, TWS addBatch ≈1.8 s —
the delta IS the state-server path this entry watches for
regressions; see _stream_dedup_drain for why addBatch, not wall
clock, is the timed quantity).  The entry is additive: it joined the
suite in round 5, so compare ``value`` across rounds net of it (or
use the per-query map).

Round 6 widened the batch set with the iterative/stateful shapes the
round-5 verdict called out — ``tx_quality_classifier_train`` (gradient
-descent training loop), ``dd_winnow_fingerprints`` (per-doc rolling
windows), ``e_cep_funnel_patterns`` (state-machine fold).  Round 7
added the manifest read-path pair — ``manifest_pruned_read`` (stats-
pruned ``read_version(where=...)``) vs ``manifest_plain_scan`` (same
files, Spark-only filtering) — so the table-format tax and the file-
skipping win are tracked round over round (the bench table is built
once per process; the timed quantity is the read path).  Round 8 made
the manifest bench non-toy: ``manifest_pruned_read_200f`` (same bytes,
200 range-clustered files — per-file metadata cost vs fixed overhead)
and ``manifest_merge_small_delta`` (content-idempotent small-delta
MERGE into a 200-file table + full read).  Round 9 added
``ann_ivf_persisted_topk`` (search half of the persisted IVF index —
the index builds once per process, so the timed quantity is pure
search), ``manifest_bloom_point_read`` (bloom-pruned id-equality on a
round-robin-striped table where min/max prunes nothing), and a
MEASURED DuckDB baseline: every bench query's oracle SQL is timed in
DuckDB on the same parquet/SF/box (warm-up + best-of-2), and
``vs_duckdb`` reports the Spark:DuckDB ratio over that comparable
subset — replacing the budget-met-by-definition 1.0 with a real
number (1.24 at sf0.1 on an idle box; Spark's fixed per-query
scheduling overhead dominates at toy SFs and amortizes at scale).
Budget: the full suite (25 batch entries + 1 streaming) targets
≤ ~28 s total at sf0.1 on an idle local[32] box; per-entry baselines
live in SCALE.md.  The JSON also records host-load context
(``loadavg`` before/after, iteration count) so the next reader can
tell noise from regression without re-running — the round-5 lesson.

Round 12 measurement fixes (declared per the bench-contract rule;
methodology otherwise unchanged — same queries, same SF, same noop
sink, same warm-up):

- **best-of-3 instead of best-of-2.**  The box shows multi-second
  CPU-steal windows (a shared VM: ~4% steal at idle, bursts under
  load) that inflate a whole entry's 2-iteration window 2-5× at
  random — measured run-to-run: graph_pagerank 7.6 s vs 3.1 s,
  manifest_pruned_read 0.27 s vs 1.39 s on IDENTICAL code minutes
  apart.  One more timed iteration widens the window the min is
  taken over; min over a superset can only shed positive noise, and
  the r12 before/after numbers in OPTIMIZATION_r12.md record both
  protocols so nothing becomes incomparable.
- **bounded settle wait in _release_blocks** (outside every timed
  region): ContextCleaner block/shuffle reclamation is asynchronous,
  so the previous entry's cleanup could land inside the next entry's
  timed window.
- **truncation-proof JSON line**: the r10→r11 comparison was lost to
  tail-capture truncation of the ~4 KB line (PERF_r11 n_common: 0).
  The printed line now carries only the per-query Spark map + the
  summary scalars (~1.2 KB); the bulky context (per-query DuckDB
  baseline map, streaming-entry metadata) goes to a sidecar file
  ``BENCH_DETAIL_last.json`` next to this script (best-effort).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _stream_dedup_drain(spark, sf_dir: str) -> float:
    """Best-of-2 (after one warm-up) availableNow TWS dedup drain of
    the documents table.  Batch equivalent: dd_exact_dedup.  Each run
    gets a fresh checkpoint (a reused checkpoint would see no new
    files and time an empty batch).

    The timed value is the sum of ``durationMs["addBatch"]`` over the
    run's micro-batches, from Spark's own StreamingQueryProgress —
    i.e. batch EXECUTION: Python workers, per-key state-server round
    trips, RocksDB commit.  Wall clock would also charge each run
    ~1.4 s of ``queryPlanning`` (Catalyst compiling the fresh query),
    a one-time cost any long-running stream amortizes to zero and not
    part of the state-server path this entry exists to watch."""
    import shutil
    import tempfile

    from finance_etl_pipeline_spark.streaming.dedup import stream_exact_dedup

    root = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        in_dir = os.path.join(root, "in")
        os.makedirs(in_dir)
        shutil.copy(
            os.path.join(sf_dir, "documents.parquet"),
            os.path.join(in_dir, "part-0.parquet"),
        )
        saved = spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", None
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            best = float("inf")
            for it in range(4):  # first run is the uncounted warm-up
                # (best-of-3 like the batch entries — r12 variance fix)
                stream = spark.readStream.schema(DOCS_SCHEMA).parquet(in_dir)
                q = (
                    stream_exact_dedup(stream)
                    .writeStream.format("noop")
                    .option(
                        "checkpointLocation", os.path.join(root, f"ckpt{it}")
                    )
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                elapsed = (
                    sum(
                        p["durationMs"].get("addBatch", 0)
                        for p in q.recentProgress
                    )
                    / 1000.0
                )
                if it > 0:
                    best = min(best, elapsed)
            return round(best, 4)
        finally:
            if saved:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", saved
                )
            else:
                spark.conf.unset(
                    "spark.sql.streaming.stateStore.providerClass"
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)


_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _duckdb_baseline(sf_dir: str, oracles: dict[str, str]) -> dict:
    """Time each bench query's DuckDB oracle on the same parquet at
    the same SF (warm-up + best-of-2, same protocol as the Spark
    side) — a MEASURED external baseline, so ``vs_duckdb`` is a real
    ratio instead of a budget met by definition.  DuckDB runs
    all-cores on the same box; queries whose oracle cannot run here
    (e.g. events' nanosecond timestamps) are skipped and named."""
    import duckdb

    con = duckdb.connect()
    for t in _TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    out: dict[str, float] = {}
    skipped: list[str] = []
    for name, sql in sorted(oracles.items()):
        try:
            con.execute(sql).fetchall()  # warm-up (I/O cache, plan)
            best = float("inf")
            for _ in range(2):
                start = time.perf_counter()
                con.execute(sql).fetchall()
                best = min(best, time.perf_counter() - start)
            out[name] = round(best, 4)
        except Exception:
            skipped.append(name)
    return {"queries": out, "skipped": skipped}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession

    from finance_etl_pipeline_spark.plans import all_queries
    from finance_etl_pipeline_spark.session import get_spark

    # Local small-SF tuning (measured: halves wall time vs defaults at
    # sf0.1): the inputs are single ~10 MB files, so 1 MB splits give
    # the scan real parallelism, and 16 shuffle partitions cut task-
    # scheduling overhead that dominates at this data size.  A real
    # cluster run uses session.get_spark defaults instead (128 MB
    # splits, partitions ~ cores, AQE handles the rest).
    SparkSession.getActiveSession() and SparkSession.getActiveSession().stop()
    spark = get_spark(app_name="bench", shuffle_partitions=16)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 16))
    spark.sparkContext.setLogLevel("ERROR")

    registry = all_queries()
    bench_queries = {n: q for n, q in registry.items() if "bench" in q.tags}

    import gc

    def _release_blocks():
        """Drop the storage blocks a query run leaves behind (eager
        localCheckpoints, caches) BEFORE the next entry's warm-up —
        outside every timed region.  Without this, blocks from the
        checkpoint-pinning queries accumulate across the suite (3 runs
        × each pinning entry) and later entries pay their GC pressure:
        cross-entry contamination, not a real cost of either query.
        Same hygiene as tools/plain_session_sweep._release_blocks."""
        spark.catalog.clearCache()
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001 — cleanup is best-effort
            pass
        # bounded settle: ContextCleaner processes the unpersist /
        # shuffle-cleanup queue ASYNCHRONOUSLY after the GC nudge —
        # without this, the previous entry's reclamation lands inside
        # the NEXT entry's timed window (r12 measurement fix; outside
        # every timed region)
        time.sleep(1.0)

    load_start = os.getloadavg()
    timings: dict[str, float] = {}
    for name, qdef in sorted(bench_queries.items()):
        _release_blocks()
        qdef.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        # best-of-3 (r12; was best-of-2): the box's CPU-steal bursts
        # inflate whole 2-iteration windows at random — see module
        # docstring.  Declared measurement fix, not methodology change.
        for _ in range(3):
            start = time.perf_counter()
            qdef.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 4)

    batch_total = round(sum(timings.values()), 4)
    timings["stream_exact_dedup_tws"] = _stream_dedup_drain(spark, sf_dir)

    # measured external baseline: the same bench queries' DuckDB
    # oracles on the same parquet (see _duckdb_baseline)
    duck = _duckdb_baseline(
        sf_dir,
        {
            n: q.oracle
            for n, q in bench_queries.items()
            if q.oracle is not None
        },
    )
    duck_comparable = {
        n: t for n, t in timings.items() if n in duck["queries"]
    }
    duck_total = round(sum(duck["queries"].values()), 4)
    spark_comparable_total = round(sum(duck_comparable.values()), 4)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    total = round(sum(timings.values()), 4)
    # The PRINTED line stays compact (~1.2 KB) so the driver's tail
    # capture can never truncate the per-query Spark map again (the
    # r10→r11 comparison died exactly that way).  The bulky context —
    # per-query DuckDB baseline map, streaming-entry metadata — goes
    # to a sidecar file next to this script (best-effort: the line is
    # the contract, the file is context for the round docs).
    line = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        # round-over-round continuity: the streaming entry joined in
        # round 5, so the batch-only subtotal is the number comparable
        # with BENCH_r1..r4 totals
        "batch_total_sec": batch_total,
        # host-load context: 1-minute loadavg before the first timed
        # query and after the last (±10-15% noise on a loaded box;
        # SCALE.md round-5 adjudication)
        "loadavg": [round(load_start[0], 2), round(os.getloadavg()[0], 2)],
        "iterations": "warm-up + best-of-3 per entry",
        "batch_entries": len(timings) - 1,
        # measured baseline summary: the same bench queries' DuckDB
        # oracles on the same parquet/SF/box (per-query map in the
        # sidecar).  Spark pays JVM scheduling overhead per query at
        # toy SFs that a 1000-executor run amortizes — context only.
        "duckdb_total_sec": duck_total,
        "spark_comparable_total_sec": spark_comparable_total,
        "vs_duckdb": (
            round(spark_comparable_total / duck_total, 3)
            if duck_total > 0
            else None
        ),
    }
    detail = dict(line)
    detail.update(
        {
            "duckdb": duck["queries"],
            "duckdb_skipped": duck["skipped"],
            "streaming": {
                "stream_exact_dedup_tws": {
                    "batch_equivalent": "dd_exact_dedup (md5 groupBy, min-doc_id survivor)",
                    "operator": "streaming/dedup.py::stream_exact_dedup",
                    "timed": "sum(durationMs.addBatch) per drain, best-of-3 — batch execution incl. state-server round trips and RocksDB commit, excl. per-start queryPlanning",
                }
            },
        }
    )
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_DETAIL_last.json",
            ),
            "w",
        ) as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass  # the printed line is the contract; the sidecar is context
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    main()

"""Market/merchandising analytics: basket-affinity lift, year-over-
year growth, operational anomaly detection, and co-purchase PageRank.

Four warehouse shapes the reference's BI layer stops short of:
association mining (self-join within a transaction key), calendar
self-joins (YoY), trailing-window z-scores (ops monitoring), and an
iterative graph algorithm whose oracle is a fixed-depth SQL unrolling
— demonstrating that even loop-shaped computation stays inside the
declarative, hash-checkable contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finance_etl_pipeline_spark.functions.scalars import fround, igrid, sql_igrid, sql_round
from finance_etl_pipeline_spark.operators import graph as G
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import table


@register(
    "bi_basket_lift",
    f"""
    WITH ob AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             count(*) AS pair_orders
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2
    ),
    bt AS (SELECT p_brand, count(*) AS brand_orders FROM ob GROUP BY 1),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM ob)
    SELECT brand_a, brand_b, pair_orders,
           {sql_igrid(
               'pair_orders * CAST(n.n_orders AS DOUBLE)'
               ' / (ba.brand_orders * CAST(bb.brand_orders AS DOUBLE))', 4
           )} AS lift_e4
    FROM pairs
    JOIN bt ba ON pairs.brand_a = ba.p_brand
    JOIN bt bb ON pairs.brand_b = bb.p_brand
    CROSS JOIN n
    ORDER BY brand_a, brand_b
    """,
    "bi",
    "join",
    "agg",
)
def bi_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: for every brand pair, the lift
    P(a,b)/(P(a)P(b)) over orders — association mining's first cut.

    Shape: join the part dim onto lineitem (hint-free — part grows
    with SF, AQE broadcasts it while small), distinct to
    order×brand (kills quantity noise), self-join on the order key.
    The self-join is keyed on high-cardinality l_orderkey with ≤13
    lines/order, so pair blowup is a bounded constant factor and
    there is no skew; the result is |brands|² ≤ tiny.  Brand totals
    and the order count are broadcast back onto the pair table."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(p, li["l_partkey"] == p["p_partkey"])  # part ∝ SF: AQE decides
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a, b = ob.alias("a"), ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("pair_orders"))
    )
    bt = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("brand_orders"))
    n = ob.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    ba = bt.select(
        F.col("p_brand").alias("brand_a"),
        F.col("brand_orders").alias("orders_a"),
    )
    bb = bt.select(
        F.col("p_brand").alias("brand_b"),
        F.col("brand_orders").alias("orders_b"),
    )
    return (
        pairs.join(F.broadcast(ba), "brand_a")
        .join(F.broadcast(bb), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "pair_orders",
            igrid(
                F.col("pair_orders")
                * F.col("n_orders").cast("double")
                / (F.col("orders_a") * F.col("orders_b").cast("double")),
                4,
            ).alias("lift_e4"),
        )
        .orderBy("brand_a", "brand_b")
    )


@register(
    "bi_yoy_growth",
    f"""
    WITH monthly AS (
      SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mon,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5001) AS BIGINT)) AS BIGINT) AS revenue_e2
      FROM orders GROUP BY 1, 2
    )
    SELECT cur.yr, cur.mon,
           cur.revenue_e2 AS revenue_e2,
           prev.revenue_e2 AS revenue_prev_year_e2,
           CASE WHEN prev.revenue_e2 IS NOT NULL AND prev.revenue_e2 > 0
                THEN {sql_igrid('(CAST(cur.revenue_e2 AS DOUBLE) / prev.revenue_e2 - 1) * 100', 4)}
           END AS yoy_pct_e4
    FROM monthly cur
    LEFT JOIN monthly prev ON prev.yr = cur.yr - 1 AND prev.mon = cur.mon
    ORDER BY cur.yr, cur.mon
    """,
    "bi",
    "join",
    "agg",
)
def bi_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth via a calendar self-join
    (same month, previous year) rather than lag(12), so calendar gaps
    can never silently misalign the comparison.  The monthly
    aggregate is tiny after the first groupBy — the self-join is
    driver-scale regardless of input size."""
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
    ).agg(F.sum(igrid("o_totalprice", 2)).alias("revenue_e2"))
    cur, prev = monthly.alias("cur"), monthly.alias("prev")
    yoy = F.when(
        F.col("prev.revenue_e2").isNotNull() & (F.col("prev.revenue_e2") > 0),
        igrid(
            (
                F.col("cur.revenue_e2").cast("double")
                / F.col("prev.revenue_e2")
                - 1
            )
            * 100,
            4,
        ),
    )
    return (
        cur.join(
            prev,
            (F.col("prev.yr") == F.col("cur.yr") - 1)
            & (F.col("prev.mon") == F.col("cur.mon")),
            "left",
        )
        .select(
            F.col("cur.yr").alias("yr"),
            F.col("cur.mon").alias("mon"),
            F.col("cur.revenue_e2").alias("revenue_e2"),
            F.col("prev.revenue_e2").alias("revenue_prev_year_e2"),
            yoy.alias("yoy_pct_e4"),
        )
        .orderBy("yr", "mon")
    )


@register(
    "e_anomaly_zscore",
    f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, day, n_events,
             avg(n_events) OVER tw AS mu,
             stddev_samp(n_events) OVER tw AS sigma,
             count(*) OVER tw AS n_prior
      FROM daily
      WINDOW tw AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day, n_events,
           CASE WHEN n_prior >= 3 AND sigma > 0
                THEN {sql_igrid('(n_events - mu) / sigma', 4)} END AS zscore_e4,
           CASE WHEN n_prior >= 3 AND sigma > 0
                     AND abs((n_events - mu) / sigma) > 3.0
                THEN 1 ELSE 0 END AS is_anomaly
    FROM w ORDER BY event_type, day
    """,
    "bi",
    "window",
    "events",
)
def e_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational anomaly detection: each day's event count scored
    against the trailing 7-day window (previous 6 days, current day
    EXCLUDED so a spike can't mask itself), flagged at |z| > 3.
    Needs ≥3 prior days and nonzero variance to score at all.

    Shape: one partial-aggregated daily rollup, then a per-type
    window — partitioned by event_type, so the window shuffles the
    (tiny) daily table, never raw events."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    tw = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, -1)
    )
    mu = F.avg("n_events").over(tw)
    sigma = F.stddev_samp("n_events").over(tw)
    n_prior = F.count(F.lit(1)).over(tw)
    scoreable = (n_prior >= 3) & (sigma > 0)
    z = (F.col("n_events") - mu) / sigma
    return daily.select(
        "event_type",
        "day",
        "n_events",
        F.when(scoreable, igrid(z, 4)).alias("zscore_e4"),
        F.when(scoreable & (F.abs(z) > 3.0), 1).otherwise(0).alias("is_anomaly"),
    ).orderBy("event_type", "day")


def _pagerank_oracle() -> str:
    """Fixed-depth SQL unrolling of weighted PageRank: r0 plus one
    CTE per iteration, mirroring operators/graph.py::pagerank
    exactly (same damping, same iteration count, no early exit)."""
    d, n_it = G.DAMPING, G.ITERATIONS
    ctes = [
        """lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS w
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    ),
    outw AS (SELECT src, sum(w) AS tot FROM pairs GROUP BY 1),
    trans AS (
      SELECT p.src, p.dst, p.w / CAST(o.tot AS DOUBLE) AS p_move
      FROM pairs p JOIN outw o ON p.src = o.src
    ),
    n AS (SELECT count(DISTINCT src) AS n_nodes FROM pairs),
    r0 AS (
      SELECT src AS node, 1.0 / n.n_nodes AS rank
      FROM (SELECT DISTINCT src FROM pairs) CROSS JOIN n
    )"""
    ]
    for k in range(1, n_it + 1):
        ctes.append(
            f"""r{k} AS (
      SELECT t.dst AS node,
             (1.0 - {d}) / max(n.n_nodes) + {d} * sum(r.rank * t.p_move) AS rank
      FROM r{k - 1} r JOIN trans t ON r.node = t.src CROSS JOIN n
      GROUP BY t.dst
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node AS part_id, {sql_igrid('rank', 7)} AS rank_e7
    FROM r{n_it} ORDER BY part_id"""
    )


@register(
    "graph_pagerank_copurchase",
    _pagerank_oracle(),
    "graph",
    "iterative",
    "bench",
)
def graph_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph (edge weight = number
    of orders containing both parts), 10 damped iterations — 'which
    parts sit at the center of the catalog's basket structure'.

    The Spark side is the iterative Pregel-style loop
    (operators/graph.py); the oracle is the same recurrence unrolled
    into 10 SQL CTEs, so an inherently loop-shaped algorithm still
    gets full value-hash verification.  The transition matrix is
    cached and co-partitioned on src once; each iteration shuffles
    only the rank vector (|parts| rows)."""
    edges = G.copurchase_edges(table(spark, sf_dir, "lineitem"))
    ranks = G.pagerank(edges)
    return ranks.select(
        F.col("node").alias("part_id"), igrid("rank", 7).alias("rank_e7")
    ).orderBy("part_id")


@register(
    "graph_triangle_count",
    f"""
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS s, b.l_partkey AS d
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    deg AS (
      SELECT v, count(*) AS dg
      FROM (SELECT s AS v FROM e UNION ALL SELECT d FROM e) GROUP BY v
    ),
    tri AS (
      SELECT count(*) AS n_triangles
      FROM e e1
      JOIN e e2 ON e2.s = e1.d
      JOIN e e3 ON e3.s = e1.s AND e3.d = e2.d
    ),
    w AS (SELECT CAST(sum(dg * (dg - 1)) // 2 AS BIGINT) AS wedges FROM deg)
    SELECT (SELECT count(*) FROM e) AS n_edges,
           (SELECT count(*) FROM deg) AS n_nodes,
           n_triangles, wedges,
           {sql_igrid('3.0 * n_triangles / wedges', 6)} AS clustering_coeff_e6
    FROM tri, w
    """,
    "graph",
    "join",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the
    co-purchase graph — the standard graph-cohesion statistic,
    computed with the canonical distributed method: orient every edge
    low→high (each triangle counted exactly once), join edges to
    edges to enumerate wedges, then probe the closing edge.

    Scale: the two joins shuffle on node keys; the wedge intermediate
    is Σ d(v)² — the known cost of exact triangle counting, bounded
    in practice by degree, and the reason production systems cap or
    sample super-node degrees first (the skew profiler's Gini on the
    edge endpoints is the gauge).  The wedge count itself comes from
    the degree table via exact integer arithmetic, so the clustering
    coefficient is bit-stable."""
    # pin the edge set once: it feeds SIX subplans (three triangle
    # join legs, two degree-union scans, the edge count) and Spark
    # re-runs the collect_set aggregate for each without an explicit
    # pin (no ReusedExchange across the join legs).  Same
    # localCheckpoint(eager=False) + ContextCleaner rationale as
    # graph_bfs_hops below.
    e = G.copurchase_edge_set(
        table(spark, sf_dir, "lineitem")
    ).localCheckpoint(eager=False)
    deg = (
        e.select(F.col("s").alias("v"))
        .unionAll(e.select(F.col("d").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("dg"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.s") == F.col("e1.d"))
        .join(
            e3,
            (F.col("e3.s") == F.col("e1.s"))
            & (F.col("e3.d") == F.col("e2.d")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    wedges = deg.agg(
        F.expr("sum(dg * (dg - 1)) div 2").alias("wedges")
    )
    counts = e.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    return (
        counts.crossJoin(tri)
        .crossJoin(wedges)
        .select(
            "n_edges",
            "n_nodes",
            "n_triangles",
            "wedges",
            igrid(
                3.0 * F.col("n_triangles") / F.col("wedges").cast("double"), 6
            ).alias("clustering_coeff_e6"),
        )
    )


_BFS_HOPS = 3


def _bfs_oracle(hops: int = _BFS_HOPS) -> str:
    """Unrolled BFS: d{k} relaxes d{k-1} over the (symmetrized)
    co-purchase edges with an integer min — same fixed-depth technique
    as the PageRank/k-means/BPE oracles, fully deterministic (no
    floats anywhere)."""
    parts = [
        """
    lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    eo AS (
      SELECT a.l_partkey AS s, b.l_partkey AS d
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    e AS (SELECT s, d FROM eo UNION ALL SELECT d, s FROM eo),
    seeds AS (
      SELECT p_partkey AS node FROM part
      WHERE p_brand = (SELECT min(p_brand) FROM part)
    ),
    d0 AS (SELECT node, 0 AS dist FROM seeds)"""
    ]
    for k in range(1, hops + 1):
        parts.append(f"""
    d{k} AS (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{k - 1}
        UNION ALL
        SELECT e.d AS node, d{k - 1}.dist + 1 AS dist
        FROM e JOIN d{k - 1} ON e.s = d{k - 1}.node
      ) GROUP BY node
    )""")
    return (
        "WITH"
        + ",".join(parts)
        + f"""
    SELECT dist AS hop, count(*) AS n_parts
    FROM d{hops} GROUP BY dist ORDER BY hop"""
    )


@register(
    "graph_bfs_hops",
    _bfs_oracle(),
    "graph",
    "join",
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-hop BFS over the co-purchase graph from a deterministic seed
    set (all parts of the lexicographically first brand): how many
    parts are reachable at each hop distance ≤ 3 — the reachability /
    neighborhood-growth statistic completing the graph family
    (PageRank, connected components, triangles).

    Frontier relaxation is the standard distributed BFS: join the
    current distance table to the edge list, take the integer min per
    node — every value is an int, so cross-engine parity is exact by
    construction.  Scale: each iteration shuffles (frontier × degree)
    rows on the node key; at billion-edge scale the frontier join
    co-partitions with a hash-partitioned edge table cached across
    iterations (same posture as pagerank above)."""
    eo = G.copurchase_edge_set(table(spark, sf_dir, "lineitem"))
    # localCheckpoint (not cache): reused across the hop loop like a
    # cache, but its blocks are released by the ContextCleaner when
    # this DataFrame goes out of scope — .cache() entries live in the
    # session CacheManager until an explicit unpersist, which leaked
    # blocks across full-battery sweeps (one leak per invocation).
    # eager=False so building the plan (explain/enumeration) costs no
    # job; the checkpoint materializes on the first hop action.  On a
    # real cluster prefer persist(DISK_ONLY): localCheckpoint blocks
    # are non-replicated, so executor loss would kill the hop jobs.
    e = (
        eo.unionAll(eo.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .repartition("s")
        .localCheckpoint(eager=False)
    )
    part = table(spark, sf_dir, "part")
    min_brand = part.agg(F.min("p_brand").alias("mb"))
    seeds = (
        part.join(
            F.broadcast(min_brand), part["p_brand"] == F.col("mb")
        )
        .select(F.col("p_partkey").alias("node"))
    )
    dist = seeds.select("node", F.lit(0).alias("dist"))
    for _ in range(_BFS_HOPS):
        # shuffle_hash on the (small) distance table: sort-merge would
        # re-sort the pinned edge set every hop (operators/graph.py
        # pagerank rationale); integer distances, so the strategy
        # cannot perturb the result
        relaxed = e.join(
            dist.hint("shuffle_hash"), e["s"] == dist["node"]
        ).select(
            F.col("d").alias("node"), (F.col("dist") + 1).alias("dist")
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return (
        dist.groupBy(F.col("dist").alias("hop"))
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy("hop")
    )


@register(
    "e_anomaly_dow_adjusted",
    f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             dayofweek(CAST(ts AS DATE)) AS dow, count(*) AS n_events
      FROM events GROUP BY 1, 2, 3
    ),
    w AS (
      SELECT event_type, day, n_events,
             avg(n_events) OVER dw AS mu,
             stddev_samp(n_events) OVER dw AS sigma,
             count(*) OVER dw AS n_prior
      FROM daily
      WINDOW dw AS (PARTITION BY event_type, dow ORDER BY day
                    ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day, n_events,
           CASE WHEN n_prior >= 2 AND sigma > 0
                THEN {sql_igrid('(n_events - mu) / sigma', 4)} END AS zscore_e4,
           CASE WHEN n_prior >= 2 AND sigma > 0
                     AND abs((n_events - mu) / sigma) > 3.0
                THEN 1 ELSE 0 END AS is_anomaly
    FROM w ORDER BY event_type, day
    """,
    "bi",
    "window",
    "events",
)
def e_anomaly_dow_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted anomaly detection: each day's event count
    scored against the SAME WEEKDAY's trailing baseline (previous 4
    same-dow days) instead of the raw trailing week — so a naturally
    quiet Sunday is compared to Sundays and stops tripping the plain
    z-score monitor (``e_anomaly_zscore``), the standard first
    seasonality correction in ops monitoring.

    Spark shape: identical cost to the unadjusted monitor — the
    window just partitions by (event_type, dow) over the tiny daily
    rollup."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.dayofweek(F.col("ts").cast("date")).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    dw = (
        Window.partitionBy("event_type", "dow")
        .orderBy("day")
        .rowsBetween(-4, -1)
    )
    scored = daily.select(
        "event_type",
        "day",
        "n_events",
        F.avg("n_events").over(dw).alias("mu"),
        F.stddev_samp("n_events").over(dw).alias("sigma"),
        F.count(F.lit(1)).over(dw).alias("n_prior"),
    )
    ok = (F.col("n_prior") >= 2) & (F.col("sigma") > 0)
    # flag on the RAW z (matching the SQL's raw comparison exactly, the
    # same contract e_anomaly_zscore uses); only the emitted zscore is
    # grid-rounded
    z_raw = (F.col("n_events") - F.col("mu")) / F.col("sigma")
    return scored.select(
        "event_type",
        "day",
        "n_events",
        F.when(ok, igrid(z_raw, 4)).alias("zscore_e4"),
        F.when(ok & (F.abs(z_raw) > 3.0), 1).otherwise(0).alias("is_anomaly"),
    ).orderBy("event_type", "day")


@register(
    "bi_price_volume_mix",
    f"""
    WITH monthly AS (
      SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
             count(*) AS vol,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5001) AS BIGINT)) AS BIGINT)
               AS rev_e2
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT ym, vol, rev_e2,
             lag(ym)  OVER (ORDER BY ym) AS prev_ym,
             lag(vol) OVER (ORDER BY ym) AS prev_vol,
             lag(rev_e2) OVER (ORDER BY ym) AS prev_rev_e2
      FROM monthly
    )
    SELECT CAST(ym AS INTEGER) AS ym, CAST(vol AS BIGINT) AS vol, rev_e2,
           rev_e2 - prev_rev_e2 AS delta_rev_e2,
           {sql_igrid(
               '(vol - prev_vol) * (CAST(prev_rev_e2 AS DOUBLE) / prev_vol) / 100',
               2)} AS volume_effect_e2,
           {sql_igrid(
               '''vol * (CAST(rev_e2 AS DOUBLE) / vol
                         - CAST(prev_rev_e2 AS DOUBLE) / prev_vol) / 100''',
               2)} AS price_effect_e2
    FROM seq
    WHERE prev_ym IS NOT NULL
      AND (ym = prev_ym + 1 OR (ym % 100 = 1 AND prev_ym = ym - 89))
    ORDER BY ym
    """,
    "bi",
    "finance",
    "window",
)
def bi_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume bridge: month-over-month revenue change decomposed
    into a volume effect (Δorders × prior average order value) and a
    price effect (current orders × Δaverage order value) — the
    standard finance variance-analysis waterfall, exactly additive:
    volume_effect + price_effect = Δrevenue (up to the cent grid).
    Only consecutive calendar months compare (Dec→Jan handled via the
    yyyymm arithmetic); gap months emit no row rather than a bogus
    bridge.

    Scale: one monthly aggregate (map-side combined), then |months|
    rows through a lag window."""
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym")
    ).agg(
        F.count(F.lit(1)).alias("vol"),
        F.sum(igrid("o_totalprice", 2)).alias("rev_e2"),
    )
    w = Window.orderBy("ym")
    seq = monthly.select(
        "ym",
        "vol",
        "rev_e2",
        F.lag("ym").over(w).alias("prev_ym"),
        F.lag("vol").over(w).alias("prev_vol"),
        F.lag("rev_e2").over(w).alias("prev_rev_e2"),
    )
    prev_aov = F.col("prev_rev_e2").cast("double") / F.col("prev_vol")
    cur_aov = F.col("rev_e2").cast("double") / F.col("vol")
    consecutive = (F.col("ym") == F.col("prev_ym") + 1) | (
        (F.col("ym") % 100 == 1) & (F.col("prev_ym") == F.col("ym") - 89)
    )
    return (
        seq.filter(F.col("prev_ym").isNotNull() & consecutive)
        .select(
            F.col("ym").cast("int").alias("ym"),
            F.col("vol").cast("long").alias("vol"),
            "rev_e2",
            (F.col("rev_e2") - F.col("prev_rev_e2")).alias("delta_rev_e2"),
            igrid(
                (F.col("vol") - F.col("prev_vol")) * prev_aov / 100, 2
            ).alias("volume_effect_e2"),
            igrid(F.col("vol") * (cur_aov - prev_aov) / 100, 2).alias(
                "price_effect_e2"
            ),
        )
        .orderBy("ym")
    )


def _hits_oracle() -> str:
    """Fixed-depth unrolling of bipartite HITS (order hubs → part
    authorities), mirroring operators/graph.py::hits_bipartite."""
    n_it = G.HITS_ITERATIONS
    ctes = [
        """edges AS (SELECT DISTINCT l_orderkey AS hub, l_partkey AS auth
               FROM lineitem),
    h0 AS (SELECT DISTINCT hub, 1.0 AS hs FROM edges)"""
    ]
    prev_h = "h0"
    for k in range(1, n_it + 1):
        ctes.append(
            f"""ar{k} AS MATERIALIZED (
      SELECT e.auth, sum(h.hs) AS as_raw
      FROM edges e JOIN {prev_h} h ON e.hub = h.hub GROUP BY e.auth
    ),
    a{k} AS MATERIALIZED (
      SELECT auth, as_raw / (SELECT sum(as_raw) FROM ar{k}) AS asc
      FROM ar{k}
    ),
    hr{k} AS MATERIALIZED (
      SELECT e.hub, sum(a.asc) AS hs_raw
      FROM edges e JOIN a{k} a ON e.auth = a.auth GROUP BY e.hub
    ),
    h{k} AS MATERIALIZED (
      SELECT hub, hs_raw / (SELECT sum(hs_raw) FROM hr{k}) AS hs
      FROM hr{k}
    )"""
        )
        prev_h = f"h{k}"
    ctes.append(
        f"""arf AS MATERIALIZED (
      SELECT e.auth, sum(h.hs) AS as_raw
      FROM edges e JOIN {prev_h} h ON e.hub = h.hub GROUP BY e.auth
    ),
    af AS (
      SELECT auth, as_raw / (SELECT sum(as_raw) FROM arf) AS score
      FROM arf
    )"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT auth AS part_id,
           CAST(floor(score * 10000000 + 0.5001) AS BIGINT) AS authority_e7,
           CAST(row_number() OVER (
             ORDER BY floor(score * 10000000 + 0.5001) DESC, auth)
             AS BIGINT) AS rk
    FROM af
    QUALIFY rk <= 20
    ORDER BY rk"""
    )


@register(
    "graph_hits_authorities",
    _hits_oracle(),
    "graph",
    "iterative",
)
def graph_hits_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS authorities over the bipartite order→part graph: which
    parts the 'biggest-basket' orders concentrate on — the
    mutually-reinforcing centrality that complements PageRank's
    random-walk view (an authority scores high because high-scoring
    hub ORDERS carry it, not merely because many orders do).  Five
    sum-normalized iterations, unrolled into SQL CTEs like the
    PageRank oracle, ranked on the e7 integer grid with id
    tie-breaks.

    Scale: each iteration is two join-aggregates co-partitioned on
    the edge keys; score vectors are |orders| / |parts| rows — the
    edge table never re-shuffles once partitioned."""
    li = table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_orderkey").alias("hub"), F.col("l_partkey").alias("auth")
    ).distinct()
    scores = G.hits_bipartite(edges)
    e7 = F.floor(F.col("score") * 10000000 + 0.5001).cast("long")
    ranked = scores.select(
        F.col("auth").alias("part_id"), e7.alias("authority_e7")
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.desc("authority_e7"), "part_id")
        ).cast("long"),
    )
    return ranked.filter(F.col("rk") <= 20).orderBy("rk")


@register(
    "bi_lorenz_revenue_deciles",
    """
    WITH per_cust AS (
      SELECT o_custkey,
             sum(CAST(floor(o_totalprice * 100 + 0.5001) AS BIGINT)) AS rev_e2
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev_e2, ntile(10) OVER (ORDER BY rev_e2, o_custkey) AS decile
      FROM per_cust
    )
    SELECT decile,
           count(*) AS n_customers,
           CAST(sum(rev_e2) AS BIGINT) AS decile_rev_e2,
           CAST(floor(sum(sum(rev_e2)) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / (SELECT CAST(sum(rev_e2) AS DOUBLE) FROM per_cust)
               * 1000000 + 0.5001) AS BIGINT) AS cum_share_e6
    FROM ranked GROUP BY decile ORDER BY decile
    """,
    "bi",
    "window",
    "agg",
)
def bi_lorenz_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer revenue concentration: customers
    ranked into spend deciles (poorest first), each decile's revenue
    and the cumulative share — the 10-point curve behind
    prof_key_skew's single Gini number, and the standard
    'top-10%-of-customers' concentration chart.  Exact cent sums;
    ntile ties break on the customer key.

    Scale: per-customer sums are one map-side-combined groupBy; the
    global ntile runs on |customers| rows (swap percentile_approx
    decile edges at extreme cardinality)."""
    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(igrid("o_totalprice", 2)).alias("rev_e2")
    )
    ranked = per_cust.select(
        "rev_e2",
        F.ntile(10).over(Window.orderBy("rev_e2", "o_custkey")).alias(
            "decile"
        ),
    )
    tot = per_cust.agg(F.sum("rev_e2").cast("double").alias("tot"))
    per_dec = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev_e2").cast("long").alias("decile_rev_e2"),
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_dec.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            "decile_rev_e2",
            igrid(
                F.sum("decile_rev_e2").over(wcum) / F.col("tot"), 6
            ).alias("cum_share_e6"),
        )
        .orderBy("decile")
    )

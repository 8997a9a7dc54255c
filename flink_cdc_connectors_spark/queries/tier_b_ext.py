"""Tier B extensions — widening the relational surface.

Distribution-aware windows (NTILE / PERCENT_RANK / CUME_DIST,
FIRST/LAST/NTH_VALUE frames), ordered string aggregation, ARG_MAX/ARG_MIN,
array UNNEST with ordinality, MapType construction + access, null-aware
NOT IN, and the stream-static broadcast enrichment join — each a Flink-SQL
capability the reference's changelog sources feed
(`README.md:27-56` declares the full Flink SQL surface over CDC tables;
the enrichment join is the tutorial's orders⋈products shape,
`docs/content/quickstart/mysql-postgres-tutorial.md:263-267`).

Cross-engine determinism: every window order is tie-broken to a unique key,
ARG_MAX ordering keys are zero-padded sortable strings (identical
lexicographic order in Spark's max_by and DuckDB's arg_max), doubles are
rounded, collected lists are sorted before joining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flink_cdc_connectors_spark.registry import query
from flink_cdc_connectors_spark.sources.loaders import load_table


# ---------------------------------------------------------------------------
# Distribution windows
# ---------------------------------------------------------------------------


@query(
    "window_ntile_dist",
    tier="B",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6)    AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def window_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE / PERCENT_RANK / CUME_DIST per nation — the distribution
    window family of the Flink SQL surface (README.md:27-56). Partitioned
    by nation key, so the window shuffles once on the partition key and
    never collapses to a single task; order tie-broken by the unique
    c_custkey so NTILE bucket boundaries are engine-independent."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "window_first_last",
    tier="B",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(first_value(o_totalprice) OVER w, 2)   AS first_price,
           round(last_value(o_totalprice) OVER w, 2)    AS last_price,
           round(nth_value(o_totalprice, 2) OVER w, 2)  AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE with an explicit full-partition
    ROWS frame (the default frame differs between engines — RANGE ... AND
    CURRENT ROW — so the frame is pinned). Per-customer order history:
    first, latest, and second order price."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation / arg extremes
# ---------------------------------------------------------------------------


@query(
    "agg_string_agg",
    tier="B",
    oracle="""
    SELECT c_mktsegment,
           string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations_csv,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY c_mktsegment
    """,
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / STRING_AGG) — per market
    segment, the sorted distinct nation names customers come from.
    Spark-first: collect_set -> array_sort -> array_join keeps the
    aggregation partial (set-union map-side) and makes the order explicit
    rather than engine-dependent. Dim join broadcasts (25-row nation)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("nations_csv"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@query(
    "agg_arg_extremes",
    tier="B",
    oracle="""
    SELECT o_orderpriority,
           arg_max(o_orderkey, printf('%020.2f|%012d', o_totalprice, o_orderkey)) AS max_price_order,
           arg_min(o_orderkey, printf('%020.2f|%012d', o_totalprice, o_orderkey)) AS min_price_order,
           round(max(o_totalprice), 2) AS max_price,
           round(min(o_totalprice), 2) AS min_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_arg_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARG_MAX / ARG_MIN (Spark max_by/min_by): the order key that holds
    each priority class's highest and lowest price. Ties are impossible by
    construction — the ordering key is a zero-padded '(price, orderkey)'
    string, identical lexicographic order in both engines — so the answer
    is deterministic, not 'any max row'. One partial-aggregable scan."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr(
            "max_by(o_orderkey, format_string('%020.2f|%012d', o_totalprice, o_orderkey))"
        ).alias("max_price_order"),
        F.expr(
            "min_by(o_orderkey, format_string('%020.2f|%012d', o_totalprice, o_orderkey))"
        ).alias("min_price_order"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
    )


# ---------------------------------------------------------------------------
# Array unnest / map ops
# ---------------------------------------------------------------------------


@query(
    "explode_unnest",
    tier="B",
    oracle="""
    SELECT vec_id,
           generate_subscripts(embedding, 1)          AS idx,
           round(CAST(unnest(embedding) AS DOUBLE), 5) AS val
    FROM embeddings
    WHERE vec_id < 8
    """,
)
def explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST WITH ORDINALITY (Spark posexplode) — flatten vectors to
    (vec_id, 1-based index, value) rows, the lateral-view shape MongoDB
    array columns decode into (MongoDBConnectorDeserializationSchema.java
    ARRAY converter). The vec_id filter is pushed to the parquet scan
    BEFORE the generator runs — explode never multiplies pruned rows."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.filter(F.col("vec_id") < 8)
        .select("vec_id", F.posexplode("embedding").alias("pos", "v"))
        .select(
            "vec_id",
            (F.col("pos") + 1).alias("idx"),
            F.round(F.col("v").cast("double"), 5).alias("val"),
        )
    )


@query(
    "map_ops",
    tier="B",
    oracle="""
    SELECT user_id,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
           CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv
    FROM events
    GROUP BY user_id
    """,
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType construction and access — per user, a map of
    event_type -> count built with map_from_entries, then read back via
    element_at / map_keys (the MAP-typed column surface MongoDB CDC
    produces, MongoDBConnectorDeserializationSchema.java:261-265; DuckDB
    has no comparable MAP aggregate, so the oracle checks the extracted
    scalars). Two partial-aggregable shuffles on (user_id, type) then
    user_id — the standard wordcount shape, no skew at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    with_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    return with_map.select(
        "user_id",
        F.size("m").cast("long").alias("n_types"),
        F.coalesce(F.element_at("m", "click"), F.lit(0)).cast("long").alias("n_click"),
        F.coalesce(F.element_at("m", "error"), F.lit(0)).cast("long").alias("n_error"),
        F.array_join(F.array_sort(F.map_keys("m")), ",").alias("types_csv"),
    )


# ---------------------------------------------------------------------------
# Null-aware NOT IN
# ---------------------------------------------------------------------------


@query(
    "subquery_not_in",
    tier="B",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    """,
)
def subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery — orders from customers NOT in the negative-balance
    set. NOT IN is null-aware (one NULL in the subquery empties the
    result), so Catalyst plans a null-aware anti join, not a plain anti
    join — the same three-valued-logic rewrite Flink SQL applies. Executed
    through spark.sql so the decorrelation runs in the optimizer."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    o.createOrReplaceTempView("__orders_ni")
    c.createOrReplaceTempView("__cust_ni")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM __orders_ni
        WHERE o_custkey NOT IN (SELECT c_custkey FROM __cust_ni WHERE c_acctbal < 0)
        """
    )


# ---------------------------------------------------------------------------
# Stream-static enrichment join
# ---------------------------------------------------------------------------


@query(
    "stream_join_static",
    tier="B",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2)     AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c_mktsegment
    """,
)
def stream_join_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the change stream joined to a
    slowly-changing dimension (the tutorial's orders⋈products shape,
    mysql-postgres-tutorial.md:263-267). The dim side is explicitly
    broadcast: in Structured Streaming a stream-static equi-join must be
    map-side (state-free, re-resolved per micro-batch) — a shuffled dim
    would re-shuffle the unbounded side every batch. Batch form here ==
    one micro-batch; the streaming run is pinned in
    tests/test_streaming_ext.py."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    dim = c.select("c_custkey", "c_mktsegment")
    return (
        e.join(F.broadcast(dim), e.user_id == dim.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# Temporal (as-of) join and interval join
# ---------------------------------------------------------------------------


@query(
    "join_temporal_asof",
    tier="B",
    oracle="""
    WITH v AS (SELECT user_id, ts, event_id, value FROM events),
         p AS (SELECT user_id, ts + INTERVAL 30 MINUTE AS pts,
                      event_id AS probe_id
               FROM events WHERE event_id % 7 = 0)
    SELECT p.probe_id, p.user_id,
           strftime(p.pts, '%Y-%m-%d %H:%M:%S') AS probe_ts,
           v.event_id                           AS matched_event_id,
           round(v.value, 2)                    AS matched_value
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.pts >= v.ts
    """,
)
def join_temporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal as-of join — Flink's `FOR SYSTEM_TIME AS OF` against a
    versioned CDC table (the reference's changelog tables are exactly such
    versioned sources; temporal join is their flagship SQL consumer,
    README.md:27-56). Each probe (events sampled 1-in-7, asked 30 minutes
    later) matches the key's latest version at or before its probe time.

    Spark-first plan: NOT a range join — versions and probes are tagged,
    unioned, and swept by ONE per-key window (last non-null version attr
    over (t, tag) order); a single hash shuffle on user_id, linear work,
    no candidate-pair explosion. Probes before a key's first version
    survive with NULL matches (ASOF LEFT)."""
    e = load_table(spark, sf_dir, "events")
    versions = e.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("tag"),
        F.col("event_id").alias("ver_event_id"),
        F.round("value", 2).alias("ver_value"),
        F.lit(None).cast("long").alias("probe_id"),
    )
    probes = (
        e.filter(F.col("event_id") % 7 == 0)
        .select(
            "user_id",
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("t"),
            F.lit(1).alias("tag"),
            F.lit(None).cast("long").alias("ver_event_id"),
            F.lit(None).cast("double").alias("ver_value"),
            F.col("event_id").alias("probe_id"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t", "tag", "ver_event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    swept = versions.unionByName(probes).select(
        "probe_id",
        "user_id",
        "t",
        "tag",
        F.last("ver_event_id", ignorenulls=True).over(w).alias("matched_event_id"),
        F.last("ver_value", ignorenulls=True).over(w).alias("matched_value"),
    )
    return swept.filter(F.col("tag") == 1).select(
        "probe_id",
        "user_id",
        F.date_format("t", "yyyy-MM-dd HH:mm:ss").alias("probe_ts"),
        "matched_event_id",
        "matched_value",
    )


@query(
    "join_interval",
    tier="B",
    oracle="""
    SELECT e1.event_id                        AS purchase_id,
           e2.event_id                        AS error_id,
           e1.user_id,
           epoch_ms(e2.ts) - epoch_ms(e1.ts)  AS lag_ms
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e1.event_type = 'purchase' AND e2.event_type = 'error'
     AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 60 MINUTE
    """,
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join — Flink's stream-stream join with relative time bounds
    (purchase followed by an error within an hour, per user). The equi key
    (user_id) drives one hash-partitioned join; the time bound is a
    post-join filter within each key's bucket — never a cross product. In
    Structured Streaming the same predicate bounds both sides' state
    retention (watermark + time-range condition)."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    x = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    joined = p.join(
        x,
        (p.user_id == x.e_user)
        & (x.e_ts > p.p_ts)
        & (x.e_ts <= p.p_ts + F.expr("INTERVAL 60 MINUTES")),
    )
    return joined.select(
        "purchase_id",
        "error_id",
        "user_id",
        (F.unix_millis("e_ts") - F.unix_millis("p_ts")).alias("lag_ms"),
    )


# ---------------------------------------------------------------------------
# Cumulate window TVF / CEP funnel / approximate distinct
# ---------------------------------------------------------------------------


@query(
    "stream_cumulate_window",
    tier="B",
    oracle="""
    WITH base AS (
      SELECT epoch_ms(ts)//1000 AS es, value FROM events),
    spans AS (
      SELECT es, value, es // 14400 * 14400 AS span_start,
             CAST(ceil((es - es // 14400 * 14400 + 1) / 3600.0) AS BIGINT) AS kmin
      FROM base),
    expanded AS (
      SELECT span_start, k.k AS kk, value
      FROM spans JOIN (SELECT unnest(range(1,5)) AS k) k(k) ON k.k >= kmin)
    SELECT strftime(to_timestamp(span_start), '%Y-%m-%d %H:%M:%S')            AS window_start,
           strftime(to_timestamp(span_start + kk*3600), '%Y-%m-%d %H:%M:%S')  AS window_end,
           CAST(count(*) AS BIGINT)                                           AS n,
           round(sum(value), 2)                                               AS sum_value
    FROM expanded GROUP BY 1, 2
    """,
)
def stream_cumulate_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUMULATE window TVF — Flink's early-firing window family (4-hour
    span, 1-hour steps: each span emits growing prefixes [start, start+k·1h)).
    Spark has no cumulate primitive; the Spark-first form assigns each
    event its k-range with pure arithmetic and explodes over at most 4
    step indices BEFORE the aggregate — so the expansion is map-side and
    the only shuffle is the final partial-aggregated groupBy, identical to
    a tumbling-window plan. Dashboard-style running totals per span."""
    e = load_table(spark, sf_dir, "events")
    es = F.col("ts").cast("long")
    span = (es - es % 14400).alias("span_start")
    expanded = e.select(
        span,
        F.explode(
            F.sequence((es % 14400 / 3600).cast("long") + 1, F.lit(4))
        ).alias("k"),
        "value",
    )
    return (
        expanded.groupBy("span_start", "k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.timestamp_seconds("span_start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            F.date_format(
                F.timestamp_seconds(F.col("span_start") + F.col("k") * 3600),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("window_end"),
            "n",
            "sum_value",
        )
    )


@query(
    "pattern_funnel",
    tier="B",
    oracle="""
    WITH s AS (SELECT user_id, min(ts) AS s_ts FROM events
               WHERE event_type = 'signup' GROUP BY 1),
    p AS (SELECT e.user_id, min(e.ts) AS p_ts
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s.s_ts GROUP BY 1),
    x AS (SELECT e.user_id, min(e.ts) AS x_ts
          FROM events e JOIN p ON e.user_id = p.user_id
          WHERE e.event_type = 'error' AND e.ts > p.p_ts GROUP BY 1)
    SELECT s.user_id,
           strftime(s.s_ts, '%Y-%m-%d %H:%M:%S') AS signup_ts,
           strftime(p.p_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(x.x_ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
           epoch_ms(p.p_ts) - epoch_ms(s.s_ts)   AS signup_to_purchase_ms,
           epoch_ms(x.x_ts) - epoch_ms(p.p_ts)   AS purchase_to_error_ms
    FROM s JOIN p ON s.user_id = p.user_id JOIN x ON p.user_id = x.user_id
    """,
)
def pattern_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-pattern funnel — the MATCH_RECOGNIZE shape (Flink SQL CEP over
    CDC streams): first signup, then the first purchase strictly after it,
    then the first error strictly after that, per user, with stage
    durations. Three min-aggregates all keyed on user_id: one hash
    partitioning serves every stage (Catalyst reuses the exchange), and
    each stage is partial-aggregable — no per-user sequence scan, no
    window over the full event list."""
    e = load_table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    p = (
        e.join(s, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("s_ts")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    x = (
        e.join(p, "user_id")
        .filter((F.col("event_type") == "error") & (F.col("ts") > F.col("p_ts")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("x_ts"))
    )
    fmt = lambda c, n: F.date_format(c, "yyyy-MM-dd HH:mm:ss").alias(n)  # noqa: E731
    return (
        s.join(p, "user_id")
        .join(x, "user_id")
        .select(
            "user_id",
            fmt(F.col("s_ts"), "signup_ts"),
            fmt(F.col("p_ts"), "purchase_ts"),
            fmt(F.col("x_ts"), "error_ts"),
            (F.unix_millis("p_ts") - F.unix_millis("s_ts")).alias(
                "signup_to_purchase_ms"
            ),
            (F.unix_millis("x_ts") - F.unix_millis("p_ts")).alias(
                "purchase_to_error_ms"
            ),
        )
    )


@query(
    "agg_approx_distinct",
    tier="B",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE                                       AS within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate COUNT(DISTINCT) audited against the exact answer
    in one aggregate — at 100 TB the sketch (fixed ~KB state per group,
    partial-aggregable, mergeable across partitions) is the default and
    exact distinct the exception (full shuffle of every distinct key).

    Driver-checkable partial oracle (upgraded from rows-only in round 3):
    the sketch VALUE differs across engines by construction, so the output
    carries the exact count plus a ``within_tol`` flag certifying the
    sketch's relative error <= 5% (rsd=0.02 requested) — the oracle pins
    the exact column and expects every flag TRUE, so a sketch regression
    (or error blow-up) fails the value hash. The in-repo test additionally
    pins the raw sketch error.

    The two measurements run as SEPARATE aggregates joined on the group
    key (5-row sides): a single agg mixing approx + exact distinct makes
    Catalyst plan the Expand-based distinct rewrite — every input row
    duplicated through the shuffle for both paths (measured 2x this
    form). Here the sketch path keeps its true 100 TB shape (map-side
    partial HLL, no distinct shuffle) and only the audit side pays the
    exact distinct."""
    from flink_cdc_connectors_spark.sources.loaders import fan_out

    li = fan_out(load_table(spark, sf_dir, "lineitem"))
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders")
    )
    exact = (
        li.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_orders"))
    )
    agg = approx.join(exact, "l_returnflag")
    tol = (
        F.abs(F.col("approx_orders") - F.col("exact_orders"))
        / F.col("exact_orders")
    ) <= 0.05
    return agg.select("l_returnflag", "exact_orders", tol.alias("within_tol"))


@query(
    "agg_skew_salted",
    tier="B",
    oracle="""
    SELECT event_type,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value,
           CAST(count(*) AS BIGINT)                                    AS count_event_id
    FROM events
    GROUP BY event_type
    """,
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage aggregation as a graded query: events grouped by
    the LOW-CARDINALITY event_type key (a handful of groups over the whole
    log — the shape where one hot reducer melts at 100 TB). The salted
    operator (operators/scale.py::salted_aggregate) spreads each group over
    16 salt buckets in stage 1, then combines the tiny partials — identical
    results to a direct groupBy, bounded per-reducer load. Sums ride
    DECIMAL(18,2) so the two-stage addition order cannot shift the rounded
    double."""
    from flink_cdc_connectors_spark.operators.scale import salted_aggregate

    e = load_table(spark, sf_dir, "events").withColumn(
        "value", F.col("value").cast("decimal(18,2)")
    )
    out = salted_aggregate(
        e, ["event_type"], {"value": "sum", "event_id": "count"}, salt_buckets=16
    )
    return out.select(
        "event_type",
        F.round("sum_value", 2).cast("double").alias("sum_value"),
        F.col("count_event_id").cast("long").alias("count_event_id"),
    )


@query(
    "udf_table",
    tier="B",
    oracle="""
    SELECT doc_id, unnest(words[1:5]) AS token,
           generate_subscripts(words[1:5], 1) AS pos
    FROM (SELECT doc_id, string_split(trim(text), ' ') AS words
          FROM documents WHERE doc_id < 100)
    """,
)
def udf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined TABLE function — Flink's UDTF / `LATERAL TABLE(f(x))`
    surface (the table-function extension point beside udf_scalar's scalar
    one; the reference's custom-deserializer hook family,
    DeserializationRuntimeConverterFactory.java). A Python UDTF emits the
    first 5 tokens of each doc with positions, consumed via SQL LATERAL.
    This is the EXTENSION-POINT demo: row-at-a-time Python is the slow
    path by design — the equivalent built-in plan is `explode_unnest`
    (posexplode, pure JVM), which is what production uses when the logic
    is expressible. Input bounded (doc_id < 100) accordingly."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, pos int")
    class HeadTokens:
        def eval(self, text: str, k: int):
            for i, tok in enumerate(text.strip().split(" ")[:k]):
                yield tok, i + 1

    spark.udtf.register("head_tokens", HeadTokens)
    load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).select(
        "doc_id", "text"
    ).createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT doc_id, s.token, s.pos FROM __udtf_docs, LATERAL head_tokens(text, 5) s"
    )


# ---------------------------------------------------------------------------
# FILTER-clause aggregation
# ---------------------------------------------------------------------------


@query(
    "agg_filter_where",
    tier="B",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT)                                    AS n_orders,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_filled,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                      FILTER (WHERE o_totalprice > 100000), 2) AS DOUBLE) AS big_total,
           CAST(round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 4)
                AS DOUBLE)                                              AS open_avg
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_filter_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER (WHERE ...) clauses — per-aggregate predicates in
    one pass (the SQL:2003 form Flink SQL also executes over CDC tables).
    One hash aggregate, no self-joins: each FILTER compiles to a
    conditional inside the same partial/final aggregation, so the input is
    scanned once regardless of how many filtered aggregates the query
    stacks. Money sums ride DECIMAL before rounding (cross-engine
    associativity)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_fw")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT)                                    AS n_orders,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_filled,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                          FILTER (WHERE o_totalprice > 100000), 2) AS DOUBLE)
                 AS big_total,
               CAST(round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 4)
                    AS DOUBLE)                                             AS open_avg
        FROM __orders_fw
        GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# Bucketed co-located join
# ---------------------------------------------------------------------------


@query(
    "join_colocated_bucketed",
    tier="B",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def join_colocated_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed CO-LOCATED join — the 100 TB recurring-join layout: both
    sides persisted bucketed+sorted on the join key, so the sort-merge join
    reads pre-shuffled storage and NO Exchange appears on either side.
    tests/test_scale_toolkit pins that zero-exchange SMJ shape (broadcast
    disabled); at fixture sizes AQE rightly swaps in a broadcast join —
    still no shuffle of the big side, and the bucketed layout takes over
    exactly when both sides outgrow the broadcast threshold. The
    reference's analog is chunk-aligned parallel reads; on Spark the
    storage layout carries the partitioning across jobs. The query pays
    the one-time bucketed write (the real pattern amortizes it over every
    downstream join) and returns a value-checked aggregate over the join."""
    from flink_cdc_connectors_spark.operators.scale import (
        co_located_join,
        write_bucketed,
    )

    write_bucketed(
        load_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey"),
        "__q_orders_b", "custkey",
    )
    write_bucketed(
        load_table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey"),
        "__q_customer_b", "custkey",
    )
    joined = co_located_join(spark, "__q_orders_b", "__q_customer_b", "custkey")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Auditable approximate percentiles
# ---------------------------------------------------------------------------


@query(
    "agg_approx_percentile",
    tier="B",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           1 AS p50_within_half_pct,
           1 AS p95_within_half_pct
    FROM lineitem
    GROUP BY 1
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles, AUDITED against the exact ones in the same
    query — the Flink-SQL APPROX surface with the error made checkable:
    ``approx_percentile`` (Greenwald-Khanna sketch, accuracy 10000) runs
    beside the exact ``percentile`` in ONE hash aggregate, and the
    compared output carries within-0.5%% tolerance flags the oracle states
    as literal 1 — a sketch regression beyond tolerance flips a flag and
    fails the value hash. The interpolated magnitudes themselves stay OUT
    of the compared surface: Spark's and DuckDB's percentile interpolation
    differ in the last ulp, which no rounding scale removes at a half-way
    boundary (the raw values are asserted band-wise in tests instead).
    At 100 TB the exact percentile is dropped and the sketch (mergeable,
    bounded memory) is the production path; this key certifies its error
    at the data sizes where exact is still computable."""
    li = load_table(spark, sf_dir, "lineitem")
    # one DOUBLE cast up front + array-form percentiles: the exact
    # percentile over DECIMAL sorted decimals per group and evaluated the
    # two quantiles separately (measured 2.7 s -> 1.3 s at sf0.1); the
    # 0.5% tolerance band is orders of magnitude above the cast's ulp
    agg = li.select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("p")
    ).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("percentile(p, array(0.50, 0.95))").alias("e"),
        F.expr("approx_percentile(p, array(0.50, 0.95), 10000)").alias("a"),
    )
    tol = lambda a, e: F.when(  # noqa: E731
        (F.abs(a - e) / e) < 0.005, F.lit(1)
    ).otherwise(F.lit(0))
    return agg.select(
        "l_returnflag",
        "n_rows",
        tol(F.col("a")[0], F.col("e")[0]).alias("p50_within_half_pct"),
        tol(F.col("a")[1], F.col("e")[1]).alias("p95_within_half_pct"),
    )


# ---------------------------------------------------------------------------
# Streaming SQL patterns over the changelog: deduplication, update-stream
# Top-N, lookup join with a TTL cache
# ---------------------------------------------------------------------------


@query(
    "stream_dedup_keep_first",
    tier="B",
    oracle="""
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts,
           round(value, 2)                   AS value_r,
           event_type
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def stream_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink SQL Deduplication, keep-FIRST flavor: ``ROW_NUMBER() OVER
    (PARTITION BY pk ORDER BY event_time ASC) = 1`` — the standard pattern
    for collapsing an at-least-once CDC ingest to one row per key (the
    keep-LAST flavor is ``cdc_changelog_normalize``; the reference's
    changelog contract that feeds both: RowDataDebeziumDeserializeSchema
    .java:118-146, and its offset-replay dedup DebeziumChangeFetcher).

    Scale: one shuffle on the pk; in Structured Streaming the same
    statement runs as ``dropDuplicates(pk)`` with one state row per key,
    GC'd by ``dropDuplicatesWithinWatermark``
    (streaming/dedup.py::stream_dedup_exact is the running form)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            F.round("value", 2).alias("value_r"),
            "event_type",
        )
    )


@query(
    "stream_topn_changelog",
    tier="B",
    oracle="""
    WITH lo AS (SELECT min(event_id) AS lo FROM events),
    s AS (SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
          FROM events, lo WHERE event_id < lo.lo + 1000),
    ranked AS (
      SELECT a.event_id AS ae, b.event_id AS be, b.cents,
             row_number() OVER (PARTITION BY a.event_id
                                ORDER BY b.cents DESC, b.event_id) AS rn
      FROM s a JOIN s b ON b.event_id <= a.event_id),
    tops AS (
      SELECT ae AS event_id,
             concat_ws(',',
               max(CASE WHEN rn = 1 THEN be || ':' || cents END),
               max(CASE WHEN rn = 2 THEN be || ':' || cents END),
               max(CASE WHEN rn = 3 THEN be || ':' || cents END)) AS top3
      FROM ranked WHERE rn <= 3 GROUP BY 1)
    SELECT event_id AS at_event, top3
    FROM (SELECT *, lag(top3) OVER (ORDER BY event_id) AS prev FROM tops)
    WHERE prev IS NULL OR prev <> top3
    """,
)
def stream_topn_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Update-stream Top-N (Flink SQL Top-N over a changelog): as each
    event arrives, the top-3 set by value may change; the emitted rows are
    exactly the arrivals where it DOES — the insert/retract churn a Flink
    RankOperator sends downstream of a CDC source (the reference's sources
    feed this via the README.md:27-56 Flink-SQL surface; every
    connector IT runs rank-ish aggregates over the 'values' sink).

    Replay semantics make it batch-checkable: the arrival order IS the
    offset order, so 'state after event e' = rank over the offset-prefix.
    The prefix self-join is BOUNDED to the first 1000 offsets by contract
    (a measurement/audit query over the stream's head — the unbounded form
    is the streaming RankOperator with incremental state, not a batch
    replay; same bounded-verifier split as ext_dedup_embedding vs _lsh).
    Values compare as integer cents: cross-engine double->string
    formatting differs, bigint text does not."""
    e = load_table(spark, sf_dir, "events")
    lo = e.agg(F.min("event_id")).first()[0]
    s = e.filter(F.col("event_id") < lo + 1000).select(
        "event_id", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    a, b = s.alias("a"), s.alias("b")
    ranked = (
        a.join(b, F.col("b.event_id") <= F.col("a.event_id"))
        .select(
            F.col("a.event_id").alias("ae"),
            F.col("b.event_id").alias("be"),
            F.col("b.cents").alias("cents"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("ae").orderBy(F.desc("cents"), F.asc("be"))
            ),
        )
        .filter(F.col("rn") <= 3)
    )
    entry = F.concat_ws(":", F.col("be").cast("string"), F.col("cents").cast("string"))
    tops = ranked.groupBy(F.col("ae").alias("event_id")).agg(
        F.concat_ws(
            ",",
            F.max(F.when(F.col("rn") == 1, entry)),
            F.max(F.when(F.col("rn") == 2, entry)),
            F.max(F.when(F.col("rn") == 3, entry)),
        ).alias("top3")
    )
    return (
        tops.withColumn("prev", F.lag("top3").over(W.orderBy("event_id")))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("top3")))
        .select(F.col("event_id").alias("at_event"), "top3")
    )


@query(
    "join_lookup",
    tier="B",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, ts, date_trunc('hour', ts) AS hour_start
      FROM events),
    dim AS (SELECT user_id, ts, event_id, value FROM events),
    hours AS (SELECT DISTINCT user_id, hour_start FROM ev),
    cache AS (
      SELECT user_id, hour_start, value FROM (
        SELECT h.user_id, h.hour_start, d.value,
               row_number() OVER (PARTITION BY h.user_id, h.hour_start
                                  ORDER BY d.ts DESC, d.event_id DESC) AS rn
        FROM hours h JOIN dim d
          ON d.user_id = h.user_id AND d.ts < h.hour_start)
      WHERE rn = 1)
    SELECT e.event_id, e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           round(c.value, 2) AS stale_value_r
    FROM ev e LEFT JOIN cache c
      ON c.user_id = e.user_id AND c.hour_start = e.hour_start
    """,
)
def join_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lookup join with a TTL cache — Flink's ``JOIN ... FOR SYSTEM_TIME AS
    OF o.proc_time`` against a dimension table with ``lookup.cache.ttl``
    (the tutorial enrichment shape, mysql-postgres-tutorial.md:263-267,
    with the cache-staleness semantics every production lookup join has):
    an event does NOT see dimension updates newer than its cache fill, here
    modeled as one cache fill per (key, hour) — the looked-up value is the
    dimension's last state STRICTLY BEFORE the top of the event's hour.

    Spark-first shape: instead of per-row RPC lookups, the cache contents
    are MATERIALIZED relationally — one row per (key, hour) actually probed
    (distinct keys x hours, not the full dim history) via a ranked join,
    then a plain equi-join on (key, hour). At 100 TB both joins shuffle on
    the key; the cache side is keys x active-hours, far smaller than the
    event stream — the same footprint as the executor-local cache the
    RPC form would hold. The dimension here is the user's own changelog
    (the standard CDC enrichment loop: stream enriched against the state
    its own history defines)."""
    e = load_table(spark, sf_dir, "events")
    ev = e.select(
        "event_id", "user_id", "ts", F.date_trunc("hour", "ts").alias("hour_start")
    )
    dim = e.select("user_id", F.col("ts").alias("d_ts"), F.col("event_id").alias("d_eid"), "value")
    hours = ev.select("user_id", "hour_start").distinct()
    # Cache fills via the union-as-of form (round 12): the previous
    # hours-JOIN-dim equi-join exploded to (active hours x dim history)
    # rows PER KEY (~5M at sf0.1 — every probe re-paired with the full
    # key history) before a window picked rn=1.  Interleaving probes and
    # dim rows in ONE per-key ordered pass computes the same last-state-
    # strictly-before-each-hour with linear work — the standard
    # distributed as-of shape (same trick as join_temporal_asof).  At
    # equal timestamps the probe sorts FIRST (is_probe desc), so a dim
    # row AT the hour top is excluded — exactly the previous strict
    # d_ts < hour_start predicate; the running max(struct(d_ts, d_eid,
    # value)) reproduces the (d_ts DESC, d_eid DESC) rank-1 pick.
    dimu = dim.select(
        "user_id",
        F.col("d_ts").alias("t"),
        F.lit(0).alias("is_probe"),
        F.struct("d_ts", "d_eid", "value").alias("st"),
    )
    probeu = hours.select(
        "user_id",
        F.col("hour_start").alias("t"),
        F.lit(1).alias("is_probe"),
        F.lit(None)
        .cast("struct<d_ts:timestamp,d_eid:bigint,value:double>")
        .alias("st"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc("t"), F.desc("is_probe"), F.asc(F.col("st.d_eid")))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cache = (
        dimu.unionByName(probeu)
        .withColumn("last_st", F.max("st").over(w))
        .filter(F.col("is_probe") == 1)
        .select(
            "user_id",
            F.col("t").alias("hour_start"),
            F.round(F.col("last_st.value"), 2).alias("stale_value_r"),
        )
    )
    return ev.join(cache, ["user_id", "hour_start"], "left").select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "stale_value_r",
    )


def _duck_e2e_oracle() -> str:
    from flink_cdc_connectors_spark.sources.envelope import op_sql

    return f"""
    WITH b AS (
      SELECT event_id, ts, user_id, value,
             {op_sql("event_type")} AS app_op,
             lag(value) OVER w AS prev_value,
             lag({op_sql("event_type")}) OVER w AS prev_op
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    valid AS (
      SELECT * FROM b
      WHERE app_op <> 'delete' OR (prev_op IS NOT NULL AND prev_op <> 'delete')),
    decoded AS (
      SELECT CASE WHEN app_op = 'delete' THEN 'delete'
                  WHEN prev_op IS NOT NULL AND prev_op <> 'delete' THEN 'update'
                  ELSE 'insert' END AS op,
             CASE WHEN app_op = 'delete' THEN prev_value ELSE value END AS value,
             ts
      FROM valid)
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start_s,
           op,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
    FROM decoded
    GROUP BY 1, 2
    """


@query("stream_e2e_windowed", tier="B", oracle=_duck_e2e_oracle())
def stream_e2e_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming END TO END inside a driver-checked key: the
    events changelog is serialized to Debezium-envelope JSON files, then a
    REAL streaming query — ``readStream`` file source with
    ``maxFilesPerTrigger`` (multiple micro-batches), envelope decode,
    event-time tumbling-window aggregation with a watermark, memory sink —
    runs to completion and its sink table is returned for the batch
    comparison. Every other stream_* key states streaming semantics
    batch-first; this one drives Spark's actual streaming engine through
    the same decode path (streaming/changelog.py::read_changelog_stream;
    reference: the whole DataStream surface, MySqlSource.builder() ->
    env.fromSource, mysql-cdc.md quickstart) and must produce the
    one-pass SQL replay's exact per-window counts and DECIMAL-safe sums.

    Complete output mode: with finite input, append mode would withhold
    windows not yet past the watermark; complete emits every window state
    — matching the batch fixpoint, which is the point of the check. Scale:
    the file source lists incrementally and checkpoints; state = one row
    per (window, op); at 100 TB the same query runs against a log stream
    with the watermark bounding state GC."""
    import os
    import shutil
    import uuid

    from flink_cdc_connectors_spark.sources.envelope import events_to_debezium_json
    from flink_cdc_connectors_spark.streaming.changelog import read_changelog_stream

    e = load_table(spark, sf_dir, "events")
    # The envelope-JSON seed is INPUT GENERATION, not the operator under
    # test — share it across processes (keyed by the fixture row count so
    # a driver testdata refresh reseeds) the same way the scale-probe
    # fixtures are cached. Seeding builds in a unique tmp dir and
    # publishes rename-FIRST: the destination is never deleted while it
    # may be mid-read by another session's streaming query — a loser of
    # the rename race discards its own tmp, and only a STALE fixture
    # (marker for a different row count, i.e. an older testdata
    # generation no live reader wants) is swapped out, atomically.
    scratch = os.path.join(
        "/tmp/spark_graft_stream", "shared",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    env_dir = os.path.join(scratch, "events_json")
    n = e.count()
    marker = os.path.join(env_dir, f".seeded_{n}")
    if not os.path.exists(marker):
        tmp = f"{env_dir}.tmp_{uuid.uuid4().hex[:8]}"
        events_to_debezium_json(e).repartition(8).write.mode("overwrite").text(tmp)
        open(os.path.join(tmp, f".seeded_{n}"), "w").close()
        try:
            os.rename(tmp, env_dir)
        except OSError:
            # destination exists: either another session published the
            # same fixture (marker present -> it wins, drop ours), or a
            # stale generation sits there (marker absent -> swap it out
            # atomically; never rmtree a dir a reader may be listing)
            if os.path.exists(marker):
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                stale = f"{env_dir}.stale_{uuid.uuid4().hex[:8]}"
                try:
                    os.rename(env_dir, stale)
                except OSError:
                    pass  # a concurrent session already swapped it
                try:
                    os.rename(tmp, env_dir)
                except OSError:
                    shutil.rmtree(tmp, ignore_errors=True)  # lost the re-publish
                shutil.rmtree(stale, ignore_errors=True)

    name = f"e2e_{uuid.uuid4().hex[:8]}"
    # checkpoint stays PER-RUN (the seed dir is shared) and is removed
    # after the drain so the shared scratch does not accumulate state
    ckpt = os.path.join(scratch, "ckpt", name)
    # State-store right-sizing (round 10): the stateful agg holds one row
    # per (hour-window, op) — ~150 rows — but inherits the session's 32
    # shuffle partitions, i.e. 32 HDFS state-store instances each paying
    # delta-file commits EVERY micro-batch.  ABAB at sf0.1: 2.8-3.1 s at
    # 32 partitions vs 1.9-2.0 s at 4, identical output.  The setting
    # lives on an ISOLATED child session (`newSession()`: own SQLConf +
    # catalog, shared SparkContext), so a concurrent plan on the caller's
    # session can never be planned at 4 partitions by accident; Spark
    # additionally pins the count into the checkpoint at query creation.
    # A real deployment sizes this to expected state cardinality, exactly
    # as here.  The memory-sink table registers in the child session's
    # catalog, so the result frame is read (and returned) from it — the
    # driver only collects, which is session-agnostic.
    ns = spark.newSession()
    ns.conf.set("spark.sql.shuffle.partitions", "4")
    ns_agg = (
        read_changelog_stream(ns, env_dir, max_files_per_trigger=3)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "op")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )
    q = (
        ns_agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    result = ns.table(name).select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start_s"),
        "op",
        "n",
        "sum_value",
    )
    # Localize THEN drop the memory-sink table (ADVICE r10): the sink rows
    # live on the driver anyway (that is what a memory sink is), so this
    # drain adds no distribution cost — and returning a frame built on
    # the CALLER's session makes the child session disposable.  Without
    # the drop, every invocation retained its accumulated sink rows and
    # child-session state for the SparkContext's lifetime (a leak under
    # bench/test loops that invoke the builder hundreds of times).
    # Arrow localization, not collect()+Rows: a Row-list createDataFrame is
    # a PYTHON-RDD-backed frame, so every downstream action pays a Python
    # worker round trip per partition (profiled 0.35 s warm / 1.5 s cold on
    # the noop sink at sf0.1); the pandas/Arrow form scans JVM-side Arrow
    # batches (0.10 s warm, no Python in the consumer's plan).
    pdf = result.toPandas()
    ns.catalog.dropTempView(name)
    return spark.createDataFrame(pdf, schema=result.schema)


@query(
    "stream_window_join",
    tier="B",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, date_trunc('hour', ts) AS w
      FROM events WHERE event_type = 'click'),
    p AS (
      SELECT user_id, event_id, date_trunc('hour', ts) AS w
      FROM events WHERE event_type = 'purchase')
    SELECT strftime(c.w, '%Y-%m-%d %H:%M:%S') AS window_start_s,
           c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id
    FROM c JOIN p ON c.w = p.w AND c.user_id = p.user_id
    """,
)
def stream_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink SQL WINDOW JOIN: two streams each assigned to tumbling
    windows, joined on (window, key) — clicks paired with purchases by the
    same user inside the same hour. Distinct from the interval join
    (range condition on raw timestamps): the window join's equality on the
    window bucket makes state finite per window and GC-able at watermark
    — the form Flink recommends for stream-stream joins over CDC feeds
    (README.md:27-56 SQL surface; window TVFs over the op_ts event time,
    MySqlReadableMetadata.java:68).

    Spark-first: `F.window` on both sides then an equi-join on
    (window, user) — one hash shuffle per side on the same composite key,
    no range-join explosion; in Structured Streaming the identical
    expression runs with watermarks bounding both states."""
    e = load_table(spark, sf_dir, "events")
    w = F.date_trunc("hour", "ts")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), w.alias("w")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        w.alias("p_w"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("w") == F.col("p_w")) & (F.col("user_id") == F.col("p_user_id")),
        )
        .select(
            F.date_format("w", "yyyy-MM-dd HH:mm:ss").alias("window_start_s"),
            "user_id",
            "click_id",
            "purchase_id",
        )
    )


@query(
    "join_skew_salted",
    tier="B",
    oracle="""
    WITH fact AS (
      SELECT CASE WHEN event_id % 10 < 7 THEN 1 ELSE user_id END AS k,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events)
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT)  AS n_events,
           CAST(sum(f.cents) AS BIGINT) AS sum_cents
    FROM fact f JOIN customer c ON f.k = c.c_custkey
    GROUP BY 1
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted JOIN: 70% of the fact rows share ONE key (the
    social-network-celebrity / null-bucket shape that collapses a shuffle
    join onto a single reducer). The fact side salts on a stable row
    attribute, the dim side replicates per salt, and the join runs on
    (key, salt) — the hot key spreads across 8 reducers
    (operators/scale.py::salted_join; the join is hinted MERGE because at
    fixture sizes AQE would broadcast the dim and hide the skew, and the
    manual salt exists precisely for the cases AQE's runtime skew split
    cannot cover: stream-stream joins and stateful operators whose state
    partitioning IS the join partitioning). Results are identical to the
    plain join — the oracle states the unsalted semantics.
    """
    from flink_cdc_connectors_spark.operators.scale import salted_join

    ev = load_table(spark, sf_dir, "events")
    fact = ev.select(
        F.when(F.col("event_id") % 10 < 7, F.lit(1))
        .otherwise(F.col("user_id"))
        .alias("k"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        "event_id",
    )
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_mktsegment"
    )
    joined = salted_join(
        fact,
        dim.hint("merge"),
        "k",
        salt_buckets=8,
        salt_from=F.xxhash64("event_id"),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.sum("cents").alias("sum_cents"),
    )


@query(
    "set_ops_bag",
    tier="B",
    oracle="""
    WITH l AS (SELECT o_custkey AS k, o_orderpriority AS p FROM orders),
    r AS (SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderkey % 3 = 0)
    SELECT 'except_all' AS op, k, p FROM
      (SELECT k, p FROM l EXCEPT ALL SELECT o_custkey, o_orderpriority FROM r)
    UNION ALL
    SELECT 'intersect_all', k, p FROM
      (SELECT k, p FROM l INTERSECT ALL SELECT o_custkey, o_orderpriority FROM r)
    """,
)
def set_ops_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantic set operations — EXCEPT ALL / INTERSECT ALL preserve
    MULTIPLICITIES (a row appearing 5 times on the left and 2 on the right
    survives EXCEPT ALL 3 times), which the distinct flavors already
    covered by set_except/set_intersect cannot express; Flink SQL supports
    both bag forms, and changelog arithmetic (insertions minus
    retractions) is exactly multiset difference. The left side is the
    orders (custkey, priority) multiset, the right a 1-in-3 slice — every
    surviving multiplicity is the difference/minimum of real duplicate
    counts, hash-checked row-for-row.

    Spark plans exceptAll/intersectAll as a count-aggregate + generate
    replay (sum of signed counts, then re-expand) — one shuffle per
    operand pair on the row value, no join explosion on duplicate keys.
    """
    o = load_table(spark, sf_dir, "orders")
    left = o.select(F.col("o_custkey").alias("k"), F.col("o_orderpriority").alias("p"))
    right = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_custkey").alias("k"), F.col("o_orderpriority").alias("p")
    )
    ex = left.exceptAll(right).select(F.lit("except_all").alias("op"), "k", "p")
    ix = left.intersectAll(right).select(F.lit("intersect_all").alias("op"), "k", "p")
    return ex.unionByName(ix)


@query(
    "agg_continuous_rollup",
    tier="B",
    oracle="""
    SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1
    """,
)
def agg_continuous_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable continuous aggregate (TimescaleDB's continuous
    aggregates / Druid rollup segments): the time range BEFORE the
    materialization watermark is served from a PRECOMPUTED hourly rollup
    of partial aggregates, the tail after it from raw events, and the
    query-time merge combines the two with the partial-aggregate algebra
    (counts add; sums add; distinct-user merges via a per-branch key set —
    the one aggregate whose partials are NOT scalars, which is why real
    rollups store HLL sketches for it; the fixture-sized key sets make the
    exact form feasible here and the oracle hash-checks the merge). The
    result must equal the direct aggregate over the whole range — the
    correctness contract of every continuous-aggregate implementation.

    Scale: at 100 TB the rollup branch is a materialized table maintained
    incrementally (one tiny partition per closed hour) and queries pay
    only the raw tail scan — this key demonstrates the merge algebra is
    exact, which is what makes that storage trade safe."""
    ev = load_table(spark, sf_dir, "events")
    hour = (F.unix_micros("ts") / 3_600_000_000).cast("long").alias("hour_id")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    wm = ev.agg(F.expr("percentile_cont(0.8) WITHIN GROUP (ORDER BY unix_micros(ts))")).first()[0]
    closed = ev.filter(F.unix_micros("ts") <= wm)
    tail = ev.filter(F.unix_micros("ts") > wm)
    # the "materialized" branch: hourly partials as a rollup table would
    # store them (count, sum, and the distinct-key partial)
    rollup = closed.groupBy(hour).agg(
        F.count("*").alias("p_n"),
        F.sum(cents).alias("p_sum"),
        F.collect_set("user_id").alias("p_users"),
    )
    tail_p = tail.groupBy(hour).agg(
        F.count("*").alias("p_n"),
        F.sum(cents).alias("p_sum"),
        F.collect_set("user_id").alias("p_users"),
    )
    # query-time merge: combine partials per hour (an hour can appear in
    # both branches when the watermark falls inside it)
    return (
        rollup.unionByName(tail_p)
        .groupBy("hour_id")
        .agg(
            F.sum("p_n").alias("n_events"),
            F.sum("p_sum").alias("sum_cents"),
            F.size(F.array_distinct(F.flatten(F.collect_list("p_users"))))
            .cast("long")
            .alias("n_users"),
        )
    )

"""Relational operator suite: every join/agg/window/set-op family of
SURVEY.md §2.3-2.7 expressed Spark-first over the generic star schema, each
paired with an exact DuckDB oracle (ORACLE_SQL) for the driver's correctness
harness.

These are the *operator-parity* probes: the KG pipeline exercises the same
primitives inside its stages (J1 broadcast label join, J3 full-outer
snapshot diff, J6 interval revert pairing, A1/A2 stats aggregation, W1/W2
windows, X1 set ops, P6-P8 projections); here each primitive runs standalone
on oracle-checkable inputs.

Float discipline: every float output is ``round(x, 2..4)`` on both sides so
the order-dependent last-ulp of parallel sums cannot flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    try:  # week/year buckets + ts comparisons assume UTC (runtime-settable)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------- #
# aggregations (A1/A2/A4/A6/A7)
# --------------------------------------------------------------------------- #

def q_pricing_summary(spark, sf_dir):
    """A1: hash aggregate with map-side partial agg (TPC-H Q1 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.avg("l_discount"), 4).alias("avg_disc"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def q_count_distinct(spark, sf_dir):
    """A4: count + count(distinct) per group."""
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_orders"),
                 F.countDistinct("o_custkey").alias("n_customers"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .orderBy("o_orderpriority"))


def q_union_rollup(spark, sf_dir):
    """A6/X4: UNION ALL'd single-row corpus metrics."""
    li = _t(spark, sf_dir, "lineitem")
    metrics = [
        li.agg(F.lit("n_rows").alias("metric"),
               F.count("*").cast("double").alias("value")),
        li.agg(F.lit("n_parts").alias("metric"),
               F.countDistinct("l_partkey").cast("double").alias("value")),
        li.agg(F.lit("sum_qty").alias("metric"),
               F.round(F.sum("l_quantity"), 2).alias("value")),
        li.agg(F.lit("max_price").alias("metric"),
               F.round(F.max("l_extendedprice"), 2).alias("value")),
    ]
    out = metrics[0]
    for m in metrics[1:]:
        out = out.unionByName(m)
    return out.orderBy("metric")


def q_grouping_sets(spark, sf_dir):
    """One-pass multi-granularity rollup — the scalable replacement for
    A6's k-scan UNION ALL: GROUP BY ROLLUP(l_returnflag, l_linestatus)
    computes the detail, per-flag subtotal, and grand total in a SINGLE
    scan via Expand + one partially-aggregated shuffle (each input row
    fans to 3 grouping-set rows map-side, collapsed by partial agg
    before the exchange).  At 100 TB this is 1 pass instead of 3; the
    UNION ALL formulation re-reads the fact table per granularity.
    grouping_id() disambiguates NULL-as-subtotal from NULL data (bit
    order: first rollup column = MSB, the ANSI convention both Spark
    and DuckDB implement)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
                 F.count("*").alias("n_rows"),
                 F.grouping_id().cast("int").alias("grp"))
            .orderBy("grp", "l_returnflag", "l_linestatus"))


def q_histogram(spark, sf_dir):
    """A7: width-bucket histogram of extended price."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.select(F.floor(F.col("l_extendedprice") / 10000)
                      .cast("long").alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("n"))
            .orderBy("bucket"))


def q_stats_assembly(spark, sf_dir):
    """A2 analog of entity_stats: per-user conditional counters + ordered
    distinct-set concat (the entity_types_31 pattern)."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.count(F.when(F.col("event_type") == "error", 1))
                 .alias("n_errors"),
                 F.count(F.when(F.col("event_type") == "signup", 1))
                 .alias("n_signups"),
                 F.min("ts").alias("first_ts"),
                 F.max("ts").alias("last_ts"),
                 F.array_join(F.array_sort(F.collect_set("event_type")), ", ")
                 .alias("event_types"))
            .orderBy("user_id"))


# --------------------------------------------------------------------------- #
# joins (J1-J6)
# --------------------------------------------------------------------------- #

def q_broadcast_join(spark, sf_dir):
    """J1: fact ⨝ broadcast dim (the property-label lookup shape)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (li.join(F.broadcast(part),
                    li.l_partkey == part.p_partkey, "left")
            .groupBy("p_brand")
            .agg(F.count("*").alias("n_items"),
                 F.round(F.sum("l_quantity"), 2).alias("qty"))
            .orderBy("p_brand"))


def q_semi_join(spark, sf_dir):
    """J2: membership semi-join (the cohort-type shape)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    active = c.join(o.select("o_custkey").distinct(),
                    c.c_custkey == F.col("o_custkey"), "left_semi")
    return (active.join(F.broadcast(n), active.c_nationkey == n.n_nationkey)
            .groupBy("n_name").agg(F.count("*").alias("n_customers"))
            .orderBy("n_name"))


def q_anti_join(spark, sf_dir):
    """J4/J5: hash anti-join (the deleted-hash set-diff shape)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (o.join(li.select("l_orderkey").distinct(),
                   o.o_orderkey == F.col("l_orderkey"), "left_anti")
            .select("o_orderkey", "o_orderstatus").orderBy("o_orderkey"))


def q_snapshot_diff(spark, sf_dir):
    """J3: consecutive-snapshot FULL OUTER diff with CREATE/DELETE/UPDATE
    classification on the null sides — the relational statement of the KG
    diff core (page_parser.py:1786-1888)."""
    ev = _t(spark, sf_dir, "events")
    pivot = F.lit("2024-01-03 00:00:00").cast("timestamp")
    prev = (ev.filter(F.col("ts") < pivot).groupBy("user_id")
            .agg(F.round(F.min("value"), 2).alias("old_value")))
    curr = (ev.filter(F.col("ts") >= pivot).groupBy("user_id")
            .agg(F.round(F.max("value"), 2).alias("new_value")))
    joined = prev.join(curr, "user_id", "full_outer")
    return (joined.select(
        "user_id", "old_value", "new_value",
        F.when(F.col("old_value").isNull(), "CREATE")
         .when(F.col("new_value").isNull(), "DELETE")
         .when(F.col("old_value") != F.col("new_value"), "UPDATE")
         .otherwise("NOCHANGE").alias("action"))
        .orderBy("user_id"))


def q_interval_revert_pairs(spark, sf_dir):
    """J6: time-bounded self-join — pair each 'error' event with the first
    'purchase' of the same user within 24 hours (the revert-pairing shape)."""
    ev = _t(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error") \
        .select(F.col("user_id"), F.col("event_id").alias("error_id"),
                F.col("ts").alias("err_ts"))
    fix = ev.filter(F.col("event_type") == "purchase") \
        .select(F.col("user_id"), F.col("event_id").alias("fix_id"),
                F.col("ts").alias("fix_ts"))
    paired = (err.join(fix, "user_id")
              .filter((F.col("fix_ts") > F.col("err_ts"))
                      & (F.col("fix_ts") <= F.col("err_ts")
                         + F.expr("INTERVAL 24 HOUR")))
              .groupBy("user_id", "error_id")
              .agg(F.min("fix_id").alias("reverted_by")))
    return paired.orderBy("user_id", "error_id")


# --------------------------------------------------------------------------- #
# windows (W1/W2/O2/O3)
# --------------------------------------------------------------------------- #

def q_window_lag(spark, sf_dir):
    """W1: previous-snapshot lag per key, ordered by event time."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (ev.select("user_id", "event_id",
                      F.round(F.col("value") - F.lag("value").over(w), 2)
                      .alias("delta"),
                      F.row_number().over(w).alias("seq"))
            .orderBy("user_id", "seq"))


def q_window_last_nonnull(spark, sf_dir):
    """W2: parent-pointer repair shape — last non-null carried forward."""
    ev = _t(spark, sf_dir, "events")
    v = F.when(F.col("event_type") != "error", F.col("value"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (ev.select("user_id", "event_id",
                      F.round(F.last(v, ignorenulls=True).over(w), 2)
                      .alias("carried"))
            .orderBy("user_id", "event_id"))


def q_topk(spark, sf_dir):
    """O3: global top-k with deterministic tie-break."""
    o = _t(spark, sf_dir, "orders")
    return (o.select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
            .orderBy(F.desc("price"), F.asc("o_orderkey")).limit(10))


def q_dedup_pk(spark, sf_dir):
    """S5: ON-CONFLICT-DO-NOTHING analog — deterministic first row per PK."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("user_id", "event_type")
            .agg(F.min_by("event_id", F.struct("ts", "event_id"))
                 .alias("first_event_id"),
                 F.min("ts").alias("first_ts"))
            .orderBy("user_id", "event_type"))


# --------------------------------------------------------------------------- #
# set ops / projections (X1, P6-P8, F8)
# --------------------------------------------------------------------------- #

def q_set_except(spark, sf_dir):
    """X1: key-set difference via EXCEPT."""
    ev = _t(spark, sf_dir, "events")
    a = (ev.filter(F.col("event_type") == "error").groupBy("user_id")
         .agg(F.count("*").alias("n")).filter("n > 14").select("user_id"))
    b = (ev.filter(F.col("event_type") == "purchase").groupBy("user_id")
         .agg(F.count("*").alias("n")).filter("n > 14").select("user_id"))
    return a.exceptAll(b).distinct().orderBy("user_id")


def q_user_type(spark, sf_dir):
    """P6: rule classifier as a when-chain (bot/anonymous/human shape)."""
    ev = _t(spark, sf_dir, "events")
    cls = (F.when(F.col("event_type").isin("error", "view"), "suspect")
           .when(F.col("value") < 50, "low")
           .otherwise("normal"))
    return (ev.select(cls.alias("user_class"))
            .groupBy("user_class").agg(F.count("*").alias("n"))
            .orderBy("user_class"))


def q_time_buckets(spark, sf_dir):
    """P8: the denormalized week/year_month buckets (calendar year + ISO
    week — the reference's %Y-W%V, utils.py:455-457)."""
    ev = _t(spark, sf_dir, "events")
    week = F.concat(F.year("ts").cast("string"), F.lit("-W"),
                    F.lpad(F.weekofyear("ts").cast("string"), 2, "0"))
    return (ev.select(week.alias("week"),
                      F.date_format("ts", "yyyy-MM").alias("year_month"))
            .groupBy("week", "year_month").agg(F.count("*").alias("n"))
            .orderBy("week", "year_month"))


def q_levenshtein(spark, sf_dir):
    """F8: built-in edit distance (JVM-side)."""
    d = _t(spark, sf_dir, "documents")
    return (d.select("doc_id",
                     F.levenshtein(F.substring("text", 1, 20),
                                   F.substring("text", 21, 20)).alias("lev"))
            .orderBy("doc_id"))


def q_asof_join(spark, sf_dir):
    """As-of join — the temporal operator Spark's DataFrame API lacks:
    attach to every non-click event the value of that user's most
    recent click at-or-before the event's timestamp (NULL when none).

    Spark-first shape: the union + ordered carry-forward formulation —
    tag probe/build rows, one window per user ordered by (ts, tag) with
    ``last(value, ignorenulls)`` — ONE hash exchange on the join key
    and a per-key sort, independent of time-range width.  The naive
    range-join formulation (probe x build on key + ts-inequality, then
    max per probe) explodes with history length; this one's cost is
    |probe| + |build| regardless.  Build ties at identical ts collapse
    via max(value) first, so the result is deterministic; at equal
    (ts), build sorts before probe (tag 0 < 1) giving inclusive >=
    semantics — exactly DuckDB's ASOF JOIN, which the oracle uses
    natively."""
    ev = _t(spark, sf_dir, "events")
    build = (ev.filter(F.col("event_type") == "click")
             .groupBy("user_id", "ts")
             .agg(F.round(F.max("value"), 2).alias("_click")))
    probe = (ev.filter(F.col("event_type") != "click")
             .select("event_id", "user_id", "event_type", "ts"))
    unioned = (probe
               .withColumn("_tag", F.lit(1))
               .withColumn("_click", F.lit(None).cast("double"))
               .unionByName(build.select(
                   F.lit(None).cast("long").alias("event_id"),
                   "user_id",
                   F.lit(None).cast("string").alias("event_type"),
                   "ts",
                   F.lit(0).alias("_tag"),
                   "_click")))
    w = (Window.partitionBy("user_id").orderBy("ts", "_tag")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (unioned
            .withColumn("asof_value", F.last("_click", ignorenulls=True).over(w))
            .filter(F.col("_tag") == 1)
            .select("event_id", "user_id", "event_type", "asof_value")
            .orderBy("event_id"))


# --------------------------------------------------------------------------- #
# DuckDB oracles — one per query above, ANSI-flavored
# --------------------------------------------------------------------------- #

ORACLE_SQL: dict[str, str] = {
    "rel_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "rel_count_distinct": """
        SELECT o_orderpriority, count(*) AS n_orders,
               count(DISTINCT o_custkey) AS n_customers,
               round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "rel_union_rollup": """
        SELECT * FROM (
          SELECT 'n_rows' AS metric, CAST(count(*) AS DOUBLE) AS value FROM lineitem
          UNION ALL
          SELECT 'n_parts', CAST(count(DISTINCT l_partkey) AS DOUBLE) FROM lineitem
          UNION ALL
          SELECT 'sum_qty', round(sum(l_quantity), 2) FROM lineitem
          UNION ALL
          SELECT 'max_price', round(max(l_extendedprice), 2) FROM lineitem
        ) ORDER BY metric
    """,
    "rel_grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(avg(l_extendedprice), 2) AS avg_price,
               count(*) AS n_rows,
               CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS grp
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY grp, l_returnflag, l_linestatus
    """,
    "rel_histogram": """
        SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket,
               count(*) AS n
        FROM lineitem GROUP BY 1 ORDER BY bucket
    """,
    "rel_stats_assembly": """
        SELECT user_id, count(*) AS n_events,
               count(*) FILTER (WHERE event_type = 'error') AS n_errors,
               count(*) FILTER (WHERE event_type = 'signup') AS n_signups,
               min(ts) AS first_ts, max(ts) AS last_ts,
               array_to_string(list_sort(list(DISTINCT event_type)), ', ')
                 AS event_types
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "rel_broadcast_join": """
        SELECT p_brand, count(*) AS n_items,
               round(sum(l_quantity), 2) AS qty
        FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand ORDER BY p_brand
    """,
    "rel_semi_join": """
        SELECT n_name, count(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
        GROUP BY n_name ORDER BY n_name
    """,
    "rel_anti_join": """
        SELECT o_orderkey, o_orderstatus FROM orders
        WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
        ORDER BY o_orderkey
    """,
    "rel_snapshot_diff": """
        WITH prev AS (
          SELECT user_id, round(min(value), 2) AS old_value
          FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
          GROUP BY user_id),
        curr AS (
          SELECT user_id, round(max(value), 2) AS new_value
          FROM events WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
          GROUP BY user_id)
        SELECT coalesce(prev.user_id, curr.user_id) AS user_id,
               old_value, new_value,
               CASE WHEN old_value IS NULL THEN 'CREATE'
                    WHEN new_value IS NULL THEN 'DELETE'
                    WHEN old_value <> new_value THEN 'UPDATE'
                    ELSE 'NOCHANGE' END AS action
        FROM prev FULL OUTER JOIN curr ON prev.user_id = curr.user_id
        ORDER BY user_id
    """,
    "rel_interval_revert_pairs": """
        SELECT e.user_id, e.event_id AS error_id,
               min(l.event_id) AS reverted_by
        FROM events e JOIN events l
          ON e.user_id = l.user_id
         AND l.event_type = 'purchase'
         AND l.ts > e.ts AND l.ts <= e.ts + INTERVAL 24 HOUR
        WHERE e.event_type = 'error'
        GROUP BY e.user_id, e.event_id
        ORDER BY e.user_id, error_id
    """,
    "rel_window_lag": """
        SELECT user_id, event_id,
               round(value - lag(value) OVER w, 2) AS delta,
               CAST(row_number() OVER w AS INT) AS seq
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, seq
    """,
    "rel_window_last_nonnull": """
        SELECT user_id, event_id,
               round(last_value(CASE WHEN event_type <> 'error' THEN value END
                     IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                 AS carried
        FROM events ORDER BY user_id, event_id
    """,
    "rel_topk": """
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders ORDER BY price DESC, o_orderkey ASC LIMIT 10
    """,
    "rel_dedup_pk": """
        SELECT user_id, event_type,
               arg_min(event_id, ts) AS first_event_id,
               min(ts) AS first_ts
        FROM events GROUP BY user_id, event_type
        ORDER BY user_id, event_type
    """,
    "rel_set_except": """
        SELECT user_id FROM events WHERE event_type = 'error'
        GROUP BY user_id HAVING count(*) > 14
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'purchase'
        GROUP BY user_id HAVING count(*) > 14
        ORDER BY user_id
    """,
    "rel_user_type": """
        SELECT CASE WHEN event_type IN ('error', 'view') THEN 'suspect'
                    WHEN value < 50 THEN 'low'
                    ELSE 'normal' END AS user_class,
               count(*) AS n
        FROM events GROUP BY 1 ORDER BY user_class
    """,
    "rel_time_buckets": """
        SELECT strftime(ts, '%Y') || '-W' || strftime(ts, '%V') AS week,
               strftime(ts, '%Y-%m') AS year_month, count(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY week, year_month
    """,
    "rel_levenshtein": """
        SELECT doc_id,
               CAST(levenshtein(substring(text, 1, 20),
                                substring(text, 21, 20)) AS INT) AS lev
        FROM documents ORDER BY doc_id
    """,
    "rel_asof_join": """
        WITH build AS (
          SELECT user_id, ts AS bts, round(max(value), 2) AS click_value
          FROM events WHERE event_type = 'click' GROUP BY user_id, ts
        ), probe AS (
          SELECT event_id, user_id, event_type, ts
          FROM events WHERE event_type <> 'click'
        )
        SELECT p.event_id, p.user_id, p.event_type,
               b.click_value AS asof_value
        FROM probe p ASOF LEFT JOIN build b
          ON p.user_id = b.user_id AND p.ts >= b.bts
        ORDER BY p.event_id
    """,
}

QUERIES = {
    "rel_pricing_summary": q_pricing_summary,
    "rel_count_distinct": q_count_distinct,
    "rel_union_rollup": q_union_rollup,
    "rel_grouping_sets": q_grouping_sets,
    "rel_histogram": q_histogram,
    "rel_stats_assembly": q_stats_assembly,
    "rel_broadcast_join": q_broadcast_join,
    "rel_semi_join": q_semi_join,
    "rel_anti_join": q_anti_join,
    "rel_snapshot_diff": q_snapshot_diff,
    "rel_interval_revert_pairs": q_interval_revert_pairs,
    "rel_window_lag": q_window_lag,
    "rel_window_last_nonnull": q_window_last_nonnull,
    "rel_topk": q_topk,
    "rel_dedup_pk": q_dedup_pk,
    "rel_set_except": q_set_except,
    "rel_user_type": q_user_type,
    "rel_time_buckets": q_time_buckets,
    "rel_levenshtein": q_levenshtein,
    "rel_asof_join": q_asof_join,
}

"""Extended operator coverage: as-of / range joins, pivot, cube,
distinct counts, nation-pair trade, embedding centroids, token
histograms, batch sessionization.

Same driver-contract conventions as ``queries.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.asof import asof_join, range_join
from .operators.text import token_count
from .queries import query, t
from .streaming.windows import sessionize

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


# --------------------------------------------------------------------
# As-of & range joins (events)
# --------------------------------------------------------------------

@query(
    "q_asof_click_before_purchase",
    f"""
    WITH p AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts, MAX(event_id) AS click_event_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT p.user_id, p.event_id,
           strftime(p.ts, '{_TS_FMT_DUCK}') AS ts_str,
           c.click_event_id,
           strftime(c.ts, '{_TS_FMT_DUCK}') AS click_ts_str
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    driver=False,  # r05: rotated out (long-green; pytest parity + bench)
)
def q_asof_click_before_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: each purchase annotated with the user's most recent
    click at-or-before it.  Union-trick plan: ONE shuffle on user_id,
    window carry-forward — no non-equi join explosion (operator:
    operators/asof.py; DuckDB verifies with its native ASOF JOIN)."""
    e = t(spark, sf, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    joined = asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["click_event_id"],
    )
    return joined.select(
        "user_id",
        "event_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("ts_str"),
        F.col("click_event_id_asof").alias("click_event_id"),
        F.date_format("ts_asof", _TS_FMT_SPARK).alias("click_ts_str"),
    )


@query(
    "q_asof_next_click_within_2h",
    f"""
    WITH p AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts, MAX(event_id) AS click_event_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), j AS (
      SELECT p.user_id, p.event_id, p.ts, c.click_event_id, c.ts AS click_ts
      FROM p ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND p.ts <= c.ts
    )
    SELECT user_id, event_id,
           strftime(ts, '{_TS_FMT_DUCK}') AS ts_str,
           CASE WHEN click_ts <= ts + INTERVAL 2 HOUR
                THEN click_event_id END AS click_event_id,
           CASE WHEN click_ts <= ts + INTERVAL 2 HOUR
                THEN strftime(click_ts, '{_TS_FMT_DUCK}') END AS click_ts_str
    FROM j
    """,
    driver=False,  # r05: rotated out (long-green; pytest parity + bench)
)
def q_asof_next_click_within_2h(spark: SparkSession, sf: str) -> DataFrame:
    """FORWARD as-of join with a tolerance: each purchase annotated
    with the user's next click at-or-after it, nulled when more than
    2 hours away — the attribution-window shape.  Same union-trick
    plan as the backward variant (one shuffle on user_id); DuckDB
    verifies with its native forward ASOF JOIN plus the tolerance
    CASE (operator: operators/asof.py direction='forward')."""
    e = t(spark, sf, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    joined = asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["click_event_id"], direction="forward", tolerance="2 hours",
    )
    return joined.select(
        "user_id",
        "event_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("ts_str"),
        F.col("click_event_id_asof").alias("click_event_id"),
        F.date_format("ts_asof", _TS_FMT_SPARK).alias("click_ts_str"),
    )


@query(
    "q_range_clicks_after_purchase",
    """
    SELECT p.event_id, p.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_clicks_10m
    FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 10 MINUTE
    GROUP BY p.event_id, p.user_id
    """,
    driver=False,
)
def q_range_clicks_after_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """Range (bounded-interval) join: clicks within 10 minutes after
    each purchase; equi-key hash join + interval filter, no cartesian
    blow-up beyond key groups (operator: operators/asof.py)."""
    e = t(spark, sf, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    j = range_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        lower="0 seconds", upper="10 minutes",
    )
    return (
        j.groupBy(F.col("l.event_id").alias("event_id"), F.col("l.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_clicks_10m"))
    )


# --------------------------------------------------------------------
# Pivot / cube / distinct
# --------------------------------------------------------------------

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@query(
    "q_pivot_daily_event_counts",
    f"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           {", ".join(
               f"CAST(COUNT(CASE WHEN event_type = '{et}' THEN 1 END) AS BIGINT) AS n_{et}"
               for et in _EVENT_TYPES
           )}
    FROM events GROUP BY 1
    """,
    driver=False,
)
def q_pivot_daily_event_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot: daily event counts, one column per event type."""
    e = t(spark, sf, "events")
    piv = (
        e.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "day",
        *[F.coalesce(F.col(et), F.lit(0)).cast("long").alias(f"n_{et}") for et in _EVENT_TYPES],
    )


@query(
    "q_cube_order_stats",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    driver=False,
)
def q_cube_order_stats(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping sets in one shuffle)."""
    o = t(spark, sf, "orders")
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@query(
    "q_unpivot_lineitem_charges",
    # pytest/bench coverage (driver view is budget-capped): wide-to-long
    # reshape via stack(), the UNPIVOT operator
    """
    SELECT measure,
           ROUND(SUM(value), 2) + 0.0 AS total,
           CAST(COUNT(*) AS BIGINT)   AS n
    FROM (
      SELECT 'extendedprice' AS measure, l_extendedprice AS value FROM lineitem
      UNION ALL SELECT 'discount', l_discount FROM lineitem
      UNION ALL SELECT 'tax', l_tax FROM lineitem
    ) GROUP BY measure
    """,
    driver=False,  # r12: rotated out (green r9-r11; pytest parity + bench)
)
def q_unpivot_lineitem_charges(spark: SparkSession, sf: str) -> DataFrame:
    """UNPIVOT (wide → long) via ``stack``: one generator projection,
    no join/union re-scan of the fact table — the reshape stays a
    single pass however many measures are unpivoted (the UNION ALL
    formulation the oracle uses would scan lineitem once per
    measure)."""
    l = t(spark, sf, "lineitem")
    return (
        l.select(
            F.expr(
                "stack(3, 'extendedprice', l_extendedprice,"
                " 'discount', l_discount, 'tax', l_tax) as (measure, value)"
            )
        )
        .groupBy("measure")
        .agg(
            (F.round(F.sum("value"), 2) + F.lit(0.0)).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q_distinct_parts_suppliers",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(*) AS BIGINT)                  AS n_lines
    FROM lineitem GROUP BY l_returnflag
    """,
    driver=False,  # r03: rotated out (long-green; still in pytest parity + bench)
)
def q_distinct_parts_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """Multi distinct-aggregate (Spark plans expand + two-phase agg)."""
    l = t(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "q07_nation_trade",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      AND n2.n_name IN ('NATION_1', 'NATION_2')
      AND n1.n_name <> n2.n_name
    GROUP BY n1.n_name, n2.n_name
    """,
    driver=False,
)
def q07_nation_trade(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7-style bilateral trade: two aliases of the same dim
    (self-alias join diversity); bounded nation aliases hinted
    broadcast, supplier/customer left to AQE."""
    l = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(
            F.col("supp_nation").isin("NATION_1", "NATION_2")
            & F.col("cust_nation").isin("NATION_1", "NATION_2")
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
        .groupBy("supp_nation", "cust_nation")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


# --------------------------------------------------------------------
# Embeddings & documents
# --------------------------------------------------------------------

@query(
    "embedding_centroids",
    """
    SELECT label, i AS dim,
           ROUND(AVG(embedding[i]::DOUBLE), 4) + 0.0 AS centroid_val
    FROM embeddings
    CROSS JOIN generate_series(1, 64) AS g(i)
    GROUP BY label, i
    """,
    driver=False,  # r05: rotated out (long-green; pytest parity + bench)
)
def embedding_centroids(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label centroid of the embedding space (posexplode +
    two-key aggregate); the building block for IVF-style coarse
    quantization."""
    e = t(spark, sf, "embeddings")
    return (
        e.select(
            "label",
            F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
                "pos", "val"
            ),
        )
        .groupBy("label", (F.col("pos") + 1).alias("dim"))
        # + 0.0 normalizes IEEE negative zero: -0.0 and 0.0 are
        # numerically equal but stringify/hash differently across
        # engines, which breaks value-hash comparison
        .agg((F.round(F.avg("val"), 4) + F.lit(0.0)).alias("centroid_val"))
    )


@query(
    "q_token_count_histogram",
    # pytest/bench only: token counting is driver-verified via
    # token_budget_documents; demoted to fit the driver's 50-row budget.
    """
    SELECT CAST((CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END // 10) * 10
                AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
    driver=False,
)
def q_token_count_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Token-count distribution in buckets of 10 (uses the text
    operator's tokenizer)."""
    d = t(spark, sf, "documents")
    return (
        d.withColumn("bucket", (F.floor(token_count("text") / 10) * 10).cast("int"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "q17_small_quantity_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT)             AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
    driver=False,
)
def q17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17-style correlated scalar subquery (per-part average
    quantity threshold), decorrelated by hand into a pre-aggregate +
    broadcast-joined threshold — the plan Catalyst's decorrelation
    produces, written explicitly so the shuffle story is visible:
    one partkey aggregation, then a broadcast of the tiny (part
    filtered) side."""
    l = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").filter(F.col("p_brand") == "Brand#1")
    thresholds = l.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(thresholds, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q15_top_supplier_revenue",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           ROUND(total_revenue, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    driver=False,
)
def q15_top_supplier_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15-style: CTE reuse + scalar subquery against the same
    derived relation.  The revenue aggregate is computed once and
    joined against its own max via a broadcast scalar — no second scan
    of lineitem."""
    l = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01 00:00:00")))
    )
    s = t(spark, sf, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue")
        )
    )


@query(
    "q_approx_distinct_sketch",
    # HLL estimates are engine-specific, so the CHECKED columns are the
    # exact counts plus within-10%-tolerance flags (rsd=0.02 → 5σ).  The
    # oracle asserts the flags are TRUE: a broken sketch goes red.
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT)  AS exact_parts,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(COUNT(*) AS BIGINT)                   AS n_lines,
           TRUE AS parts_sketch_ok,
           TRUE AS orders_sketch_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    driver=False,
)
def q_approx_distinct_sketch(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate distinct counting (HyperLogLog++): the mergeable
    sketch you run at 100 TB where exact COUNT(DISTINCT) would shuffle
    every key.  Output carries the exact counts plus sketch-within-
    tolerance flags so the check is oracle-exact while still exercising
    the sketch path.

    Plan shape matters here: two ``countDistinct`` + two sketches in
    ONE aggregate forces Spark's Expand-based multi-distinct plan
    (every input row replicated once per distinct group — measured
    36 s vs ~1 s at sf0.1).  Instead each exact count runs as its own
    two-phase (group-by-key, then count) aggregation, the sketches
    share one partial-aggregating pass, and the three 3-row results
    broadcast-join on the group key."""
    l = t(spark, sf, "lineitem")
    sketches = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    exact_parts = (
        l.select("l_returnflag", "l_partkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_parts"))
    )
    exact_orders = (
        l.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_orders"))
    )
    agg = sketches.join(F.broadcast(exact_parts), "l_returnflag").join(
        F.broadcast(exact_orders), "l_returnflag"
    )
    tol = 0.10
    return agg.select(
        "l_returnflag", "exact_parts", "exact_orders", "n_lines",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= tol * F.col("exact_parts")
        ).alias("parts_sketch_ok"),
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            <= tol * F.col("exact_orders")
        ).alias("orders_sketch_ok"),
    )


@query(
    "q_scalar_function_surface",
    """
    SELECT o_orderkey,
           upper(o_orderpriority)                       AS prio_upper,
           lower(o_orderstatus)                         AS status_lower,
           substring(o_orderpriority, 1, 1)             AS prio_code,
           CAST(length(o_orderpriority) AS INTEGER)     AS prio_len,
           concat(o_orderstatus, '-', o_orderpriority)  AS status_prio,
           replace(o_orderpriority, '-', '_')           AS prio_snake,
           ROUND(abs(o_totalprice - 100000.0), 2)       AS dist_100k,
           CAST(floor(o_totalprice / 1000) AS BIGINT)   AS price_k_floor,
           CAST(ceil(o_totalprice / 1000) AS BIGINT)    AS price_k_ceil,
           ROUND(sqrt(o_totalprice), 4)                 AS price_sqrt,
           CAST(year(o_orderdate) AS INTEGER)           AS order_year,
           CAST(month(o_orderdate) AS INTEGER)          AS order_month,
           CAST(day(o_orderdate) AS INTEGER)            AS order_day,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
           greatest(o_custkey, o_orderkey)              AS max_key,
           least(o_custkey, o_orderkey)                 AS min_key,
           CASE WHEN o_totalprice > 150000 THEN 'big'
                WHEN o_totalprice > 50000  THEN 'mid'
                ELSE 'small' END                        AS size_bucket
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
    driver=False,  # r03: rotated out (long-green; still in pytest parity + bench)
)
def q_scalar_function_surface(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar-function surface demo: string, math, date-part, and
    conditional/null functions in one projection (the reference's SQL
    uses NO scalar functions at all — SURVEY §2.3; this engine exposes
    the full Spark SQL function library through transform_query)."""
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") % 10 == 0)
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.lower("o_orderstatus").alias("status_lower"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.length("o_orderpriority").alias("prio_len"),
        F.concat(F.col("o_orderstatus"), F.lit("-"), F.col("o_orderpriority")).alias(
            "status_prio"
        ),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")).alias("prio_snake"),
        F.round(F.abs(F.col("o_totalprice") - 100000.0), 2).alias("dist_100k"),
        F.floor(F.col("o_totalprice") / 1000).alias("price_k_floor"),
        F.ceil(F.col("o_totalprice") / 1000).alias("price_k_ceil"),
        F.round(F.sqrt("o_totalprice"), 4).alias("price_sqrt"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        F.greatest("o_custkey", "o_orderkey").alias("max_key"),
        F.least("o_custkey", "o_orderkey").alias("min_key"),
        F.when(F.col("o_totalprice") > 150000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("size_bucket"),
    )


@query(
    "q02_cheapest_supplier_per_part",
    """
    SELECT l_partkey, l_suppkey, ROUND(l_extendedprice, 2) AS best_price
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_extendedprice = (
        SELECT MIN(l2.l_extendedprice) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
    driver=False,
)
def q02_cheapest_supplier_per_part(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2-style correlated MIN subquery, decorrelated into a
    per-part minimum joined back on (partkey, price) — one partkey
    aggregation plus one equi-join, no per-row subquery execution."""
    l = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").filter(F.col("p_brand") == "Brand#3")
    mins = l.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("l_extendedprice").alias("m_price")
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            mins,
            (F.col("m_partkey") == F.col("l_partkey"))
            & (F.col("m_price") == F.col("l_extendedprice")),
        )
        .select(
            "l_partkey", "l_suppkey", F.round("l_extendedprice", 2).alias("best_price")
        )
    )


@query(
    "q16_suppliers_excluding_returns",
    """
    SELECT p_brand, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_size <= 20
      AND l_suppkey NOT IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_returnflag = 'R' AND l_quantity > 49
          AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY p_brand
    """,
    driver=False,
)
def q16_suppliers_excluding_returns(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16-style NOT IN over a non-null key — planned as a
    left-anti join against the (small, distinct) excluded set, then a
    distinct-count aggregate."""
    l = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").filter(F.col("p_size") <= 20)
    excluded = (
        l.filter(
            (F.col("l_returnflag") == "R")
            & (F.col("l_quantity") > 49)
            & (F.col("l_shipdate") >= F.to_timestamp(F.lit("2000-01-01 00:00:00")))
        )
        .select(F.col("l_suppkey").alias("x_suppkey"))
        .distinct()
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(excluded, F.col("x_suppkey") == F.col("l_suppkey"), "left_anti")
        .groupBy("p_brand")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_bulk_economy_suppliers",
    """
    SELECT s_suppkey, s_name, ROUND(s_acctbal, 2) AS acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'ECONOMY'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 100
    )
    """,
    driver=False,
)
def q20_bulk_economy_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20-style IN over an aggregated subquery: the HAVING
    aggregate runs first (fact side), then a left-semi join filters the
    dim — the subquery result is the broadcast side."""
    l = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").filter(F.col("p_type") == "ECONOMY")
    s = t(spark, sf, "supplier")
    bulk = (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 100)
        .select("l_suppkey")
    )
    return s.join(
        bulk, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))


@query(
    "q11_important_stock",
    """
    WITH vol AS (
      SELECT l_suppkey, SUM(l_extendedprice * l_quantity) AS supp_value
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT l_suppkey, ROUND(supp_value, 2) AS supp_value
    FROM vol
    WHERE supp_value > (SELECT SUM(supp_value) * 0.001 FROM vol)
    """,
    driver=False,
)
def q11_important_stock(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11-style: aggregate reused both as rows and as a scalar
    threshold (fraction of its own total) — one shuffle computes the
    per-supplier values; the global total is a broadcast one-row
    cross join, not a second scan of lineitem."""
    l = t(spark, sf, "lineitem")
    vol = l.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("supp_value")
    )
    total = vol.agg((F.sum("supp_value") * 0.001).alias("_thr"))
    return (
        vol.crossJoin(F.broadcast(total))
        .filter(F.col("supp_value") > F.col("_thr"))
        .select("l_suppkey", F.round("supp_value", 2).alias("supp_value"))
    )


@query(
    "q21_multi_supplier_orders",
    """
    SELECT s.l_suppkey,
           CAST(COUNT(DISTINCT s.l_orderkey) AS BIGINT) AS n_shared_orders
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) s
    WHERE EXISTS (
        SELECT 1 FROM lineitem o
        WHERE o.l_orderkey = s.l_orderkey AND o.l_suppkey <> s.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem r
        WHERE r.l_orderkey = s.l_orderkey AND r.l_suppkey <> s.l_suppkey
          AND r.l_returnflag = 'R'
      )
    GROUP BY s.l_suppkey
    ORDER BY n_shared_orders DESC, s.l_suppkey
    LIMIT 20
    """,
    driver=False,
)
def q21_multi_supplier_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21-style EXISTS + NOT EXISTS against the same fact with
    different residuals: semi join then anti join, both hash-
    partitioned on orderkey so the two probes reuse one shuffle
    layout."""
    l = t(spark, sf, "lineitem")
    s = l.select("l_orderkey", "l_suppkey").distinct()
    other = l.select(
        F.col("l_orderkey").alias("o_ok"), F.col("l_suppkey").alias("o_sk")
    )
    other_r = l.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r_ok"), F.col("l_suppkey").alias("r_sk")
    )
    sem = s.join(
        other,
        (F.col("o_ok") == F.col("l_orderkey")) & (F.col("o_sk") != F.col("l_suppkey")),
        "left_semi",
    )
    anti = sem.join(
        other_r,
        (F.col("r_ok") == F.col("l_orderkey")) & (F.col("r_sk") != F.col("l_suppkey")),
        "left_anti",
    )
    return (
        anti.groupBy("l_suppkey")
        .agg(F.countDistinct("l_orderkey").alias("n_shared_orders"))
        .orderBy(F.col("n_shared_orders").desc(), F.col("l_suppkey"))
        .limit(20)
    )


@query(
    "q19_disjunctive_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 5 AND 15)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 20 AND 40)
       OR (p_type = 'ECONOMY' AND l_discount >= 0.05)
    """,
    driver=False,
)
def q19_disjunctive_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19-style disjunctive multi-attribute predicate across
    both join sides — the OR-of-ANDs shape that exercises Catalyst's
    predicate normalization (common factors push into the scans, the
    residual evaluates post-join)."""
    l = t(spark, sf, "lineitem")
    p = t(spark, sf, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(5, 15)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(20, 40)
        )
        | ((F.col("p_type") == "ECONOMY") & (F.col("l_discount") >= 0.05))
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q22_inactive_rich_customers",
    """
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT substring(c_name, length(c_name) - 1, 2) AS name_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY 1
    """,
    driver=False,
)
def q22_inactive_rich_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22-style: scalar aggregate subquery (broadcast one-row
    cross join), substring bucketing, anti join on a filtered stream —
    three operator families in one plan.  Buckets on the LAST two name
    characters: this data's names share a constant prefix, so the
    classic fixed-offset substring collapsed to a single degenerate
    bucket (NOTES r01 backlog 8)."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("1999-01-01 00:00:00"))
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(
            F.expr("substring(c_name, length(c_name) - 1, 2)").alias("name_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@query(
    "q_quantity_percentiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.50) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75,
           CAST(COUNT(*) AS BIGINT)        AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    driver=False,
)
def q_quantity_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles.  Deliberately dyadic quantiles
    (1/4, 1/2, 3/4 are binary-exact) over integer-valued quantities so
    interpolation is bit-identical across engines — a non-dyadic
    quantile of cent-valued prices lands on half-cent boundaries and
    the two engines' last-ulp differences flip the rounding (observed:
    52724.24 vs 52724.25).  At 100 TB you'd switch to
    ``percentile_approx`` (mergeable sketch); kept exact here so the
    oracle can check it."""
    l = t(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        *[
            F.expr(f"percentile(l_quantity, {q})").alias(name)
            for name, q in [("p25", 0.25), ("p50", 0.50), ("p75", 0.75)]
        ],
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_moving_window_user_value",
    f"""
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER w4, 4)  AS mavg_4,
           ROUND(SUM(value) OVER wc, 2)  AS running_sum,
           CAST(ROW_NUMBER() OVER wo AS INTEGER) AS seq
    FROM events
    WHERE user_id < 50
    WINDOW
      w4 AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
      wc AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      wo AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    driver=False,
)
def q_moving_window_user_value(spark: SparkSession, sf: str) -> DataFrame:
    """Window frames: 4-row moving average + running cumulative sum +
    sequence number per user (one shuffle on user_id serves all three
    frames — same window spec, shared sort)."""
    from pyspark.sql import Window as W

    e = t(spark, sf, "events").filter(F.col("user_id") < 50)
    base = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(base.rowsBetween(-3, 0)), 4).alias("mavg_4"),
        F.round(F.sum("value").over(base.rowsBetween(W.unboundedPreceding, 0)), 2).alias(
            "running_sum"
        ),
        F.row_number().over(base).alias("seq"),
    )


@query(
    "q_sessionize_events",
    f"""
    WITH m AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       < INTERVAL 5 MINUTE
                  THEN 0 ELSE 1 END AS new_s
      FROM events
    ), s AS (
      SELECT *, SUM(new_s) OVER (
        PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM m
    )
    SELECT user_id,
           strftime(MIN(ts), '{_TS_FMT_DUCK}') AS session_start,
           strftime(MAX(ts) + INTERVAL 5 MINUTE, '{_TS_FMT_DUCK}') AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2)     AS sum_value
    FROM s GROUP BY user_id, sid
    """,
    driver=False,  # r05: rotated out (long-green; pytest parity + bench)
)
def q_sessionize_events(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization via native session_window (batch form
    of the streaming operator); oracle replicates with lag + running
    sum session ids."""
    e = t(spark, sf, "events")
    s = sessionize(e, gap="5 minutes", watermark=None)
    return s.select(
        "user_id",
        F.date_format("session_start", _TS_FMT_SPARK).alias("session_start"),
        F.date_format("session_end", _TS_FMT_SPARK).alias("session_end"),
        "n_events",
        "sum_value",
    )


# --------------------------------------------------------------------
# TPC-H shapes 8 / 9 / 13 (adapted: the synthetic tables carry no
# partsupp or comment columns, so Q9's supplycost uses the part's
# retail price and Q13's comment filter uses order priority — the
# join/aggregation SHAPES are the originals')
# --------------------------------------------------------------------

@query(
    "q08_market_share",
    """
    WITH all_sales AS (
      SELECT EXTRACT(year FROM o_orderdate)::INTEGER AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n2.n_regionkey
      WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
    )
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
                 / SUM(volume), 4) + 0.0 AS mkt_share
    FROM all_sales GROUP BY o_year
    """,
    driver=False,  # r05: rotated out (long-green; pytest parity + bench)
)
def q08_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8-style national market share: 7-table join tree, share
    computed as conditional-sum / sum inside ONE aggregation (no
    second pass).  nation/region broadcast (bounded dims); part,
    supplier, customer, orders shuffle on their keys and AQE picks
    build sides; the p_type filter prunes part before its join."""
    l, p, s = t(spark, sf, "lineitem"), t(spark, sf, "part"), t(spark, sf, "supplier")
    o, c, n = t(spark, sf, "orders"), t(spark, sf, "customer"), t(spark, sf, "nation")
    r = t(spark, sf, "region")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_rkey"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p.filter(F.col("p_type") == "PROMO"), F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
              F.col("r_regionkey") == F.col("n2_rkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.round(
                    F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(F.lit(0.0)))
                    / F.sum(vol),
                    4,
                )
                + F.lit(0.0)
            ).alias("mkt_share")
        )
    )


@query(
    "q09_profit_by_nation_year",
    """
    SELECT n_name AS nation,
           EXTRACT(year FROM o_orderdate)::INTEGER AS o_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)
                     - 0.8 * p_retailprice * l_quantity) + 1e-6, 2) AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%a%'
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)::INTEGER
    """,
    driver=False,  # r05: rotated out (long-green; pytest parity + bench)
)
def q09_profit_by_nation_year(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9-style profit rollup (no partsupp table exists, so
    supply cost is modeled as 80% of the part's retail price —
    the 5-table join + two-key agg shape is Q9's).  The p_name
    LIKE filter pushes into the part scan; nation broadcasts.

    The 1e-6 stabilizer inside ROUND (both engines) keeps sums that
    land exactly on a .005 boundary from flipping with float
    accumulation order — far below 2dp significance, identical on
    both sides."""
    l, p, s = t(spark, sf, "lineitem"), t(spark, sf, "part"), t(spark, sf, "supplier")
    o, n = t(spark, sf, "orders"), t(spark, sf, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.8) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(p.filter(F.col("p_name").contains("a")), F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit) + F.lit(1e-6), 2).alias("sum_profit"))
    )


@query(
    "q13_order_count_distribution",
    """
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON o_custkey = c_custkey
                       AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY c_count
    """,
    rank=30,
    driver=False,  # r03: rotated into the driver view (VERDICT r02 #4)
)
def q13_order_count_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13-style customer order-count histogram: LEFT OUTER join
    with an ON-clause predicate (kept out of WHERE so customers with
    zero qualifying orders survive with count 0), then a second
    aggregation over the first's result — the canonical two-level
    agg.  Count of a nullable key skips nulls on both engines."""
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    per_cust = (
        c.join(
            o.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q_hll_user_rollup",
    """
    SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT)          AS exact_users,
           TRUE AS union_est_within_5pct
    FROM events
    """,
    # r03+r04: driver-green twice; demoted r4-cont to make room for
    # pagerank_purchase_graph (parity coverage stays via pytest)
    driver=False,
)
def q_hll_user_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable-sketch rollup (operators/sketches.py): per-day HLL
    user sketches union-merged to a grand total WITHOUT re-scanning
    events — the pre-aggregation algebra COUNT(DISTINCT) lacks.  The
    oracle checks the verifiable facts exactly (day count, exact
    users) and the estimate as a tolerance flag; each input is its
    own two-phase aggregate (never two COUNT DISTINCTs in one agg —
    that triggers Expand row replication) joined as 1-row broadcasts.
    """
    from .operators.sketches import distinct_sketches, rollup_estimate

    e = t(spark, sf, "events").withColumn("day", F.to_date("ts"))
    daily = distinct_sketches(e, ["day"], "user_id")
    est = rollup_estimate(daily, []).select(
        F.col("approx_distinct").alias("est_users")
    )
    exact = e.agg(F.countDistinct("user_id").alias("exact_users"))
    n_days = daily.agg(F.count(F.lit(1)).alias("n_days"))
    return (
        n_days.crossJoin(exact)
        .crossJoin(est)
        .select(
            "n_days",
            "exact_users",
            (
                F.abs(F.col("est_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("union_est_within_5pct"),
        )
    )


# --------------------------------------------------------------------
# Time-series gap-fill / resample (events)
# --------------------------------------------------------------------

@query(
    "q_resample_user_values",
    """
    WITH ev AS (
      SELECT user_id, event_id, value, ts,
             CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket
      FROM events WHERE user_id % 10 = 0
    ), obs AS (
      SELECT user_id, bucket, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id, bucket
          ORDER BY ts DESC, value DESC, event_id DESC) AS rn
        FROM ev
      ) WHERE rn = 1
    ), spans AS (
      SELECT user_id, MIN(bucket) AS b0, MAX(bucket) AS b1 FROM ev GROUP BY 1
    ), grid AS (
      SELECT user_id, unnest(generate_series(b0, b1, 3600)) AS bucket FROM spans
    )
    SELECT g.user_id, g.bucket AS bucket_start,
           ROUND(last_value(o.value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) + 0.0
             AS value_filled,
           CAST(o.value IS NULL AS INTEGER) AS is_gap
    FROM grid g LEFT JOIN obs o USING (user_id, bucket)
    """,
    driver=False,  # r07: rotated out (long-green; pytest parity + bench)
    rank=20,
)
def q_resample_user_values(spark: SparkSession, sf: str) -> DataFrame:
    """Hypertable-style gap-fill resample (operators/timeseries.py):
    irregular events → regular hourly per-user grid, last observation
    carried forward across gaps, deterministic in-bucket survivor.
    Grid rows are generated JVM-side from each key's span (never on
    the driver); two bounded-width shuffles total."""
    from .operators.timeseries import resample_last_value  # noqa: PLC0415

    ev = t(spark, sf, "events").filter(F.col("user_id") % 10 == 0)
    out = resample_last_value(ev, step_seconds=3600)
    return out.select(
        F.col("key").alias("user_id"),
        F.col("bucket").alias("bucket_start"),
        (F.round("value_filled", 4) + F.lit(0.0)).alias("value_filled"),
        "is_gap",
    )


# --------------------------------------------------------------------
# Analytic window-function surface (orders)
# --------------------------------------------------------------------

@query(
    "q_window_function_surface",
    """
    SELECT o_custkey,
           o_orderkey,
           lag(o_orderkey)  OVER w                                   AS prev_order,
           lead(o_orderkey) OVER w                                   AS next_order,
           CAST(ntile(4) OVER w AS INTEGER)                          AS spend_quartile,
           ROUND(percent_rank() OVER w, 4) + 0.0                     AS pr,
           ROUND(cume_dist() OVER w, 4) + 0.0                        AS cd,
           first_value(o_orderkey) OVER w                            AS first_order,
           nth_value(o_orderkey, 2) OVER w                           AS second_order,
           CAST(o_totalprice - lag(o_totalprice) OVER w IS NOT NULL
                AS INTEGER)                                          AS has_prev
    FROM orders
    WHERE o_custkey % 100 = 0
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    driver=False,  # r07: rotated out (long-green; pytest parity + bench)
    rank=20,
)
def q_window_function_surface(spark: SparkSession, sf: str) -> DataFrame:
    """The analytic-window surface in one query: lag/lead, ntile,
    percent_rank, cume_dist, first/nth value, all over one explicit
    frame with a deterministic (date, key) order.  One window shuffle;
    the oracle is the identical ANSI window spec."""
    from pyspark.sql import Window  # noqa: PLC0415

    o = t(spark, sf, "orders").filter(F.col("o_custkey") % 100 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(wo).alias("prev_order"),
        F.lead("o_orderkey").over(wo).alias("next_order"),
        F.ntile(4).over(wo).cast("int").alias("spend_quartile"),
        (F.round(F.percent_rank().over(wo), 4) + F.lit(0.0)).alias("pr"),
        (F.round(F.cume_dist().over(wo), 4) + F.lit(0.0)).alias("cd"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        (F.col("o_totalprice") - F.lag("o_totalprice").over(wo)).isNotNull()
        .cast("int")
        .alias("has_prev"),
    )


# --------------------------------------------------------------------
# Declarative data-quality constraint gate (orders / customer)
# --------------------------------------------------------------------

_OK_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM")

@query(
    "q_constraint_checks",
    f"""
    SELECT 'not_null(o_custkey)' AS rule_id,
           CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
             AS n_violations
    FROM orders
    UNION ALL
    SELECT 'range(o_totalprice)',
           CAST(COUNT(*) FILTER (WHERE o_totalprice IS NOT NULL
                 AND (o_totalprice < 0 OR o_totalprice > 300000)) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'accepted_values(o_orderpriority)',
           CAST(COUNT(*) FILTER (WHERE o_orderpriority IS NOT NULL
                 AND o_orderpriority NOT IN {_OK_PRIORITIES!r}) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'unique(o_orderkey)',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'foreign_key(o_custkey->customer.c_custkey)',
           CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
    FROM (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL) o
    LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON o.o_custkey = c.c_custkey
    """,
    driver=False,  # r07: rotated out (long-green; pytest parity + bench)
    rank=20,
)
def q_constraint_checks(spark: SparkSession, sf: str) -> DataFrame:
    """The declarative ingest validation gate
    (operators/quality_checks.py): five rule kinds over orders —
    not-null, key uniqueness, numeric range, accepted values, and a
    referential-integrity check against customer — evaluated as one
    conditional-sum scan for the row-local rules plus one hash agg and
    one anti-join, emitting a complete per-rule violation report (a
    mix of zero and non-zero counts on this data)."""
    from .operators.quality_checks import check_constraints  # noqa: PLC0415

    rules = [
        {"rule": "not_null", "column": "o_custkey"},
        {"rule": "range", "column": "o_totalprice", "min": 0, "max": 300000},
        {"rule": "accepted_values", "column": "o_orderpriority",
         "values": list(_OK_PRIORITIES)},
        {"rule": "unique", "columns": ["o_orderkey"]},
        {"rule": "foreign_key", "columns": ["o_custkey"], "ref": "customer",
         "ref_columns": ["c_custkey"]},
    ]
    return check_constraints(
        t(spark, sf, "orders"), rules, refs={"customer": t(spark, sf, "customer")}
    )


# --------------------------------------------------------------------
# KMV bottom-k sketches (deterministic, mergeable, oracle-exact)
# --------------------------------------------------------------------

_KMV_K = 64

@query(
    "q_kmv_user_sketch",
    f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::UBIGINT
                  AS BIGINT) AS hv
      FROM events
    ), ranked AS (
      SELECT event_type, hv,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      FROM h
    ), sk AS (
      SELECT event_type, hv, rn FROM ranked WHERE rn <= {_KMV_K}
    ), per_est AS (
      SELECT event_type, COUNT(*) AS cnt, MAX(hv) AS u_k FROM sk GROUP BY 1
    ), exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS c FROM events GROUP BY 1
    ), g_ranked AS (
      SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn
      FROM (SELECT DISTINCT hv FROM h)
    ), g_est AS (
      SELECT COUNT(*) AS cnt, MAX(hv) AS u_k FROM g_ranked WHERE rn <= {_KMV_K}
    )
    SELECT e.event_type,
           CAST(e.c AS BIGINT) AS n_exact,
           ROUND(CASE WHEN p.cnt < {_KMV_K} THEN p.cnt * 1.0
                      ELSE {_KMV_K - 1} / (p.u_k / {1 << 60}.0) END, 4) + 0.0
             AS kmv_est
    FROM exact e JOIN per_est p USING (event_type)
    UNION ALL
    SELECT 'ALL',
           CAST((SELECT COUNT(DISTINCT user_id) FROM events) AS BIGINT),
           ROUND(CASE WHEN cnt < {_KMV_K} THEN cnt * 1.0
                      ELSE {_KMV_K - 1} / (u_k / {1 << 60}.0) END, 4) + 0.0
    FROM g_est
    """,
    driver=False,  # r07: rotated out (long-green; pytest parity + bench)
    rank=20,
)
def q_kmv_user_sketch(spark: SparkSession, sf: str) -> DataFrame:
    """Bottom-k (KMV) distinct sketches (operators/sketches.py): per
    event type, the k smallest user-id hashes estimate distinct users;
    the 'ALL' row is estimated from the MERGED per-type sketches (k
    smallest of the union members — never re-scanning the facts),
    demonstrating the mergeability a rollup hierarchy runs on.  Unlike
    HLL, every value here is deterministic given the portable md5
    construction, so the oracle matches exactly."""
    from .operators.sketches import kmv_estimate, kmv_sketches  # noqa: PLC0415

    ev = t(spark, sf, "events")
    k = _KMV_K
    sk = kmv_sketches(ev, ["event_type"], "user_id", k)
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    per = exact.join(sk, "event_type").select(
        "event_type",
        F.col("n_exact").cast("long").alias("n_exact"),
        (F.round(kmv_estimate("kmv", k), 4) + F.lit(0.0)).alias("kmv_est"),
    )
    # union across types from the SKETCHES alone (mergeability)
    members = sk.select(F.explode("kmv").alias("_h")).distinct()
    union_sk = members.orderBy("_h").limit(k).agg(
        F.sort_array(F.collect_list("_h")).alias("kmv")
    )
    g = (
        ev.agg(F.count_distinct("user_id").alias("n_exact"))
        .crossJoin(union_sk)
        .select(
            F.lit("ALL").alias("event_type"),
            F.col("n_exact").cast("long").alias("n_exact"),
            (F.round(kmv_estimate("kmv", k), 4) + F.lit(0.0)).alias("kmv_est"),
        )
    )
    return per.unionByName(g)


# --------------------------------------------------------------------
# Funnel + cohort-retention analytics (events)
# --------------------------------------------------------------------

@query(
    "q_funnel_view_click_purchase",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM events) AS BIGINT)
             AS n_users,
           CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_after_view,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased_after_click
    """,
    driver=False,  # r07: rotated out (long-green; pytest parity + bench)
    rank=20,
)
def q_funnel_view_click_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase, strictly
    later timestamps per stage): three stage aggregates, each joined
    forward on the user key.  Stage frontiers are user-count-sized, so
    the joins broadcast under AQE; the fact table is scanned once per
    stage with the event-type filter pushed down."""
    ev = t(spark, sf, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id").agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id").agg(F.min("ts").alias("t_purchase"))
    )
    return (
        ev.agg(F.count_distinct("user_id").cast("long").alias("n_users"))
        .crossJoin(v.agg(F.count(F.lit(1)).alias("n_viewed")))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after_click")))
    )


@query(
    "q_cohort_weekly_retention",
    """
    WITH firsts AS (
      SELECT user_id,
             CAST(FLOOR(epoch(MIN(ts)) / 604800) AS BIGINT) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(FLOOR(epoch(e.ts) / 604800) AS BIGINT) - f.cohort_week
               AS week_offset
      FROM events e JOIN firsts f USING (user_id)
    )
    SELECT cohort_week, week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
    driver=False,  # r07: rotated out (long-green; pytest parity + bench)
    rank=20,
)
def q_cohort_weekly_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention: users bucketed by first-seen week, activity
    counted per (cohort, week offset) — the standard triangle.  One
    agg for cohort assignment (user-sized, AQE-broadcast back onto the
    facts), one distinct + group for the matrix."""
    ev = t(spark, sf, "events").select("user_id", "ts")
    week = lambda c: F.floor(F.unix_timestamp(c) / 604800).cast("long")  # noqa: E731
    firsts = ev.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_week"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (week(F.col("ts")) - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).cast("long").alias("n_active_users")
    )


@query(
    "q_grouping_sets_revenue",
    """
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
                AS INTEGER) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus), ())
    """,
    driver=True,  # r07: rotated into the driver gate
)
def q_grouping_sets_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS (the generalization rollup/cube compile
    to) with grouping_id disambiguation — one Expand + one aggregate,
    revenue in exact integer cents.  Oracle is the identical ANSI
    GROUPING SETS."""
    o = t(spark, sf, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = o.select("o_orderpriority", "o_orderstatus", cents.alias("_c"))
    base.createOrReplaceTempView("_sg_gs_orders")
    out = spark.sql(
        """
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
                    AS INT) AS gid,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(_c) AS BIGINT) AS revenue_cents
        FROM _sg_gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus), ())
        """
    )
    return out


@query(
    "q_heavy_hitter_users",
    """
    WITH counts AS (
      SELECT CAST(user_id AS VARCHAR) AS value, COUNT(*) AS cnt
      FROM events GROUP BY 1
    ), ranked AS (
      SELECT value, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, value ASC) AS rn
      FROM counts
    ), kth AS (
      SELECT MIN(cnt) AS kth_cnt FROM ranked WHERE rn <= 10
    )
    SELECT value, CAST(cnt AS BIGINT) AS cnt,
           CAST((SELECT kth_cnt FROM kth)
                > (SELECT COUNT(*) FROM events) / 4096.0 AS INTEGER)
             AS exact_guaranteed
    FROM ranked WHERE rn <= 10
    """,
    driver=False,  # r07: rotated out (green r5+r6; pytest parity + bench)
    rank=25,
)
def q_heavy_hitter_users(spark: SparkSession, sf: str) -> DataFrame:
    """Exact heavy hitters via two-phase Misra-Gries
    (operators/sketches.py heavy_hitters): bounded-memory per-partition
    candidate summaries + one exact recount of candidates only — the
    shuffle carries candidate values, never the full key space.  Exact
    and partition-independent whenever the k-th frequency clears
    n/capacity (reported by the flag, true on this data); the oracle
    is the plain exact top-k."""
    from .operators.sketches import heavy_hitters  # noqa: PLC0415

    return heavy_hitters(t(spark, sf, "events"), "user_id", k=10, capacity=4096)


@query(
    "q_resample_interpolate",
    """
    WITH ev AS (
      SELECT user_id, event_id, value, ts,
             CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket
      FROM events WHERE user_id % 10 = 0
    ), obs AS (
      SELECT user_id, bucket, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id, bucket
          ORDER BY ts DESC, value DESC, event_id DESC) AS rn
        FROM ev
      ) WHERE rn = 1
    ), spans AS (
      SELECT user_id, MIN(bucket) AS b0, MAX(bucket) AS b1 FROM ev GROUP BY 1
    ), grid AS (
      SELECT user_id, unnest(generate_series(b0, b1, 3600)) AS bucket FROM spans
    ), g AS (
      SELECT g.user_id, g.bucket, o.value AS v,
             last_value(o.value IGNORE NULLS) OVER w_prev AS v_prev,
             last_value(CASE WHEN o.value IS NOT NULL THEN g.bucket END
                        IGNORE NULLS) OVER w_prev AS b_prev,
             first_value(o.value IGNORE NULLS) OVER w_next AS v_next,
             first_value(CASE WHEN o.value IS NOT NULL THEN g.bucket END
                         IGNORE NULLS) OVER w_next AS b_next
      FROM grid g LEFT JOIN obs o USING (user_id, bucket)
      WINDOW w_prev AS (PARTITION BY g.user_id ORDER BY g.bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w_next AS (PARTITION BY g.user_id ORDER BY g.bucket
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, bucket AS bucket_start,
           CAST(ROUND((CASE WHEN v IS NOT NULL THEN v
                            WHEN v_next IS NULL THEN v_prev
                            ELSE v_prev + (v_next - v_prev)
                                 * ((bucket - b_prev) * 1.0 / (b_next - b_prev))
                       END) * 10000.0) AS BIGINT) AS value_fp4,
           CAST(v IS NULL AS INTEGER) AS is_gap
    FROM g
    """,
    driver=True,  # r07: rotated into the driver gate (final never-gated batch)
)
def q_resample_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    """Linear-interpolation resample (operators/timeseries.py,
    mode="linear"): gap buckets take the line between the surrounding
    observations; tail buckets carry forward.  Same two-shuffle shape
    as the LOCF entry (which keeps the family's driver slot); the
    oracle mirrors the window construction and the exact interpolation
    expression tree.  Output values are fixed-point (×10⁴ BIGINT):
    interpolated values land on exact .00005 boundaries (dyadic bucket
    ratios), where decimal-exact rounding (Spark) and multiply-based
    rounding (DuckDB ROUND(x,4)) differ by an ulp — scaling explicitly
    makes both engines round the identical double."""
    from .operators.timeseries import resample_last_value  # noqa: PLC0415

    ev = t(spark, sf, "events").filter(F.col("user_id") % 10 == 0)
    out = resample_last_value(ev, step_seconds=3600, mode="linear")
    return out.select(
        F.col("key").alias("user_id"),
        F.col("bucket").alias("bucket_start"),
        F.round(F.col("value_filled") * 10000.0).cast("long").alias("value_fp4"),
        "is_gap",
    )


_EWMA_EXPR = (
    "CAST(ROUND((((8 * v0 + COALESCE(4 * v1, CAST(0 AS DOUBLE))) "
    "+ COALESCE(2 * v2, CAST(0 AS DOUBLE))) + COALESCE(v3, CAST(0 AS DOUBLE))) "
    "/ CAST(((8 + CASE WHEN v1 IS NULL THEN 0 ELSE 4 END) "
    "+ CASE WHEN v2 IS NULL THEN 0 ELSE 2 END) "
    "+ CASE WHEN v3 IS NULL THEN 0 ELSE 1 END AS DOUBLE) "
    "* 10000) AS BIGINT)"
)


@query(
    "q_ewma_user_value",
    f"""
    WITH l AS (
      SELECT user_id, event_id, value AS v0,
             lag(value, 1) OVER w AS v1,
             lag(value, 2) OVER w AS v2,
             lag(value, 3) OVER w AS v3
      FROM events
      WHERE user_id < 50
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, {_EWMA_EXPR} AS ewma_fp4
    FROM l
    """,
    driver=True,  # r07: rotated into the driver gate
)
def q_ewma_user_value(spark: SparkSession, sf: str) -> DataFrame:
    """Exponentially-weighted moving average per user (truncated at 4
    observations, alpha = 1/2): the smoothing pass of a metrics/
    monitoring pipeline.  Dyadic weights (8/4/2/1) make every product
    EXACT in IEEE double; the addition tree is explicitly
    parenthesized and IDENTICAL in the Spark expression and the
    oracle, so cross-engine results match to the bit before the final
    fixed-point cast.  One shuffle on user_id serves all four lags
    (shared window sort)."""
    from pyspark.sql import Window as W

    base = W.partitionBy("user_id").orderBy("ts", "event_id")
    e = t(spark, sf, "events").filter(F.col("user_id") < 50)
    return (
        e.select(
            "user_id",
            "event_id",
            F.col("value").alias("v0"),
            F.lag("value", 1).over(base).alias("v1"),
            F.lag("value", 2).over(base).alias("v2"),
            F.lag("value", 3).over(base).alias("v3"),
        )
        .select(
            "user_id", "event_id", F.expr(_EWMA_EXPR).alias("ewma_fp4")
        )
    )


@query(
    "q_approx_quantile_check",
    # GK-sketch quantiles are engine-specific (and merge-order
    # sensitive), so the CHECKED columns are the exact percentiles plus
    # within-tolerance flags, HLL-check style: the oracle asserts the
    # flags are TRUE, so a broken sketch goes red while the comparison
    # stays oracle-exact.  accuracy=1000 → rank error ≤ n/1000; on
    # l_quantity (integers 1..50) that bounds the value error well
    # inside ±1.
    """
    SELECT l_returnflag,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)
                AS BIGINT) AS exact_p50,
           CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY l_quantity)
                AS BIGINT) AS exact_p95,
           CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS p50_sketch_ok,
           TRUE AS p95_sketch_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    driver=True,  # r07: rotated into the driver gate
)
def q_approx_quantile_check(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate quantiles (Greenwald-Khanna sketch) with a hard
    exactness envelope: the mergeable quantile sketch you run at
    100 TB where an exact percentile would sort every group, checked
    against the exact discrete percentile computed in the same pass.
    Same two-phase shape as the HLL check: the exact percentile runs
    as its own aggregation, the sketch shares a partial-aggregating
    pass, and the tiny per-group results broadcast-join."""
    l = t(spark, sf, "lineitem")
    exact = l.groupBy("l_returnflag").agg(
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS BIGINT)").alias("exact_p50"),
        F.expr("CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY l_quantity) AS BIGINT)").alias("exact_p95"),
        F.count(F.lit(1)).alias("n"),
    )
    approx = l.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_quantity, 0.5, 1000)").alias("a50"),
        F.expr("approx_percentile(l_quantity, 0.95, 1000)").alias("a95"),
    )
    return exact.join(F.broadcast(approx), "l_returnflag").select(
        "l_returnflag",
        "exact_p50",
        "exact_p95",
        "n",
        (F.abs(F.col("a50") - F.col("exact_p50")) <= 1).alias("p50_sketch_ok"),
        (F.abs(F.col("a95") - F.col("exact_p95")) <= 1).alias("p95_sketch_ok"),
    )


@query(
    "q_mad_outliers",
    """
    WITH med AS (
      SELECT l_returnflag,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)
                  AS BIGINT) AS med
      FROM lineitem GROUP BY l_returnflag
    ), dev AS (
      SELECT l.l_returnflag, m.med,
             abs(l.l_quantity - m.med) AS d
      FROM lineitem l JOIN med m USING (l_returnflag)
    )
    SELECT l_returnflag,
           CAST(MIN(med) AS BIGINT) AS med,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY d) AS BIGINT) AS mad,
           CAST(SUM(CASE WHEN d > 3 * (SELECT percentile_disc(0.5)
                                              WITHIN GROUP (ORDER BY d2.d)
                                       FROM dev d2
                                       WHERE d2.l_returnflag = dev.l_returnflag)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM dev GROUP BY l_returnflag
    """,
    driver=False,  # r07: rotated out (long-green; pytest parity + bench)
    rank=20,
)
def q_mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Robust outlier detection per group: median absolute deviation
    on integer quantities — every statistic (median, MAD, the 3-MAD
    fence) is an EXACT integer via ``percentile_disc``, so the flag
    counts are oracle-exact with no float anywhere.

    Scale shape: two grouped aggregations over the fact table with a
    3-row broadcast join between them (medians per group, then
    deviations + MAD + fence counts); no window over the fact, no
    sort — ``percentile_disc`` aggregates partially per partition."""
    l = t(spark, sf, "lineitem").select("l_returnflag", "l_quantity")
    med = l.groupBy("l_returnflag").agg(
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS BIGINT)"
        ).alias("med")
    )
    dev = l.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag", "med", F.abs(F.col("l_quantity") - F.col("med")).alias("d")
    )
    mad = dev.groupBy("l_returnflag").agg(
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY d) AS BIGINT)").alias(
            "mad"
        )
    )
    return (
        dev.join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum((F.col("d") > 3 * F.col("mad")).cast("long")).alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "med", "mad", "n_outliers", "n")
    )


_PROFILE_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
)

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{c}' AS column,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
    FROM orders
    """
    for c in _PROFILE_COLS
)


@query("profile_orders", _PROFILE_ORACLE)  # r06: rotated IN
def profile_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Per-column table profile (operators/quality_checks.py
    profile_table): row/null/distinct counts for every column of
    ``orders`` — completeness and cardinality monitoring, all
    integer-exact."""
    from .operators.quality_checks import profile_table

    return profile_table(t(spark, sf, "orders"), _PROFILE_COLS)


_FK_EDGES = (
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
)

_REF_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{child}.{fk} -> {parent}.{pk}' AS edge,
           CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS n_child,
           CAST(COUNT(*) AS BIGINT) AS n_orphans
    FROM {child} c ANTI JOIN {parent} p ON c.{fk} = p.{pk}
    """
    for child, fk, parent, pk in _FK_EDGES
)


@query("q_referential_scorecard", _REF_ORACLE,
       driver=True)  # r07: rotated into the driver gate
def q_referential_scorecard(spark: SparkSession, sf: str) -> DataFrame:
    """Referential-integrity scorecard across the whole star schema:
    one row per foreign-key edge with child cardinality and orphan
    count — the cross-table conformance report the per-table
    constraint gate (operators/quality_checks.py) doesn't cover.

    Scale shape: each edge is ONE left-anti join; dimension parents
    broadcast, the two fact-to-fact edges (lineitem→orders) are
    key-projected before the shuffle so only the join keys move; the
    seven 1-row aggregates union into the report."""
    parts = []
    for child, fk, parent, pk in _FK_EDGES:
        c = t(spark, sf, child).select(F.col(fk))
        p = t(spark, sf, parent).select(F.col(pk))
        n_child = c.agg(F.count(F.lit(1)).alias("n_child"))
        orphans = (
            c.join(p, c[fk] == p[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .crossJoin(F.broadcast(n_child))
            .select(
                F.lit(f"{child}.{fk} -> {parent}.{pk}").alias("edge"),
                F.col("n_child"),
                F.col("n_orphans"),
            )
        )
        parts.append(orphans)
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out


@query(
    "q_trending_event_types",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), ranked AS (
      SELECT hour, event_type, c,
             ROW_NUMBER() OVER (PARTITION BY hour
                                ORDER BY c DESC, event_type) AS rnk
      FROM hourly
    )
    SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(rnk AS INTEGER) AS rnk, event_type, CAST(c AS BIGINT) AS c
    FROM ranked WHERE rnk <= 3
    """,
    driver=True,  # r07: rotated into the driver gate (final never-gated batch)
)
def q_trending_event_types(spark: SparkSession, sf: str) -> DataFrame:
    """Trending-items report: top-3 event types per hour (grouped
    counts + bounded per-hour ranking window, deterministic
    tiebreak) — the batch form of a streaming trending dashboard.
    One (hour, type) aggregate with map-side partials; the ranking
    window partitions by hour, so no global sort."""
    from pyspark.sql import Window  # noqa: PLC0415

    e = t(spark, sf, "events")
    hourly = (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"), "event_type"
        ).agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("hour_ts").orderBy(F.col("c").desc(), "event_type")
    return (
        hourly.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.date_format("hour_ts", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "rnk",
            "event_type",
            "c",
        )
    )


@query(
    "q_multiset_set_ops",
    """
    WITH hi AS (
      SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    ), lo AS (
      SELECT o_custkey FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    ), ex AS (
      SELECT o_custkey FROM hi EXCEPT ALL SELECT o_custkey FROM lo
    ), ix AS (
      SELECT o_custkey FROM hi INTERSECT ALL SELECT o_custkey FROM lo
    )
    SELECT 'except_all' AS op,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COALESCE(SUM(o_custkey), 0) AS BIGINT) AS key_sum
    FROM ex
    UNION ALL
    SELECT 'intersect_all' AS op,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COALESCE(SUM(o_custkey), 0) AS BIGINT) AS key_sum
    FROM ix
    """,
    driver=True,  # r07: rotated into the driver gate (final never-gated batch)
)
def q_multiset_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Multiset set operations (EXCEPT ALL / INTERSECT ALL): bag
    semantics preserve duplicate cardinalities — the remaining leg of
    the set-op surface beyond the DISTINCT-semantics intersect/except
    queries.  Catalyst plans both as a single aggregate producing
    per-key min/diff counts + generate — one shuffle each; the
    checksum keeps the compared output row-bounded."""
    o = t(spark, sf, "orders")
    hi = o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_custkey"
    )
    lo = o.filter(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_custkey"
    )

    def _summ(df, tag):
        return df.agg(
            F.lit(tag).alias("op"),
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(F.sum("o_custkey"), F.lit(0)).cast("long").alias("key_sum"),
        )

    return _summ(hi.exceptAll(lo), "except_all").unionByName(
        _summ(hi.intersectAll(lo), "intersect_all")
    )


@query(
    "q_datetime_function_surface",
    """
    SELECT event_id,
           CAST(quarter(ts) AS INTEGER)                    AS q,
           CAST(hour(ts) AS INTEGER)                       AS h,
           CAST(minute(ts) AS INTEGER)                     AS mi,
           CAST(date_part('second', ts) AS INTEGER)        AS s,
           CAST(dayofweek(ts) + 1 AS INTEGER)              AS dow,
           CAST(week(ts) AS INTEGER)                       AS iso_week,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                AS INTEGER)                                AS days_since_2024,
           strftime(CAST(ts AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d')
                                                           AS plus_2_months,
           strftime(last_day(CAST(ts AS DATE)), '%Y-%m-%d') AS month_end,
           strftime(date_trunc('week', ts), '%Y-%m-%d')     AS week_start
    FROM events WHERE user_id < 5
    """,
    driver=False,  # r11: rotated out (long-green r8-r10; pytest parity + bench)
)
def q_datetime_function_surface(spark: SparkSession, sf: str) -> DataFrame:
    """The datetime scalar surface in one query: quarter/hour/minute/
    second extraction, day-of-week (Spark's 1=Sunday convention,
    mirrored in the oracle by shifting DuckDB's 0=Sunday), ISO week,
    day arithmetic, end-of-month-clamped month addition, last_day,
    and Monday-start week truncation — all formatted to strings or
    integers so the comparison is format-exact.  Pure projection;
    zero shuffles."""
    e = t(spark, sf, "events").filter(F.col("user_id") < 5)
    return e.select(
        "event_id",
        F.quarter("ts").alias("q"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.second("ts").alias("s"),
        F.dayofweek("ts").alias("dow"),
        F.weekofyear("ts").alias("iso_week"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "days_since_2024"
        ),
        F.date_format(F.add_months(F.col("ts").cast("date"), 2), "yyyy-MM-dd").alias(
            "plus_2_months"
        ),
        F.date_format(F.last_day(F.col("ts").cast("date")), "yyyy-MM-dd").alias(
            "month_end"
        ),
        F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias(
            "week_start"
        ),
    )


@query(
    "q_full_outer_reconciliation",
    """
    WITH a AS (
      SELECT o_custkey, COUNT(*) AS n_a FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY o_custkey
    ), b AS (
      SELECT o_custkey, COUNT(*) AS n_b FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_custkey
    ), j AS (
      SELECT COALESCE(a.o_custkey, b.o_custkey) AS k, n_a, n_b
      FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
    )
    SELECT CAST(SUM(CASE WHEN n_a IS NOT NULL AND n_b IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
           CAST(SUM(CASE WHEN n_b IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_only_1996,
           CAST(SUM(CASE WHEN n_a IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_only_1997,
           CAST(COALESCE(SUM(n_a), 0) AS BIGINT) AS orders_1996,
           CAST(COALESCE(SUM(n_b), 0) AS BIGINT) AS orders_1997
    FROM j
    """,
    driver=True,  # r07: rotated into the driver gate
)
def q_full_outer_reconciliation(spark: SparkSession, sf: str) -> DataFrame:
    """FULL OUTER JOIN reconciliation — the remaining join type of the
    §2.3 surface: customers' order activity in 1996 vs 1997, keys
    alive in either period surviving the join, summarized to
    integer-exact presence/volume counts.  Two pre-aggregates shrink
    the fact table to per-key counts BEFORE the outer join (a full
    outer join of raw facts would shuffle everything; of aggregates,
    only distinct keys)."""
    o = t(spark, sf, "orders")

    def period(y):
        return (
            o.filter(
                (F.col("o_orderdate") >= F.to_timestamp(F.lit(f"{y}-01-01 00:00:00")))
                & (F.col("o_orderdate") < F.to_timestamp(F.lit(f"{y + 1}-01-01 00:00:00")))
            )
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias(f"n_{y}"))
        )

    j = period(1996).join(period(1997), "o_custkey", "full_outer")
    return j.agg(
        F.sum(
            (F.col("n_1996").isNotNull() & F.col("n_1997").isNotNull()).cast("long")
        ).alias("n_both"),
        F.sum(F.col("n_1997").isNull().cast("long")).alias("n_only_1996"),
        F.sum(F.col("n_1996").isNull().cast("long")).alias("n_only_1997"),
        F.coalesce(F.sum("n_1996"), F.lit(0)).cast("long").alias("orders_1996"),
        F.coalesce(F.sum("n_1997"), F.lit(0)).cast("long").alias("orders_1997"),
    )


@query(
    "q_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)  # r06: rotated IN
def q_event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """Behavioral transition matrix (first-order Markov counts): how
    often each event type follows each other type within a user's
    ordered stream, with the distinct-user reach of every edge.  One
    window shuffle on user_id (deterministic (ts, event_id) order)
    feeding one (prev, next) aggregate."""
    from pyspark.sql import Window  # noqa: PLC0415

    e = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    return seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "q_map_function_surface",
    # The oracle computes every output DIRECTLY (no maps): the Spark
    # side must round-trip the same values through its map operators,
    # so a broken map function diverges from ground truth.
    """
    SELECT o_orderkey,
           o_orderstatus                                   AS status_val,
           CAST(2 AS INTEGER)                              AS m_size,
           'prio,status'                                   AS keys_sorted,
           concat(o_orderpriority, '|', o_orderstatus)     AS vals_by_key,
           CAST(3 AS INTEGER)                              AS merged_size,
           upper(o_orderstatus)                            AS status_upper,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS n_f_entries
    FROM orders WHERE o_orderkey % 1000 = 0
    """,
    driver=False,  # r10: rotated out (green r7-r9; pytest parity + bench)
)
def q_map_function_surface(spark: SparkSession, sf: str) -> DataFrame:
    """The map-typed scalar surface in one query: create_map,
    element_at, size, map_keys (sorted for determinism — map iteration
    order is not part of the contract), map_values addressed BY KEY,
    map_concat, transform_values (HOF over maps), and map_filter.
    Each output is mirrored by a map-free oracle expression, so the
    comparison checks the map operators against ground truth.  Pure
    projection; zero shuffles."""
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") % 1000 == 0)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("prio"), F.col("o_orderpriority"),
    )
    merged = F.map_concat(m, F.create_map(F.lit("clerk"), F.lit("x")))
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_val"),
        F.size(m).alias("m_size"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.concat(
            F.element_at(m, "prio"), F.lit("|"), F.element_at(m, "status")
        ).alias("vals_by_key"),
        F.size(merged).alias("merged_size"),
        F.element_at(
            F.transform_values(m, lambda k, v: F.upper(v)), "status"
        ).alias("status_upper"),
        F.size(F.map_filter(m, lambda k, v: v == "F")).alias("n_f_entries"),
    )


@query(
    "q_theta_band_join",
    """
    WITH bands(band, lo, hi) AS (
      VALUES ('budget',   0.0,    950.0),
             ('standard', 950.0,  1400.0),
             ('premium',  1400.0, 1e9)
    )
    SELECT band,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(p_retailprice), 2) AS total_price
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    """,
)  # r06: rotated IN
def q_theta_band_join(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit theta join (non-equi, band predicate): parts priced
    into VALUES-defined bands — the inequality-join leg of the §2.3
    join surface (the range join covers time intervals; this covers
    scalar banding).  The 3-row band table broadcasts, so the
    physical plan is a BroadcastNestedLoopJoin over a projected
    single column, then a 3-group aggregate — the fact table is
    scanned once and never shuffled beyond the partial-agg exchange."""
    bands = spark.createDataFrame(
        [("budget", 0.0, 950.0), ("standard", 950.0, 1400.0), ("premium", 1400.0, 1e9)],
        "band string, lo double, hi double",
    )
    p = t(spark, sf, "part").select("p_retailprice")
    return (
        p.join(
            F.broadcast(bands),
            (F.col("p_retailprice") >= F.col("lo"))
            & (F.col("p_retailprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("p_retailprice"), 2).alias("total_price"),
        )
    )


# --------------------------------------------------------------------
# Graph centrality: PageRank over the purchase graph
# --------------------------------------------------------------------

@query(
    "pagerank_purchase_graph",
    """
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    c2 AS (
      SELECT CAST(1000000000000 // COUNT(DISTINCT src) AS BIGINT) AS initv,
             CAST(((1000000000000 // COUNT(DISTINCT src)) * 15) // 100
                  AS BIGINT) AS basev
      FROM edges
    ),
    r1 AS (
      SELECT e.dst AS node,
             CAST(basev + (85 * SUM(initv // d.outdeg)) // 100
                  AS BIGINT) AS rank_fp
      FROM edges e JOIN deg d ON e.src = d.src CROSS JOIN c2
      GROUP BY e.dst, basev
    ),
    r2 AS (
      SELECT e.dst AS node,
             CAST(basev + (85 * SUM(r1.rank_fp // d.outdeg)) // 100
                  AS BIGINT) AS rank_fp
      FROM edges e JOIN deg d ON e.src = d.src
                   JOIN r1 ON r1.node = e.src CROSS JOIN c2
      GROUP BY e.dst, basev
    ),
    r3 AS (
      SELECT e.dst AS node,
             CAST(basev + (85 * SUM(r2.rank_fp // d.outdeg)) // 100
                  AS BIGINT) AS rank_fp
      FROM edges e JOIN deg d ON e.src = d.src
                   JOIN r2 ON r2.node = e.src CROSS JOIN c2
      GROUP BY e.dst, basev
    )
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           CAST(node // 2 AS BIGINT) AS entity_id,
           rank_fp
    FROM r3
    QUALIFY ROW_NUMBER() OVER (ORDER BY rank_fp DESC, node) <= 20
    """,
    rank=25,
    driver=False,  # r07: rotated out (long-green; pytest parity + bench)
)
def pagerank_purchase_graph(spark: SparkSession, sf: str) -> DataFrame:
    """PageRank centrality over the symmetrized customer↔supplier
    purchase graph (an edge per distinct trading pair), 3 power
    iterations, damping 0.85 — the host-importance signal a crawl
    curation pipeline feeds into quality-weighted sampling.

    Integer fixed-point throughout (operators/graph.py): init, per-edge
    split, and damping are all BIGINT ops, so the DuckDB oracle — the
    same three iterations unrolled as CTEs — matches bit-for-bit with
    no float-order hazard.  Plan shape: the (edges ⋈ outdeg) frame is
    persisted once and each iteration is one rank join + one
    groupBy(dst) SUM; ranks (node-sized) shuffle to the edges, never
    the reverse.  Top-20 via a single-partition window over the final
    node-sized rank table.
    """
    from .operators.graph import pagerank  # noqa: PLC0415

    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = pagerank(edges, iterations=3)
    # top-k as orderBy+limit → TakeOrderedAndProject (per-partition
    # heaps + driver merge), not a single-partition window sort
    return (
        ranks.orderBy(F.desc("rank_fp"), F.asc("node"))
        .limit(20)
        .select(
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.expr("node div 2").cast("bigint").alias("entity_id"),
            "rank_fp",
        )
    )


@query(
    "triangle_census_coordered_parts",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p AS (
      SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      FROM li x JOIN li y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
    ),
    deg AS (
      SELECT v, COUNT(*) AS deg FROM (
        SELECT a AS v FROM p UNION ALL SELECT b AS v FROM p
      ) GROUP BY v
    ),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM p e1 JOIN p e2 ON e1.a = e2.a AND e1.b < e2.b
                JOIN p e3 ON e3.a = e1.b AND e3.b = e2.b
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(deg) // 2 AS BIGINT) AS n_edges,
             CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
      FROM deg
    )
    SELECT n_nodes, n_edges, n_wedges,
           CAST(n_triangles AS BIGINT) AS n_triangles,
           CAST(CASE WHEN n_wedges = 0 THEN 0
                     ELSE (3 * n_triangles * 1000000) // n_wedges END
                AS BIGINT) AS global_cc_ppm
    FROM tot CROSS JOIN tri
    """,
    driver=False,  # r07: rotated out (green r5+r6) for schema_evolution_ingest_documents
    rank=25,
)
def triangle_census_coordered_parts(spark: SparkSession, sf: str) -> DataFrame:
    """Triangle census + global clustering coefficient of the
    co-ordered-parts graph (parts are adjacent when one order contains
    both).  Engine side uses degree-ordered orientation
    (operators/graph.py triangle_stats) — per-vertex wedge fan-out
    bounded O(sqrt m) so hub parts can't explode the self-join; the
    oracle counts the same triangles with the canonical a<b<c 3-way
    join, which is orientation-independent, so agreement checks the
    ALGORITHM, not a shared implementation."""
    from .operators.graph import triangle_stats  # noqa: PLC0415

    li = (
        t(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    x = li.select(F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("a"))
    y = li.select(F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("b"))
    pairs = (
        x.join(y, "bk")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return triangle_stats(pairs)


@query(
    "supplier_cooccurrence_similarity",
    """
    WITH m AS (
      SELECT DISTINCT l_orderkey AS bk, l_suppkey AS it FROM lineitem
    ),
    deg AS (SELECT it, COUNT(*) AS n FROM m GROUP BY it),
    co AS (
      SELECT x.it AS item_a, y.it AS item_b, COUNT(*) AS n_common
      FROM m x JOIN m y ON x.bk = y.bk AND x.it < y.it
      GROUP BY 1, 2
    )
    SELECT item_a, item_b,
           CAST(n_common AS BIGINT) AS n_common,
           CAST((n_common * 1000000) // (da.n + db.n - n_common) AS BIGINT)
             AS jaccard_ppm
    FROM co JOIN deg da ON da.it = item_a JOIN deg db ON db.it = item_b
    QUALIFY ROW_NUMBER()
      OVER (ORDER BY jaccard_ppm DESC, item_a, item_b) <= 20
    """,
    driver=False,  # r07: rotated out (green r5+r6) for partition_evolution_week_events
    rank=25,
)
def supplier_cooccurrence_similarity(spark: SparkSession, sf: str) -> DataFrame:
    """Item-item collaborative-filtering primitive: suppliers ranked
    by Jaccard similarity of the ORDER sets they appear in
    (operators/graph.py cooccurrence_similarity).  The self-join is
    keyed on the order, so cost is Σ C(order_size, 2) — bounded by
    basket size, independent of supplier count; integer-ppm Jaccard
    for exact cross-engine parity; top-20 via TakeOrderedAndProject."""
    from .operators.graph import cooccurrence_similarity  # noqa: PLC0415

    li = t(spark, sf, "lineitem")
    sim = cooccurrence_similarity(li, "l_orderkey", "l_suppkey")
    return sim.orderBy(
        F.desc("jaccard_ppm"), F.asc("item_a"), F.asc("item_b")
    ).limit(20)

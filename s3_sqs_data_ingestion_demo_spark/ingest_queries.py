"""The reference's core operation — CDC upsert through the managed
table — as driver-checkable queries.

The reference's ONLY real query is its MERGE INTO with a
dedup-by-recency subquery (reference: spark-job/mergeSQL.sql:1-43,
executed at spark-job/read.py:173-180).  These two entries run that
scenario end-to-end at driver-gate time: create a partitioned
``ManagedTable``, merge a bootstrap batch, merge a CDC batch (with
intra-batch duplicate keys for ``unconditional``; with stale rows for
``latest_wins``), then read the final snapshot back.  The DuckDB
oracle re-derives the same final state relationally (windowed batch
dedup + anti-join ∪ upsert), so the whole write→commit→read path is
value-checked, not just the pure DataFrame operator.

Determinism notes: batches are arithmetic slices of ``orders`` (no
randomness); ``change_seq`` values are distinct within every key so
the recency windows have no ties; partition values (o_orderstatus)
are stable per key, satisfying the partition-pruned COW invariant.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .queries import query, t
from .table import ManagedTable

_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("change_seq", T.LongType(), True),
    ]
)

# Shared bootstrap batch: 2/3 of orders at seq 1.
_B1_SQL = """
    SELECT o_orderkey, o_orderstatus, o_totalprice AS price,
           CAST(1 AS BIGINT) AS change_seq
    FROM orders WHERE o_orderkey % 3 <> 0
"""


def _bootstrap(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    return o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("price"),
        F.lit(1).cast("long").alias("change_seq"),
    )


def _run_cdc_scenario(
    spark: SparkSession, sf: str, policy: str, batch2: DataFrame
) -> DataFrame:
    """create → merge(bootstrap) → merge(batch2) → read."""
    # Path is namespaced by the Spark applicationId: two concurrent
    # sessions running the same query (driver gate + pytest parity or
    # bench) would otherwise race on one fixed /tmp table — one rmtrees
    # while the other is mid-merge.  Within a session, reruns reuse and
    # clean the same path.
    app_id = spark.sparkContext.applicationId
    path = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_merge_{app_id}_{policy}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    table = ManagedTable.create(
        spark,
        path,
        _SCHEMA,
        partition_cols=["o_orderstatus"],
        key_cols=["o_orderkey"],
        order_column="change_seq",
        merge_policy=policy,
    )
    table.merge(_bootstrap(spark, sf))
    table.merge(batch2)
    out = table.read()
    return out.select(
        "o_orderkey",
        "o_orderstatus",
        (F.round(F.col("price"), 2) + F.lit(0.0)).alias("price"),
        "change_seq",
    )


@query(
    "merge_upsert_unconditional",
    f"""
    WITH b1 AS ({_B1_SQL}),
    b2raw AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice + 100.0 AS price,
             CAST(2 AS BIGINT) AS change_seq
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice + 200.0, CAST(3 AS BIGINT)
      FROM orders WHERE o_orderkey % 4 = 0
    ),
    b2 AS (
      SELECT o_orderkey, o_orderstatus, price, change_seq FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY o_orderkey ORDER BY change_seq DESC) AS rn
        FROM b2raw
      ) WHERE rn = 1
    ),
    final AS (
      SELECT * FROM b1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b2)
      UNION ALL
      SELECT * FROM b2
    )
    SELECT o_orderkey, o_orderstatus,
           ROUND(price, 2) + 0.0 AS price, change_seq
    FROM final
    """,
    rank=10,
)
def merge_upsert_unconditional(spark: SparkSession, sf: str) -> DataFrame:
    """Two-batch CDC upsert, reference semantics (WHEN MATCHED THEN
    UPDATE with no recency guard, mergeSQL.sql:24-32): the CDC batch
    carries duplicate keys at different ``change_seq`` so the
    dedup-by-recency subquery (mergeSQL.sql:14-21) is exercised, then
    matched keys take the batch row unconditionally.

    Scale: the merge reads only the hive partitions present in the
    batch and shuffles once on the key (table.py merge)."""
    o = t(spark, sf, "orders")
    seq2 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        (F.col("o_totalprice") + 100.0).cast("double").alias("price"),
        F.lit(2).cast("long").alias("change_seq"),
    )
    seq3 = o.filter(F.col("o_orderkey") % 4 == 0).select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        (F.col("o_totalprice") + 200.0).cast("double").alias("price"),
        F.lit(3).cast("long").alias("change_seq"),
    )
    return _run_cdc_scenario(
        spark, sf, "unconditional", seq2.unionByName(seq3)
    )


@query(
    "merge_upsert_latest_wins",
    f"""
    WITH b1 AS ({_B1_SQL}),
    b2 AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice + 100.0 AS price,
             CAST(CASE WHEN o_orderkey % 5 = 0 THEN 0 ELSE 2 END AS BIGINT)
               AS change_seq
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    final AS (
      SELECT o_orderkey, o_orderstatus, price, change_seq FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY o_orderkey ORDER BY change_seq DESC) AS rn
        FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2)
      ) WHERE rn = 1
    )
    SELECT o_orderkey, o_orderstatus,
           ROUND(price, 2) + 0.0 AS price, change_seq
    FROM final
    """,
    rank=10,
)
def merge_upsert_latest_wins(spark: SparkSession, sf: str) -> DataFrame:
    """Two-batch CDC upsert under ``latest_wins`` (the redelivery-safe
    mode, SURVEY §2.4 T4): 1/5 of the CDC batch arrives with a STALE
    ``change_seq`` (0 < the table's 1) and must NOT overwrite the
    bootstrap row; fresh rows (seq 2) and brand-new keys land."""
    o = t(spark, sf, "orders")
    batch = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        (F.col("o_totalprice") + 100.0).cast("double").alias("price"),
        F.when(F.col("o_orderkey") % 5 == 0, 0)
        .otherwise(2)
        .cast("long")
        .alias("change_seq"),
    )
    return _run_cdc_scenario(spark, sf, "latest_wins", batch)


_ROLLUP_SRC_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("price_cents", T.LongType(), True),
    ]
)


@query(
    "incremental_rollup_orders",
    """
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_price_cents
    FROM orders
    GROUP BY o_orderstatus
    """,
    rank=20,
    driver=False,  # r07: rotated out (long-green; pytest parity + bench)
)
def incremental_rollup_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Incrementally-maintained aggregate table (operators/rollup.py)
    end-to-end at driver-gate time: create an append-only source
    ManagedTable, land orders in two batches, refresh the rollup after
    each — the SECOND refresh consumes only the second batch via the
    change feed's file-level fast path (O(new data), never a full
    re-aggregate) — then read the summary back.  The oracle aggregates
    the whole orders table from scratch; matching it proves the
    incremental folds compose to the exact full answer."""
    from .operators.rollup import create_rollup, refresh_rollup  # noqa: PLC0415

    app_id = spark.sparkContext.applicationId
    base = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_rollup_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    src = ManagedTable.create(
        spark, os.path.join(base, "src"), _ROLLUP_SRC_SCHEMA,
        key_cols=["o_orderkey"],
    )
    # sums maintained in exact integer cents: two incremental folds
    # plus one full oracle SUM would otherwise disagree at a 2-dp
    # rounding boundary (float summation-order sensitivity, the repo's
    # known cross-engine trap)
    o = t(spark, sf, "orders").select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    dst = create_rollup(src, os.path.join(base, "rollup"),
                        ["o_orderstatus"], ["price_cents"])
    src.append(o.filter(F.col("o_orderkey") % 3 != 0))
    refresh_rollup(src, dst, ["o_orderstatus"], ["price_cents"])
    src.append(o.filter(F.col("o_orderkey") % 3 == 0))
    refresh_rollup(src, dst, ["o_orderstatus"], ["price_cents"])
    return dst.read().select(
        "o_orderstatus",
        "n_rows",
        F.col("sum_price_cents").cast("long").alias("sum_price_cents"),
    )


@query(
    "incremental_rollup_upsert_orders",
    """
    WITH b1 AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    b2 AS (
      SELECT o_orderkey, 'X' AS o_orderstatus,
             CAST(ROUND(o_totalprice * 100) + 500 AS BIGINT) AS price_cents
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    merged AS (
      SELECT * FROM b1
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b2)
      UNION ALL SELECT * FROM b2
    ),
    final AS (SELECT * FROM merged WHERE o_orderkey % 7 <> 0)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(price_cents) AS BIGINT) AS sum_price_cents
    FROM final GROUP BY o_orderstatus
    """,
    rank=20,
)
def incremental_rollup_upsert_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental view maintenance over an UPSERT + DELETE stream —
    the retraction path (operators/rollup.py + table.read_changes_cdf):
    bootstrap-append, then a merge batch that both updates rows INTO a
    different group ('X' — contributions must move between groups via
    pre-image retraction + post-image addition) and inserts new keys,
    then a tombstoned delete batch; the rollup is refreshed after each
    from the table's change feed, never re-aggregated.  Sums live in
    integer cents carried as doubles (exact to 2^53), so incremental
    add/subtract is bit-exact against the oracle's full re-aggregation
    of the final state.  Scale shape per refresh: O(window rows +
    matching base keys + affected groups) — the base pre-image read is
    key-restricted below the MOR resolution window and manifest-stats
    pruned."""
    from .operators.rollup import create_rollup, refresh_rollup  # noqa: PLC0415

    app_id = spark.sparkContext.applicationId
    base = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_rollup_ivm_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    src = ManagedTable.create(
        spark, os.path.join(base, "src"), _ROLLUP_SRC_SCHEMA,
        key_cols=["o_orderkey"], table_type="MOR",
    )
    o = t(spark, sf, "orders").select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    dst = create_rollup(src, os.path.join(base, "rollup"),
                        ["o_orderstatus"], ["price_cents"])
    src.append(o.filter(F.col("o_orderkey") % 3 != 0))
    refresh_rollup(src, dst, ["o_orderstatus"], ["price_cents"])
    src.merge(
        o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            (F.col("price_cents") + 500).alias("price_cents"),
        )
    )
    refresh_rollup(src, dst, ["o_orderstatus"], ["price_cents"])
    src.delete_keys(
        o.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    )
    refresh_rollup(src, dst, ["o_orderstatus"], ["price_cents"])
    return dst.read().select(
        "o_orderstatus",
        "n_rows",
        F.col("sum_price_cents").cast("long").alias("sum_price_cents"),
    )


@query(
    "incremental_rollup_minmax_orders",
    """
    WITH b1 AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    b2 AS (
      SELECT o_orderkey, 'X' AS o_orderstatus,
             CAST(ROUND(o_totalprice * 100) + 500 AS BIGINT) AS price_cents
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    merged AS (
      SELECT * FROM b1
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b2)
      UNION ALL SELECT * FROM b2
    ),
    final AS (SELECT * FROM merged WHERE o_orderkey % 7 <> 0)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(price_cents) AS BIGINT) AS min_price_cents,
           CAST(MAX(price_cents) AS BIGINT) AS max_price_cents
    FROM final GROUP BY o_orderstatus
    """,
    rank=20,
)
def incremental_rollup_minmax_orders(spark: SparkSession, sf: str) -> DataFrame:
    """MIN/MAX incremental view maintenance — the NON-additive family
    (operators/rollup.py min_cols/max_cols): same upsert + delete
    stream as incremental_rollup_upsert_orders, but the maintained
    aggregates are group extremes.  Inserts fold via least/greatest;
    the delete batch retracts rows that INCLUDE stored group minima,
    so the refresh must take the bounded affected-group rescan path
    (recompute from the source pinned at the window's high version) to
    recover the runner-up values — a pure fold could not produce them.
    Extremes live in exact integer cents, so the incremental result is
    bit-identical to the oracle's full re-aggregation of the final
    state.  Scale shape: rescan bounded by retraction-touched groups,
    isin pushed to the source scan when the group-value set is small."""
    from .operators.rollup import create_rollup, refresh_rollup  # noqa: PLC0415

    app_id = spark.sparkContext.applicationId
    base = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_rollup_mm_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    src = ManagedTable.create(
        spark, os.path.join(base, "src"), _ROLLUP_SRC_SCHEMA,
        key_cols=["o_orderkey"], table_type="MOR",
    )
    o = t(spark, sf, "orders").select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    dst = create_rollup(
        src, os.path.join(base, "rollup"), ["o_orderstatus"], [],
        min_cols=["price_cents"], max_cols=["price_cents"],
    )
    kw = {"min_cols": ["price_cents"], "max_cols": ["price_cents"]}
    src.append(o.filter(F.col("o_orderkey") % 3 != 0))
    refresh_rollup(src, dst, ["o_orderstatus"], [], **kw)
    # merge + delete land in ONE refresh window (two commits, one
    # fold): exercises the multi-commit window path and keeps the
    # entry's wall time constant-bounded (each refresh is ~6 actions)
    src.merge(
        o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            (F.col("price_cents") + 500).alias("price_cents"),
        )
    )
    src.delete_keys(
        o.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    )
    refresh_rollup(src, dst, ["o_orderstatus"], [], **kw)
    return dst.read().select(
        "o_orderstatus",
        "n_rows",
        F.col("min_price_cents").cast("long").alias("min_price_cents"),
        F.col("max_price_cents").cast("long").alias("max_price_cents"),
    )


_ROLLUP_DISTINCT_SRC_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("cust_bucket", T.LongType(), True),
    ]
)


@query(
    "incremental_rollup_distinct_orders",
    """
    WITH b1 AS (
      SELECT o_orderkey, o_orderstatus,
             o_custkey % 50 AS cust_bucket
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    b2 AS (
      SELECT o_orderkey, 'X' AS o_orderstatus,
             o_custkey % 7 AS cust_bucket
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    merged AS (
      SELECT * FROM b1
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b2)
      UNION ALL SELECT * FROM b2
    ),
    final AS (SELECT * FROM merged WHERE o_orderkey % 7 <> 0)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT cust_bucket) AS BIGINT) AS n_distinct_cust_bucket
    FROM final GROUP BY o_orderstatus
    """,
    rank=20,
)
def incremental_rollup_distinct_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Exact COUNT(DISTINCT) incremental view maintenance
    (operators/rollup.py distinct_cols): the same upsert + delete
    stream as the other rollup entries, over a heavily-duplicated
    value column (custkey buckets — many source rows per (group,
    value) pair).  Distinct counts survive retraction only through the
    companion per-(group, value) counts table: deleting ONE holder of
    a duplicated value must not drop the count, deleting the LAST
    holder must — transitions through zero are the signal, and only
    the companion sees them.  The final state is bit-identical to the
    oracle's full COUNT(DISTINCT) re-aggregation.  Scale shape per
    refresh: one O(delta) keyed companion merge + an affected-group-
    restricted count over it; never O(table)."""
    from .operators.rollup import create_rollup, refresh_rollup  # noqa: PLC0415

    app_id = spark.sparkContext.applicationId
    base = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_rollup_dc_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    src = ManagedTable.create(
        spark, os.path.join(base, "src"), _ROLLUP_DISTINCT_SRC_SCHEMA,
        key_cols=["o_orderkey"], table_type="MOR",
    )
    o = t(spark, sf, "orders").select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        F.col("o_custkey").cast("long").alias("o_custkey"),
    )
    dst = create_rollup(
        src, os.path.join(base, "rollup"), ["o_orderstatus"], [],
        distinct_cols=["cust_bucket"],
    )
    kw = {"distinct_cols": ["cust_bucket"]}
    src.append(
        o.filter(F.col("o_orderkey") % 3 != 0).select(
            "o_orderkey", "o_orderstatus",
            (F.col("o_custkey") % 50).alias("cust_bucket"),
        )
    )
    refresh_rollup(src, dst, ["o_orderstatus"], [], **kw)
    # merge + delete in one refresh window (multi-commit fold)
    src.merge(
        o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            (F.col("o_custkey") % 7).alias("cust_bucket"),
        )
    )
    src.delete_keys(
        o.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    )
    refresh_rollup(src, dst, ["o_orderstatus"], [], **kw)
    return dst.read().select(
        "o_orderstatus",
        "n_rows",
        F.col("n_distinct_cust_bucket").cast("long")
        .alias("n_distinct_cust_bucket"),
    )


_ROLLUP_REAGG_SRC_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
        T.StructField("price_cents", T.LongType(), True),
        T.StructField("cust_bucket", T.LongType(), True),
    ]
)


@query(
    "rollup_reaggregate_orders",
    """
    WITH b1 AS (
      SELECT o_orderkey, o_orderstatus, o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
             o_custkey % 50 AS cust_bucket
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    b2 AS (
      SELECT o_orderkey, 'X' AS o_orderstatus, o_orderpriority,
             CAST(ROUND(o_totalprice * 100) + 500 AS BIGINT) AS price_cents,
             o_custkey % 7 AS cust_bucket
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    merged AS (
      SELECT * FROM b1
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b2)
      UNION ALL SELECT * FROM b2
    ),
    final AS (SELECT * FROM merged WHERE o_orderkey % 7 <> 0)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(price_cents) AS BIGINT) AS sum_price_cents,
           CAST(MIN(price_cents) AS BIGINT) AS min_price_cents,
           CAST(MAX(price_cents) AS BIGINT) AS max_price_cents,
           CAST(COUNT(DISTINCT cust_bucket) AS BIGINT)
             AS n_distinct_cust_bucket
    FROM final GROUP BY o_orderstatus
    """,
    rank=20,
)
def rollup_reaggregate_orders(spark: SparkSession, sf: str) -> DataFrame:
    """MV-routing flagship: ONE rollup maintained at (status, priority)
    granularity through the upsert + delete stream — every aggregate
    family at once (count, sum, min/max via affected-group rescan,
    COUNT(DISTINCT) via the companion) — then a COARSER query
    (GROUP BY status) answered from the rollup by reaggregate_rollup,
    never touching the base table: counts/sums re-add, extremes
    re-fold (associative), distinct recounted from the companion
    (per-group distinct counts do NOT add — bucket values are shared
    across priorities by construction here, so a naive sum would
    overcount and hash-mismatch).  The oracle re-aggregates the final
    state at the coarse granularity directly.  Scale shape: the
    coarse answer reads group-cardinality-sized tables only."""
    from .operators.rollup import (  # noqa: PLC0415
        create_rollup,
        reaggregate_rollup,
        refresh_rollup,
    )

    app_id = spark.sparkContext.applicationId
    base = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_rollup_ra_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    src = ManagedTable.create(
        spark, os.path.join(base, "src"), _ROLLUP_REAGG_SRC_SCHEMA,
        key_cols=["o_orderkey"], table_type="MOR",
    )
    o = t(spark, sf, "orders").select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
    )
    groups = ["o_orderstatus", "o_orderpriority"]
    kw = {
        "min_cols": ["price_cents"],
        "max_cols": ["price_cents"],
        "distinct_cols": ["cust_bucket"],
    }
    dst = create_rollup(
        src, os.path.join(base, "rollup"), groups, ["price_cents"], **kw
    )
    src.append(
        o.filter(F.col("o_orderkey") % 3 != 0).select(
            "o_orderkey", "o_orderstatus", "o_orderpriority", "price_cents",
            (F.col("o_custkey") % 50).alias("cust_bucket"),
        )
    )
    refresh_rollup(src, dst, groups, ["price_cents"], **kw)
    # merge + delete in one refresh window (multi-commit fold)
    src.merge(
        o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            "o_orderpriority",
            (F.col("price_cents") + 500).alias("price_cents"),
            (F.col("o_custkey") % 7).alias("cust_bucket"),
        )
    )
    src.delete_keys(
        o.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    )
    refresh_rollup(src, dst, groups, ["price_cents"], **kw)
    return reaggregate_rollup(
        dst, ["o_orderstatus"], sum_cols=["price_cents"], **kw
    ).select(
        "o_orderstatus",
        "n_rows",
        F.col("sum_price_cents").cast("long").alias("sum_price_cents"),
        F.col("min_price_cents").cast("long").alias("min_price_cents"),
        F.col("max_price_cents").cast("long").alias("max_price_cents"),
        F.col("n_distinct_cust_bucket").cast("long")
        .alias("n_distinct_cust_bucket"),
    )


@query(
    "incremental_rollup_var_orders",
    """
    WITH b1 AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100000 AS vb
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    b2 AS (
      SELECT o_orderkey, 'X' AS o_orderstatus,
             (CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100000) + 500 AS vb
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    merged AS (
      SELECT * FROM b1
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b2)
      UNION ALL SELECT * FROM b2
    ),
    final AS (SELECT * FROM merged WHERE o_orderkey % 7 <> 0)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT)      AS n_rows,
           CAST(SUM(vb) AS BIGINT)       AS sum_vb,
           CAST(SUM(vb * vb) AS BIGINT)  AS sumsq_vb,
           ROUND(CAST(SUM(vb) AS DOUBLE) / COUNT(*), 6) AS avg_vb,
           ROUND(GREATEST(
             CAST(SUM(vb * vb) AS DOUBLE) / COUNT(*)
             - (CAST(SUM(vb) AS DOUBLE) / COUNT(*))
               * (CAST(SUM(vb) AS DOUBLE) / COUNT(*)),
             0.0), 4) AS var_vb
    FROM final GROUP BY o_orderstatus
    """,
    rank=20,
)
def incremental_rollup_var_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Second-moment IVM (operators/rollup.py sumsq_cols +
    rollup_stats): Σx² maintained next to Σx through the same upsert +
    delete stream as the other rollup entries — updates move BOTH
    moments between groups via retraction, deletes subtract them —
    then AVG and population VARIANCE are DERIVED from the maintained
    moments, never recomputed from the base.  The measure is bounded
    (price cents mod 1e5) so Σx² stays far under 2^53 and the double
    arithmetic is exact on both engines; the oracle mirrors the
    var = Σx²/n − (Σx/n)² form operation-for-operation so the rounded
    derived columns compare bit-stable.  Scale shape: identical to
    the additive rollup — one windowed aggregate, one keyed merge;
    variance adds ZERO rescans (second moments are additive)."""
    from .operators.rollup import (  # noqa: PLC0415
        create_rollup,
        refresh_rollup,
        rollup_stats,
    )

    app_id = spark.sparkContext.applicationId
    base = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_rollup_var_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    src = ManagedTable.create(
        spark, os.path.join(base, "src"), _ROLLUP_SRC_SCHEMA,
        key_cols=["o_orderkey"], table_type="MOR",
    )
    o = t(spark, sf, "orders").select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        (F.round(F.col("o_totalprice") * 100).cast("long") % 100000)
        .alias("price_cents"),
    )
    kw = {"sumsq_cols": ["price_cents"]}
    dst = create_rollup(src, os.path.join(base, "rollup"),
                        ["o_orderstatus"], ["price_cents"], **kw)
    src.append(o.filter(F.col("o_orderkey") % 3 != 0))
    refresh_rollup(src, dst, ["o_orderstatus"], ["price_cents"], **kw)
    src.merge(
        o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            (F.col("price_cents") + 500).alias("price_cents"),
        )
    )
    refresh_rollup(src, dst, ["o_orderstatus"], ["price_cents"], **kw)
    src.delete_keys(
        o.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    )
    refresh_rollup(src, dst, ["o_orderstatus"], ["price_cents"], **kw)
    return rollup_stats(dst.read(), ["price_cents"]).select(
        "o_orderstatus",
        "n_rows",
        F.col("sum_price_cents").cast("long").alias("sum_vb"),
        F.col("sumsq_price_cents").cast("long").alias("sumsq_vb"),
        F.round(F.col("avg_price_cents"), 6).alias("avg_vb"),
        F.round(F.col("var_price_cents"), 4).alias("var_vb"),
    )


@query(
    "cdc_export_roundtrip_orders",
    """
    WITH b1 AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100000 AS vb
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    b2 AS (
      SELECT o_orderkey, 'X' AS o_orderstatus,
             (CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100000) + 500 AS vb
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    merged AS (
      SELECT * FROM b1
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b2)
      UNION ALL SELECT * FROM b2
    )
    SELECT o_orderkey, o_orderstatus, vb
    FROM merged WHERE o_orderkey % 7 <> 0
    """,
    rank=20,
)
def cdc_export_roundtrip_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Outbound CDC round-trip (operators/cdc_export.py): the same
    upsert + delete stream as the rollup entries, EXPORTED after every
    batch as immutable parquet window directories (atomic rename
    publish, cursor = the listing) — then the final live state is
    reconstructed FROM THE EXPORT ALONE (``replay_to_state``: per key,
    the latest window's net-effect change wins, deletes drop) and must
    equal the table, which the oracle re-derives relationally.  This
    value-checks the whole outbound connector path: window splitting,
    net-effect CDF classification (insert/pre/post/delete), atomic
    publish, and downstream replay semantics.  Scale shape: each
    export is O(window) off the MOR fast path; replay reads only the
    export (one shuffle per key-window rank)."""
    from .operators.cdc_export import (  # noqa: PLC0415
        create_change_export,
        export_changes,
        read_change_export,
        replay_to_state,
    )

    app_id = spark.sparkContext.applicationId
    base = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_cdcx_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    src = ManagedTable.create(
        spark, os.path.join(base, "src"), _ROLLUP_SRC_SCHEMA,
        key_cols=["o_orderkey"], table_type="MOR",
    )
    ex = os.path.join(base, "export")
    create_change_export(src, ex)
    o = t(spark, sf, "orders").select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        (F.round(F.col("o_totalprice") * 100).cast("long") % 100000)
        .alias("price_cents"),
    )
    src.append(o.filter(F.col("o_orderkey") % 3 != 0))
    export_changes(src, ex)
    src.merge(
        o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            (F.col("price_cents") + 500).alias("price_cents"),
        )
    )
    export_changes(src, ex)
    src.delete_keys(
        o.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    )
    export_changes(src, ex)
    return replay_to_state(
        read_change_export(spark, ex), ["o_orderkey"]
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("price_cents").alias("vb"),
    )


@query(
    "cdc_replica_sync_orders",
    """
    WITH o AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100000 AS vb
      FROM orders
    ),
    b1 AS (SELECT * FROM o WHERE o_orderkey % 3 <> 0),
    b2 AS (
      SELECT o_orderkey, 'X' AS o_orderstatus, vb + 500 AS vb
      FROM o WHERE o_orderkey % 10 = 0
    ),
    merged AS (
      SELECT * FROM b1
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b2)
      UNION ALL SELECT * FROM b2
    )
    SELECT o_orderkey, o_orderstatus, vb
    FROM merged WHERE o_orderkey % 21 <> 0
    """,
    rank=20,
)
def cdc_replica_sync_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Two-table replication over the outbound connector
    (operators/cdc_export.py): a source table ingests a CDC stream —
    insert batch, bounded group-moving upsert (10% of keys), bounded
    delete (~5%) — exporting each window; a REPLICA table is kept in
    sync by the production consumer loop (``sync_from_export``: tail
    from the replica's durable ``cdc-apply.cursor``, latest-per-key
    keyed merge + delete, cursor write last), with producer-side
    retention (``prune_export``) run below the replica's cursor
    between cycles so the tail genuinely consumes a pruned export,
    never full history.  The final REPLICA state must equal the
    relational restatement of the stream — value-checking the whole
    sync path: at-least-once tail → exactly-once application, cursor
    durability, and retention interop.  Scale shape: each cycle is
    O(tail) — directory-name pruning before Spark lists a file, one
    key-partitioned rank over the tail, one keyed MOR merge +
    tombstone delete on the replica; never O(history) or O(replica).
    Reference semantics: Delta's MERGE-from-CDF replication recipe;
    the reference itself replays full batches (spark-job/read.py:274),
    which cannot express incremental sync."""
    from .operators.cdc_export import (  # noqa: PLC0415
        create_change_export,
        export_changes,
        prune_export,
        sync_from_export,
    )

    app_id = spark.sparkContext.applicationId
    base = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_cdcrep_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    src = ManagedTable.create(
        spark, os.path.join(base, "src"), _ROLLUP_SRC_SCHEMA,
        key_cols=["o_orderkey"], table_type="MOR",
    )
    replica = ManagedTable.create(
        spark, os.path.join(base, "replica"), _ROLLUP_SRC_SCHEMA,
        key_cols=["o_orderkey"], table_type="MOR",
    )
    ex = os.path.join(base, "export")
    create_change_export(src, ex)
    o = t(spark, sf, "orders").select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        (F.round(F.col("o_totalprice") * 100).cast("long") % 100000)
        .alias("price_cents"),
    )
    src.append(o.filter(F.col("o_orderkey") % 3 != 0))
    export_changes(src, ex)
    cursor = sync_from_export(spark, ex, replica)
    prune_export(ex, cursor)
    src.merge(
        o.filter(F.col("o_orderkey") % 10 == 0).select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            (F.col("price_cents") + 500).alias("price_cents"),
        )
    )
    export_changes(src, ex)
    cursor = sync_from_export(spark, ex, replica)
    prune_export(ex, cursor)
    src.delete_keys(
        o.filter(F.col("o_orderkey") % 21 == 0).select("o_orderkey")
    )
    export_changes(src, ex)
    sync_from_export(spark, ex, replica)
    return replica.read().select(
        "o_orderkey",
        "o_orderstatus",
        F.col("price_cents").alias("vb"),
    )


@query(
    "cdc_takedown_cascade_orders",
    """
    WITH o AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100000 AS vb
      FROM orders
    ),
    b1 AS (SELECT * FROM o WHERE o_orderkey % 3 <> 0),
    b2 AS (
      SELECT o_orderkey, 'X' AS o_orderstatus, vb + 500 AS vb
      FROM o WHERE o_orderkey % 10 = 0
    ),
    merged AS (
      SELECT * FROM b1
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b2)
      UNION ALL SELECT * FROM b2
    ),
    final AS (SELECT * FROM merged WHERE o_orderkey % 17 <> 0)
    SELECT f.o_orderkey, f.o_orderstatus, f.vb, s.src
    FROM final f
    CROSS JOIN (VALUES ('boot'), ('synced')) AS s(src)
    """,
    rank=22,
)
def cdc_takedown_cascade_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Right-to-be-forgotten cascade through the replication pipeline
    (operators/cdc_export.py scrub_export_windows, r12): a source table
    ingests insert + 10%-upsert CDC batches, each exported and synced
    to a registered replica; a takedown then deletes ~6% of keys,
    publishes the delete window (so the tailing replica receives the
    removal), and SCRUBS every retained window — payload rows of the
    forgotten keys dropped, their delete rows nulled, window stamps
    untouched.  Two replicas are then value-checked against ONE
    relational restatement of the surviving state: the LAGGING replica
    (synced pre-takedown, catches up through the delete window) and a
    FRESH replica bootstrapped from the scrubbed export alone — the
    compliance claims in one query: the removal propagates forward,
    and scrubbed history still reconstructs exactly (modulo the
    forgotten keys, which appear nowhere).  Scale shape: the scrub is
    one reconciled probe scan over retained windows + a rewrite of
    only the hit windows (broadcast key join); syncs stay O(tail).
    Reference anchor: the reference has no compliance surface at all
    (spark-job/read.py); this cascade is what its MERGE-based pipeline
    (mergeSQL.sql) would need before serving takedown requests."""
    from .operators.cdc_export import (  # noqa: PLC0415
        create_change_export,
        export_changes,
        scrub_export_windows,
        sync_from_export,
    )

    app_id = spark.sparkContext.applicationId
    base = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_cdctd_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    src = ManagedTable.create(
        spark, os.path.join(base, "src"), _ROLLUP_SRC_SCHEMA,
        key_cols=["o_orderkey"], table_type="MOR",
    )
    replica = ManagedTable.create(
        spark, os.path.join(base, "replica"), _ROLLUP_SRC_SCHEMA,
        key_cols=["o_orderkey"], table_type="MOR",
    )
    ex = os.path.join(base, "export")
    create_change_export(src, ex)
    o = t(spark, sf, "orders").select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        (F.round(F.col("o_totalprice") * 100).cast("long") % 100000)
        .alias("price_cents"),
    )
    src.append(o.filter(F.col("o_orderkey") % 3 != 0))
    export_changes(src, ex)
    sync_from_export(spark, ex, replica, consumer_id="synced")
    src.merge(
        o.filter(F.col("o_orderkey") % 10 == 0).select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            (F.col("price_cents") + 500).alias("price_cents"),
        )
    )
    export_changes(src, ex)
    sync_from_export(spark, ex, replica, consumer_id="synced")
    # takedown: delete on the source, publish the delete window FIRST
    # (the tailing replica must receive the removal), then scrub all
    # retained history — the same order job.forget_keys uses
    forgotten = o.filter(F.col("o_orderkey") % 17 == 0).select("o_orderkey")
    src.delete_keys(forgotten)
    export_changes(src, ex)
    scrub_export_windows(spark, ex, forgotten, ["o_orderkey"])
    # the lagging replica catches up THROUGH the scrubbed history
    sync_from_export(spark, ex, replica, consumer_id="synced")
    # a fresh replica reconstructs state from the scrubbed export alone
    boot = ManagedTable.create(
        spark, os.path.join(base, "boot"), _ROLLUP_SRC_SCHEMA,
        key_cols=["o_orderkey"], table_type="MOR",
    )
    sync_from_export(spark, ex, boot, consumer_id="boot")
    out_cols = [
        "o_orderkey",
        "o_orderstatus",
        F.col("price_cents").alias("vb"),
    ]
    return (
        boot.read().select(*out_cols, F.lit("boot").alias("src"))
        .unionByName(
            replica.read().select(*out_cols, F.lit("synced").alias("src"))
        )
    )


@query(
    "incremental_topk_orders",
    """
    WITH b1 AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100000 AS vb
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    b2 AS (
      SELECT o_orderkey, 'X' AS o_orderstatus,
             (CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100000) + 500 AS vb
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    merged AS (
      SELECT * FROM b1
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b2)
      UNION ALL SELECT * FROM b2
    ),
    final AS (SELECT * FROM merged WHERE o_orderkey % 7 <> 0),
    ranked AS (
      SELECT o_orderstatus, o_orderkey, vb,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderstatus
               ORDER BY vb DESC NULLS LAST, o_orderkey ASC) AS rnk
      FROM final
    )
    SELECT o_orderstatus, CAST(rnk AS INTEGER) AS rnk, o_orderkey, vb
    FROM ranked WHERE rnk <= 5
    """,
    rank=20,
)
def incremental_topk_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental top-k materialization (operators/topk_mv.py): the
    5 highest-value orders per status maintained through the same
    upsert + delete stream as the rollup entries.  The append folds
    WITHOUT touching the base (new rows compete with each group's
    current top-5); the merge moves half the keys into a synthetic
    'X' group — its pre-images force the ORIGINAL groups onto the
    bounded rescan path while 'X' itself (insert-only) folds — and
    the delete retracts winners, forcing runner-up recovery.  The
    oracle re-ranks the final state with the identical strict total
    order (value desc nulls-last, key asc tie-break), so the
    maintained set must match row-for-row including ranks.  Scale
    shape: folds are O(window + k·affected groups); rescans bounded
    by retraction-touched groups with the capped-isin pushdown —
    never O(table)."""
    from .operators.topk_mv import (  # noqa: PLC0415
        create_topk_mv,
        read_topk,
        refresh_topk_mv,
    )

    app_id = spark.sparkContext.applicationId
    base = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_topk_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    src = ManagedTable.create(
        spark, os.path.join(base, "src"), _ROLLUP_SRC_SCHEMA,
        key_cols=["o_orderkey"], table_type="MOR",
    )
    o = t(spark, sf, "orders").select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        (F.round(F.col("o_totalprice") * 100).cast("long") % 100000)
        .alias("price_cents"),
    )
    kw = dict(
        group_cols=["o_orderstatus"], order_col="price_cents", k=5,
        id_cols=["o_orderkey"],
    )
    dst = create_topk_mv(src, os.path.join(base, "mv"), **kw)
    src.append(o.filter(F.col("o_orderkey") % 3 != 0))
    refresh_topk_mv(src, dst, **kw)
    src.merge(
        o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            (F.col("price_cents") + 500).alias("price_cents"),
        )
    )
    refresh_topk_mv(src, dst, **kw)
    src.delete_keys(
        o.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    )
    refresh_topk_mv(src, dst, **kw)
    return read_topk(dst, ["o_orderstatus"], "price_cents").select(
        "o_orderstatus",
        F.col("rnk").cast("int").alias("rnk"),
        "o_orderkey",
        F.col("price_cents").alias("vb"),
    )


@query(
    "incremental_rollup_hist_orders",
    """
    WITH b1 AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100000 AS vb
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    b2 AS (
      SELECT o_orderkey, 'X' AS o_orderstatus,
             (CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100000) + 500 AS vb
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    merged AS (
      SELECT * FROM b1
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b2)
      UNION ALL SELECT * FROM b2
    ),
    final AS (SELECT * FROM merged WHERE o_orderkey % 7 <> 0),
    binned AS (
      SELECT o_orderstatus,
             CASE WHEN CAST(vb AS DOUBLE) < 0.0 THEN 0
                  WHEN CAST(vb AS DOUBLE) >= 100000.0 THEN 21
                  ELSE LEAST(20, 1 + CAST(FLOOR(
                    (CAST(vb AS DOUBLE) - 0.0) / 5000.0) AS INTEGER))
             END AS bin_idx
      FROM final
    ),
    counts AS (
      SELECT o_orderstatus, bin_idx, COUNT(*) AS n
      FROM binned GROUP BY o_orderstatus, bin_idx
    ),
    cum AS (
      SELECT o_orderstatus, bin_idx, n,
             SUM(n) OVER (PARTITION BY o_orderstatus ORDER BY bin_idx)
               AS c,
             SUM(n) OVER (PARTITION BY o_orderstatus) AS total
      FROM counts
    ),
    quant AS (
      SELECT o_orderstatus,
        ROUND(ARG_MIN(
          CASE WHEN bin_idx = 0 THEN 0.0
               WHEN bin_idx = 21 THEN 100000.0
               ELSE 0.0 + CAST(bin_idx - 1 AS DOUBLE) * 5000.0
                    + 5000.0 * (0.5 * CAST(total AS DOUBLE)
                                - CAST(c - n AS DOUBLE))
                      / CAST(n AS DOUBLE) END,
          bin_idx)
          FILTER (WHERE CAST(c AS DOUBLE) >= 0.5 * CAST(total AS DOUBLE)
                        AND n > 0), 6) AS p50_vb,
        ROUND(ARG_MIN(
          CASE WHEN bin_idx = 0 THEN 0.0
               WHEN bin_idx = 21 THEN 100000.0
               ELSE 0.0 + CAST(bin_idx - 1 AS DOUBLE) * 5000.0
                    + 5000.0 * (0.9 * CAST(total AS DOUBLE)
                                - CAST(c - n AS DOUBLE))
                      / CAST(n AS DOUBLE) END,
          bin_idx)
          FILTER (WHERE CAST(c AS DOUBLE) >= 0.9 * CAST(total AS DOUBLE)
                        AND n > 0), 6) AS p90_vb
      FROM cum GROUP BY o_orderstatus
    ),
    grps AS (SELECT DISTINCT o_orderstatus FROM final),
    bins AS (SELECT UNNEST(GENERATE_SERIES(0, 21)) AS bin_idx)
    SELECT g.o_orderstatus,
           CAST(b.bin_idx AS INTEGER) AS bin_idx,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS bin_count,
           q.p50_vb, q.p90_vb
    FROM grps g
    CROSS JOIN bins b
    LEFT JOIN counts c
      ON c.o_orderstatus = g.o_orderstatus AND c.bin_idx = b.bin_idx
    JOIN quant q ON q.o_orderstatus = g.o_orderstatus
    """,
    rank=20,
)
def incremental_rollup_hist_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Histogram IVM (operators/rollup.py hist_cols +
    rollup_quantiles): a 20-bin fixed-width histogram (plus
    underflow/overflow) maintained per status group through the same
    upsert + delete stream as the other rollup entries.  Histograms
    are PURELY ADDITIVE — updates move bin counts between groups via
    CDF retractions, deletes subtract them, and no rescan ever fires —
    and they route approximate quantiles (P50/P90 via binned linear
    interpolation) without touching the base table.  The merge bumps
    values by +500, pushing the top slice past the declared hi bound
    into the OVERFLOW bin, so the clamp semantics are value-checked
    too.  The oracle recomputes the bins from the final state with the
    identical IEEE bin expression and mirrors the interpolation
    operation-for-operation (integer-valued doubles throughout, so the
    rounded estimates compare bit-stable).  Scale shape: identical to
    the additive rollup — one windowed aggregate with n_bins+2
    map-side-combined sums, one keyed merge; quantile answers read a
    group-cardinality-sized table."""
    from .operators.rollup import (  # noqa: PLC0415
        create_rollup,
        refresh_rollup,
        rollup_quantiles,
    )

    app_id = spark.sparkContext.applicationId
    base = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_rollup_hist_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    src = ManagedTable.create(
        spark, os.path.join(base, "src"), _ROLLUP_SRC_SCHEMA,
        key_cols=["o_orderkey"], table_type="MOR",
    )
    o = t(spark, sf, "orders").select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        (F.round(F.col("o_totalprice") * 100).cast("long") % 100000)
        .alias("price_cents"),
    )
    spec = (0.0, 100000.0, 20)
    kw = {"hist_cols": {"price_cents": spec}}
    dst = create_rollup(src, os.path.join(base, "rollup"),
                        ["o_orderstatus"], [], **kw)
    src.append(o.filter(F.col("o_orderkey") % 3 != 0))
    refresh_rollup(src, dst, ["o_orderstatus"], [], **kw)
    src.merge(
        o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            (F.col("price_cents") + 500).alias("price_cents"),
        )
    )
    refresh_rollup(src, dst, ["o_orderstatus"], [], **kw)
    src.delete_keys(
        o.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    )
    refresh_rollup(src, dst, ["o_orderstatus"], [], **kw)
    r = dst.read()
    q = rollup_quantiles(
        r, "price_cents", spec, [0.5, 0.9], ["o_orderstatus"]
    ).select(
        "o_orderstatus",
        F.round(F.col("p50_price_cents"), 6).alias("p50_vb"),
        F.round(F.col("p90_price_cents"), 6).alias("p90_vb"),
    )
    bins = r.select(
        "o_orderstatus",
        F.posexplode("hist_price_cents").alias("bin_idx", "bin_count"),
    )
    return bins.join(q, "o_orderstatus").select(
        "o_orderstatus",
        F.col("bin_idx").cast("int").alias("bin_idx"),
        F.col("bin_count").cast("long").alias("bin_count"),
        "p50_vb",
        "p90_vb",
    )


@query(
    "rollup_rollback_absorption_orders",
    """
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_price_cents
    FROM orders
    GROUP BY o_orderstatus
    """,
    rank=20,
)
def rollup_rollback_absorption_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Rollback absorbed by incremental view maintenance
    (table.rollback + operators/rollup.py): bootstrap a source, fold
    it into a rollup, land a merge that moves half the keys into a
    synthetic 'X' group, fold that too — then ROLL THE SOURCE BACK to
    the pre-merge snapshot and refresh again.  The rollback commits
    the old manifest as a NEW snapshot, so the change feed presents
    the window as a rewrite (full keyed diff) and the rollup's
    retraction path must undo the 'X' contributions exactly.  A final
    append of the remaining keys then rides the normal fast path
    ACROSS the rollback commit.  The oracle is simply the full
    aggregate of the orders table — every 'X' trace must be gone and
    every original contribution restored, bit-exact in integer cents.
    Scale shape: the rollback itself is O(1) metadata; only its keyed
    diff is data work, bounded by the rolled-back window's keys."""
    from .operators.rollup import create_rollup, refresh_rollup  # noqa: PLC0415

    app_id = spark.sparkContext.applicationId
    base = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_rollup_rb_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    src = ManagedTable.create(
        spark, os.path.join(base, "src"), _ROLLUP_SRC_SCHEMA,
        key_cols=["o_orderkey"], table_type="MOR",
    )
    o = t(spark, sf, "orders").select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    dst = create_rollup(src, os.path.join(base, "rollup"),
                        ["o_orderstatus"], ["price_cents"])
    src.append(o.filter(F.col("o_orderkey") % 3 != 0))
    refresh_rollup(src, dst, ["o_orderstatus"], ["price_cents"])
    keep = src._current_version()
    # a wrong turn: half the keys move into group 'X' with bumped sums
    src.merge(
        o.filter(
            (F.col("o_orderkey") % 3 != 0) & (F.col("o_orderkey") % 2 == 0)
        ).select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            (F.col("price_cents") + 500).alias("price_cents"),
        )
    )
    refresh_rollup(src, dst, ["o_orderstatus"], ["price_cents"])
    # undo it: restore the audited snapshot; IVM absorbs the rewrite
    src.rollback(keep)
    refresh_rollup(src, dst, ["o_orderstatus"], ["price_cents"])
    # and keep ingesting across the rollback commit
    src.append(o.filter(F.col("o_orderkey") % 3 == 0))
    refresh_rollup(src, dst, ["o_orderstatus"], ["price_cents"])
    return dst.read().select(
        "o_orderstatus",
        "n_rows",
        F.col("sum_price_cents").cast("long").alias("sum_price_cents"),
    )


@query(
    "compact_small_feed_continuity_orders",
    """
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_price_cents
    FROM orders
    GROUP BY o_orderstatus
    """,
    rank=20,
)
def compact_small_feed_continuity_orders(
    spark: SparkSession, sf: str
) -> DataFrame:
    """Change-feed continuity across PARTIAL small-file compaction
    (table.compact_small — the O(small files) maintenance cadence for
    the append-only steady state): three disjoint-key-range appends
    land with rollup refreshes interleaved; between the second and
    third, ``compact_small`` binpacks the accumulated small roots as a
    content-neutral ``maintenance`` snapshot.  The next refresh's
    consume window CONTAINS that commit — ``change_segments`` must
    split around it (folding the rewrite would double-count every
    compacted row) while still folding the real data on either side.
    The oracle re-aggregates everything from scratch; the binpack is
    asserted to have actually run (the scenario is vacuous
    otherwise).  Scale shape: maintenance cost stays O(small files),
    and the feed consumer pays nothing for it."""
    from .operators.rollup import create_rollup, refresh_rollup  # noqa: PLC0415

    app_id = spark.sparkContext.applicationId
    base = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_rollup_cs_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    src = ManagedTable.create(
        spark, os.path.join(base, "src"), _ROLLUP_SRC_SCHEMA,
        key_cols=["o_orderkey"],
    )
    o = t(spark, sf, "orders").select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    # contiguous key ranges: binpack's safety gate needs the live
    # entries provably pairwise disjoint on the single key column
    mx = int(o.agg(F.max("o_orderkey")).collect()[0][0])
    c1, c2 = mx // 3, 2 * mx // 3
    dst = create_rollup(src, os.path.join(base, "rollup"),
                        ["o_orderstatus"], ["price_cents"])
    src.append(o.filter(F.col("o_orderkey") <= c1))
    refresh_rollup(src, dst, ["o_orderstatus"], ["price_cents"])
    src.append(
        o.filter((F.col("o_orderkey") > c1) & (F.col("o_orderkey") <= c2))
    )
    folded = src.compact_small(max_entry_bytes=1 << 40)
    assert folded is not None, "binpack must have run for this scenario"
    # window (refresh1, here] = one data commit + one maintenance
    # commit: the refresh folds the former, skips the latter
    refresh_rollup(src, dst, ["o_orderstatus"], ["price_cents"])
    src.append(o.filter(F.col("o_orderkey") > c2))
    refresh_rollup(src, dst, ["o_orderstatus"], ["price_cents"])
    return dst.read().select(
        "o_orderstatus",
        "n_rows",
        F.col("sum_price_cents").cast("long").alias("sum_price_cents"),
    )


_JMV_ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("price_cents", T.LongType(), True),
    ]
)
_JMV_CUST_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), False),
        T.StructField("c_mktsegment", T.StringType(), True),
    ]
)


@query(
    "incremental_join_mv_orders_customer",
    """
    WITH b1 AS (
      SELECT o_orderkey, o_custkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    b2 AS (
      SELECT o_orderkey, (o_custkey % 50) + 1 AS o_custkey,
             CAST(ROUND(o_totalprice * 100) + 500 AS BIGINT) AS price_cents
      FROM orders WHERE o_orderkey % 100 = 0
    ),
    merged AS (
      SELECT * FROM b1
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b2)
      UNION ALL SELECT * FROM b2
    ),
    o_final AS (SELECT * FROM merged WHERE o_orderkey % 90 <> 0),
    c_final AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 25 = 0 THEN 'MOVED'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM customer
    )
    SELECT o.o_orderkey, o.o_custkey, o.price_cents, c.c_mktsegment
    FROM o_final o JOIN c_final c ON o.o_custkey = c.c_custkey
    """,
    rank=18,
)
def incremental_join_mv_orders_customer(
    spark: SparkSession, sf: str
) -> DataFrame:
    """Incrementally-maintained JOIN materialization
    (operators/join_mv.py) end-to-end at driver-gate time: orders ⋈
    customer kept in sync by affected-key recompute from BOTH sources'
    change feeds — never a full re-join.  The scenario exercises every
    delta class a join MV must absorb: bootstrap append, a merge batch
    that MOVES join keys (an updated order re-homes to ``(o_custkey %
    50) + 1`` — its old pair must vanish, its new one appear) while
    changing a payload column, a tombstoned left delete, and a
    right-side attribute update fanning out to every matching MV row.
    The oracle recomputes the join of the FINAL states from scratch;
    matching it proves the incremental folds compose exactly.  Scale
    shape per refresh: O(changed windows + rows matching the affected
    join keys) — the affected value set is pushed to both sources'
    scans via ``read_where_in`` when bounded, a distributed semi-join
    past the cap.  Batch predicates are chosen to keep the dirty key
    sets BOUNDED subsets of the key space (the operator's intended
    shape — a batch that moves half the table's keys is a full
    re-join by any strategy and measures nothing incremental); only
    the bootstrap fold is inherently full-corpus.  At sf0.1
    micro-batch sizes the entry is CONSTANT-dominated, not
    volume-dominated: each refresh is ~8 actions (two change-feed
    reads, three MOR-resolved slice reads, the keyed merge, the
    vanished probe + cursor) whose fixed cost amortizes at production
    batch sizes — the same adjudication as the
    ingest_cdc_merge_with_indexes bench entry."""
    from .operators.join_mv import (  # noqa: PLC0415
        create_join_mv,
        refresh_join_mv,
    )

    app_id = spark.sparkContext.applicationId
    base = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_join_mv_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    src_o = ManagedTable.create(
        spark, os.path.join(base, "o"), _JMV_ORDERS_SCHEMA,
        key_cols=["o_orderkey"], table_type="MOR",
    )
    src_c = ManagedTable.create(
        spark, os.path.join(base, "c"), _JMV_CUST_SCHEMA,
        key_cols=["c_custkey"], table_type="MOR",
    )
    mv = create_join_mv(
        src_o, src_c, os.path.join(base, "mv"),
        on=("o_custkey", "c_custkey"), consume_from=(1, 1),
    )
    on = ("o_custkey", "c_custkey")
    o = t(spark, sf, "orders").select(
        F.col("o_orderkey").cast("long"),
        F.col("o_custkey").cast("long"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    c = t(spark, sf, "customer").select(
        F.col("c_custkey").cast("long"), "c_mktsegment"
    )
    src_c.append(c)
    src_o.append(o.filter(F.col("o_orderkey") % 3 != 0))
    refresh_join_mv(src_o, src_c, mv, on=on)
    src_o.merge(
        o.filter(F.col("o_orderkey") % 100 == 0).select(
            "o_orderkey",
            (F.col("o_custkey") % 50 + 1).alias("o_custkey"),
            (F.col("price_cents") + 500).alias("price_cents"),
        )
    )
    refresh_join_mv(src_o, src_c, mv, on=on)
    src_o.delete_keys(
        o.filter(F.col("o_orderkey") % 90 == 0).select("o_orderkey")
    )
    src_c.merge(
        c.filter(F.col("c_custkey") % 25 == 0).select(
            "c_custkey", F.lit("MOVED").alias("c_mktsegment")
        )
    )
    refresh_join_mv(src_o, src_c, mv, on=on)
    return mv.read().select(
        "o_orderkey", "o_custkey", "price_cents", "c_mktsegment"
    )


@query(
    "incremental_agg_over_join_orders",
    """
    WITH base AS (
      SELECT o_orderkey, o_custkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
      FROM orders WHERE o_orderkey % 4 = 1
    ),
    b1 AS (SELECT * FROM base WHERE o_orderkey % 3 <> 0),
    b2 AS (
      SELECT o_orderkey, (o_custkey % 50) + 1 AS o_custkey,
             price_cents + 500 AS price_cents
      FROM base WHERE o_orderkey % 25 = 11
    ),
    merged AS (
      SELECT * FROM b1
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b2)
      UNION ALL SELECT * FROM b2
    ),
    o_final AS (SELECT * FROM merged WHERE o_orderkey % 15 <> 1),
    c_final AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 25 = 0 THEN 'MOVED'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM customer
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o.price_cents) AS BIGINT) AS sum_price_cents
    FROM o_final o JOIN c_final c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    rank=19,
)
def incremental_agg_over_join_orders(
    spark: SparkSession, sf: str
) -> DataFrame:
    """MULTI-LEVEL incremental view maintenance: a rollup maintained ON
    a join MV (aggregate-over-join) — the chain
    sources → refresh_join_mv → refresh_rollup(mv, …) with NO
    special-case code: the rollup machinery consumes ANY
    ManagedTable's change feed, and the MV's keyed merges + deletes
    arrive as retraction pairs its CDF path absorbs.  The stream
    exercises a left key-move (row re-segments via its join key), a
    left delete, and a RIGHT-side re-segmentation that fans out to
    every matching MV row — all folding through two IVM levels onto
    the oracle's from-scratch join+GROUP BY of the final states.
    Sums in exact integer cents.  Scale shape: level 1 is
    affected-key bounded, level 2 is affected-group bounded; neither
    re-reads a base table."""
    from .operators.join_mv import (  # noqa: PLC0415
        create_join_mv,
        refresh_join_mv,
    )
    from .operators.rollup import (  # noqa: PLC0415
        create_rollup,
        refresh_rollup,
    )

    app_id = spark.sparkContext.applicationId
    base = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_aoj_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    src_o = ManagedTable.create(
        spark, os.path.join(base, "o"), _JMV_ORDERS_SCHEMA,
        key_cols=["o_orderkey"], table_type="MOR",
    )
    src_c = ManagedTable.create(
        spark, os.path.join(base, "c"), _JMV_CUST_SCHEMA,
        key_cols=["c_custkey"], table_type="MOR",
    )
    mv = create_join_mv(
        src_o, src_c, os.path.join(base, "mv"),
        on=("o_custkey", "c_custkey"), consume_from=(1, 1),
    )
    roll = create_rollup(
        mv, os.path.join(base, "roll"), ["c_mktsegment"], ["price_cents"],
        consume_from=1,
    )
    on = ("o_custkey", "c_custkey")

    def sync():
        refresh_join_mv(src_o, src_c, mv, on=on)
        refresh_rollup(mv, roll, ["c_mktsegment"], ["price_cents"])

    o = t(spark, sf, "orders").filter(F.col("o_orderkey") % 4 == 1).select(
        F.col("o_orderkey").cast("long"),
        F.col("o_custkey").cast("long"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    c = t(spark, sf, "customer").select(
        F.col("c_custkey").cast("long"), "c_mktsegment"
    )
    src_c.append(c)
    src_o.append(o.filter(F.col("o_orderkey") % 3 != 0))
    sync()
    # one window per level holding a key-move merge, a delete, and a
    # right-side re-segmentation — bounded dirty sets (see the join-MV
    # entry's adjudication)
    src_o.merge(
        o.filter(F.col("o_orderkey") % 25 == 11).select(
            "o_orderkey",
            (F.col("o_custkey") % 50 + 1).alias("o_custkey"),
            (F.col("price_cents") + 500).alias("price_cents"),
        )
    )
    src_o.delete_keys(
        o.filter(F.col("o_orderkey") % 15 == 1).select("o_orderkey")
    )
    src_c.merge(
        c.filter(F.col("c_custkey") % 25 == 0).select(
            "c_custkey", F.lit("MOVED").alias("c_mktsegment")
        )
    )
    sync()
    return roll.read().select(
        "c_mktsegment",
        "n_rows",
        F.col("sum_price_cents").cast("long").alias("sum_price_cents"),
    )


_SCD_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("price_cents", T.LongType(), True),
        T.StructField("change_seq", T.LongType(), True),
    ]
)


# r08: rotated out (long-green r5-r7; pytest parity + bench keep it)
@query(
    "scd2_orders_history",
    """
    WITH ch AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
             CAST(1 AS BIGINT) AS change_seq
      FROM orders WHERE o_orderkey % 3 <> 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) + 500 AS BIGINT),
             CAST(2 AS BIGINT)
      FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT o_orderkey, o_orderstatus, price_cents,
           change_seq AS valid_from_seq,
           LEAD(change_seq) OVER (
             PARTITION BY o_orderkey ORDER BY change_seq) AS valid_to_seq,
           CAST(LEAD(change_seq) OVER (
             PARTITION BY o_orderkey ORDER BY change_seq) IS NULL AS INTEGER)
             AS is_current
    FROM ch
    """,
    rank=20,
    driver=False,
)
def scd2_orders_history(spark: SparkSession, sf: str) -> DataFrame:
    """SCD type-2 dimension history from a CDC feed
    (operators/scd.py), end-to-end through a ManagedTable at
    driver-gate time: bootstrap versions at seq 1, a second batch of
    updates at seq 2 folded INCREMENTALLY (only the batch's keys are
    re-windowed and merged back on (key, valid_from_seq) — closed-out
    current rows update in place, O(batch) per fold).  The oracle
    derives the same history with one window over the unioned change
    log; matching it proves the incremental folds compose exactly."""
    from .operators.scd import create_scd2_table, scd2_merge  # noqa: PLC0415

    app_id = spark.sparkContext.applicationId
    base = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_scd2_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    o = t(spark, sf, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    b1 = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").cast("long"), "o_orderstatus",
        cents.alias("price_cents"), F.lit(1).cast("long").alias("change_seq"),
    )
    b2 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").cast("long"), "o_orderstatus",
        (cents + 500).alias("price_cents"),
        F.lit(2).cast("long").alias("change_seq"),
    )
    hist = create_scd2_table(
        spark, os.path.join(base, "hist"), b1, ["o_orderkey"], "change_seq"
    )
    scd2_merge(hist, b1, ["o_orderkey"], "change_seq")
    scd2_merge(hist, b2, ["o_orderkey"], "change_seq")
    return hist.read().select(
        "o_orderkey", "o_orderstatus", "price_cents",
        "valid_from_seq", "valid_to_seq", "is_current",
    )


@query(
    "scd2_asof_lookup_orders",
    """
    WITH ch AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
             CAST(1 AS BIGINT) AS change_seq
      FROM orders WHERE o_orderkey % 3 <> 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) + 500 AS BIGINT),
             CAST(2 AS BIGINT)
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    hist AS (
      SELECT o_orderkey, o_orderstatus, price_cents,
             change_seq AS valid_from_seq,
             LEAD(change_seq) OVER (
               PARTITION BY o_orderkey ORDER BY change_seq) AS valid_to_seq
      FROM ch
    )
    SELECT o_orderkey, o_orderstatus, price_cents, valid_from_seq
    FROM hist
    WHERE valid_from_seq <= 1
      AND (valid_to_seq IS NULL OR valid_to_seq > 1)
    """,
    rank=20,
)
def scd2_asof_lookup_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time SCD2 read (operators/scd.py asof_lookup): the
    state of every key AS OF sequence 1 — keys later updated at seq 2
    must surface their seq-1 version, keys first seen at seq 2 must be
    absent (half-open validity: from ≤ s < to).  History derives from
    the same change log as ``scd2_orders_history`` via the one-window
    derivation; the lookup itself is a pure interval filter, so at
    scale it rides the history table's manifest stats (valid_from_seq
    is a key column) with zero shuffle."""
    from .operators.scd import asof_lookup, scd2_history  # noqa: PLC0415

    o = t(spark, sf, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    b1 = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").cast("long"), "o_orderstatus",
        cents.alias("price_cents"), F.lit(1).cast("long").alias("change_seq"),
    )
    b2 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").cast("long"), "o_orderstatus",
        (cents + 500).alias("price_cents"),
        F.lit(2).cast("long").alias("change_seq"),
    )
    hist = scd2_history(b1.unionByName(b2), ["o_orderkey"], "change_seq")
    return asof_lookup(hist, ["o_orderkey"], 1).select(
        "o_orderkey", "o_orderstatus", "price_cents", "valid_from_seq"
    )


@query(
    "merge_delete_reinsert",
    """
    SELECT o_orderkey, o_orderstatus,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
           CAST(1 AS BIGINT) AS change_seq
    FROM orders WHERE o_orderkey % 5 <> 0
    UNION ALL
    SELECT o_orderkey, o_orderstatus,
           CAST(ROUND(o_totalprice * 100) + 500 AS BIGINT),
           CAST(2 AS BIGINT)
    FROM orders WHERE o_orderkey % 10 = 0
    """,
    rank=20,
)
def merge_delete_reinsert(spark: SparkSession, sf: str) -> DataFrame:
    """The DELETE surface end-to-end (table.py delete_where): merge a
    full bootstrap into a MOR table, DELETE every 5th key (lands as an
    O(matched-keys) tombstone delta, no rewrite), then re-insert every
    10th key at seq 2 — revived keys must surface with their NEW row
    while never-revived deleted keys stay gone.  The oracle states the
    survivor set relationally."""
    app_id = spark.sparkContext.applicationId
    base = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_del_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    tbl = ManagedTable.create(
        spark, os.path.join(base, "t"), _SCD_SCHEMA,
        key_cols=["o_orderkey"], order_column="change_seq",
        merge_policy="latest_wins", table_type="MOR",
    )
    o = t(spark, sf, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    tbl.merge(o.select(
        F.col("o_orderkey").cast("long"), "o_orderstatus",
        cents.alias("price_cents"), F.lit(1).cast("long").alias("change_seq"),
    ))
    tbl.delete_where(F.col("o_orderkey") % 5 == 0)
    tbl.merge(o.filter(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").cast("long"), "o_orderstatus",
        (cents + 500).alias("price_cents"),
        F.lit(2).cast("long").alias("change_seq"),
    ))
    return tbl.read().select(
        "o_orderkey", "o_orderstatus", "price_cents", "change_seq"
    )


def _minhash_ingest_oracle() -> str:
    # full-corpus LSH oracle (pipeline_queries._minhash_oracle) at the
    # streaming module's defaults: the INCREMENTAL path must find
    # exactly the pairs one full-corpus pass finds
    from .pipeline_queries import _minhash_oracle  # noqa: PLC0415

    return _minhash_oracle(
        num_hashes=16, bands=4, threshold=0.12, max_band_freq=10_000
    )


@query(
    "minhash_index_ingest_pairs",
    None,  # placeholder; set right below (needs the generator above)
    driver=True,  # r07: new — gates the incremental near-dup index path
)
def minhash_index_ingest_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """The INCREMENTAL near-dup index path, driver-gated end-to-end:
    4 monotone doc_id slices of ``documents`` fold one after another
    into a fresh table-backed signature index
    (streaming/neardup.process_near_dup_batch_table — the same code
    the declarative ``minhash`` index and the streaming sink run), and
    the union of the per-batch verified pairs must equal the
    FULL-CORPUS LSH pass bit-for-bit (the oracle is the same SQL as
    minhash_lsh_near_dup_documents).

    This is the core claim of ingest-time dedup: a pair (a, b)
    collides incrementally iff it collides in one full pass — the
    later-arriving member finds the earlier one in the index (or both
    collide within a batch), band keys and signatures are the same
    md5-derived family, and verification reads the same stored
    shingle arrays.  Batches are monotone id RANGES, so every batch
    after the first also exercises the disjoint-id fast path
    (manifest-stats-proven seq-free reads).

    Equivalence caveat (documented, not hit here): the hot-band cap
    is evaluated against the population seen SO FAR, so a key that
    only crosses ``max_band_freq`` late emits its early pairs
    incrementally while a full pass suppresses the whole bucket.
    Exact equality therefore holds while every band key stays under
    the cap — true by orders of magnitude at gate scale (cap 10,000
    vs ≤5,000 docs)."""
    from .streaming.neardup import (  # noqa: PLC0415
        _NUM_HASHES,
        _index_schema,
        process_near_dup_batch_table,
    )

    app_id = spark.sparkContext.applicationId
    path = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_mhix_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    table = ManagedTable.create(
        spark,
        path,
        _index_schema(_NUM_HASHES),
        key_cols=["id"],
        table_type="MOR",
        properties={"write.max-delta-files": "4"},
    )
    docs = t(spark, sf, "documents").select("doc_id", "text")
    hi = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    bounds = [0, hi // 4, hi // 2, 3 * hi // 4, hi]
    parts = []
    for b in range(4):
        batch = docs.filter(
            (F.col("doc_id") >= bounds[b]) & (F.col("doc_id") < bounds[b + 1])
        )
        # pairs materialize eagerly (localCheckpoint inside), so the
        # union below stays valid however the index mutates later
        parts.append(
            process_near_dup_batch_table(batch, table, threshold=0.12)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "wap_audited_ingest_orders",
    f"""
    WITH b1 AS ({_B1_SQL}),
    b3 AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice + 50.0 AS price,
             CAST(2 AS BIGINT) AS change_seq
      FROM orders WHERE o_orderkey % 5 = 0
    ),
    final AS (
      SELECT * FROM b1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b3)
      UNION ALL
      SELECT * FROM b3
    )
    SELECT o_orderkey, o_orderstatus,
           ROUND(price, 2) + 0.0 AS price, change_seq
    FROM final
    """,
    rank=30,
    driver=True,  # r07: new — gates the write-audit-publish flow
)
def wap_audited_ingest_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Write-audit-publish end-to-end (table.py stage/audit_staged/
    publish_staged — the Iceberg WAP pattern over the manifest layer):
    three batches flow through an audited MOR ingest, and the BAD one
    must leave zero trace.

    1. bootstrap (keys %3≠0, seq 1): staged as append, audited clean
       (not_null / range / post-merge unique), published;
    2. poisoned CDC batch (keys %2=0, seq 2) where every 10th key
       carries a NEGATIVE price: staged as a MOR merge delta, the
       range(price ≥ 0) rule fires at publish time → AuditFailedError,
       stage discarded — the table must not contain any %2-only key or
       updated price from this batch;
    3. clean CDC batch (keys %5=0, price +50, seq 2): staged, audited,
       published — latest_wins resolution takes it over bootstrap rows.

    The oracle states the final table relationally from batches 1 and
    3 alone — batch 2 appearing anywhere breaks the hash.  Scale: the
    stage writes the batch at full parallelism ONCE; audit reads the
    staged delta + live manifest (no extra table rewrite); publish is
    a driver-side tagged CAS commit, so the audit window costs no data
    movement and concurrent commits don't invalidate the stage (MOR
    delta = version-independent)."""
    from .table import AuditFailedError  # noqa: PLC0415

    app_id = spark.sparkContext.applicationId
    path = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_wap_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    tbl = ManagedTable.create(
        spark, path, _SCHEMA,
        key_cols=["o_orderkey"], order_column="change_seq",
        merge_policy="latest_wins", table_type="MOR",
    )
    rules = [
        {"rule": "not_null", "column": "o_orderstatus"},
        {"rule": "range", "column": "price", "min": 0.0},
        {"rule": "unique", "columns": ["o_orderkey"]},
    ]
    o = t(spark, sf, "orders")

    sid = tbl.stage(_bootstrap(spark, sf), mode="append")
    tbl.publish_staged(sid, rules=rules)

    bad = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 10 == 0, -F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice") + 100.0)
        .cast("double")
        .alias("price"),
        F.lit(2).cast("long").alias("change_seq"),
    )
    sid = tbl.stage(bad, mode="merge")
    try:
        tbl.publish_staged(sid, rules=rules)
        raise RuntimeError("poisoned batch passed the audit gate")
    except AuditFailedError:
        tbl.discard_staged(sid)

    good = o.filter(F.col("o_orderkey") % 5 == 0).select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        (F.col("o_totalprice") + 50.0).cast("double").alias("price"),
        F.lit(2).cast("long").alias("change_seq"),
    )
    sid = tbl.stage(good, mode="merge")
    tbl.publish_staged(sid, rules=rules)

    return tbl.read().select(
        "o_orderkey",
        "o_orderstatus",
        (F.round(F.col("price"), 2) + F.lit(0.0)).alias("price"),
        "change_seq",
    )


@query(
    "hidden_partition_week_events",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_value_cents
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      AND ts <= TIMESTAMP '2024-01-14 23:59:59'
    GROUP BY event_type
    """,
    rank=30,
    driver=True,  # r07: new — gates hidden (transform) partitioning
)
def hidden_partition_week_events(spark: SparkSession, sf: str) -> DataFrame:
    """Hidden partitioning end-to-end (table.py partition_transforms —
    Iceberg's signature ``day(ts)`` transform): the events feed lands
    in a table whose STORAGE is day-partitioned by a column that never
    exists in the schema, then a one-week range query on ``ts`` runs
    through ``read_where`` — which maps the timestamp bounds into
    partition-value space and subsets the hive dirs to the 7 touched
    days before any file is opened (plus manifest-stats skipping, plus
    parquet row-group pruning on the residual predicate).

    Scale: this is THE time-series table layout at 100 TB — a year of
    data is ~365 partitions, a week's query opens 7, and the user
    never maintains a derived date column or remembers to filter on
    it.  The oracle computes the same week directly on the raw
    events."""
    import datetime as _dt  # noqa: PLC0415

    app_id = spark.sparkContext.applicationId
    path = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_hp_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    tbl = ManagedTable.create(
        spark, path, schema,
        partition_cols=["ts_day"],
        partition_transforms={"ts_day": "day(ts)"},
    )
    tbl.append(
        t(spark, sf, "events").select("event_id", "ts", "event_type", "value")
    )
    week = tbl.read_where(
        "ts",
        _dt.datetime(2024, 1, 8, 0, 0, 0),
        _dt.datetime(2024, 1, 14, 23, 59, 59),
    )
    return week.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("sum_value_cents"),
    )


@query(
    "partition_evolution_week_events",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_value_cents
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
      AND ts <= TIMESTAMP '2024-01-21 23:59:59'
    GROUP BY event_type
    """,
    rank=30,
    driver=True,  # r07: new — gates partition-spec evolution
)
def partition_evolution_week_events(spark: SparkSession, sf: str) -> DataFrame:
    """Partition-spec EVOLUTION end-to-end (table.py
    ``set_partition_spec`` — Iceberg's metadata-only layout change):
    half the events land under ``day(ts)`` partitioning, the spec
    evolves to ``month(ts)``, the other half lands under the new
    layout, and a one-week range query then prunes EACH generation
    under the spec it was written with (``_prune_entry_parts`` resolves
    the entry's own transforms) — old entries subset to 7 day dirs, new
    entries to 1 month dir, no file rewritten by the evolution.

    Scale: re-partitioning a 100 TB table because days got too small
    (or too big) must not rewrite 100 TB — the spec change is one
    metadata commit, old data keeps serving correctly pruned, and
    ``compact()`` migrates the layout incrementally at maintenance
    cadence.  The oracle computes the same week on the raw events."""
    import datetime as _dt  # noqa: PLC0415

    app_id = spark.sparkContext.applicationId
    path = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_pse_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    tbl = ManagedTable.create(
        spark, path, schema,
        partition_cols=["ts_day"],
        partition_transforms={"ts_day": "day(ts)"},
    )
    ev = t(spark, sf, "events").select("event_id", "ts", "event_type", "value")
    tbl.append(ev.filter(F.col("event_id") % 2 == 0))
    tbl.set_partition_spec(
        partition_cols=["ts_month"],
        partition_transforms={"ts_month": "month(ts)"},
    )
    tbl.append(ev.filter(F.col("event_id") % 2 == 1))
    week = tbl.read_where(
        "ts",
        _dt.datetime(2024, 1, 15, 0, 0, 0),
        _dt.datetime(2024, 1, 21, 23, 59, 59),
    )
    return week.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("sum_value_cents"),
    )


@query(
    "schema_evolution_ingest_documents",
    """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           source,
           CAST(n_chars AS BIGINT) AS n_chars,
           CASE WHEN doc_id % 2 = 1 OR doc_id % 10 = 0
                THEN lang END AS lang,
           CAST(CASE WHEN doc_id % 2 = 1 OR doc_id % 10 = 0
                     THEN 2 ELSE 1 END AS BIGINT) AS seq
    FROM documents
    """,
    rank=30,
    driver=True,  # r07: new — gates ingest-time schema evolution
)
def schema_evolution_ingest_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Ingest-time schema evolution end-to-end
    (``output_config.schema_evolution`` → ``ManagedTable.evolve_schema``):
    a merge-mode job absorbs a batch whose schema GREW — a new ``lang``
    column appears and ``n_chars`` widens int→bigint — and the table
    evolves instead of silently dropping the new data.

    1. bootstrap batch (even doc_ids, seq 1): (doc_id, source,
       n_chars INT) — the table is created at this narrow contract;
    2. evolved batch (odd doc_ids + every 10th id as an UPDATE, seq
       2): (doc_id, source, n_chars BIGINT, lang STRING) — processed
       through the SAME job config, which adds ``lang`` (nullable) and
       widens ``n_chars`` before the merge lands.

    The final read must serve BOTH generations under the evolved
    contract: bootstrap-only rows null-fill ``lang`` and promote their
    int32 ``n_chars`` at scan time (no file was rewritten — the
    evolution is metadata-only, table.py ``widen_column``).  The
    oracle restates the final table from the raw documents relation.

    Scale: evolution cost is one ``_meta.json`` rewrite regardless of
    table size — the 100 TB alternative (rewrite every file to the new
    schema) is exactly what this design avoids; old files promote in
    the parquet reader (SPARK-40876), new files land wide."""
    import glob as _glob  # noqa: PLC0415

    from . import job as J  # noqa: PLC0415
    from .config import JobConfig  # noqa: PLC0415

    app_id = spark.sparkContext.applicationId
    path = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_sev_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(path, ignore_errors=True)
    docs = t(spark, sf, "documents")
    b1 = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").cast("long"),
        "source",
        F.col("n_chars").cast("int"),
        F.lit(1).cast("long").alias("seq"),
    )
    b2 = docs.filter(
        (F.col("doc_id") % 2 == 1) | (F.col("doc_id") % 10 == 0)
    ).select(
        F.col("doc_id").cast("long"),
        "source",
        F.col("n_chars").cast("long"),
        "lang",
        F.lit(2).cast("long").alias("seq"),
    )
    b1.coalesce(1).write.mode("overwrite").parquet(f"{path}/land/b1")
    b2.coalesce(1).write.mode("overwrite").parquet(f"{path}/land/b2")
    ManagedTable.create(
        spark, f"{path}/tbl", b1.schema,
        key_cols=["doc_id"], order_column="seq", table_type="MOR",
    )
    cfg = JobConfig.from_dict(
        {
            "input_config": {"format": "parquet"},
            "output_config": {
                "table_path": f"{path}/tbl",
                "mode": "merge",
                "key_columns": ["doc_id"],
                "order_column": "seq",
                "schema_evolution": True,
            },
        }
    )
    for b in ("b1", "b2"):
        J.process_files(
            spark, cfg,
            sorted(_glob.glob(f"{path}/land/{b}/part-*.parquet")),
        )
    return ManagedTable.load(spark, f"{path}/tbl").read().select(
        "doc_id", "source", "n_chars", "lang", "seq"
    )


@query(
    "declarative_pipeline_orders",
    """
    WITH o AS (
      SELECT o_orderkey, o_orderstatus, o_custkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100000
               AS price_cents,
             'w' || CAST(o_orderkey % 20 AS VARCHAR) AS note
      FROM orders
    ),
    b1 AS (SELECT * FROM o WHERE o_orderkey % 3 <> 0),
    b2 AS (
      SELECT o_orderkey, 'X' AS o_orderstatus,
             (o_custkey % 50) + 1 AS o_custkey,
             price_cents + 500 AS price_cents,
             'w' || CAST((o_orderkey + 1) % 20 AS VARCHAR) AS note
      FROM o WHERE o_orderkey % 10 = 0
    ),
    merged AS (
      SELECT * FROM b1
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b2)
      UNION ALL SELECT * FROM b2
    ),
    final AS (SELECT * FROM merged WHERE o_orderkey % 21 <> 0),
    binned AS (
      SELECT o_orderstatus,
             CASE WHEN CAST(price_cents AS DOUBLE) < 0.0 THEN 0
                  WHEN CAST(price_cents AS DOUBLE) >= 100000.0 THEN 21
                  ELSE LEAST(20, 1 + CAST(FLOOR(
                    (CAST(price_cents AS DOUBLE) - 0.0) / 5000.0)
                    AS INTEGER))
             END AS bin_idx
      FROM final
    ),
    counts AS (
      SELECT o_orderstatus, bin_idx, COUNT(*) AS n
      FROM binned GROUP BY o_orderstatus, bin_idx
    ),
    cum AS (
      SELECT o_orderstatus, bin_idx, n,
             SUM(n) OVER (PARTITION BY o_orderstatus ORDER BY bin_idx)
               AS c,
             SUM(n) OVER (PARTITION BY o_orderstatus) AS total
      FROM counts
    ),
    quant AS (
      SELECT o_orderstatus,
        ROUND(ARG_MIN(
          CASE WHEN bin_idx = 0 THEN 0.0
               WHEN bin_idx = 21 THEN 100000.0
               ELSE 0.0 + CAST(bin_idx - 1 AS DOUBLE) * 5000.0
                    + 5000.0 * (0.5 * CAST(total AS DOUBLE)
                                - CAST(c - n AS DOUBLE))
                      / CAST(n AS DOUBLE) END,
          bin_idx)
          FILTER (WHERE CAST(c AS DOUBLE) >= 0.5 * CAST(total AS DOUBLE)
                        AND n > 0), 6) AS p50
      FROM cum GROUP BY o_orderstatus
    ),
    ranked AS (
      SELECT o_orderstatus, o_orderkey, price_cents,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderstatus
               ORDER BY price_cents DESC NULLS LAST, o_orderkey ASC)
               AS rnk
      FROM final
    )
    SELECT 'rollup' AS family, o_orderstatus AS grp, 'n' AS metric,
           CAST(COUNT(*) AS DOUBLE) AS val
    FROM final GROUP BY o_orderstatus
    UNION ALL
    SELECT 'rollup', o_orderstatus, 'sum', CAST(SUM(price_cents) AS DOUBLE)
    FROM final GROUP BY o_orderstatus
    UNION ALL
    SELECT 'rollup', o_orderstatus, 'ndistinct',
           CAST(COUNT(DISTINCT note) AS DOUBLE)
    FROM final GROUP BY o_orderstatus
    UNION ALL
    SELECT 'hist', o_orderstatus, 'p50', p50 FROM quant
    UNION ALL
    SELECT 'topk', o_orderstatus, 'key' || CAST(rnk AS VARCHAR),
           CAST(o_orderkey AS DOUBLE)
    FROM ranked WHERE rnk <= 3
    UNION ALL
    SELECT 'topk', o_orderstatus, 'val' || CAST(rnk AS VARCHAR),
           CAST(price_cents AS DOUBLE)
    FROM ranked WHERE rnk <= 3
    UNION ALL
    SELECT 'joinmv', c.c_mktsegment, 'n', CAST(COUNT(*) AS DOUBLE)
    FROM final f JOIN customer c ON f.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    UNION ALL
    SELECT 'joinmv', c.c_mktsegment, 'sum',
           CAST(SUM(f.price_cents) AS DOUBLE)
    FROM final f JOIN customer c ON f.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    UNION ALL
    SELECT 'index', 'all', 'n_docs', CAST(COUNT(*) AS DOUBLE) FROM final
    """,
    rank=21,
)
def declarative_pipeline_orders(spark: SparkSession, sf: str) -> DataFrame:
    """The declarative kitchen sink: ONE job config declaring a bm25
    index + a rollup (sums, exact COUNT(DISTINCT), fixed-bin
    histogram) + a join MV + a top-k MV + table maintenance, driven
    through ``process_files`` over a three-batch CDC stream (insert /
    group-moving upsert / delete) — proving the maintenance families
    COEXIST on one ingest path, including across the mid-stream
    compaction the maintenance cadence triggers (every MV's change
    window splits around that commit).  Every family is then
    VALUE-CHECKED against one relational restatement of the final
    state: rollup counts/sums/distincts per status, the histogram's
    routed P50, the top-3 keys and values per status, the join MV
    re-aggregated per market segment, and the search index's live doc
    count.  Scale shape: each family's per-batch refresh is the same
    trigger-bounded fold gated by its dedicated entry
    (incremental_rollup_*/topk/join_mv); this entry pins their
    COMPOSITION — shared change feed, interleaved maintenance, one
    committed cursor per family — not new per-family machinery."""
    import glob as _glob  # noqa: PLC0415
    import json as _json  # noqa: PLC0415

    from . import job as J  # noqa: PLC0415
    from .config import JobConfig  # noqa: PLC0415
    from .operators.rollup import rollup_quantiles  # noqa: PLC0415
    from .operators.search_index import load_search_index  # noqa: PLC0415
    from .operators.topk_mv import read_topk  # noqa: PLC0415

    app_id = spark.sparkContext.applicationId
    base = os.path.join(
        tempfile.gettempdir(),
        f"sg_driver_dp_{app_id}_{os.path.basename(sf.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    o = t(spark, sf, "orders").select(
        F.col("o_orderkey").cast("long"),
        "o_orderstatus",
        F.col("o_custkey").cast("long"),
        (F.round(F.col("o_totalprice") * 100).cast("long") % 100000)
        .alias("price_cents"),
        F.concat(F.lit("w"), (F.col("o_orderkey") % 20).cast("string"))
        .alias("note"),
    )
    b1 = o.filter(F.col("o_orderkey") % 3 != 0).select(
        "*", F.lit(1).cast("long").alias("seq"), F.lit("I").alias("Op")
    )
    b2 = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_custkey") % 50 + 1).alias("o_custkey"),
        (F.col("price_cents") + 500).alias("price_cents"),
        F.concat(F.lit("w"), ((F.col("o_orderkey") + 1) % 20).cast("string"))
        .alias("note"),
        F.lit(2).cast("long").alias("seq"),
        F.lit("U").alias("Op"),
    )
    b3 = o.filter(F.col("o_orderkey") % 21 == 0).select(
        "*", F.lit(3).cast("long").alias("seq"), F.lit("D").alias("Op")
    )
    for name, b in [("b1", b1), ("b2", b2), ("b3", b3)]:
        b.coalesce(1).write.mode("overwrite").parquet(f"{base}/land/{name}")
    # the dimension another job would maintain (static here — right-side
    # churn is gated by incremental_join_mv_orders_customer)
    c = t(spark, sf, "customer").select(
        F.col("c_custkey").cast("long"), "c_mktsegment"
    )
    dim = ManagedTable.create(
        spark, f"{base}/dim", c.schema, key_cols=["c_custkey"],
        table_type="MOR",
    )
    dim.append(c)
    with open(f"{base}/contract.avsc", "w") as fh:
        _json.dump(
            {
                "type": "record",
                "name": "orders_cdc",
                "fields": [
                    {"name": "o_orderkey", "type": "long"},
                    {"name": "o_orderstatus", "type": "string"},
                    {"name": "o_custkey", "type": "long"},
                    {"name": "price_cents", "type": "long"},
                    {"name": "note", "type": "string"},
                    {"name": "seq", "type": "long"},
                ],
            },
            fh,
        )
    spec = (0.0, 100000.0, 20)
    cfg = JobConfig.from_dict(
        {
            "input_config": {"format": "parquet"},
            "output_config": {
                "table_path": f"{base}/tbl",
                "mode": "merge",
                "table_type": "MOR",
                "schema": f"{base}/contract.avsc",
                "key_columns": ["o_orderkey"],
                "order_column": "seq",
                "cdc_delete_values": ["D"],
                "maintenance": {"compact_every": 2},
                "indexes": [
                    {
                        "type": "bm25",
                        "path": f"{base}/ix",
                        "id_column": "o_orderkey",
                        "text_column": "note",
                    }
                ],
                "rollups": [
                    {
                        "path": f"{base}/roll",
                        "group_columns": ["o_orderstatus"],
                        "sum_columns": ["price_cents"],
                        "distinct_columns": ["note"],
                        "hist_columns": {"price_cents": list(spec)},
                        "maintenance_every": 2,
                    }
                ],
                "join_mvs": [
                    {
                        "path": f"{base}/jmv",
                        "right_table": f"{base}/dim",
                        "on": ["o_custkey", "c_custkey"],
                    }
                ],
                "topk_mvs": [
                    {
                        "path": f"{base}/topk",
                        "group_columns": ["o_orderstatus"],
                        "order_column": "price_cents",
                        "k": 3,
                    }
                ],
            },
        }
    )
    for name in ("b1", "b2", "b3"):
        J.process_files(
            spark, cfg,
            sorted(_glob.glob(f"{base}/land/{name}/part-*.parquet")),
        )

    def _fam(df, family, grp_col, metric, val):
        return df.select(
            F.lit(family).alias("family"),
            F.col(grp_col).alias("grp"),
            (metric if not isinstance(metric, str) else F.lit(metric))
            .alias("metric"),
            val.cast("double").alias("val"),
        )

    roll = ManagedTable.load(spark, f"{base}/roll").read()
    parts = [
        _fam(roll, "rollup", "o_orderstatus", "n", F.col("n_rows")),
        _fam(roll, "rollup", "o_orderstatus", "sum",
             F.col("sum_price_cents")),
        _fam(roll, "rollup", "o_orderstatus", "ndistinct",
             F.col("n_distinct_note")),
        _fam(
            rollup_quantiles(
                roll, "price_cents", spec, [0.5], ["o_orderstatus"]
            ),
            "hist", "o_orderstatus", "p50",
            F.round(F.col("p50_price_cents"), 6),
        ),
    ]
    topk = read_topk(
        ManagedTable.load(spark, f"{base}/topk"),
        ["o_orderstatus"], "price_cents",
    )
    parts.append(_fam(
        topk, "topk", "o_orderstatus",
        F.concat(F.lit("key"), F.col("rnk").cast("string")),
        F.col("o_orderkey"),
    ))
    parts.append(_fam(
        topk, "topk", "o_orderstatus",
        F.concat(F.lit("val"), F.col("rnk").cast("string")),
        F.col("price_cents"),
    ))
    jm = (
        ManagedTable.load(spark, f"{base}/jmv").read()
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("price_cents").alias("s"),
        )
    )
    parts.append(_fam(jm, "joinmv", "c_mktsegment", "n", F.col("n")))
    parts.append(_fam(jm, "joinmv", "c_mktsegment", "sum", F.col("s")))
    pt, _stats = load_search_index(spark, f"{base}/ix")
    ix = pt.read().agg(
        F.countDistinct("doc_id").alias("nd")
    ).select(F.lit("all").alias("g"), "nd")
    parts.append(_fam(ix, "index", "g", "n_docs", F.col("nd")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# late-bound oracle: the generator lives in pipeline_queries, which
# imports from queries (not from here) — no cycle, but the decorator
# above runs at module import before we can reference it inline
from .queries import REGISTRY as _REG  # noqa: E402,PLC0415

_REG["minhash_index_ingest_pairs"].oracle = _minhash_ingest_oracle()

"""Z-order clustering (operators/layout.py).

The measurable property of a good layout: after clustering on
(l_shipdate, l_partkey), each output file's min/max span of EITHER
column covers only a small slice of its global range — which is
exactly what a reader's stats-based skipping needs.  A single-column
sort gives tight spans on that column and full-range spans on the
other; Z-order must be tight-ish on both.
"""

import pytest
from pyspark.sql import functions as F

from s3_sqs_data_ingestion_demo_spark.operators.layout import (
    file_stat_spans,
    zorder_key,
    zorder_write,
)

SF = "/root/testdata/sf0.01"
N_FILES = 16


def _mean_span_fraction(path, col, lo, hi):
    spans = file_stat_spans(path, col)
    assert spans, f"no footer stats for {col}"
    width = hi - lo
    return sum((b - a) / width for a, b in spans) / len(spans)


def test_zorder_tightens_both_columns(spark, tmp_path):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_shipdate", "l_extendedprice"
    )
    gl = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min(F.unix_timestamp("l_shipdate")), F.max(F.unix_timestamp("l_shipdate")),
    ).first()
    pk_lo, pk_hi, sd_lo, sd_hi = gl

    z = str(tmp_path / "zorder")
    s = str(tmp_path / "single")
    zorder_write(li, z, ["l_shipdate", "l_partkey"], n_files=N_FILES)
    # baseline: single-column sort (perfect on shipdate, blind on partkey)
    (
        li.repartitionByRange(N_FILES, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(s)
    )

    z_pk = _mean_span_fraction(z, "l_partkey", pk_lo, pk_hi)
    s_pk = _mean_span_fraction(s, "l_partkey", pk_lo, pk_hi)
    # the single-column sort leaves partkey unclustered (~full range per
    # file); z-order must cut the mean span at least in half
    assert s_pk > 0.8, s_pk
    assert z_pk < s_pk / 2, (z_pk, s_pk)

    # and shipdate stays clustered too (well below full range per file)
    def _days(v):  # pyarrow surfaces date/timestamp stats as datetimes
        return v.timestamp() if hasattr(v, "timestamp") else float(v)

    spans = file_stat_spans(z, "l_shipdate")
    width = sd_hi - sd_lo
    z_sd = sum((_days(b) - _days(a)) / width for a, b in spans) / len(spans)
    assert z_sd < 0.5, z_sd


def test_zorder_preserves_rows_and_schema(spark, tmp_path):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    path = str(tmp_path / "full")
    zorder_write(li, path, ["l_shipdate", "l_partkey"], n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    assert sorted(back.columns) == sorted(li.columns)  # _zkey dropped
    # clustered read returns identical data
    a = li.agg(F.sum("l_extendedprice")).first()[0]
    b = back.agg(F.sum("l_extendedprice")).first()[0]
    # repartitioning reorders the float additions; equality is relative
    assert abs(a - b) / abs(a) < 1e-9


def test_compact_zorder_clusters_table_files(spark, tmp_path):
    """ManagedTable.compact(zorder_by=...) — the OPTIMIZE ZORDER BY
    maintenance path: the rewritten snapshot's files must carry tight
    min/max footer spans on BOTH clustered columns, and the table's
    contents must be unchanged."""
    import os

    from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_shipdate", "l_extendedprice"
    )
    t = ManagedTable.create(
        spark, str(tmp_path / "tbl"), li.schema, key_cols=["l_orderkey"]
    )
    t.append(li)
    n_before = t.read().count()
    sum_before = t.read().agg(F.sum("l_extendedprice")).first()[0]

    t.compact(target_partitions=N_FILES, zorder_by=["l_shipdate", "l_partkey"])

    assert t.read().count() == n_before
    sum_after = t.read().agg(F.sum("l_extendedprice")).first()[0]
    assert abs(sum_after - sum_before) / abs(sum_before) < 1e-9

    entries = t._read_manifest()
    assert len(entries) == 1  # one fresh root, deltas folded
    root = os.path.join(t.path, entries[0]["root"])
    gl = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min(F.unix_timestamp("l_shipdate")), F.max(F.unix_timestamp("l_shipdate")),
    ).first()
    pk_lo, pk_hi, sd_lo, sd_hi = gl
    assert _mean_span_fraction(root, "l_partkey", pk_lo, pk_hi) < 0.5

    def _secs(v):
        return v.timestamp() if hasattr(v, "timestamp") else float(v)

    spans = file_stat_spans(root, "l_shipdate")
    z_sd = sum((_secs(b) - _secs(a)) / (sd_hi - sd_lo) for a, b in spans) / len(spans)
    assert z_sd < 0.5, z_sd


def test_zorder_key_is_deterministic_and_bounded(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    keyed, key = zorder_key(li, ["l_partkey", "l_quantity"], bits=4)
    stats = keyed.agg(
        F.min(key), F.max(key), F.countDistinct(key)
    ).first()
    lo, hi, nd = stats
    assert lo >= 0 and hi < (1 << 8)  # 2 cols x 4 bits
    assert nd > 16  # the curve actually spreads
    again, _ = zorder_key(li, ["l_partkey", "l_quantity"], bits=4)
    assert (
        keyed.select(key).exceptAll(again.select(key)).limit(1).count() == 0
    )

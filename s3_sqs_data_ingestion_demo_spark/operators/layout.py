"""Data-layout management: Z-order clustering for multi-column skipping.

Parquet readers prune row groups (and whole files) whose min/max
statistics exclude a predicate.  Sorting by one column gives perfect
skipping on that column and none on any other; interleaving the bits
of several columns' quantile ranks (a Z-order / Morton curve) gives
each clustered column locality, so selective predicates on ANY of
them skip most of a 100 TB table.  This is the layout strategy table
formats expose as ``OPTIMIZE ... ZORDER BY``, built here from plain
DataFrame primitives:

1. per column, quantile boundaries via ``approxQuantile`` (driver
   receives ≤ 2^bits scalars — bounded, never data-sized);
2. rank each row into its quantile bucket (flat CASE chain over the
   boundary constants — JVM expression, no shuffle);
3. interleave bucket bits into one Morton key (flat bit-arithmetic);
4. ``repartitionByRange`` on the key (one range shuffle — the same
   shuffle a plain sorted write pays) + ``sortWithinPartitions`` so
   every output file owns a compact Morton range.

Quantile (not min/max-linear) bucketing keeps skew from collapsing
the curve: a hot key range still spreads over distinct buckets.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_col(col: str, boundaries: list[float]) -> Column:
    """Quantile-bucket index of ``col`` given sorted inner boundaries
    (len = n_buckets - 1): a flat comparison-sum, monotone in the
    column, constant-folded by codegen."""
    c = F.col(col).cast("double")
    idx: Column = F.lit(0)
    for b in boundaries:
        idx = idx + F.when(c > F.lit(float(b)), 1).otherwise(0)
    return idx


def _interleave(bucket_cols: list[Column], bits: int) -> Column:
    """Morton key: bit i of column j lands at position i*ncols + j."""
    ncols = len(bucket_cols)
    terms = []
    for j, bc in enumerate(bucket_cols):
        b = bc.cast("long")
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(b, i).bitwiseAND(F.lit(1)), i * ncols + j
                )
            )
    return reduce(lambda a, x: a + x, terms).alias("_zkey")


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
) -> tuple[DataFrame, str]:
    """Attach a Morton key column over ``cols`` (numeric/date/timestamp;
    dates are ranked through their epoch seconds).  Returns
    ``(df_with_key, key_col_name)``.

    ``approxQuantile`` runs one bounded aggregation per call (all cols
    at once); 2^bits boundaries per column reach the driver — for the
    default 8 bits that is 255 doubles however large the table is.
    """
    n_buckets = 1 << bits
    qs = [i / n_buckets for i in range(1, n_buckets)]
    proj = df
    num_cols = []
    for c in cols:
        dt = dict(df.dtypes)[c]
        if dt in ("date", "timestamp", "timestamp_ntz"):
            num_c = f"_z_{c}"
            proj = proj.withColumn(
                num_c, F.unix_timestamp(F.col(c)).cast("double")
            )
            num_cols.append(num_c)
        else:
            num_cols.append(c)
    bounds = proj.stat.approxQuantile(num_cols, qs, 0.001)
    buckets = [
        _bucket_col(c, sorted(set(bs))) for c, bs in zip(num_cols, bounds)
    ]
    out = proj.withColumn("_zkey", _interleave(buckets, bits))
    return out.drop(*[c for c in num_cols if c.startswith("_z_")]), "_zkey"


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Morton curve of
    ``cols``: one range shuffle on the key, files sorted within, key
    dropped from the output schema.  Each file then owns a compact
    key range, so parquet min/max stats on EVERY clustered column are
    tight enough to skip on."""
    keyed, key = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, F.col(key))
        .sortWithinPartitions(key)
        .drop(key)
        .write.mode(mode)
        .parquet(path)
    )


def file_stat_spans(path: str, col: str) -> list[tuple[float, float]]:
    """Per-file (min, max) of ``col`` from parquet footer statistics —
    the metadata a reader skips on.  Driver-side utility for layout
    audits and the clustering tests (reads footers only, never data)."""
    import glob
    import os

    import pyarrow.parquet as pq

    spans = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                column = md.row_group(rg).column(ci)
                if column.path_in_schema == col and column.statistics:
                    st = column.statistics
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            spans.append((lo, hi))
    return spans

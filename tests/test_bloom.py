"""Parquet bloom filters via the ``write.bloom-columns`` table
property: written by the parquet encoder (file-scaled, never a
manifest-level bloom that saturates on bulk entries), consulted by the
scan for pushed =/IN predicates — the row-group skip that makes point
lookups (takedowns, removals) cheap on NON-monotone key columns where
min/max stats prune nothing.
"""

import glob
import os

from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.table import ManagedTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


def _bloom_offsets(spark, parquet_file: str) -> dict[str, int]:
    """Column -> bloom filter offset from the parquet footer (-1 when
    the column has no bloom), via the JVM parquet-mr reader."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hif = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(parquet_file), conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(hif)
    try:
        rg = reader.getFooter().getBlocks().get(0)
        out = {}
        for i in range(rg.getColumns().size()):
            cc = rg.getColumns().get(i)
            out[cc.getPath().toDotString()] = cc.getBloomFilterOffset()
        return out
    finally:
        reader.close()


def _scattered(spark, n=20_000):
    # multiplicative scramble: non-monotone key, every file spans the
    # whole range -> min/max stats prune nothing for point lookups
    return spark.range(n).selectExpr(
        "id * 7919 % 1000003 AS doc_id", "CAST(id AS STRING) AS v"
    )


def _one_file(t: ManagedTable) -> str:
    files = glob.glob(os.path.join(t.path, "data", "*", "*.parquet"))
    assert files
    return files[0]


def test_bloom_columns_property_writes_blooms(spark, tmp_path):
    t = ManagedTable.create(
        spark,
        os.path.join(str(tmp_path), "b"),
        SCHEMA,
        key_cols=["doc_id"],
        properties={
            "write.bloom-columns": "doc_id",
            "write.bloom-ndv": "50000",
        },
    )
    t.append(_scattered(spark))
    offs = _bloom_offsets(spark, _one_file(t))
    assert offs["doc_id"] >= 0, "configured column must carry a bloom"
    assert offs["v"] == -1, "unconfigured column must not pay for one"


def test_no_property_means_no_blooms(spark, tmp_path):
    t = ManagedTable.create(
        spark, os.path.join(str(tmp_path), "nb"), SCHEMA, key_cols=["doc_id"]
    )
    t.append(_scattered(spark))
    offs = _bloom_offsets(spark, _one_file(t))
    assert all(v == -1 for v in offs.values())


def test_point_lookup_filter_reaches_the_scan(spark, tmp_path):
    """The reader consults blooms only for predicates that reach the
    parquet scan: pin that read_where_in's IN lands in PushedFilters
    on a bloom-bearing table."""
    t = ManagedTable.create(
        spark,
        os.path.join(str(tmp_path), "p"),
        SCHEMA,
        key_cols=["doc_id"],
        properties={"write.bloom-columns": "doc_id"},
    )
    t.append(_scattered(spark))
    df = t.read_where_in("doc_id", [7919, 15838])
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    pushed = plan.split("PushedFilters:", 1)[1].splitlines()[0]
    assert "In(doc_id" in pushed, pushed
    got = sorted(r.doc_id for r in df.collect())
    assert got == [7919, 15838]


def test_index_tables_declare_blooms_on_their_lookup_keys(spark, tmp_path):
    """The keyed index tables opt in where clustering scatters the
    takedown key: postings (term-clustered -> doc_id bloom) and IVF
    assignments (cell-clustered -> vec_id bloom)."""
    from s3_sqs_data_ingestion_demo_spark.operators.search_index import (
        create_search_index,
    )

    pt, _ = create_search_index(spark, os.path.join(str(tmp_path), "ix"))
    assert pt.meta.properties.get("write.bloom-columns") == "doc_id"

"""CAS protection of table-metadata writes (_persist_meta's metalog
witness): the data path has had optimistic-concurrency commits with
retry since round 5, but metadata writes were documented single-writer
— a rollup cursor write racing a schema evolution on the same table
was a silent lost update.  Now the doc carries a meta_seq advanced
through an O_EXCL witness; the loser raises (or, for key-local
property patches, auto-retries on fresh state)."""

import glob
import json
import os

import pytest
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark.table import (
    ManagedTable,
    MetaCommitConflictError,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("v", T.DoubleType(), True),
    ]
)


def _mk(spark, tmp):
    return ManagedTable.create(spark, f"{tmp}/t", SCHEMA, key_cols=["id"])


def test_concurrent_property_patches_both_survive(spark, tmp_path):
    """Two stale handles patch DIFFERENT properties: the loser's CAS
    fails, set_properties re-reads and re-applies — both keys land."""
    _mk(spark, tmp_path)
    a = ManagedTable.load(spark, f"{tmp_path}/t")
    b = ManagedTable.load(spark, f"{tmp_path}/t")  # same seq as a
    a.set_properties(**{"rollup.src-version": "7"})
    b.set_properties(**{"other.cursor": "3"})  # stale seq: retries
    fresh = ManagedTable.load(spark, f"{tmp_path}/t").meta.properties
    assert fresh["rollup.src-version"] == "7"
    assert fresh["other.cursor"] == "3"


def test_stale_structural_evolution_conflicts_loudly(spark, tmp_path):
    """A schema evolution derived from stale metadata must raise, not
    silently revert the winner's property write."""
    _mk(spark, tmp_path)
    a = ManagedTable.load(spark, f"{tmp_path}/t")
    b = ManagedTable.load(spark, f"{tmp_path}/t")
    a.set_properties(cursor="42")
    with pytest.raises(MetaCommitConflictError, match="concurrently"):
        b.add_columns([T.StructField("extra", T.StringType(), True)])
    # winner's write intact; loser left no trace
    fresh = ManagedTable.load(spark, f"{tmp_path}/t")
    assert fresh.meta.properties["cursor"] == "42"
    assert "extra" not in fresh.meta.schema.fieldNames()
    # reloaded, the evolution goes through
    fresh.add_columns([T.StructField("extra", T.StringType(), True)])
    assert "extra" in ManagedTable.load(
        spark, f"{tmp_path}/t"
    ).meta.schema.fieldNames()


def test_crash_between_witness_and_replace_loses_nothing(spark, tmp_path):
    """The witness is the commit point: simulate a crash by planting a
    newer witness without touching _meta.json — load must prefer it,
    and the next persist continues the seq chain."""
    t = _mk(spark, tmp_path)
    t.set_properties(k="1")
    seq = t.meta.meta_seq
    doc = dict(t.meta.__dict__)
    doc["meta_seq"] = seq + 1
    doc["properties"] = dict(doc["properties"], k="2")
    wit = os.path.join(f"{tmp_path}/t", "_metalog", f"m{seq + 1:08d}.json")
    with open(wit, "x", encoding="utf-8") as fh:
        json.dump(doc, fh)
    fresh = ManagedTable.load(spark, f"{tmp_path}/t")
    assert fresh.meta.properties["k"] == "2"
    assert fresh.meta.meta_seq == seq + 1
    fresh.set_properties(k="3")
    assert ManagedTable.load(
        spark, f"{tmp_path}/t"
    ).meta.properties["k"] == "3"


def test_legacy_meta_without_seq_joins_protocol(spark, tmp_path):
    """Pre-metalog tables (no meta_seq key, no _metalog dir) load at
    seq 0 and CAS from their first write."""
    t = _mk(spark, tmp_path)
    meta_path = os.path.join(f"{tmp_path}/t", "_meta.json")
    with open(meta_path, encoding="utf-8") as fh:
        doc = json.load(fh)
    doc.pop("meta_seq", None)
    with open(meta_path, "w", encoding="utf-8") as fh:
        json.dump(doc, fh)
    import shutil

    shutil.rmtree(os.path.join(f"{tmp_path}/t", "_metalog"),
                  ignore_errors=True)
    legacy = ManagedTable.load(spark, f"{tmp_path}/t")
    assert legacy.meta.meta_seq == 0
    legacy.set_properties(k="1")
    assert ManagedTable.load(spark, f"{tmp_path}/t").meta.meta_seq == 1


def test_witness_pruning_keeps_last_four(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for i in range(8):
        t.set_properties(k=str(i))
    wits = sorted(glob.glob(os.path.join(f"{tmp_path}/t", "_metalog",
                                         "m*.json")))
    assert len(wits) == 4
    assert ManagedTable.load(spark, f"{tmp_path}/t").meta.properties[
        "k"
    ] == "7"

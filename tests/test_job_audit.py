"""Declarative write-audit-publish gate (``output_config.audit``):
every batch stages, the constraint rules run over the staged view, and
only a clean batch publishes — rejection per the configured policy
(fail / skip_batch / quarantine)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_sqs_data_ingestion_demo_spark import job as J
from s3_sqs_data_ingestion_demo_spark.config import JobConfig
from s3_sqs_data_ingestion_demo_spark.table import (
    AuditFailedError,
    ManagedTable,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("amount", T.IntegerType(), True),
    ]
)


def _write_csv(path, rows):
    with open(path, "w") as fh:
        fh.write("id\tname\tamount\n")
        for r in rows:
            fh.write("\t".join("" if v is None else str(v) for v in r) + "\n")


def _cfg(tmp, mode="append", audit=None, **out_extra):
    out = {
        "table_path": f"{tmp}/tbl",
        "mode": mode,
        "key_columns": ["id"],
        **out_extra,
    }
    if audit is not None:
        out["audit"] = audit
    return JobConfig.from_dict(
        {
            "input_config": {
                "format": "csv",
                "options": {
                    "header": "true", "sep": "\t", "inferSchema": "true",
                },
            },
            "output_config": out,
        }
    )


RULES = [
    {"rule": "not_null", "column": "name"},
    {"rule": "range", "column": "amount", "min": 0},
]


@pytest.fixture
def setup(spark, tmp_path):
    d = str(tmp_path)
    ManagedTable.create(spark, f"{d}/tbl", SCHEMA, key_cols=["id"])
    good, bad = f"{d}/good.csv", f"{d}/bad.csv"
    _write_csv(good, [(1, "a", 10), (2, "b", 20)])
    _write_csv(bad, [(3, None, 30), (4, "d", -5)])
    return d, good, bad


def test_on_fail_fail_raises_and_leaves_no_trace(spark, setup):
    d, good, bad = setup
    cfg = _cfg(d, audit={"rules": RULES})  # on_fail default: fail
    J.process_files(spark, cfg, [good])
    with pytest.raises(AuditFailedError):
        J.process_files(spark, cfg, [bad])
    t = ManagedTable.load(spark, f"{d}/tbl")
    assert sorted(r.id for r in t.read().collect()) == [1, 2]
    assert t.list_staged() == []  # rejected stage discarded, not leaked


def test_on_fail_skip_batch_drops_and_continues(spark, setup):
    d, good, bad = setup
    cfg = _cfg(d, audit={"rules": RULES, "on_fail": "skip_batch"})
    v1 = J.process_files(spark, cfg, [bad])  # no raise: stream survives
    t = ManagedTable.load(spark, f"{d}/tbl")
    assert t.read().count() == 0
    assert v1 == t._current_version()
    J.process_files(spark, cfg, [good])
    assert sorted(r.id for r in t.read().collect()) == [1, 2]


def test_on_fail_quarantine_lands_batch_in_side_table(spark, setup):
    d, good, bad = setup
    cfg = _cfg(
        d,
        audit={
            "rules": RULES,
            "on_fail": "quarantine",
            "quarantine_path": f"{d}/quarantine",
        },
    )
    J.process_files(spark, cfg, [good])
    J.process_files(spark, cfg, [bad])
    t = ManagedTable.load(spark, f"{d}/tbl")
    assert sorted(r.id for r in t.read().collect()) == [1, 2]
    q = ManagedTable.load(spark, f"{d}/quarantine").read()
    rows = {r.id: r for r in q.collect()}
    assert sorted(rows) == [3, 4]
    # both violated rules are named on every quarantined row
    assert "not_null(name)=1" in rows[3]["_audit_failures"]
    assert "range(amount)=1" in rows[3]["_audit_failures"]


def test_rejected_batch_skips_deletes_and_indexes(spark, tmp_path):
    """A rejected batch must leave EVERYTHING untouched: CDC deletes
    from the same batch don't apply, declared indexes don't fold."""
    d = str(tmp_path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.IntegerType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("Op", T.StringType(), True),
        ]
    )
    ManagedTable.create(spark, f"{d}/tbl", schema, key_cols=["doc_id"])
    b1, b2 = f"{d}/b1.csv", f"{d}/b2.csv"
    with open(b1, "w") as fh:
        fh.write("doc_id\ttext\tOp\n1\thello world\tI\n2\tgood text\tI\n")
    with open(b2, "w") as fh:
        # delete of key 1 rides a batch that also carries a bad row
        fh.write("doc_id\ttext\tOp\n1\thello world\tD\n3\t\tI\n")
    cfg = JobConfig.from_dict(
        {
            "input_config": {
                "format": "csv",
                "options": {
                    "header": "true", "sep": "\t", "inferSchema": "true",
                },
            },
            "output_config": {
                "table_path": f"{d}/tbl",
                "mode": "append",
                "key_columns": ["doc_id"],
                "cdc_delete_values": ["D"],
                "indexes": [{"type": "bm25", "path": f"{d}/idx"}],
                "audit": {
                    "rules": [{"rule": "not_null", "column": "text"}],
                    "on_fail": "skip_batch",
                },
            },
        }
    )
    from s3_sqs_data_ingestion_demo_spark.operators.search_index import (
        load_search_index,
    )

    J.process_files(spark, cfg, [b1])
    _, st = load_search_index(spark, f"{d}/idx")
    n1 = st.read().agg(F.sum("n_docs")).collect()[0][0]
    assert n1 == 2
    J.process_files(spark, cfg, [b2])  # rejected
    t = ManagedTable.load(spark, f"{d}/tbl")
    assert sorted(r.doc_id for r in t.read().collect()) == [1, 2]  # no delete
    n2 = st.read().agg(F.sum("n_docs")).collect()[0][0]
    assert n2 == 2  # index untouched


def test_audit_table_view_checks_post_merge_state(spark, tmp_path):
    """view='table' audits the WOULD-BE published state: a unique rule
    over the keys passes on a MOR merge batch that UPDATES an existing
    key (delta view would also pass, but the table view proves the
    post-resolution state is what's checked — the duplicate raw rows
    in (base + delta) resolve before the rule runs)."""
    d = str(tmp_path)
    ManagedTable.create(
        spark, f"{d}/tbl", SCHEMA, key_cols=["id"], table_type="MOR",
    )
    b1, b2 = f"{d}/b1.csv", f"{d}/b2.csv"
    _write_csv(b1, [(1, "a", 10), (2, "b", 20)])
    _write_csv(b2, [(1, "a2", 11)])
    cfg = _cfg(
        d,
        mode="merge",
        table_type="MOR",
        audit={
            "rules": [{"rule": "unique", "columns": ["id"]}],
            "view": "table",
        },
    )
    J.process_files(spark, cfg, [b1])
    J.process_files(spark, cfg, [b2])
    t = ManagedTable.load(spark, f"{d}/tbl")
    rows = {r.id: r.name for r in t.read().collect()}
    assert rows == {1: "a2", 2: "b"}


def test_foreign_key_refs_load_from_paths(spark, tmp_path):
    d = str(tmp_path)
    ManagedTable.create(spark, f"{d}/tbl", SCHEMA, key_cols=["id"])
    spark.createDataFrame(
        [(10,), (20,)], T.StructType([T.StructField("amount", T.IntegerType())])
    ).write.parquet(f"{d}/valid_amounts")
    bad = f"{d}/b.csv"
    _write_csv(bad, [(1, "a", 10), (2, "b", 99)])  # 99 not in ref
    cfg = _cfg(
        d,
        audit={
            "rules": [
                {
                    "rule": "foreign_key",
                    "columns": ["amount"],
                    "ref": "valid",
                    "ref_columns": ["amount"],
                }
            ],
            "refs": {"valid": f"{d}/valid_amounts"},
            "on_fail": "skip_batch",
        },
    )
    J.process_files(spark, cfg, [bad])
    assert ManagedTable.load(spark, f"{d}/tbl").read().count() == 0


def test_parse_time_rejects_audit_on_cow_merge():
    with pytest.raises(ValueError, match="MOR"):
        _cfg("/tmp/x", mode="merge", audit={"rules": RULES})


def test_parse_time_rejects_bad_policy_and_missing_quarantine_path():
    with pytest.raises(ValueError, match="on_fail"):
        _cfg("/tmp/x", audit={"rules": RULES, "on_fail": "explode"})
    with pytest.raises(ValueError, match="quarantine_path"):
        _cfg("/tmp/x", audit={"rules": RULES, "on_fail": "quarantine"})
    with pytest.raises(ValueError, match="view"):
        _cfg("/tmp/x", audit={"rules": RULES, "view": "sideways"})


def test_quarantine_replay_is_exactly_once(spark, setup, monkeypatch):
    """Crash between the quarantine append and the stage discard: the
    redelivered batch hits the batch-tag guard and must NOT land a
    duplicate forensic row."""
    d, good, bad = setup
    cfg = _cfg(
        d,
        audit={
            "rules": RULES,
            "on_fail": "quarantine",
            "quarantine_path": f"{d}/quarantine",
        },
    )
    orig = ManagedTable.discard_staged
    armed = {"on": True}

    def crashing_discard(self, staged_id):
        if armed["on"]:
            armed["on"] = False
            raise RuntimeError("simulated crash before stage discard")
        return orig(self, staged_id)

    monkeypatch.setattr(ManagedTable, "discard_staged", crashing_discard)
    with pytest.raises(RuntimeError, match="simulated crash"):
        J.process_files(spark, cfg, [bad])
    # redelivery: quarantine row must not duplicate
    J.process_files(spark, cfg, [bad])
    q = ManagedTable.load(spark, f"{d}/quarantine").read()
    assert sorted(r.id for r in q.collect()) == [3, 4]
    # a DIFFERENT bad batch still quarantines (tag is per batch)
    bad2 = f"{d}/bad2.csv"
    _write_csv(bad2, [(9, None, 1)])
    J.process_files(spark, cfg, [bad2])
    q = ManagedTable.load(spark, f"{d}/quarantine").read()
    assert sorted(r.id for r in q.collect()) == [3, 4, 9]


def test_quarantine_append_failure_does_not_leak_stage(
    spark, setup, monkeypatch
):
    """An in-process quarantine failure discards the stage on the way
    out (finally) — staged data roots must not stay GC-protected."""
    d, good, bad = setup
    cfg = _cfg(
        d,
        audit={
            "rules": RULES,
            "on_fail": "quarantine",
            "quarantine_path": f"{d}/quarantine",
        },
    )
    orig = ManagedTable.append
    armed = {"on": True}

    def crashing_append(self, df, tag=None):
        if armed["on"] and self.path == f"{d}/quarantine":
            armed["on"] = False
            raise RuntimeError("simulated quarantine append failure")
        return orig(self, df, tag=tag)

    monkeypatch.setattr(ManagedTable, "append", crashing_append)
    with pytest.raises(RuntimeError, match="quarantine append"):
        J.process_files(spark, cfg, [bad])
    t = ManagedTable.load(spark, f"{d}/tbl")
    assert t.list_staged() == []  # no leak
    # stream recovers on redelivery
    J.process_files(spark, cfg, [bad])
    q = ManagedTable.load(spark, f"{d}/quarantine").read()
    assert sorted(r.id for r in q.collect()) == [3, 4]

"""End-to-end SQS-notification ingest: fake queue -> files -> merge
table, with a failing batch redelivered (reference main-loop parity,
spark-job/read.py:330-350, minus the T5 loss bug)."""

import json
import os

from s3_sqs_data_ingestion_demo_spark.config import JobConfig
from s3_sqs_data_ingestion_demo_spark.job import run_sqs_loop
from s3_sqs_data_ingestion_demo_spark.sources.sqs import SqsFileSource
from s3_sqs_data_ingestion_demo_spark.table import ManagedTable
from tests.test_golden_cdc import AVSC, BATCH1, BATCH2, HEADER, MERGE_SQL
from tests.test_sqs_source import FakeSqs, _event_body


def test_sqs_loop_end_to_end(spark, tmp_path):
    d = str(tmp_path)
    for name, lines in [("b1.csv", BATCH1), ("b2.csv", BATCH2)]:
        with open(os.path.join(d, name), "w") as fh:
            fh.write(HEADER + "\n" + "\n".join(lines) + "\n")
    with open(os.path.join(d, "schema.avsc"), "w") as fh:
        json.dump(AVSC, fh)
    with open(os.path.join(d, "merge.sql"), "w") as fh:
        fh.write(MERGE_SQL)

    cfg = JobConfig.from_dict(
        {
            "input_config": {
                "type": "sqs",
                "format": "csv",
                "poll_interval": 0,
                "options": {"sep": "\t", "header": "true", "inferSchema": "true"},
            },
            "output_config": {
                "table_path": os.path.join(d, "wh", "orders"),
                "mode": "merge",
                "schema": os.path.join(d, "schema.avsc"),
                "merge_query": os.path.join(d, "merge.sql"),
                "partition": ["destinationstate"],
                "key_columns": ["invoiceid", "itemid"],
                "order_column": "replicadmstimestamp",
            },
        }
    )

    # poll 1: batch 1; poll 2: a bad file (fails) + poll 3: batch 2
    fake = FakeSqs(
        [
            [(_event_body("x", "ignored"), "h1")],
            [(_event_body("x", "ignored"), "h_bad")],
            [(_event_body("x", "ignored"), "h2")],
        ]
    )
    # patch the parser result per poll by giving local paths directly:
    # SqsFileSource returns URIs; use a subclass mapping to local files
    files_per_poll = [
        [os.path.join(d, "b1.csv")],
        [os.path.join(d, "missing.csv")],  # read fails -> no commit
        [os.path.join(d, "b2.csv")],
    ]

    class LocalSource(SqsFileSource):
        def __init__(self):
            super().__init__("q", client=fake)
            self._i = 0

        def poll(self):
            batch = super().poll()
            if batch.receipt_handles:
                batch.files = files_per_poll[self._i]
            self._i += 1
            return batch

    src = LocalSource()
    run_sqs_loop(spark, cfg, source=src, max_polls=3)

    table = ManagedTable.load(spark, cfg.output_config.table_path)
    rows = {(r.invoiceid, r.itemid): r for r in table.read().collect()}
    assert len(rows) == 5
    assert rows[(40994, 67)].category == "market####"
    # failed batch's handle must NOT be deleted (redelivery possible)
    assert sorted(fake.deleted) == ["h1", "h2"]


def test_poison_messages_committed_not_redelivered(spark, tmp_path):
    """Messages whose bodies parse to zero file URIs (s3:TestEvent,
    malformed JSON, non-S3 notifications) must still be deleted —
    nothing was processed, so deletion is safe, and without it they
    redeliver forever after every visibility timeout."""
    d = str(tmp_path)
    cfg = JobConfig.from_dict(
        {
            "input_config": {"type": "sqs", "format": "csv", "poll_interval": 0},
            "output_config": {
                "table_path": os.path.join(d, "wh", "orders"),
                "mode": "merge",
                "key_columns": ["invoiceid", "itemid"],
            },
        }
    )
    fake = FakeSqs(
        [
            [("{\"Event\": \"s3:TestEvent\"}", "h_test"), ("not json", "h_junk")],
            [],  # empty poll: no messages at all -> nothing to commit
        ]
    )
    src = SqsFileSource("q", client=fake)
    run_sqs_loop(spark, cfg, source=src, max_polls=2)
    assert sorted(fake.deleted) == ["h_junk", "h_test"]

"""SQS micro-batch planner with a fake client: S3-event parsing,
per-batch commit semantics, and the T5 data-loss fix (SURVEY §2.4)."""

import json

from s3_sqs_data_ingestion_demo_spark.sources.sqs import (
    MicroBatch,
    SqsFileSource,
    parse_s3_event_files,
)


def _event_body(bucket, *keys):
    return json.dumps(
        {"Records": [{"s3": {"bucket": {"name": bucket}, "object": {"key": k}}} for k in keys]}
    )


class FakeSqs:
    def __init__(self, batches):
        self.batches = list(batches)  # list[list[(body, handle)]]
        self.deleted = []

    def receive_message(self, QueueUrl, MaxNumberOfMessages, WaitTimeSeconds):
        assert MaxNumberOfMessages <= 10  # SQS hard limit honored
        if not self.batches:
            return {}
        msgs = self.batches.pop(0)
        return {
            "Messages": [
                {"Body": b, "ReceiptHandle": h} for b, h in msgs[:MaxNumberOfMessages]
            ]
        }

    def delete_message(self, QueueUrl, ReceiptHandle):
        self.deleted.append(ReceiptHandle)


def test_parse_s3_events_multi_record_and_garbage():
    files = parse_s3_event_files(
        [
            _event_body("bkt", "a/x.csv", "a/y.csv"),
            "not json at all",
            json.dumps({"Records": [{"s3": {"bucket": {}, "object": {"key": "z"}}}]}),
            _event_body("other", "b.csv"),
        ]
    )
    assert files == ["s3a://bkt/a/x.csv", "s3a://bkt/a/y.csv", "s3a://other/b.csv"]


def test_poll_and_commit_only_own_handles():
    fake = FakeSqs(
        [
            [(_event_body("bkt", "f1.csv"), "h1"), (_event_body("bkt", "f2.csv"), "h2")],
            [(_event_body("bkt", "f3.csv"), "h3")],
        ]
    )
    src = SqsFileSource("q", client=fake, batch_size=10)
    b1 = src.poll()
    assert b1.files == ["s3a://bkt/f1.csv", "s3a://bkt/f2.csv"]
    b2 = src.poll()
    # T5 fix: committing batch 2 must NOT delete batch 1's messages
    src.commit(b2)
    assert fake.deleted == ["h3"]
    src.commit(b1)
    assert sorted(fake.deleted) == ["h1", "h2", "h3"]


def test_failed_batch_never_committed():
    """The reference buffered handles across polls, so a failed batch's
    messages were deleted by the NEXT successful commit (silent data
    loss, reference: spark-job/read.py:31,44-62).  Here a batch the
    caller never commits keeps its handles — redelivery works."""
    fake = FakeSqs([[(_event_body("bkt", "bad.csv"), "h_bad")],
                    [(_event_body("bkt", "good.csv"), "h_good")]])
    src = SqsFileSource("q", client=fake)
    b_bad = src.poll()   # caller's processing fails -> no commit
    b_good = src.poll()
    src.commit(b_good)
    assert fake.deleted == ["h_good"]  # h_bad survives for redelivery


def test_batch_size_clamped_to_sqs_limit():
    src = SqsFileSource("q", client=FakeSqs([]), batch_size=50)
    assert src.batch_size == 10


def test_empty_poll():
    src = SqsFileSource("q", client=FakeSqs([]))
    b = src.poll()
    assert b.files == [] and b.receipt_handles == []

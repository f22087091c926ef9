"""SQS-notification micro-batch source (driver-side planner).

Re-expresses the reference's S3-event poller (reference:
spark-job/read.py:26-62, 251-269) with two deliberate fixes:

- **T5 commit-buffer bug fixed**: the reference accumulated receipt
  handles across polls and a later successful commit deleted messages
  from a *failed* earlier batch (spark-job/read.py:31, 44-47, 54-62) —
  silent data loss.  Here each poll returns a self-contained
  ``MicroBatch`` whose ``commit()`` deletes exactly its own handles.
- boto3 is injected, not imported at module scope, so tests run with a
  fake client and no AWS dependency.

The idiomatic replacement for most deployments is the file-listing
Structured Streaming source in ``streaming/ingest.py``; this planner is
kept for queue-notification parity (``input_config.type: "sqs"``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


def parse_s3_event_files(message_bodies: list[str], protocol: str = "s3a") -> list[str]:
    """Decode S3 event notification JSON bodies into file URIs
    (reference: spark-job/read.py:251-269)."""
    files: list[str] = []
    for body in message_bodies:
        try:
            doc = json.loads(body)
        except json.JSONDecodeError:
            continue
        for rec in doc.get("Records", []):
            s3 = rec.get("s3") or {}
            bucket = (s3.get("bucket") or {}).get("name")
            key = (s3.get("object") or {}).get("key")
            if bucket and key:
                files.append(f"{protocol}://{bucket}/{key}")
    return files


@dataclass
class MicroBatch:
    """One poll's worth of work: file URIs + the receipt handles that
    acknowledge exactly those files."""

    files: list[str]
    receipt_handles: list[str] = field(default_factory=list)


class SqsFileSource:
    """Long-poll SQS for S3 event notifications; yield micro-batches.

    Parity: batch_size ≤ 10, 20 s long poll (reference:
    spark-job/read.py:30-41).
    """

    def __init__(
        self,
        queue_url: str,
        client=None,
        batch_size: int = 10,
        wait_time_seconds: int = 20,
        protocol: str = "s3a",
    ):
        if client is None:
            try:
                import boto3  # noqa: PLC0415
            except ImportError as exc:  # pragma: no cover - cloud-only
                raise RuntimeError("boto3 required for the SQS source") from exc
            client = boto3.client("sqs")
        self.client = client
        self.queue_url = queue_url
        self.batch_size = min(int(batch_size), 10)  # SQS hard limit
        self.wait_time_seconds = wait_time_seconds
        self.protocol = protocol

    def poll(self) -> MicroBatch:
        resp = self.client.receive_message(
            QueueUrl=self.queue_url,
            MaxNumberOfMessages=self.batch_size,
            WaitTimeSeconds=self.wait_time_seconds,
        )
        messages = resp.get("Messages", [])
        return MicroBatch(
            files=parse_s3_event_files(
                [m.get("Body", "") for m in messages], self.protocol
            ),
            receipt_handles=[m["ReceiptHandle"] for m in messages],
        )

    def commit(self, batch: MicroBatch) -> None:
        """Delete exactly this batch's messages — at-least-once when the
        caller commits only after a successful write (reference:
        spark-job/read.py:54-62, minus the T5 buffer bug)."""
        for handle in batch.receipt_handles:
            self.client.delete_message(
                QueueUrl=self.queue_url, ReceiptHandle=handle
            )

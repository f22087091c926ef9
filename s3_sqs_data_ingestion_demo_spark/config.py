"""Declarative job configuration.

Same JSON surface as the reference's ``job.json`` (reference:
spark-job/job.json:1-39, loader at spark-job/read.py:283-296): a ``spark``
conf map, an ``input_config`` (source type/format/options), and an
``output_config`` (target table, mode, schema contract, merge SQL).

Files (job JSON, ``.avsc`` schema, merge ``.sql``) load from the local
filesystem or, when an ``s3://`` URI is given and boto3 is importable,
from S3 (reference: spark-job/read.py:104-108, 162-171). boto3 is not a
hard dependency — cloud loading is gated behind an import-try.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any


def _read_text(path_or_uri: str) -> str:
    if path_or_uri.startswith(("s3://", "s3a://")):
        try:
            import boto3  # noqa: PLC0415
        except ImportError as exc:  # pragma: no cover - cloud-only path
            raise RuntimeError(
                f"boto3 is required to load {path_or_uri!r} from S3"
            ) from exc
        rest = path_or_uri.split("://", 1)[1]
        bucket, key = rest.split("/", 1)
        obj = boto3.client("s3").get_object(Bucket=bucket, Key=key)
        return obj["Body"].read().decode("utf-8")
    with open(path_or_uri, encoding="utf-8") as fh:
        return fh.read()


@dataclass
class InputConfig:
    """Source half of the job spec (reference: spark-job/job.json:13-26).

    ``type: "cdc_export"`` declares a REPLICATION CONSUMER job: ``path``
    is a change-export directory published by another job's
    ``output_config.cdc_exports`` (operators/cdc_export.py), and the
    output half describes the replica table kept in exact sync by
    ``job.run_replica_sync`` / ``streaming.start_streaming_replica_sync``
    — the consumer-side mirror of the reference's declarative job file
    (spark-job/job.json:1-39).  ``consumer_id`` registers the replica's
    cursor with the export for fan-out-safe producer retention;
    ``allow_partial_bootstrap`` opts into syncing from an export that
    was provisioned mid-history (post-provision changes only)."""

    type: str = "files"  # "files" | "sqs" | "stream" | "cdc_export"
    format: str = "csv"
    path: str | None = None
    queue_url: str | None = None
    poll_interval: int = 60
    batch_size: int = 10
    commit_checkpoint: bool = True
    options: dict[str, str] = field(default_factory=dict)  # csv_options etc.
    schema_file: str | None = None  # explicit source schema (streaming needs one)
    transform_query: str = ""  # pre-sink SQL over view `batch` (wires job.json:19)
    consumer_id: str | None = None  # cdc_export only: fan-out registration
    allow_partial_bootstrap: bool = False  # cdc_export only

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "InputConfig":
        opts = d.get("options") or d.get("csv_options") or {}
        return cls(
            type=d.get("type", "files"),
            format=d.get("format", "csv"),
            path=d.get("path"),
            queue_url=d.get("queue_url"),
            poll_interval=int(d.get("poll_interval", 60)),
            batch_size=int(d.get("batch_size", 10)),
            commit_checkpoint=bool(d.get("commit_checkpoint", True)),
            options={str(k): str(v) for k, v in opts.items()},
            schema_file=d.get("schema_file"),
            transform_query=d.get("transform_query", "") or "",
            consumer_id=d.get("consumer_id"),
            allow_partial_bootstrap=bool(
                d.get("allow_partial_bootstrap", False)
            ),
        )


@dataclass
class MaintenanceConfig:
    """Declarative table maintenance, run inline after ingest commits.

    A long-running CDC ingest accumulates a data root per merge (COW)
    or delta entry (MOR); without periodic compaction, read
    amplification grows without bound.  The reference (and raw
    Iceberg) leaves this to an external scheduler — here the job spec
    declares it and the ingest loop maintains itself:

    - ``compact_every``: run ``ManagedTable.compact`` whenever the
      committed version is a multiple of N (0 disables).
    - ``zorder_by``: cluster the compaction rewrite on the Morton
      curve of these columns (multi-column stat skipping).
    - ``target_partitions``: output file count for the rewrite.
    - ``expire_keep_last``: after compaction, expire all but the K
      newest snapshots (0 keeps full history / time travel).
    """

    compact_every: int = 0
    zorder_by: list[str] = field(default_factory=list)
    target_partitions: int | None = None
    expire_keep_last: int = 0
    # append-mode cadence: binpack only entries under this size via
    # compact_small (O(small files)); larger roots are left alone.
    # Ignored when zorder_by/target_partitions request a full layout.
    compact_small_bytes: int = 64 << 20

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "MaintenanceConfig":
        zo = d.get("zorder_by") or []
        if isinstance(zo, str):
            zo = [c for c in (zo,) if c]
        tp = d.get("target_partitions")
        return cls(
            compact_every=int(d.get("compact_every", 0)),
            zorder_by=list(zo),
            target_partitions=int(tp) if tp is not None else None,
            expire_keep_last=int(d.get("expire_keep_last", 0)),
            compact_small_bytes=int(
                d.get("compact_small_bytes", 64 << 20)
            ),
        )


@dataclass
class IndexConfig:
    """One declaratively-maintained secondary index
    (``output_config.indexes``): every ingested batch is ALSO folded
    into the named retrieval index — ``bm25`` (operators/
    search_index.py: keyed postings merges, tag-guarded exactly-once
    additive stats), ``ivf`` (operators/ann_index.py: no-refit
    keyed vector appends; the first batch bootstraps the centroids) or
    ``minhash`` (streaming/neardup.py: keyed MinHash-LSH signature
    table; each batch's verified near-dup pairs optionally land in a
    ``pairs_path`` log table — the ingest-time duplicate alarm).
    This is how a lakehouse ingest keeps its secondary indexes
    trailing the table by one batch without an external scheduler."""

    type: str = "bm25"  # "bm25" | "ivf" | "minhash"
    path: str = ""
    id_column: str = "doc_id"
    text_column: str = "text"  # bm25 + minhash
    vector_column: str = "embedding"  # ivf only
    ivf_cells: int = 8  # ivf only: k for the bootstrap fit
    # minhash only: keyed MOR log of verified near-dup pairs, one row
    # per canonical (doc_id_a < doc_id_b) pair — empty disables pair
    # emission (the signature index is still maintained for ad-hoc use)
    pairs_path: str = ""
    minhash_threshold: float = 0.5  # minhash only: verified-jaccard gate
    maintenance_every: int = 0  # fold/compact the index every N batches
    # ivf only: at maintenance cadence, REFIT the centroids from the
    # stored vectors when the largest cell holds more than this share
    # of the index (drift signal — see operators/ann_index.py
    # max_cell_share).  0 disables; sensible values sit a few × above
    # the balanced share 1/ivf_cells.
    rebuild_max_cell_share: float = 0.0

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "IndexConfig":
        t = str(d.get("type", "bm25")).lower()
        if t not in ("bm25", "ivf", "minhash"):
            raise ValueError(
                f"unknown index type {t!r} (want bm25 | ivf | minhash)"
            )
        if not d.get("path"):
            raise ValueError("output_config.indexes entries need a path")
        thr = float(d.get("minhash_threshold", 0.5))
        if not (0.0 < thr <= 1.0):
            raise ValueError(
                f"minhash_threshold must be in (0, 1], got {thr}"
            )
        share = float(d.get("rebuild_max_cell_share", 0.0))
        if not (0.0 <= share <= 1.0):
            raise ValueError(
                "rebuild_max_cell_share is a cell-occupancy FRACTION: "
                f"want 0 (disabled) or (0, 1], got {share} — a negative "
                "value would refit on every cadence, >1 would never fire"
            )
        return cls(
            type=t,
            path=str(d["path"]),
            id_column=str(d.get("id_column", "doc_id")),
            text_column=str(d.get("text_column", "text")),
            vector_column=str(d.get("vector_column", "embedding")),
            ivf_cells=int(d.get("ivf_cells", 8)),
            pairs_path=str(d.get("pairs_path", "")),
            minhash_threshold=thr,
            maintenance_every=int(d.get("maintenance_every", 0)),
            rebuild_max_cell_share=share,
        )


@dataclass
class AuditConfig:
    """Declarative write-audit-publish gate (``output_config.audit``):
    every batch is STAGED (reader-invisible, table.py stage), the
    constraint rules run over the staged view, and only a clean batch
    publishes — the Iceberg WAP pattern wired into the ingest loop.

    - ``rules``: quality_checks rule dicts (not_null / range /
      accepted_values / unique / foreign_key).
    - ``refs``: {name: parquet path} lookup tables for foreign_key
      rules (read once per batch; broadcast-joined under AQE).
    - ``view``: what the rules see — ``delta`` (the staged batch, the
      cheap default) or ``table`` (the WOULD-BE post-publish table
      state, for global invariants like post-merge uniqueness).
    - ``on_fail``: ``fail`` (raise — batch pipelines), ``skip_batch``
      (drop the batch, keep streaming; the SQS message still commits,
      so a poison batch cannot redeliver forever) or ``quarantine``
      (land the offending batch in a side table at
      ``quarantine_path``, annotated with the violated rules — the
      triage queue of a production feed).
    """

    rules: list[dict] = field(default_factory=list)
    refs: dict[str, str] = field(default_factory=dict)
    view: str = "delta"  # "delta" | "table"
    on_fail: str = "fail"  # "fail" | "skip_batch" | "quarantine"
    quarantine_path: str = ""

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "AuditConfig":
        view = str(d.get("view", "delta"))
        if view not in ("delta", "table"):
            raise ValueError(f"audit.view must be delta|table, got {view!r}")
        on_fail = str(d.get("on_fail", "fail"))
        if on_fail not in ("fail", "skip_batch", "quarantine"):
            raise ValueError(
                "audit.on_fail must be fail|skip_batch|quarantine, "
                f"got {on_fail!r}"
            )
        qp = str(d.get("quarantine_path", ""))
        if on_fail == "quarantine" and not qp:
            raise ValueError(
                "audit.on_fail='quarantine' needs audit.quarantine_path"
            )
        return cls(
            rules=[dict(r) for r in (d.get("rules") or [])],
            refs={str(k): str(v) for k, v in (d.get("refs") or {}).items()},
            view=view,
            on_fail=on_fail,
            quarantine_path=qp,
        )


def _parse_cadence(v: Any, what: str) -> int:
    """Parse an every-N-data-commits maintenance cadence (0 = never);
    negative values are refused at parse time — they'd silently mean
    'every batch' or 'never' depending on the comparison direction."""
    n = int(v or 0)
    if n < 0:
        raise ValueError(
            f"output_config.{what} maintenance_every must be >= 0, got {n}"
        )
    return n


def _parse_hist_columns(
    d: Any,
) -> dict[str, tuple[float, float, int]]:
    """Parse + validate ``hist_columns: {col: [lo, hi, n_bins]}`` at
    config time (the same checks operators/rollup applies — a bad spec
    should refuse the job at startup, not crash mid-batch)."""
    out: dict[str, tuple[float, float, int]] = {}
    for c, spec in (d or {}).items():
        if not (isinstance(spec, (list, tuple)) and len(spec) == 3):
            raise ValueError(
                f"output_config.rollups hist_columns[{c!r}] must be "
                f"[lo, hi, n_bins], got {spec!r}"
            )
        lo, hi, nb = float(spec[0]), float(spec[1]), int(spec[2])
        if not (hi > lo) or nb < 1:
            raise ValueError(
                f"output_config.rollups hist_columns[{c!r}] needs "
                f"hi > lo and n_bins >= 1, got ({lo}, {hi}, {nb})"
            )
        out[str(c)] = (lo, hi, nb)
    return out


@dataclass
class RollupConfig:
    """One declaratively-maintained aggregate table
    (``output_config.rollups``): after every ingested batch the named
    summary table is refreshed from the TARGET TABLE'S change feed
    (operators/rollup.py) — count + sums per group (additive folds),
    optional min/max (incremental on inserts, bounded affected-group
    rescan on retractions), and optional exact COUNT(DISTINCT) via a
    companion per-(group, value) counts table; updates/deletes handled
    via CDF retractions.  Because the rollup consumes the
    table's committed state (never the raw batch), it stays coherent
    under every write mode including the verbatim MERGE INTO path,
    and a redelivered batch whose merge lands byte-identical rows
    nets to zero.  Keep the source table MOR: COW merge windows push
    the feed onto its full-diff fallback."""

    path: str = ""
    group_columns: list[str] = field(default_factory=list)
    sum_columns: list[str] = field(default_factory=list)
    min_columns: list[str] = field(default_factory=list)
    max_columns: list[str] = field(default_factory=list)
    distinct_columns: list[str] = field(default_factory=list)
    # second moments (Σx²): enables AVG/VARIANCE/STDDEV routing via
    # operators/rollup.rollup_stats — purely additive, no rescans
    sumsq_columns: list[str] = field(default_factory=list)
    # fixed-bin histograms ({col: [lo, hi, n_bins]}): additive per-bin
    # counts — retraction-exact, zero rescans — routing approximate
    # quantiles via operators/rollup.rollup_quantiles
    hist_columns: dict[str, tuple[float, float, int]] = field(
        default_factory=dict
    )
    # compact the rollup (and its distinct companions) every N data
    # commits (0 = never): per-batch MOR merges otherwise accumulate
    # delta files whose read-time resolution cost grows with every
    # refresh
    maintenance_every: int = 0

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "RollupConfig":
        if not d.get("path"):
            raise ValueError("output_config.rollups entries need a path")
        groups = [str(c) for c in (d.get("group_columns") or [])]
        if not groups:
            raise ValueError(
                "output_config.rollups entries need group_columns"
            )
        return cls(
            path=str(d["path"]),
            group_columns=groups,
            sum_columns=[str(c) for c in (d.get("sum_columns") or [])],
            min_columns=[str(c) for c in (d.get("min_columns") or [])],
            max_columns=[str(c) for c in (d.get("max_columns") or [])],
            distinct_columns=[
                str(c) for c in (d.get("distinct_columns") or [])
            ],
            sumsq_columns=[str(c) for c in (d.get("sumsq_columns") or [])],
            hist_columns=_parse_hist_columns(d.get("hist_columns")),
            maintenance_every=_parse_cadence(
                d.get("maintenance_every"), "rollups"
            ),
        )


@dataclass
class JoinMVConfig:
    """One declaratively-maintained join materialization
    (``output_config.join_mvs``): after every ingested batch the named
    MV table is refreshed as TARGET TABLE ⋈ right_table
    (operators/join_mv.py) — affected-key recompute from both tables'
    change feeds, never a full re-join.  The left side is the job's
    target table (keep it MOR, same constraint as rollups); the right
    side is any pre-existing keyed ManagedTable (a dimension another
    job maintains — its changes are picked up too, and it should also
    be MOR if it rewrites).  The MV is created on the first batch with
    both cursors anchored at bootstrap (consume_from=(1, 1)) so
    pre-existing right-side content folds in."""

    path: str = ""
    right_table: str = ""
    on: tuple[str, str] = ("", "")
    left_columns: list[str] = field(default_factory=list)
    right_columns: list[str] = field(default_factory=list)
    # compact the MV every N data commits (0 = never) — same
    # delta-accumulation reasoning as RollupConfig.maintenance_every
    maintenance_every: int = 0

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "JoinMVConfig":
        if not d.get("path"):
            raise ValueError("output_config.join_mvs entries need a path")
        if not d.get("right_table"):
            raise ValueError(
                "output_config.join_mvs entries need right_table"
            )
        on = d.get("on") or []
        if not (isinstance(on, (list, tuple)) and len(on) == 2
                and all(on)):
            raise ValueError(
                "output_config.join_mvs entries need on: "
                "[left_join_column, right_join_column]"
            )
        return cls(
            path=str(d["path"]),
            right_table=str(d["right_table"]),
            on=(str(on[0]), str(on[1])),
            left_columns=[str(c) for c in (d.get("left_columns") or [])],
            right_columns=[str(c) for c in (d.get("right_columns") or [])],
            maintenance_every=_parse_cadence(
                d.get("maintenance_every"), "join_mvs"
            ),
        )


@dataclass
class TopKMVConfig:
    """One declaratively-maintained top-k-per-group materialization
    (``output_config.topk_mvs``): after every ingested batch the named
    MV is refreshed from the TARGET TABLE'S change feed
    (operators/topk_mv.py) — insert-only batches fold against the
    groups' current top-k without touching the base; batches carrying
    retractions rescan only the touched groups.  ``id_columns``
    defaults to the job's key_columns (the per-row identity and the
    ranking tie-break).  Same MOR constraint as rollups."""

    path: str = ""
    group_columns: list[str] = field(default_factory=list)
    order_column: str = ""
    k: int = 0
    id_columns: list[str] = field(default_factory=list)
    payload_columns: list[str] = field(default_factory=list)
    descending: bool = True
    # compact the MV every N data commits (0 = never) — same
    # delta-accumulation reasoning as RollupConfig.maintenance_every
    maintenance_every: int = 0

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "TopKMVConfig":
        if not d.get("path"):
            raise ValueError("output_config.topk_mvs entries need a path")
        groups = [str(c) for c in (d.get("group_columns") or [])]
        if not groups:
            raise ValueError(
                "output_config.topk_mvs entries need group_columns"
            )
        if not d.get("order_column"):
            raise ValueError(
                "output_config.topk_mvs entries need order_column"
            )
        k = int(d.get("k") or 0)
        if k < 1:
            raise ValueError(
                f"output_config.topk_mvs entries need k >= 1, got {k}"
            )
        return cls(
            path=str(d["path"]),
            group_columns=groups,
            order_column=str(d["order_column"]),
            k=k,
            id_columns=[str(c) for c in (d.get("id_columns") or [])],
            payload_columns=[
                str(c) for c in (d.get("payload_columns") or [])
            ],
            descending=bool(d.get("descending", True)),
            maintenance_every=_parse_cadence(
                d.get("maintenance_every"), "topk_mvs"
            ),
        )


@dataclass
class CdcExportConfig:
    """One declaratively-maintained outbound CDC export
    (``output_config.cdc_exports``): after every ingested batch the
    target table's new change window is published to ``path`` as an
    immutable ``w_<lo>_<hi>/`` parquet directory a downstream system
    tails without linking against this library
    (operators/cdc_export.py).  Provisioned lazily on the first batch
    with ``consume_from=1``, so table content that predates the
    declaration exports as inserts (the same bootstrap contract as
    declared rollups/MVs).

    Retention/binpack cadences are derived from the export directory's
    own listing — stateless, like the listing-is-the-cursor design:

    - ``keep_last_windows`` > 0: after each export, prune all but the
      most recent N windows (producer-side retention).  Only safe once
      every downstream consumer tails faster than N batches — a slower
      consumer's next read raises ``ExpiredCursorError`` instead of
      silently serving a gapped history — UNLESS consumers register
      their cursors (``sync_from_export(..., consumer_id=...)``): the
      prune boundary is then capped at the slowest registered cursor.
    - ``coalesce_after`` > 0: when MORE than N window directories are
      retained, binpack all but the newest into one, so a
      bootstrapping consumer opens O(1) directories.  Each coalesce
      rewrites the retained prefix, bounded only by periodic explicit
      ``prune_export`` calls on long-lived exports.

    MUTUALLY EXCLUSIVE: both cadences trigger on the directory count,
    so setting both always leaves one silently dead — and with
    ``keep_last_windows > coalesce_after``, retention never fires while
    each coalesce rewrites ever-growing history
    (operators/cdc_export.validate_export_cadences).  Refused at parse
    time."""

    path: str = ""
    keep_last_windows: int = 0
    coalesce_after: int = 0

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "CdcExportConfig":
        if not d.get("path"):
            raise ValueError("output_config.cdc_exports entries need a path")
        keep = int(d.get("keep_last_windows") or 0)
        if keep < 0:
            raise ValueError(
                "output_config.cdc_exports keep_last_windows must be "
                f">= 0, got {keep}"
            )
        co = int(d.get("coalesce_after") or 0)
        if co < 0:
            raise ValueError(
                "output_config.cdc_exports coalesce_after must be "
                f">= 0, got {co}"
            )
        from .operators.cdc_export import (  # noqa: PLC0415
            validate_export_cadences,
        )

        validate_export_cadences(keep, co)
        return cls(
            path=str(d["path"]),
            keep_last_windows=keep,
            coalesce_after=co,
        )


@dataclass
class OutputConfig:
    """Sink half of the job spec (reference: spark-job/job.json:28-39)."""

    table_path: str = ""
    mode: str = "merge"  # append | overwrite | merge
    schema: str | None = None  # .avsc path (target contract)
    merge_query: str | None = None  # .sql path for merge mode
    table_type: str = "COW"  # COW | MOR (MOR = O(batch) delta appends,
    # read-time resolution, foldable via compaction — table.py)
    compression: str = "zstd"  # honored (reference read it but never applied)
    partition: list[str] = field(default_factory=list)
    # hidden partitioning (Iceberg transforms): {"ts_day": "day(ts)"} —
    # names listed in ``partition`` whose values are DERIVED from a
    # schema column at write time and never appear in the table schema
    partition_transforms: dict[str, str] = field(default_factory=dict)
    key_columns: list[str] = field(default_factory=list)
    order_column: str | None = None  # recency column for dedup/latest-wins
    merge_policy: str = "unconditional"  # "unconditional" | "latest_wins"
    table_properties: dict[str, str] = field(default_factory=dict)
    maintenance: MaintenanceConfig = field(default_factory=MaintenanceConfig)
    indexes: list["IndexConfig"] = field(default_factory=list)
    rollups: list["RollupConfig"] = field(default_factory=list)
    join_mvs: list["JoinMVConfig"] = field(default_factory=list)
    topk_mvs: list["TopKMVConfig"] = field(default_factory=list)
    cdc_exports: list["CdcExportConfig"] = field(default_factory=list)
    # CDC delete handling: rows whose op column carries one of these
    # values DELETE their keys instead of upserting (DMS-style feeds).
    # Empty list = reference behavior (deletes upsert like any row).
    cdc_op_column: str = "Op"
    cdc_delete_values: list[str] = field(default_factory=list)
    audit: AuditConfig = field(default_factory=AuditConfig)
    # Ingest-time schema evolution: a batch carrying columns the table
    # lacks ADDS them (nullable), a batch whose column type widens
    # losslessly (int→bigint, float→double) WIDENS the contract — no
    # file rewrites either way (table.evolve_schema).  Off by default:
    # the contract-pinned behavior (extra batch columns dropped by the
    # align step) is the reference's semantics.
    schema_evolution: bool = False

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "OutputConfig":
        part = d.get("partition") or []
        if isinstance(part, str):
            part = [p for p in (part,) if p]
        return cls(
            table_path=d.get("table_path") or d.get("table") or "",
            mode=d.get("mode", "merge"),
            schema=d.get("schema"),
            merge_query=d.get("merge_query"),
            table_type=d.get("table_type", "COW"),
            compression=d.get("compression", "zstd"),
            partition=list(part),
            partition_transforms={
                str(k): str(v)
                for k, v in (d.get("partition_transforms") or {}).items()
            },
            key_columns=list(d.get("key_columns") or []),
            order_column=d.get("order_column"),
            merge_policy=d.get("merge_policy", "unconditional"),
            table_properties={
                str(k): str(v) for k, v in (d.get("table_properties") or {}).items()
            },
            maintenance=MaintenanceConfig.from_dict(d.get("maintenance") or {}),
            indexes=[
                IndexConfig.from_dict(i) for i in (d.get("indexes") or [])
            ],
            rollups=[
                RollupConfig.from_dict(r) for r in (d.get("rollups") or [])
            ],
            join_mvs=[
                JoinMVConfig.from_dict(j)
                for j in (d.get("join_mvs") or [])
            ],
            topk_mvs=[
                TopKMVConfig.from_dict(tk)
                for tk in (d.get("topk_mvs") or [])
            ],
            cdc_exports=[
                CdcExportConfig.from_dict(e)
                for e in (d.get("cdc_exports") or [])
            ],
            cdc_op_column=d.get("cdc_op_column", "Op"),
            cdc_delete_values=[str(v) for v in (d.get("cdc_delete_values") or [])],
            audit=AuditConfig.from_dict(d.get("audit") or {}),
            schema_evolution=bool(d.get("schema_evolution", False)),
        )._validated()

    def _merge_query_is_merge_into(self) -> bool:
        """Parse-time probe: does ``merge_query`` hold a verbatim MERGE
        INTO statement?  An unreadable file (e.g. S3-only) answers
        False here and defers to the runtime guards in
        ``job.process_files``, which fail the batch before any write."""
        if not self.merge_query:
            return False
        try:
            text = _read_text(self.merge_query)
        except (OSError, RuntimeError):
            return False
        from .plans import is_merge_into  # noqa: PLC0415

        return is_merge_into(text)

    def _validated(self) -> "OutputConfig":
        # Static coherence checks AT PARSE TIME: raising mid-batch
        # (after the table write committed) would turn a config error
        # into an infinite poison-redelivery loop in the SQS path.
        # one probe (file read + parse) shared by the three checks below
        merge_into = self._merge_query_is_merge_into()
        if self.indexes and merge_into:
            # a verbatim MERGE INTO reshapes the batch before it lands,
            # so a declared index would be built from a different frame
            # than the table — refuse HERE, not per batch at run time
            raise ValueError(
                "output_config.indexes is not supported with a "
                "verbatim MERGE INTO merge_query — move the "
                "source projection into input_config."
                "transform_query so the indexed frame matches "
                "the table"
            )
        if self.schema_evolution and merge_into:
            raise ValueError(
                "output_config.schema_evolution is not supported with "
                "a verbatim MERGE INTO merge_query — the statement's "
                "fixed column list cannot see evolved columns; use "
                "key_columns merge mode (the shim) instead"
            )
        if self.indexes and self.mode == "merge" and not self.order_column:
            # table.merge and the index maintenance must dedup a batch
            # carrying two versions of one key by the SAME rule, or the
            # index and the table can disagree on which version is
            # live; without an order column there is no shared
            # deterministic rule (the MOR delta keeps both rows at one
            # commit seq, resolution pick undefined).
            raise ValueError(
                "merge-mode output_config.indexes requires "
                "order_column: without a recency column the table and "
                "the index cannot dedup duplicate-key batches "
                "identically"
            )
        if self.audit.rules:
            # WAP staging only supports the version-independent writes:
            # a COW merge rewrite computed against one base manifest
            # goes stale during the audit window (table.py stage).
            # Refuse HERE — raising per batch would poison-loop the
            # SQS path (same rationale as every check in this method).
            if self.mode == "merge" and self.table_type.upper() != "MOR":
                raise ValueError(
                    "output_config.audit with mode='merge' requires "
                    "table_type='MOR': staged COW merges cannot be "
                    "published safely after the audit window "
                    "(table.py stage)"
                )
            if merge_into:
                raise ValueError(
                    "output_config.audit is not supported with a "
                    "verbatim MERGE INTO merge_query — the MERGE "
                    "executes directly against the table, so "
                    "there is no staged snapshot to audit; use "
                    "key_columns merge mode (the shim) instead"
                )
        if self.join_mvs and not self.key_columns:
            raise ValueError(
                "output_config.join_mvs requires key_columns: the MV "
                "is keyed by both sides' keys (operators/join_mv.py)"
            )
        for tk in self.topk_mvs:
            ids = tk.id_columns or [
                c for c in self.key_columns if c not in tk.group_columns
            ]
            if not ids:
                raise ValueError(
                    "output_config.topk_mvs requires id_columns (or "
                    "job key_columns outside the group columns to "
                    "default to): the MV key and ranking tie-break "
                    "(operators/topk_mv.py)"
                )
            overlap = set(ids) & set(tk.group_columns)
            if overlap:
                raise ValueError(
                    f"output_config.topk_mvs id columns "
                    f"{sorted(overlap)} duplicate group columns"
                )
        if (
            self.rollups or self.join_mvs or self.topk_mvs
        ) and self.table_type.upper() != "MOR":
            # The rollup feed consumes the table's change feed; a
            # rewriting write (COW merge/MERGE INTO, COW deletes)
            # pushes read_changes_cdf onto its full-table keyed-diff
            # fallback EVERY batch — answers stay correct but refresh
            # cost silently becomes O(table), the per-batch pathology
            # this method exists to refuse at parse time (same
            # standard as the audit+COW-merge refusal above).
            if (
                self.mode == "merge"
                or merge_into
                or self.cdc_delete_values
            ):
                raise ValueError(
                    "output_config.rollups/join_mvs/topk_mvs with a rewriting "
                    "write path (mode='merge', a verbatim MERGE INTO "
                    "merge_query, or cdc_delete_values) requires "
                    "table_type='MOR': on a COW table every batch "
                    "degrades the change feed to a full-table diff "
                    "(operators/rollup.py, operators/join_mv.py)"
                )
        if self.cdc_delete_values and self.indexes:
            for ix in self.indexes:
                if ix.id_column not in self.key_columns:
                    raise ValueError(
                        f"index {ix.path!r}: cdc_delete_values is "
                        f"configured but index id column "
                        f"{ix.id_column!r} is not among key_columns "
                        f"{self.key_columns} — deletions could not be "
                        "propagated to the index"
                    )
        return self


@dataclass
class JobConfig:
    spark: dict[str, str] = field(default_factory=dict)
    input_config: InputConfig = field(default_factory=InputConfig)
    output_config: OutputConfig = field(default_factory=OutputConfig)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "JobConfig":
        return cls(
            spark={str(k): str(v) for k, v in (d.get("spark") or {}).items()},
            input_config=InputConfig.from_dict(d.get("input_config") or {}),
            output_config=OutputConfig.from_dict(d.get("output_config") or {}),
        )._validated()

    def _validated(self) -> "JobConfig":
        """Cross-half coherence for replication-consumer jobs
        (``input_config.type: "cdc_export"``) — parse-time, same
        poison-redelivery rationale as OutputConfig._validated.  The
        replica's write path is ``apply_changes`` (exact mirroring),
        so every ingest-shaping knob is meaningless there and a set
        one is a config error, not a silent no-op.  Derived families
        (rollups/join_mvs/topk_mvs/cdc_exports + maintenance) ARE
        allowed — they consume the replica's change feed, which
        apply_changes commits like any writer (cascading replication
        and replica-local aggregates compose for free)."""
        inp, out = self.input_config, self.output_config
        if inp.type != "cdc_export":
            return self
        if not inp.path:
            raise ValueError(
                "input_config.type='cdc_export' requires path: the "
                "change-export directory to tail"
            )
        if not out.key_columns:
            raise ValueError(
                "a cdc_export consumer job requires output_config."
                "key_columns: apply_changes merges on the replica's keys"
            )
        if out.mode != "merge":
            raise ValueError(
                f"output_config.mode {out.mode!r} is not supported on a "
                "cdc_export consumer job: apply_changes always applies "
                "the tail as keyed merges + deletes — leave mode unset "
                "(a configured append/overwrite would be a silent no-op)"
            )
        for bad, what in (
            (out.merge_query, "output_config.merge_query"),
            (out.indexes, "output_config.indexes"),
            (out.audit.rules, "output_config.audit"),
            (out.cdc_delete_values, "output_config.cdc_delete_values"),
            (out.schema_evolution, "output_config.schema_evolution"),
            (inp.transform_query, "input_config.transform_query"),
            (inp.schema_file, "input_config.schema_file"),
            (inp.queue_url, "input_config.queue_url"),
            (inp.options, "input_config.options"),
        ):
            if bad:
                raise ValueError(
                    f"{what} is not supported on a cdc_export consumer "
                    "job: the replica mirrors the source exactly "
                    "(apply_changes — deletes propagate from the "
                    "export, evolution propagates automatically, and "
                    "indexes need the raw batch frame the consumer "
                    "never sees); declare these on the PRODUCER job"
                )
        if (
            out.rollups or out.join_mvs or out.topk_mvs
        ) and out.table_type.upper() != "MOR":
            raise ValueError(
                "rollups/join_mvs/topk_mvs on a cdc_export consumer "
                "job require table_type='MOR': apply_changes is a "
                "rewriting write (keyed merge + deletes), which on a "
                "COW replica degrades every family refresh to a "
                "full-table diff (same rule as the producer side)"
            )
        return self

    @classmethod
    def load(cls, path_or_uri: str) -> "JobConfig":
        return cls.from_dict(json.loads(_read_text(path_or_uri)))


def load_text(path_or_uri: str) -> str:
    """Public helper for .sql / .avsc artifacts (local or S3)."""
    return _read_text(path_or_uri)

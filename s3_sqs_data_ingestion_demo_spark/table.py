"""``ManagedTable`` — a parquet-backed snapshot table with upsert.

Stands in for the reference's Iceberg v2 target table (reference:
spark-job/read.py:195-246).  No Iceberg/Delta runtime jar is bundled in
this environment, so instead of ``MERGE INTO`` on a V2 catalog the same
semantics are implemented as a versioned-snapshot layout over plain
parquet plus DataFrame programs:

```
<table_path>/
    _meta.json                  table contract: schema, partition cols,
                                key cols, merge policy, properties
    _snapshots/v00000001.json   manifest: list of (data root, partition
                                subdirs) pairs that make up the version
    _current                    pointer file -> committed version
    data/v00000001/...          immutable parquet data, hive-partitioned
```

Commit protocol: data and manifest are written first, then the
``_current`` pointer is swapped with an atomic rename — readers always
see a complete snapshot (single-writer; the reference is also a
single-writer loop, spark-job/read.py:330-350).

Scale design (the part that matters at 100 TB):

- **Partition-aware copy-on-write merge.** A merge only reads and
  rewrites the hive partitions that the source batch actually touches;
  untouched partition directories are carried over into the new
  manifest by reference.  With a CDC batch touching k of N partitions,
  a merge costs O(size of k partitions), not O(table).  This is the
  same pruning Iceberg does with manifests, expressed with parquet
  directory partitioning.
- **One shuffle per merge.**  The upsert itself is an anti-join + union
  (or union + window for ``latest_wins``) hash-partitioned on the key
  columns — Spark's canonical upsert plan.  Small CDC batches broadcast
  automatically under AQE.
- **No driver data paths.**  Only distinct partition *values* of the
  incoming batch are collected (bounded by partition cardinality by
  construction); rows never move through the driver.

Local-FS note: partition-directory discovery uses ``glob``; on an
object store this listing would go through the Hadoop FileSystem API —
the manifest format is unchanged.
"""

from __future__ import annotations

import glob
import json
import math
import os
import random
import re
import time
import urllib.parse
import uuid
from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .operators.merge import dedup_latest, merge_upsert

_META = "_meta.json"
_CURRENT = "_current"
_SNAPDIR = "_snapshots"
_STAGEDIR = "_staged"
_METALOG = "_metalog"  # O_EXCL witnesses CAS-protecting _meta.json


class AuditFailedError(RuntimeError):
    """A staged snapshot failed its publish-time audit.

    Carries the per-rule violation report in ``report`` (list of
    (rule_id, n_violations) dicts).  The staged snapshot is left in
    place so the operator can inspect ``read_staged`` and either fix
    the rules/data or ``discard_staged``."""

    def __init__(self, msg: str, report: list[dict]):
        super().__init__(msg)
        self.report = report


class CommitConflictError(RuntimeError):
    """Another writer committed the same table version concurrently.

    Raised by the optimistic-concurrency commit protocol instead of
    silently overwriting the winner's snapshot; the standard response
    is to re-load the table and retry the operation against the new
    current version."""


class MetaCommitConflictError(RuntimeError):
    """Another writer advanced the table METADATA concurrently.

    Raised by ``_persist_meta``'s O_EXCL witness instead of silently
    losing the winner's update (the lost-update race between e.g. a
    rollup cursor write and a schema evolution).  ``set_properties``
    auto-retries by re-reading and re-applying its patch; structural
    metadata ops (schema/spec evolution) surface the conflict — reload
    the table and re-derive the change."""

# Characters Spark/Hive escape in partition directory names
# (ExternalCatalogUtils.charToEscape): ASCII control chars plus these.
_ESCAPED_CHARS = set('"#%\'*/:=?\\\x7f{[]^')


def _escape_part_value(v) -> str:
    """Render a partition value exactly as Spark names the hive
    directory (escaping parity is what lets the merge match a batch's
    partition values against written subdirs — a raw ``str()`` here
    silently misses dirs for values like ``a:b`` or ``50%``)."""
    if v is None:
        return "__HIVE_DEFAULT_PARTITION__"
    s = str(v)
    out = []
    for ch in s:
        if ch in _ESCAPED_CHARS or ord(ch) < 0x20:
            out.append(f"%{ord(ch):02X}")
        else:
            out.append(ch)
    return "".join(out)


@dataclass
class TableMeta:
    schema_json: str
    partition_cols: list[str] = field(default_factory=list)
    key_cols: list[str] = field(default_factory=list)
    order_column: str | None = None
    merge_policy: str = "unconditional"
    table_type: str = "COW"  # accepted for parity; executed as COW
    compression: str = "zstd"
    properties: dict[str, str] = field(default_factory=dict)
    # Hidden partitioning (Iceberg partition transforms): maps a
    # partition column in ``partition_cols`` to a transform over a
    # SOURCE column of the logical schema — "day(ts)" / "month(ts)" /
    # "hour(ts)" / "bucket(16, id)" / "truncate(8, name)".  The
    # derived column exists only in the storage layout (hive dirs),
    # never in the logical schema: writers derive it, readers drop it,
    # and predicates on the SOURCE column prune the dirs (see
    # ``read_where``).  Identity partitions (no transform entry)
    # behave exactly as before.
    partition_transforms: dict[str, str] = field(default_factory=dict)
    # Partition-spec EVOLUTION (Iceberg spec ids): ``spec_id`` names
    # the CURRENT spec (the partition_cols/partition_transforms
    # above); every superseded spec is kept in ``partition_specs``
    # under its stringified id, and manifest entries record the spec
    # they were written under (``entry["spec"]``, absent = 0) so reads
    # prune each entry by ITS OWN layout.  Old metas deserialize with
    # spec_id 0 / empty history — fully back-compatible.
    spec_id: int = 0
    partition_specs: dict[str, dict] = field(default_factory=dict)
    # Names removed by drop_column: reads are name-based, so a NEW
    # column reusing a dropped name would silently resurrect the old
    # files' values (Iceberg avoids this with field ids; we refuse the
    # re-add instead — see add_columns).
    dropped_columns: list[str] = field(default_factory=list)
    # Metadata CAS term: every ``_persist_meta`` advances this by one
    # through an O_EXCL witness file (``_metalog/m<seq>.json``), so two
    # writers whose in-memory meta derives from the same seq cannot
    # silently clobber each other's update (e.g. a rollup cursor write
    # racing a schema evolution on the same table).  Legacy metas
    # deserialize at seq 0 and join the protocol on their next write.
    meta_seq: int = 0

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schema_json))


# transform spec grammar: kind(source) or kind(param, source)
_TRANSFORM_RE = re.compile(
    r"^\s*(day|month|hour|bucket|truncate)\s*\(\s*"
    r"(?:(\d+)\s*,\s*)?([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*$"
)


def parse_transform(spec: str) -> tuple[str, int | None, str]:
    """``"day(ts)"`` → ("day", None, "ts"); ``"bucket(16, id)"`` →
    ("bucket", 16, "id").  Fails loudly on anything else."""
    m = _TRANSFORM_RE.match(spec)
    if not m:
        raise ValueError(
            f"bad partition transform {spec!r} — want day(col) | "
            "month(col) | hour(col) | bucket(N, col) | truncate(W, col)"
        )
    kind, param, source = m.group(1), m.group(2), m.group(3)
    if kind in ("bucket", "truncate"):
        if param is None or int(param) <= 0:
            raise ValueError(f"{kind} transform needs a positive width: {spec!r}")
        return kind, int(param), source
    if param is not None:
        raise ValueError(f"{kind} transform takes no width: {spec!r}")
    return kind, None, source


def transform_expr(spec: str, dtype: T.DataType | None = None):
    """The JVM-side Column computing a transform's partition value.
    Date-ish transforms render zero-padded strings whose LEXICOGRAPHIC
    order equals time order — the property dir pruning relies on."""
    kind, param, source = parse_transform(spec)
    c = F.col(source)
    if kind == "day":
        return F.date_format(c, "yyyy-MM-dd")
    if kind == "month":
        return F.date_format(c, "yyyy-MM")
    if kind == "hour":
        return F.date_format(c, "yyyy-MM-dd-HH")
    if kind == "bucket":
        # xxhash64 is seed-stable across Spark versions; pmod keeps the
        # value in [0, N) for negative hashes
        return F.pmod(F.xxhash64(c), F.lit(param)).cast("int")
    # truncate: numbers floor to a multiple of W; strings take the
    # W-char prefix — both monotone, so range pruning stays valid
    if isinstance(dtype, T.StringType):
        return F.substring(c, 1, param)
    return (c - F.pmod(c, F.lit(param))).cast(
        dtype.simpleString() if dtype is not None else "long"
    )


# Lossless type widenings (Iceberg's evolution matrix, executable here
# because Spark 4's parquet readers promote these physically at scan
# time, SPARK-40876): a widened column's OLD files keep their narrow
# physical type forever — no rewrite — and every read serves the wide
# logical type.  Anything outside this set (long→int, string→int,
# double→float) loses data or fails per-file casts, so it is refused.
_WIDEN_OK = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"),
    ("float", "double"),
}


def can_widen(frm: T.DataType, to: T.DataType) -> bool:
    if isinstance(frm, T.DecimalType) and isinstance(to, T.DecimalType):
        # Iceberg's decimal rule: precision may grow, scale must hold —
        # every old value is exactly representable, no rounding
        # semantics enter.  (Spark 4's parquet reader can rescale too,
        # but a scale change alters the rendered value; refused.)
        return to.scale == frm.scale and to.precision > frm.precision
    return (frm.simpleString(), to.simpleString()) in _WIDEN_OK


def merge_types(cur: T.DataType, inc: T.DataType, path: str = "") -> T.DataType:
    """Reconcile two types for schema evolution, recursively:

    - equal → unchanged; one widens losslessly into the other → the
      wider (``can_widen``: integral upcasts, float→double, decimal
      precision growth)
    - struct vs struct → field-wise union: shared fields reconcile
      recursively, fields unique to either side are kept (nullable —
      the absent side null-fills, on read for old files and on write
      for old-shaped batches)
    - array vs array → element types reconcile
    - anything else → loud ``ValueError`` (a silent lossy cast would
      corrupt data)

    The read side is free: Spark 4's parquet readers null-fill missing
    nested fields and apply widening promotions inside structs/arrays
    (verified on this build).  The write side goes through
    ``align_to_schema``'s structural rebuild."""
    if cur == inc:
        return cur
    if can_widen(cur, inc):
        return inc
    if can_widen(inc, cur):
        return cur
    if isinstance(cur, T.StructType) and isinstance(inc, T.StructType):
        inc_map = {f.name: f for f in inc.fields}
        cur_names = {f.name for f in cur.fields}
        fields = []
        for f in cur.fields:
            g = inc_map.get(f.name)
            if g is None:
                # nullable like the inc-unique fields below: the
                # incoming-shaped batches will null-fill this field
                fields.append(T.StructField(f.name, f.dataType, True))
            else:
                fields.append(
                    T.StructField(
                        f.name,
                        merge_types(
                            f.dataType, g.dataType, f"{path}{f.name}."
                        ),
                        True,
                    )
                )
        fields.extend(
            T.StructField(g.name, g.dataType, True)
            for g in inc.fields
            if g.name not in cur_names
        )
        return T.StructType(fields)
    if isinstance(cur, T.ArrayType) and isinstance(inc, T.ArrayType):
        return T.ArrayType(
            merge_types(cur.elementType, inc.elementType, f"{path}[]"),
            True,
        )
    raise ValueError(
        f"schema evolution cannot reconcile {path or 'column'}: "
        f"{cur.simpleString()} vs {inc.simpleString()} — neither side "
        "widens losslessly into the other"
    )


def _align_expr(c, frm: T.DataType, to: T.DataType):
    """Column expression aligning a value of type ``frm`` onto ``to``.
    Scalars cast (Spark semantics, unchanged); structs REBUILD —
    Spark's struct cast refuses differing field counts, so missing
    subfields null-fill explicitly, with a null-struct guard (a NULL
    struct row must stay NULL, not become a row of nulls); arrays
    align per element."""
    if frm == to:
        return c
    if isinstance(to, T.StructType) and isinstance(frm, T.StructType):
        frm_map = {f.name: f for f in frm.fields}
        # extra BATCH subfields fail loudly, matching the struct-cast
        # behavior this rebuild replaced: contracts only grow nested
        # fields, so an unknown subfield is always producer drift —
        # dropping it silently would lose nested data with no signal
        # that schema evolution is needed.  (Extra TOP-LEVEL batch
        # columns stay silently dropped — the reference's semantics.)
        extra = [f.name for f in frm.fields if f.name not in
                 {x.name for x in to.fields}]
        if extra:
            raise ValueError(
                f"batch struct carries subfields {extra} not in the "
                "table contract — enable output_config.schema_evolution "
                "or fix the producer"
            )
        subs = []
        for f in to.fields:
            g = frm_map.get(f.name)
            if g is None:
                subs.append(F.lit(None).cast(f.dataType).alias(f.name))
            else:
                subs.append(
                    _align_expr(
                        c.getField(f.name), g.dataType, f.dataType
                    ).alias(f.name)
                )
        return F.when(c.isNull(), F.lit(None).cast(to)).otherwise(
            F.struct(*subs)
        )
    if isinstance(to, T.ArrayType) and isinstance(frm, T.ArrayType):
        return F.transform(
            c, lambda x: _align_expr(x, frm.elementType, to.elementType)
        ).cast(to)
    return c.cast(to)


def isin_column(col: str, vals) -> "F.Column":
    """``col IN (vals)`` as a Column built in ONE py4j round-trip.

    ``Column.isin(vals)`` converts every literal through an individual
    py4j call (~0.5 ms each — measured ~2 s for ~3k values, paid per
    read on the affected-key paths); rendering the IN list as SQL
    hands the whole thing to the JVM parser at once.  Catalyst
    semantics are identical (same In/InSet expression, same parquet
    pushdown).

    The SQL-text fast path is taken ONLY for values that render
    unambiguously under EITHER setting of
    ``spark.sql.parser.escapedStringLiterals``: finite numbers, and
    strings free of backslashes and control characters (the default
    parser treats ``\\`` inside a literal as an escape, so ``a\\nb``
    would silently parse as ``a<newline>b`` — a wrong-membership
    answer, not an error; quote doubling ``''`` is safe on both
    settings).  Anything else — bools, None, non-finite floats
    (``repr`` → unparseable ``nan``/``inf``), backslash/control-char
    strings, mixed or exotic types — falls back to the
    slow-but-general built-in ``isin``, preserving correctness at the
    cost of the per-literal py4j conversions."""
    vals = list(vals)
    if not vals:
        return F.lit(False)
    for v in vals:
        if isinstance(v, bool) or not isinstance(v, (int, float, str)):
            return F.col(col).isin(vals)
        if isinstance(v, float) and not math.isfinite(v):
            return F.col(col).isin(vals)
        if isinstance(v, str) and (
            "\\" in v or any(ord(ch) < 0x20 or ch == "\x7f" for ch in v)
        ):
            return F.col(col).isin(vals)
    body = ",".join(
        "'" + v.replace("'", "''") + "'" if isinstance(v, str) else repr(v)
        for v in vals
    )
    name = col.replace("`", "``")
    return F.expr(f"`{name}` IN ({body})")


def join_nullsafe(
    left: DataFrame, right: DataFrame, cols: Sequence[str], how: str
) -> DataFrame:
    """Join on named columns with NULL-SAFE equality (``<=>``) — the
    name-list ``df.join(other, cols)`` uses plain equality, where NULL
    never matches NULL, silently dropping null-keyed rows from semi
    joins and never pairing them in outer joins.  Null group/key
    values are legitimate (SQL GROUP BY keeps them; this table's MOR
    resolution window groups them), so every key-matching join on a
    potentially-null column must come through here.

    Output columns: semi/anti joins keep the left frame's columns (as
    usual); other join types keep BOTH sides' columns — select/drop
    explicitly via the ``_l``/``_r`` aliases this helper applies."""
    if not cols:
        raise ValueError("join_nullsafe requires at least one column")
    cond = None
    for c in cols:
        t = F.col(f"_l.{c}").eqNullSafe(F.col(f"_r.{c}"))
        cond = t if cond is None else (cond & t)
    return left.alias("_l").join(right.alias("_r"), cond, how)


def _subset_stats(stats: dict) -> dict:
    """Entry stats carried into a PARTS-SUBSET entry: per-column
    (min, max) remain valid bounds for any subset, but ``__rows``
    counts the whole original entry and must be dropped — a subset
    entry advertising the full count would corrupt the metadata-only
    ``count_rows()`` and the emptiness proofs."""
    return {k: v for k, v in stats.items() if k != "__rows"}


def _validate_partition_spec(
    schema: T.StructType,
    partition_cols: Sequence[str],
    partition_transforms: dict[str, str] | None,
) -> dict[str, str]:
    """Shared spec validation for ``create`` and
    ``set_partition_spec``; returns the normalized transforms map."""
    transforms = dict(partition_transforms or {})
    names = schema.fieldNames()
    for pcol, spec in transforms.items():
        if pcol in names:
            raise ValueError(
                f"transform partition column {pcol!r} collides with a "
                "schema column — hidden partitions are storage-only; "
                "use an identity partition for a real column"
            )
        _, _, source = parse_transform(spec)  # validates the spec
        if source not in names:
            raise ValueError(
                f"partition transform {spec!r}: source column "
                f"{source!r} not in schema"
            )
    for c in partition_cols:
        if c not in names and c not in transforms:
            raise ValueError(f"partition column {c!r} not in schema")
    for pcol in transforms:
        if pcol not in partition_cols:
            raise ValueError(
                f"transform column {pcol!r} must be listed in "
                "partition_cols"
            )
    return transforms


def align_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project/cast ``df`` onto ``schema`` (explicit align-and-cast step;
    the reference relied on implicit MERGE analyzer casts, SURVEY §1.3).
    Struct columns whose shape differs are rebuilt field-wise
    (``_align_expr``) so old-shaped batches keep writing after an
    additive struct evolution; scalar alignment is the same cast as
    before."""
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in schema.fields:
        if f.name in have:
            cols.append(
                _align_expr(F.col(f.name), have[f.name], f.dataType).alias(
                    f.name
                )
            )
        elif f.nullable:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            raise ValueError(f"source is missing non-nullable column {f.name!r}")
    return df.select(*cols)


class ManagedTable:
    """Parquet snapshot table with append / overwrite / merge modes
    (reference write-mode dispatch: spark-job/read.py:229-246)."""

    def __init__(self, spark: SparkSession, path: str, meta: TableMeta):
        self.spark = spark
        self.path = path
        self.meta = meta

    # ------------------------------------------------------------- DDL
    @staticmethod
    def exists(path: str) -> bool:
        """Catalog existence probe (reference: spark-job/read.py:199)."""
        return os.path.exists(os.path.join(path, _META))

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        partition_cols: Sequence[str] = (),
        key_cols: Sequence[str] = (),
        order_column: str | None = None,
        merge_policy: str = "unconditional",
        table_type: str = "COW",
        compression: str = "zstd",
        properties: dict[str, str] | None = None,
        partition_transforms: dict[str, str] | None = None,
    ) -> "ManagedTable":
        """Create an empty table from a schema contract (reference DDL
        path: spark-job/read.py:199-228; unlike the reference, the
        configured compression codec is actually honored).

        ``partition_transforms`` maps partition-column names to hidden
        transforms over logical columns (Iceberg partition specs):
        ``{"ts_day": "day(ts)"}`` partitions storage by the day of
        ``ts`` without ``ts_day`` ever appearing in the schema."""
        if cls.exists(path):
            raise FileExistsError(f"table already exists at {path}")
        transforms = _validate_partition_spec(
            schema, partition_cols, partition_transforms
        )
        meta = TableMeta(
            schema_json=json.dumps(schema.jsonValue()),
            partition_cols=list(partition_cols),
            key_cols=list(key_cols),
            order_column=order_column,
            merge_policy=merge_policy,
            table_type=table_type,
            compression=compression,
            properties=dict(properties or {}),
            partition_transforms=transforms,
        )
        os.makedirs(os.path.join(path, _SNAPDIR), exist_ok=True)
        with open(os.path.join(path, _META), "w", encoding="utf-8") as fh:
            json.dump(meta.__dict__, fh, indent=2)
        table = cls(spark, path, meta)
        table._commit_snapshot([], kind="create", base_version=0)  # v1 = empty table
        return table

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "ManagedTable":
        with open(os.path.join(path, _META), encoding="utf-8") as fh:
            doc = json.load(fh)
        # the metalog witness is the metadata COMMIT POINT: a writer
        # that crashed between creating it and replacing _meta.json
        # leaves the canonical file one seq behind — prefer the witness
        wits = sorted(glob.glob(os.path.join(path, _METALOG, "m*.json")))
        if wits:
            try:
                with open(wits[-1], encoding="utf-8") as fh:
                    wdoc = json.load(fh)
                if int(wdoc.get("meta_seq", 0)) > int(doc.get("meta_seq", 0)):
                    doc = wdoc
            except (OSError, ValueError):
                pass
        return cls(spark, path, TableMeta(**doc))

    @classmethod
    def create_if_absent(cls, spark: SparkSession, path: str, schema: T.StructType, **kw):
        if cls.exists(path):
            return cls.load(spark, path)
        return cls.create(spark, path, schema, **kw)

    # -------------------------------------------------------- snapshots
    def _current_version(self) -> int:
        with open(os.path.join(self.path, _CURRENT), encoding="utf-8") as fh:
            return int(fh.read().strip().lstrip("v"))

    def _read_manifest(self) -> list[dict]:
        return self._manifest_at(self._current_version())

    def _manifest_at(self, version: int) -> list[dict]:
        with open(
            os.path.join(self.path, _SNAPDIR, f"v{version:08d}.json"),
            encoding="utf-8",
        ) as fh:
            return json.load(fh)["entries"]

    def _snapshot_kind(self, version: int) -> str:
        """The commit kind recorded in a snapshot manifest — "data" for
        append/overwrite/merge, "maintenance" for compact, "create" for
        the initial empty snapshot.  Pre-kind manifests default to
        "data" (conservative: cadence may fire one commit early once)."""
        with open(
            os.path.join(self.path, _SNAPDIR, f"v{version:08d}.json"),
            encoding="utf-8",
        ) as fh:
            return json.load(fh).get("kind", "data")

    def data_commits_since_maintenance(self) -> int:
        """Count data commits since the last non-data commit (compact /
        create) — the correct cadence counter for ``compact_every``:
        raw version numbers also advance on maintenance commits, so a
        ``version % N`` check fires after N-1 merges and, at N=2,
        after EVERY merge (each compact realigns the parity).  Walks
        manifests newest-first and stops at the first non-data or
        expired snapshot."""
        n = 0
        v = self._current_version()
        while v > 0:
            try:
                kind = self._snapshot_kind(v)
            except FileNotFoundError:
                break  # expired history: everything older is unknowable
            if kind != "data":
                break
            n += 1
            v -= 1
        return n

    def has_commit_tag(self, tag: str, max_scan: int | None = None) -> bool:
        """Whether any live snapshot carries ``tag`` — the idempotency
        probe for replayed writers (e.g. a streaming micro-batch that
        crashed between its append and its checkpoint).  Tags only
        survive as long as their snapshots: keep ``expire_snapshots``'
        horizon longer than the replay window.

        ``max_scan`` bounds the probe to the NEWEST N manifests
        (version-descending) — the right shape for a per-batch hot
        path, where a replayed batch is always recent: an unbounded
        probe is O(total snapshots) driver work per batch and grows
        forever on a long-lived stream."""
        return any(t == tag for t in self._iter_tags(max_scan))

    def _iter_tags(self, max_scan: int | None = None):
        """Live snapshot tags, newest first — the single scanner behind
        ``has_commit_tag`` and ``find_commit_tag`` (unreadable or
        untagged manifests are skipped)."""
        names = sorted(
            glob.glob(os.path.join(self.path, _SNAPDIR, "v*.json")),
            reverse=True,
        )
        if max_scan is not None:
            names = names[: max(1, int(max_scan))]
        for m in names:
            try:
                with open(m, encoding="utf-8") as fh:
                    tag = json.load(fh).get("tag")
            except (OSError, ValueError):
                continue
            if tag:
                yield tag

    def find_commit_tag(
        self,
        prefix: str,
        stop_prefix: str | None = None,
        max_scan: int | None = None,
    ) -> str | None:
        """Newest live snapshot tag starting with ``prefix``, or None.

        The replay-recovery probe for tag FAMILIES (e.g. a rollup fold
        tagged ``rollup-<lo>-<hi>`` probed by ``rollup-<lo>-`` so the
        crashed attempt's high bound can be recovered from the tag
        text).  ``stop_prefix`` makes the scan STRUCTURALLY bounded
        instead of empirically bounded: the first non-matching tag
        that starts with ``stop_prefix`` is an older generation of the
        same family — everything beneath it predates the window being
        probed — so the scan stops there instead of walking all
        retained history.  ``max_scan`` additionally caps the walk
        like ``has_commit_tag``'s."""
        for tag in self._iter_tags(max_scan):
            if tag.startswith(prefix):
                return tag
            if stop_prefix is not None and tag.startswith(stop_prefix):
                return None
        return None

    def _commit_snapshot(
        self,
        entries: list[dict],
        kind: str = "data",
        tag: str | None = None,
        cleanup_on_conflict: bool = True,
        base_version: int | None = None,
    ) -> int:
        """Optimistic-concurrency commit (the same protocol Iceberg
        runs against a filesystem/catalog): the snapshot manifest is
        created with O_EXCL at ``base_version + 1``, so of two writers
        whose state derives from the same version N, exactly one
        creates ``v{N+1}.json`` and publishes the pointer — the loser
        raises ``CommitConflictError`` instead of silently clobbering
        the winner's manifest, and its caller re-loads the table and
        retries on the new current state.  (The data-root namespace is
        version-keyed and written ``errorifexists``, so a racing loser
        usually fails loudly there first, never corrupting the
        winner's files.)

        ``base_version`` anchors the commit to the version whose
        manifest the entries were DERIVED from — the CAS term.  Without
        it (legacy callers) the target version is re-read at commit
        time, which cannot detect a writer that landed between the
        caller's manifest read and this commit: the stale manifest
        would publish one version later and silently drop the
        winner's entries.  Every state-deriving caller must pass it."""
        if base_version is not None:
            prev = base_version
        else:
            prev = self._current_version() if os.path.exists(
                os.path.join(self.path, _CURRENT)
            ) else 0
        v = prev + 1
        snap = os.path.join(self.path, _SNAPDIR, f"v{v:08d}.json")
        fh = None
        for _ in range(3):  # bounded: reclaim can race another healer
            try:
                fh = open(snap, "x", encoding="utf-8")
                break
            except FileExistsError:
                # Slot occupied.  Two cases: (a) a concurrent writer
                # committed AND published — a genuine lost race; (b) a
                # writer CRASHED between creating the manifest and
                # publishing the CURRENT pointer, leaving an orphan
                # that would otherwise wedge this slot forever (every
                # retry re-anchors to base N and hits the same file).
                # Case (b) is detected as "manifest exists but CURRENT
                # still points below it" and reclaimed after an mtime
                # grace window (same rule as vacuum_orphans) — a
                # writer younger than the grace may still be mid-
                # publish, so it is left alone and the conflict raised.
                if self._reclaim_orphan_manifest(v):
                    continue
                # the loser's freshly-written data roots would block
                # its own retry (version-keyed names, errorifexists) —
                # drop any of this commit's roots no committed manifest
                # references (skipped by the rename-retry protocol,
                # which re-targets the SAME written root at the next
                # free version instead)
                if cleanup_on_conflict:
                    self._cleanup_unreferenced(entries)
                raise CommitConflictError(
                    f"snapshot v{v:08d} already exists at {snap}: "
                    "another writer committed concurrently — re-load "
                    "the table and retry the operation (an unpublished "
                    "crashed commit at this slot is reclaimed "
                    "automatically once older than "
                    "commit.orphan-grace-seconds)"
                ) from None
        if fh is None:  # pragma: no cover — 3 reclaim races in a row
            raise CommitConflictError(
                f"snapshot slot v{v:08d} could not be acquired after "
                "repeated orphan reclaims — concurrent healer contention"
            )
        with fh:
            # wall-clock stamped INTO the manifest so timestamp time
            # travel (version_as_of) and snapshots().committed_at
            # survive a copy/rsync/restore of the table directory —
            # file mtimes are rewritten by any such move, silently
            # rewriting history for an mtime-derived clock.  Clamped
            # strictly above the previous snapshot's stamp (Delta's
            # rule) so the stamps are MONOTONE even across an NTP
            # clock step — version_as_of's ascending early exit and
            # the "newest at or before ts" semantics both rely on it.
            committed_at = time.time()
            if prev > 0:
                try:
                    committed_at = max(
                        committed_at, self._commit_time(prev) + 1e-3
                    )
                except OSError:
                    pass
            snap_doc = {
                "version": v,
                "kind": kind,
                "committed_at": committed_at,
                "entries": entries,
            }
            if tag is not None:
                snap_doc["tag"] = tag
            json.dump(snap_doc, fh, indent=2)
        tmp = os.path.join(self.path, f"{_CURRENT}.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(f"v{v:08d}")
        os.replace(tmp, os.path.join(self.path, _CURRENT))  # atomic publish
        # seed the handle's stamp cache (post-publish, so a failed
        # write can never leave a stale entry): the NEXT commit's
        # monotone clamp and any as-of resolution become a dict hit
        # instead of a full-manifest re-parse
        cache = getattr(self, "_commit_time_cache", None)
        if cache is None:
            cache = self._commit_time_cache = {}
        cache[v] = (committed_at, True)
        return v

    def _reclaim_orphan_manifest(self, version: int) -> bool:
        """Delete ``v{version}.json`` iff it is an UNPUBLISHED crash
        leftover: the CURRENT pointer is still below ``version`` (a
        published manifest is never an orphan) and the file is older
        than the ``commit.orphan-grace-seconds`` table property
        (default 300 s) — younger files may belong to a live writer
        between its O_EXCL create and pointer publish.  Returns True
        when the slot was freed (including by a racing healer).  The
        orphan's writer-unique data roots become unreferenced and are
        collected later by ``vacuum_orphans``."""
        import time  # noqa: PLC0415

        if self._current_version() >= version:
            return False  # published: a real concurrent commit
        snap = os.path.join(self.path, _SNAPDIR, f"v{version:08d}.json")
        grace = float(
            self.meta.properties.get("commit.orphan-grace-seconds", 300.0)
        )
        try:
            st0 = os.stat(snap)
        except FileNotFoundError:
            return True  # a racing healer already freed the slot
        except OSError:
            return False
        if time.time() - st0.st_mtime < grace:
            return False
        # A bare os.remove here would be a TOCTOU hole: between the
        # checks above and the remove, a racing healer can reclaim the
        # slot, recreate v{N}.json with ITS commit, and even publish —
        # removing THAT file silently drops a committed snapshot.
        # Instead: atomically rename the file aside, verify the moved
        # file is the SAME inode we statted, and only then delete it;
        # a mismatch means we grabbed a freshly-created manifest, so
        # restore it (link-not-rename: never clobber a slot someone
        # re-acquired meanwhile) and report the slot as contended.
        quarantine = f"{snap}.reclaim-{uuid.uuid4().hex[:8]}"
        try:
            os.rename(snap, quarantine)
        except FileNotFoundError:
            return True
        except OSError:
            return False
        st1 = os.stat(quarantine)
        if (st1.st_ino, st1.st_mtime_ns) != (st0.st_ino, st0.st_mtime_ns):
            try:
                os.link(quarantine, snap)
                os.unlink(quarantine)
            except FileExistsError:
                # a third writer already created a new manifest in the
                # slot — two fresh manifests now exist; surface loudly
                # instead of guessing which one wins
                raise CommitConflictError(
                    f"orphan reclaim race on v{version:08d}: a fresh "
                    f"manifest was displaced to {quarantine} while the "
                    "slot was re-acquired — manual reconciliation needed"
                ) from None
            except OSError:
                # hard links unsupported (some object-store FUSE
                # mounts): restore via replace — clobbering is only
                # possible in the triple-race the FileExistsError
                # branch above guards on link-capable filesystems
                os.replace(quarantine, snap)
            return False
        os.remove(quarantine)
        return True

    def _committed_roots(self) -> set[str]:
        """Data roots referenced by any retained snapshot manifest —
        the shared base of every GC decision (conflict cleanup, stage
        discard, orphan vacuum).  Unreadable manifests contribute
        nothing (conservative callers must union other live sources,
        e.g. ``_staged_roots``, themselves)."""
        referenced: set[str] = set()
        for m in glob.glob(os.path.join(self.path, _SNAPDIR, "v*.json")):
            try:
                with open(m, encoding="utf-8") as fh:
                    for e in json.load(fh)["entries"]:
                        referenced.add(e["root"])
            except (OSError, ValueError, KeyError):
                continue
        return referenced

    def _cleanup_unreferenced(self, entries: list[dict]) -> None:
        """Remove data roots among ``entries`` that no committed
        manifest AND no live staged doc references (a conflict-losing
        commit's own output; a staged-but-unpublished WAP root is live
        state even though no manifest names it yet)."""
        import shutil  # noqa: PLC0415

        referenced = self._committed_roots() | self._staged_roots()
        for e in entries:
            if e.get("root") and e["root"] not in referenced:
                shutil.rmtree(
                    os.path.join(self.path, e["root"]), ignore_errors=True
                )

    def _new_root(self) -> str:
        """Version-PREFIXED but writer-UNIQUE data root (Iceberg's file
        layout rule): the random suffix means two racing writers never
        contend on the data namespace — only the manifest CAS decides
        the winner, and the loser re-commits its already-written root
        against the fresh manifest with zero data movement."""
        suffix = uuid.uuid4().hex[:8]
        return os.path.join(
            self.path, "data",
            f"v{self._current_version() + 1:08d}-{suffix}",
        )

    def _commit_entry_with_retry(
        self,
        entry: dict,
        kind: str = "data",
        tag: str | None = None,
        delta_seq: bool = False,
    ) -> int:
        """Commit ONE freshly-written entry on top of the current
        manifest, retrying a lost optimistic-commit race (table
        property ``commit.retries``, default 3).

        Valid only for version-INDEPENDENT entries — appends, MOR
        deltas, tombstones — whose data content does not depend on
        which manifest they land on.  Data roots are writer-unique, so
        a lost race simply re-commits the already-written root against
        the fresh manifest (driver-side, no recompute, no data
        movement); ``delta_seq`` re-stamps the MOR commit sequence
        each attempt.  COW rewrites are computed AGAINST a specific
        manifest and must recompute instead (see ``compact`` retries)."""
        retries = int(self.meta.properties.get("commit.retries", 3))
        for attempt in range(retries + 1):
            base = self._current_version()
            entries = self._manifest_at(base)
            if delta_seq:
                entry["seq"] = base + 1
            try:
                return self._commit_snapshot(
                    entries + [entry],
                    kind=kind,
                    tag=tag,
                    cleanup_on_conflict=False,
                    base_version=base,
                )
            except CommitConflictError:
                if attempt >= retries:
                    self._cleanup_unreferenced([entry])
                    raise
                # data roots are writer-unique, so the already-written
                # root re-commits verbatim against the fresh manifest —
                # the loop re-anchors base (and the MOR seq) and tries
                # the next version slot.  A lost race is only PROGRESS
                # once the winner publishes: until CURRENT advances,
                # re-anchoring lands on the same slot and the same
                # O_EXCL failure, so a tight loop can exhaust the whole
                # retry budget against one mid-publish competitor.
                # Back off (bounded, jittered) while no new version is
                # visible; retry immediately once it is.
                if self._current_version() == base:
                    time.sleep(
                        min(0.25, 0.005 * (2**attempt))
                        * (0.5 + random.random())
                    )
        raise AssertionError("unreachable")  # pragma: no cover

    # ------------------------------------------------------------ read
    def _read_entry(self, entry: dict) -> DataFrame:
        root = os.path.join(self.path, entry["root"])
        # Always read with the table contract's schema: files written
        # before an add-column evolution resolve their missing columns
        # to null, and a rootless/empty entry (e.g. a historical commit
        # of an empty batch) resolves to an empty DataFrame instead of
        # UNABLE_TO_INFER_SCHEMA.
        reader = self.spark.read.schema(self.meta.schema)
        if entry.get("parts"):
            paths = [os.path.join(root, p) for p in entry["parts"]]
            df = reader.option("basePath", root).parquet(*paths)
            # hive partition columns come back APPENDED by the reader
            # regardless of schema order — re-align to the contract
            return align_to_schema(df, self.meta.schema)
        # unpartitioned: the schema-explicit read already enforces
        # types, order, and null-fill; skip the no-op cast projection
        return reader.parquet(root)

    def _assemble(
        self, entries: list[dict], restrict_keys: DataFrame | None = None
    ) -> DataFrame:
        """Union the manifest's entries; when delta entries are present
        (MOR tables), resolve row versions at read time; when
        tombstone entries are present (MOR deletes), drop rows whose
        winning version predates the key's latest tombstone (a key
        re-inserted AFTER its delete survives).

        Resolution: one window over the key columns ordered by
        (order_column desc when latest_wins,) commit seq desc — the
        standard merge-on-read trade: merges/deletes are O(batch)
        appends, reads pay one key-shuffle of the live data until
        ``compact()`` rewrites deltas (and folds tombstones away) into
        the base.

        ``restrict_keys`` (a distinct frame of the table's key columns)
        limits the result to those keys via a semi-join applied BELOW
        the resolution window — safe because resolution partitions by
        exactly those keys, so dropping whole key-groups early never
        changes which version wins.  Used by the change feed to read
        pre/post images of only the affected keys.
        """
        tomb_entries = [e for e in entries if e.get("kind") == "tombstone"]
        data_entries = [e for e in entries if e.get("kind") != "tombstone"]
        if not data_entries:
            return self.spark.createDataFrame([], self.meta.schema)
        needs_seq = tomb_entries or any(
            e.get("kind") == "delta" for e in data_entries
        )
        key_list = list(self.meta.key_cols)
        if not needs_seq:
            dfs = [self._read_entry(e) for e in data_entries]
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d)
            if restrict_keys is not None:
                # null-safe: a null-keyed group is restrictable too
                out = join_nullsafe(out, restrict_keys, key_list, "left_semi")
            return out

        dfs = [
            self._read_entry(e).withColumn("_sg_seq", F.lit(int(e.get("seq", 0))))
            for e in data_entries
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        if restrict_keys is not None:
            out = join_nullsafe(out, restrict_keys, key_list, "left_semi")
        keys = self.meta.key_cols
        order_exprs = []
        if (
            self.meta.merge_policy == "latest_wins"
            and self.meta.order_column
            and self.meta.order_column in self.meta.schema.fieldNames()
        ):
            order_exprs.append(F.col(self.meta.order_column).desc())
        order_exprs.append(F.col("_sg_seq").desc())
        from pyspark.sql import Window  # noqa: PLC0415

        w = Window.partitionBy(*keys).orderBy(*order_exprs)
        out = (
            out.withColumn("_sg_rn", F.row_number().over(w))
            .filter(F.col("_sg_rn") == 1)
            .drop("_sg_rn")
        )
        if tomb_entries:
            tdfs = [
                self._read_entry(e)
                .select(*keys)
                .withColumn("_sg_tomb", F.lit(int(e.get("seq", 0))))
                for e in tomb_entries
            ]
            tombs = tdfs[0]
            for d in tdfs[1:]:
                tombs = tombs.unionByName(d)
            latest_tomb = tombs.groupBy(*keys).agg(
                F.max("_sg_tomb").alias("_sg_tomb")
            )
            # null-safe: a tombstone naming a null key must delete the
            # null-keyed row (plain equality would never match it)
            out = (
                join_nullsafe(out, latest_tomb, list(keys), "left")
                .filter(
                    F.col("_r._sg_tomb").isNull()
                    | (F.col("_r._sg_tomb") < F.col("_l._sg_seq"))
                )
                .select("_l.*")
            )
        return out.drop("_sg_seq")

    def read(self) -> DataFrame:
        return self._assemble(self._read_manifest())

    @staticmethod
    def _entry_may_contain(entry: dict, col: str, lo, hi) -> bool:
        """Manifest-stats check: can this entry hold a ``col`` value in
        [lo, hi]?  Entries without stats for the column must be kept
        (stats are advisory)."""
        s = (entry.get("stats") or {}).get(col)
        if not s:
            return True
        mn, mx = s
        if lo is not None and mx < lo:
            return False
        return not (hi is not None and mn > hi)

    def _transformed_bounds(self, spec: str, lo, hi):
        """Map a [lo, hi] range on a transform's SOURCE column to the
        corresponding bounds in partition-value space, or None when the
        transform/bound shape can't be pruned (caller keeps the dir).
        Monotone transforms (date renders, truncate) map ranges; bucket
        maps only point lookups (lo == hi)."""
        kind, param, _ = parse_transform(spec)
        if kind in ("day", "month", "hour"):
            fmt = {
                "day": "%Y-%m-%d", "month": "%Y-%m", "hour": "%Y-%m-%d-%H",
            }[kind]
            try:
                return (
                    lo.strftime(fmt) if lo is not None else None,
                    hi.strftime(fmt) if hi is not None else None,
                )
            except AttributeError:
                return None  # bound isn't date-like; don't prune
        if kind == "truncate":
            if lo is not None and isinstance(lo, str) or (
                hi is not None and isinstance(hi, str)
            ):
                return (
                    lo[:param] if lo is not None else None,
                    hi[:param] if hi is not None else None,
                )
            try:
                return (
                    lo - (lo % param) if lo is not None else None,
                    hi - (hi % param) if hi is not None else None,
                )
            except TypeError:
                return None
        if kind == "bucket" and lo is not None and lo == hi:
            # one bounded 1-row job computes the bucket of the point
            # with the exact JVM hash the writer used — the literal is
            # cast to the SOURCE column's type first (xxhash64 hashes
            # the physical representation: an int literal and a long
            # column hash differently)
            probe = F.lit(lo)
            dtype = self._source_dtype(spec)
            if dtype is not None:
                probe = probe.cast(dtype)
            b = (
                self.spark.range(1)
                .select(F.pmod(F.xxhash64(probe), F.lit(param)).cast("int"))
                .collect()[0][0]
            )
            return (b, b)
        return None

    def _prune_entry_parts(self, entry: dict, col: str, lo, hi):
        """Hidden-partition dir pruning: subset an entry's hive parts
        to those whose transform-partition value can intersect the
        [lo, hi] range on the SOURCE column ``col``.  Returns the
        (possibly subset) entry, or None when no part survives.  Null
        partition dirs are ALWAYS kept — MOR tombstones null their
        non-key columns, so a tombstone masking an in-range row lives
        in the null dir and pruning it would resurrect deleted keys."""
        parts = entry.get("parts")
        if not parts or (lo is None and hi is None):
            return entry
        # prune under the spec the ENTRY was written with — after a
        # partition-spec evolution, old entries keep their old layout
        specs = [
            (pcol, spec)
            for pcol, spec in self._entry_spec(entry)[1].items()
            if parse_transform(spec)[2] == col
        ]
        if not specs:
            return entry
        # per-transform bounds are invariant across parts — compute
        # them ONCE (a bucket probe runs a 1-row Spark job; inside the
        # loop it would run once per partition directory)
        pruners = []
        for pcol, spec in specs:
            bounds = self._transformed_bounds(spec, lo, hi)
            if bounds is not None:
                pruners.append((pcol, parse_transform(spec)[0], bounds))
        if not pruners:
            return entry
        kept = []
        for part in parts:
            seg_vals = {}
            for seg in part.split("/"):
                name, _, raw = seg.partition("=")
                seg_vals[name] = raw
            keep = True
            for pcol, kind, (lo_t, hi_t) in pruners:
                raw = seg_vals.get(pcol)
                if raw is None or raw == "__HIVE_DEFAULT_PARTITION__":
                    continue  # unknown or null dir: keep (see docstring)
                val = urllib.parse.unquote(raw)
                if kind in ("bucket", "truncate") and not isinstance(
                    lo_t if lo_t is not None else hi_t, str
                ):
                    try:
                        val = type(lo_t if lo_t is not None else hi_t)(val)
                    except (TypeError, ValueError):
                        continue
                if (lo_t is not None and val < lo_t) or (
                    hi_t is not None and val > hi_t
                ):
                    keep = False
                    break
            if keep:
                kept.append(part)
        if not kept:
            return None
        if len(kept) == len(parts):
            return entry
        out = dict(entry, parts=kept)
        # entry-level stats remain valid bounds for any subset
        return out

    def read_where(self, col: str, lo=None, hi=None) -> DataFrame:
        """Point/range read with MANIFEST-LEVEL pruning (the skip
        Iceberg gets from manifest stats): data roots whose per-entry
        (min, max) of ``col`` cannot intersect [lo, hi] are never
        opened — on a long-lived keyed table a point lookup touches
        the handful of entries that ever saw the key, not the whole
        history.  The predicate is ALSO applied to the assembled rows,
        so results are exact whether or not stats exist.

        Hidden partitioning composes here: when ``col`` is the source
        of a partition transform, each surviving entry's hive dirs are
        additionally subset to the partitions the range can touch
        (``_prune_entry_parts``) — the Iceberg behavior where a
        predicate on ``ts`` prunes ``day(ts)`` partitions the user
        never sees.

        Correctness with MOR resolution: an entry that cannot contain
        the key contributes no version of it, so skipping it never
        changes the winning row; tombstone entries are pruned by the
        same rule (and their null dirs are always kept)."""
        entries = []
        for e in self._read_manifest():
            if not self._entry_may_contain(e, col, lo, hi):
                continue
            e = self._prune_entry_parts(e, col, lo, hi)
            if e is not None:
                entries.append(e)
        out = self._assemble(entries)
        c = F.col(col)
        if lo is not None:
            out = out.filter(c >= F.lit(lo))
        if hi is not None:
            out = out.filter(c <= F.lit(hi))
        return out

    def entries_disjoint_on(self, col: str, entries: list[dict] | None = None) -> bool:
        """True iff the live (non-tombstone) manifest entries' ``col``
        stats prove pairwise-disjoint ranges.  For a KEY column this
        proves no key has more than one live row, so MOR seq
        resolution is a no-op — the proof behind the streaming
        near-dup index's fast path and ``read_where_in``'s
        resolution-free scan.  Any entry missing the column's stats
        makes the answer False (stats are advisory).  Driver-side,
        O(entries log entries)."""
        ranges = []
        for e in entries if entries is not None else self._read_manifest():
            if e.get("kind") == "tombstone":
                continue
            est = e.get("stats") or {}
            if est.get("__rows") == 0:
                # provably empty entry (rowless merge delta /
                # overwrite-to-empty): contains no key, cannot overlap
                continue
            s = est.get(col)
            if not s:
                return False
            ranges.append((s[0], s[1]))
        ranges.sort()
        return all(
            ranges[i - 1][1] < ranges[i][0] for i in range(1, len(ranges))
        )

    def read_where_in(self, col: str, values) -> DataFrame:
        """Multi-point read: rows whose ``col`` is in ``values``, with
        the predicate pushed as deep as provable-correctness allows.

        Fast path — when the table has a single key column, no live
        tombstones, and the live entries' KEY stats prove pairwise
        disjointness (so no key has two live versions): MOR resolution
        is provably a no-op, so the read is one schema-explicit scan
        over only the entries whose ``col`` stats intersect the value
        set, with an ``isin`` filter that reaches the parquet scan
        (file/row-group skip after ``compact(cluster_by=[col])``).
        This is the steady state of a compacted index table: ONE
        entry, trivially disjoint.

        Fallback — duplicate key versions or tombstones present: the
        newest version of a key may live in an entry the value filter
        would prune (the key's ``col`` value can change across
        versions), so entry pruning could resurrect a stale row.  The
        read degrades to the fully resolved ``read()`` with the filter
        applied above resolution: exact, no manifest skip.
        ``compact()`` restores the fast path."""
        vset = set(values)
        if None in vset:
            # SQL IN never matches NULL — a silent miss, not an error;
            # callers that can see null keys must filter them (join
            # semantics) or read with an explicit isNull() disjunct.
            raise ValueError(
                "read_where_in values must be non-null — IN never "
                "matches NULL; filter nulls or add an isNull() read"
            )
        vals = sorted(vset)
        if not vals:
            return self.spark.createDataFrame([], self.meta.schema)
        isin = isin_column(col, vals)
        all_entries = self._read_manifest()
        live = [e for e in all_entries if e.get("kind") != "tombstone"]
        keys = list(self.meta.key_cols)
        if (
            len(live) == len(all_entries)
            and len(keys) == 1
            and not self.meta.partition_cols
            # old entries written under a superseded PARTITIONED spec
            # keep hive subdirs; mixing them with bare roots in one
            # multi-root scan fails partition discovery (same guard as
            # _read_unresolved_union)
            and not any(e.get("parts") for e in live)
            and self.entries_disjoint_on(keys[0], live)
        ):
            kept = [
                e
                for e in live
                if any(self._entry_may_contain(e, col, v, v) for v in vals)
            ]
            if not kept:
                return self.spark.createDataFrame([], self.meta.schema)
            roots = [os.path.join(self.path, e["root"]) for e in kept]
            return (
                self.spark.read.schema(self.meta.schema)
                .parquet(*roots)
                .filter(isin)
            )
        return self.read().filter(isin)

    def read_unresolved(
        self, with_seq: bool = False, apply_tombstones: bool = False
    ) -> DataFrame:
        """Union of all live entries WITHOUT merge-on-read key
        resolution — O(scan), no key-shuffle window.  For consumers
        whose downstream logic tolerates (or locally resolves)
        duplicate keys: e.g. the streaming near-dup index derives LSH
        collision candidates from the raw union (stale duplicates only
        add candidates, which exact verification discards) and resolves
        latest-by-seq on the candidate-sized slice only — instead of
        paying a full-index window every micro-batch.  ``with_seq``
        appends the commit-sequence column ``_sg_seq`` (0 for base
        entries, the commit version for MOR deltas) so callers can
        resolve recency themselves.

        By default tombstone (delete) entries are SKIPPED, not
        applied: the raw union may contain deleted rows — acceptable
        when stale rows only generate extra work that verification
        discards.  ``apply_tombstones=True`` masks deleted keys (rows
        whose seq predates the key's latest tombstone; re-inserts
        survive, same rule as resolved reads) via one join against the
        key-only tombstone rows — O(deletes), broadcast-sized until
        compaction folds them, and FREE when no tombstones exist."""
        all_entries = self._read_manifest()
        tomb_entries = (
            [e for e in all_entries if e.get("kind") == "tombstone"]
            if apply_tombstones
            else []
        )
        entries = [
            e for e in all_entries if e.get("kind") != "tombstone"
        ]
        if not entries:
            out = self.spark.createDataFrame([], self.meta.schema)
            return out.withColumn("_sg_seq", F.lit(0).cast("long")) if with_seq else out
        if tomb_entries:
            out = self._read_unresolved_union(entries, with_seq=True)
            keys = list(self.meta.key_cols)
            tombs = None
            for e in tomb_entries:
                d = self._read_entry(e).select(*keys).withColumn(
                    "_sg_tomb", F.lit(int(e.get("seq", 0))).cast("long")
                )
                tombs = d if tombs is None else tombs.unionByName(d)
            t_agg = tombs.groupBy(*keys).agg(
                F.max("_sg_tomb").alias("_sg_tomb")
            )
            # null-safe, like _assemble's resolution path: a tombstone
            # naming a null key must mask the null-keyed row
            out = (
                join_nullsafe(out, t_agg, keys, "left")
                .filter(
                    F.col("_r._sg_tomb").isNull()
                    | (F.col("_r._sg_tomb") < F.col("_l._sg_seq"))
                )
                .select("_l.*")
            )
            return out if with_seq else out.drop("_sg_seq")
        return self._read_unresolved_union(entries, with_seq)

    def _read_unresolved_union(
        self, entries: list[dict], with_seq: bool
    ) -> DataFrame:
        # Unpartitioned fast path: ONE multi-path FileScan over every
        # live root instead of a per-entry scan union — a long-lived
        # MOR stream accumulates hundreds of delta entries between
        # compactions, and an O(entries) plan is driver-side bloat and
        # O(entries) scan setup per micro-batch.  The per-entry commit
        # seq is recovered from the file path via a small root→seq map
        # expression (JVM-side, no shuffle).  Partitioned tables keep
        # the per-entry union: hive partition columns need one
        # ``basePath`` per root, which a single scan cannot express.
        # (Entries written under a SUPERSEDED partitioned spec keep
        # hive subdirs even when the current spec is unpartitioned —
        # they need the per-entry basePath union too.)
        if not self.meta.partition_cols and not any(
            e.get("parts") for e in entries
        ):
            roots = [os.path.join(self.path, e["root"]) for e in entries]
            # the schema-explicit read already enforces the contract's
            # types, order, and null-fill of evolved-away columns — an
            # align_to_schema here would be 20+ no-op casts that cost a
            # measurable per-read Project (0.3 s at sf0.1)
            out = self.spark.read.schema(self.meta.schema).parquet(*roots)
            if with_seq:
                kv = []
                for e in entries:
                    kv += [
                        F.lit(e["root"].rstrip("/").split("/")[-1]),
                        F.lit(int(e.get("seq", 0))).cast("long"),
                    ]
                # try_element_at, NOT element_at: under Spark 4's
                # default ANSI mode a missing map key raises
                # MAP_KEY_DOES_NOT_EXIST, which would turn the
                # documented degrade-to-seq-0 fallback below into a
                # runtime error the first time a path misses the map
                seq_expr = F.try_element_at(
                    F.create_map(*kv),
                    F.regexp_extract(
                        F.input_file_name(), r"/([^/]+)/[^/]*$", 1
                    ),
                )
                # an unmappable path (shouldn't happen) degrades to the
                # base seq 0, never a null that breaks recency windows
                out = out.withColumn(
                    "_sg_seq", F.coalesce(seq_expr, F.lit(0).cast("long"))
                )
            return out
        dfs = [
            self._read_entry(e).withColumn("_sg_seq", F.lit(int(e.get("seq", 0))))
            if with_seq
            else self._read_entry(e)
            for e in entries
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    # ----------------------------------------------------------- write
    _STATS_TYPES = (T.LongType, T.IntegerType, T.ShortType, T.ByteType,
                    T.DoubleType, T.FloatType, T.StringType, T.DateType)

    def _collect_entry_stats(self, root: str) -> dict | None:
        """Per-entry (min, max) of the key columns — the Iceberg-style
        manifest stats that let point/range reads SKIP whole data
        roots without opening a file.

        Harvested DRIVER-SIDE from the parquet footers of the files
        just written (plus hive directory names for partition-column
        keys) — zero Spark jobs, zero data re-read.  The previous
        implementation re-scanned the freshly-written root with a
        Spark aggregate, which doubled I/O on every commit and showed
        up as a ~2× regression on the CDC-merge hot path.  Parquet
        min/max chunk statistics are exactly the bounds Iceberg
        manifests carry; a column missing stats in any file is dropped
        (stats are advisory, pruning stays exact without them).
        Numeric/string/date keys only.  The table property
        ``write.stats-columns`` (comma-separated names) extends the
        harvested set beyond the key columns — the Iceberg
        ``write.metadata.metrics.column.*`` idea — so secondary-index
        tables can fund pruning on a non-key scan column (e.g. the IVF
        assignments table's ``cell_id``)."""
        key_set = set(self.meta.key_cols)
        extra = self.meta.properties.get("write.stats-columns", "")
        key_set |= {c.strip() for c in extra.split(",") if c.strip()}
        cols = [
            f
            for f in self.meta.schema.fields
            if f.name in key_set and isinstance(f.dataType, self._STATS_TYPES)
        ]
        if self.meta.properties.get("write.collect-stats") == "false":
            return None
        # no stats-eligible columns (e.g. keyless table): the footer
        # pass still runs for "__rows" alone — it funds the
        # metadata-only count_rows() and the emptiness proofs
        part_set = set(self.meta.partition_cols)
        file_cols = {f.name for f in cols if f.name not in part_set}
        stats: dict[str, list] = {}
        dropped: set[str] = set()
        n_rows = 0

        def _update(name, mn, mx):
            if hasattr(mn, "isoformat"):
                mn, mx = mn.isoformat(), mx.isoformat()
            cur = stats.get(name)
            if cur is None:
                stats[name] = [mn, mx]
            else:
                cur[0], cur[1] = min(cur[0], mn), max(cur[1], mx)

        try:
            import pyarrow as pa
            import pyarrow.parquet as pq
        except ImportError:
            self._warn_stats_skipped("pyarrow is not importable")
            return None
        try:
            for path in glob.glob(
                os.path.join(root, "**", "*.parquet"), recursive=True
            ):
                md = pq.ParquetFile(path).metadata
                n_rows += md.num_rows
                if not file_cols:
                    continue
                for rg in range(md.num_row_groups):
                    grp = md.row_group(rg)
                    for ci in range(grp.num_columns):
                        chunk = grp.column(ci)
                        name = chunk.path_in_schema
                        if name not in file_cols or name in dropped:
                            continue
                        st = chunk.statistics
                        if st is None or not st.has_min_max:
                            dropped.add(name)
                            stats.pop(name, None)
                            continue
                        _update(name, st.min, st.max)
            # partition-column keys: bounds come from the hive dir
            # names (typed via the table contract, like Spark's
            # partition-column resolution under an explicit schema)
            for f in cols:
                if f.name not in part_set:
                    continue
                vals = set()
                for p in glob.glob(
                    os.path.join(root, "**", f"{f.name}=*"), recursive=True
                ):
                    raw = urllib.parse.unquote(os.path.basename(p).split("=", 1)[1])
                    if raw == "__HIVE_DEFAULT_PARTITION__":
                        continue
                    if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
                        vals.add(float(raw))
                    elif isinstance(f.dataType, (T.StringType, T.DateType)):
                        vals.add(raw)
                    else:
                        vals.add(int(raw))
                if vals:
                    _update(f.name, min(vals), max(vals))
        except (OSError, ValueError, KeyError, pa.ArrowException) as exc:
            # stats are advisory (pruning stays exact without them),
            # but a silent drop would regress pruning with no signal —
            # and a blanket except here once masked real harvest bugs
            self._warn_stats_skipped(f"{type(exc).__name__}: {exc}")
            return None
        # "__rows" rides the stats dict (the name cannot collide with a
        # real column: readers access stats by column name only).  Two
        # consumers: the disjointness proofs (a ZERO-row entry — an
        # empty merge delta or an overwrite-to-empty — cannot contain
        # any key, so they skip it instead of failing on its absent
        # column stats) and the metadata-only ``count_rows``.
        stats["__rows"] = n_rows
        return stats or None

    _stats_warned = False

    def _warn_stats_skipped(self, reason: str) -> None:
        """One-time (per process) warning that manifest key stats are
        being dropped — pruning silently regressing to full scans is
        the failure mode this surfaces."""
        import warnings  # noqa: PLC0415

        if not ManagedTable._stats_warned:
            ManagedTable._stats_warned = True
            warnings.warn(
                "manifest key-stats collection skipped "
                f"({reason}); data-root pruning will degrade to full "
                "scans for commits written without stats",
                RuntimeWarning,
                stacklevel=3,
            )

    def _source_dtype(self, spec: str) -> T.DataType | None:
        _, _, source = parse_transform(spec)
        for f in self.meta.schema.fields:
            if f.name == source:
                return f.dataType
        return None

    def _with_partition_cols(self, df: DataFrame) -> DataFrame:
        """Add the hidden (transform-derived) partition columns — the
        writer-side half of hidden partitioning.  Identity partitions
        are already real columns; derived ones are computed here and
        exist only between this projection and the hive directory
        name."""
        for pcol, spec in self.meta.partition_transforms.items():
            if pcol not in df.columns:
                df = df.withColumn(
                    pcol, transform_expr(spec, self._source_dtype(spec))
                )
        return df

    def _write_data(
        self, df: DataFrame, root: str, apply_sort_property: bool = True
    ) -> dict:
        # File-count bounding (table property "write.max-delta-files"):
        # tables fed by trigger-bounded increments (streaming signature
        # indexes, incremental rollup folds) receive SMALL relations
        # still carrying their computation's full shuffle fan-out — an
        # uncoalesced write lands ~shuffle.partitions near-empty files
        # per commit, and a long-lived stream accumulates files linear
        # in commits × partitions.  The property coalesces every write
        # of this table to at most N tasks; pair with compact() for
        # long-term folding.  Leave unset on tables that take bulk
        # writes — there the parallel fan-out is the point.
        max_files = self.meta.properties.get("write.max-delta-files")
        if max_files:
            df = df.coalesce(max(1, int(max_files)))
        if self.meta.partition_cols:
            # hidden-partition columns are derived here, become hive
            # dirs below, and are dropped again on read — they never
            # exist in the logical schema
            df = self._with_partition_cols(df)
        # Declared write sort order (table property
        # "write.sort-columns", Iceberg's write.sort.order): sort rows
        # WITHIN each output task on the declared columns so per-file
        # parquet min/max are tight from the first commit — selective
        # reads skip files/row-groups without waiting for a
        # compact(cluster_by=...) maintenance pass.  No shuffle: this
        # is a per-task sort, not a range repartition (the cheap
        # always-on half of clustering; compaction still does the
        # global range layout).  Partition columns lead the sort so a
        # partitioned write groups each task's rows per hive dir.
        # (suppressed via apply_sort_property=False when the caller
        # already imposed a layout — compact(zorder_by/cluster_by)
        # would otherwise have its within-task clustering silently
        # re-sorted away)
        sort_cols = (
            self.meta.properties.get("write.sort-columns")
            if apply_sort_property
            else None
        )
        # gate on the PARSED list, not the raw property: a degenerate
        # value (e.g. " , ") is truthy but names zero columns, and an
        # argless sortWithinPartitions on an unpartitioned table would
        # fail every subsequent write
        cols = (
            [c.strip() for c in sort_cols.split(",") if c.strip()]
            if sort_cols
            else []
        )
        if cols:
            lead = [c for c in self.meta.partition_cols if c not in cols]
            df = df.sortWithinPartitions(*lead, *cols)
        writer = df.write.option("compression", self.meta.compression)
        # File-size targeting (table property "write.target-file-rows"):
        # caps rows per parquet file so snapshots land as evenly-sized
        # files — the knob that prevents the two 100 TB failure modes,
        # multi-GB single files (no read parallelism, executor OOM on
        # row-group decode) and millions of tiny files (listing +
        # footer overhead dominates).  Spark splits at the row count
        # without an extra shuffle.
        target_rows = self.meta.properties.get("write.target-file-rows")
        if target_rows:
            writer = writer.option("maxRecordsPerFile", int(target_rows))
        # Point-lookup skipping (table property "write.bloom-columns"):
        # per-column parquet bloom filters, written by the parquet
        # encoder itself so they scale with the file instead of the
        # manifest (a manifest-level bloom saturates on any bulk entry;
        # the file-level filter is sized per row group).  The scan side
        # needs no code: Spark's parquet reader consults blooms for
        # pushed =/IN predicates (parquet.filter.bloom.enabled defaults
        # true), so ``read_where_in``/``delete_keys``/``forget_keys``
        # skip row groups that min/max stats can't rule out — the
        # non-monotone-key (uuid-ish) case where range stats are
        # useless.  Costs write-side memory per distinct value, so it
        # is opt-in per table, aimed at the keyed index tables.
        bloom_cols = self.meta.properties.get("write.bloom-columns")
        if bloom_cols:
            ndv = self.meta.properties.get("write.bloom-ndv")
            for c in (x.strip() for x in bloom_cols.split(",")):
                if not c:
                    continue
                writer = writer.option(
                    f"parquet.bloom.filter.enabled#{c}", "true"
                )
                if ndv:
                    writer = writer.option(
                        f"parquet.bloom.filter.expected.ndv#{c}", int(ndv)
                    )
        if self.meta.partition_cols:
            writer = writer.partitionBy(*self.meta.partition_cols)
        try:
            writer.parquet(root, mode="errorifexists")
        except Exception as e:  # noqa: BLE001 — narrowed below
            # Uniform conflict contract: two racing writers both target
            # the version-keyed root data/v{N+1}; in most interleavings
            # the loser fails HERE (path already exists) rather than at
            # the manifest O_EXCL, so surface the same typed error the
            # retry protocol documents instead of a raw AnalysisException.
            if "already exists" in str(e) and os.path.exists(root):
                raise CommitConflictError(
                    f"data root {root} already exists: another writer is "
                    "committing the same version concurrently — re-load "
                    "the table and retry the operation"
                ) from e
            raise
        entry = {
            "root": os.path.relpath(root, self.path),
            "parts": self._list_parts(root) if self.meta.partition_cols else None,
        }
        if self.meta.spec_id:
            # record which partition spec this entry's layout follows
            # (absent = spec 0, the common never-evolved case)
            entry["spec"] = self.meta.spec_id
        stats = self._collect_entry_stats(root)
        if stats:
            entry["stats"] = stats
        return entry

    def _list_parts(self, root: str) -> list[str]:
        pattern = os.path.join(root, *["*=*"] * len(self.meta.partition_cols))
        return sorted(os.path.relpath(p, root) for p in glob.glob(pattern))

    def _write_data_probed(
        self, df: DataFrame, root: str, apply_sort_property: bool = True
    ) -> tuple[dict, bool]:
        """``_write_data`` + emptiness verdict in ONE plan execution.

        The hot write paths (MOR merge deltas, tombstones, appends)
        used to run the source plan twice per commit: once for the
        upfront ``isEmpty()`` probe, once for the write itself —
        ~0.2–0.4 s of duplicated work per commit at sf0.1, one of the
        two dominant per-commit constants in the job-driven entries.
        The driver-side footer harvest already counts the written rows
        (``__rows``), so the write IS the probe.  An empty write's
        root is removed before returning and the caller no-ops without
        committing — exactly the contract the probe enforced (no
        rowless snapshot, no tag on an empty batch).

        Emptiness source, cheapest-first: partitioned tables prove it
        structurally (zero rows ⇒ zero hive dirs ⇒ empty ``parts``);
        unpartitioned tables read the harvested ``__rows``; if stats
        were skipped (pyarrow missing / ``write.collect-stats=false``)
        a schema-pinned read of the just-written root decides — still
        one execution of the SOURCE plan either way."""
        entry = self._write_data(df, root, apply_sort_property)
        stats = entry.get("stats")
        if self.meta.partition_cols:
            empty = not entry.get("parts")
        elif stats is not None:
            empty = int(stats.get("__rows", 0)) == 0
        else:
            empty = (
                self.spark.read.schema(self.meta.schema)
                .parquet(root)
                .isEmpty()
            )
        if empty:
            import shutil  # noqa: PLC0415

            shutil.rmtree(root, ignore_errors=True)
        return entry, empty

    def append(self, df: DataFrame, tag: str | None = None) -> int:
        """Append sink (reference: spark-job/read.py:231-233).

        An empty batch is a no-op returning the current version: a
        partitioned write of zero rows would commit a rootless entry
        (no hive subdirs), and version churn for nothing.  ``tag``
        stamps the snapshot for ``has_commit_tag`` idempotency probes
        (replayed streaming batches).  Emptiness is decided BY the
        write (``_write_data_probed``), not an upfront ``isEmpty()``
        — one execution of the batch plan per commit instead of two."""
        src = align_to_schema(df, self.meta.schema)
        entry, empty = self._write_data_probed(src, self._new_root())
        if empty:
            return self._current_version()
        return self._commit_entry_with_retry(entry, tag=tag)

    def overwrite(self, df: DataFrame) -> int:
        """Full-table overwrite sink (reference: spark-job/read.py:234-236)."""
        base = self._current_version()
        entry = self._write_data(align_to_schema(df, self.meta.schema), self._new_root())
        return self._commit_snapshot([entry], base_version=base)

    # ----------------------------------------------------------- merge
    def merge(
        self,
        source: DataFrame,
        key_cols: Sequence[str] | None = None,
        order_column: str | None = None,
        policy: str | None = None,
        assume_nonempty: bool = False,
        tag: str | None = None,
    ) -> int:
        """Upsert ``source`` into the table (reference merge sink:
        spark-job/read.py:237-239 + spark-job/mergeSQL.sql).

        Dedup-by-recency is applied within the batch when an order
        column is available (reference: spark-job/mergeSQL.sql:14-21);
        then matched keys are replaced per the merge policy.  Only the
        hive partitions present in ``source`` are read and rewritten.
        ``tag`` stamps the committing snapshot for ``has_commit_tag``
        idempotency probes (same contract as ``append``); an empty
        batch no-ops WITHOUT committing the tag.
        """
        keys = list(key_cols or self.meta.key_cols)
        if not keys:
            raise ValueError("merge requires key columns")
        order_col = order_column or self.meta.order_column
        policy = policy or self.meta.merge_policy

        if order_col and order_col in source.columns:
            source = dedup_latest(source, keys, order_col)
        src = align_to_schema(source, self.meta.schema)
        merge_order = order_col if (policy == "latest_wins") else None
        if merge_order and merge_order not in self.meta.schema.fieldNames():
            raise ValueError(
                f"latest_wins merge needs order column {merge_order!r} in the table schema"
            )

        # Merge-on-read (reference table_type MOR, spark-job/read.py:
        # 208-216): the merge is an O(batch) delta append tagged with
        # the commit sequence; reads resolve, compact() folds deltas
        # into the base.  Copy-on-write pays at write time instead.
        # Empty CDC batch (header-only files, transform_query filtering
        # everything) → no-op; never commit a rowless snapshot or its
        # tag.  Emptiness is decided BY the delta write itself
        # (``_write_data_probed``) — the old upfront ``isEmpty()``
        # re-executed the whole batch plan per merge; ``assume_nonempty``
        # is kept for API compatibility (the verdict is now free).
        if self.meta.table_type.upper() == "MOR":
            entry, empty = self._write_data_probed(src, self._new_root())
            if empty:
                return self._current_version()
            entry["kind"] = "delta"
            return self._commit_entry_with_retry(entry, tag=tag, delta_seq=True)

        # COW: the probe stays upfront — it gates a full-table rewrite
        # (and its partition-prune collect), not just a delta append.
        if not assume_nonempty and src.isEmpty():
            return self._current_version()

        base = self._current_version()
        entries = self._manifest_at(base)

        parts_cols = self.meta.partition_cols
        # Mixed partition specs (after set_partition_spec): the batch's
        # dir strings render under the CURRENT spec and can never match
        # an old-layout entry's parts, so the pruned path would leave a
        # matched key's old row in place — a duplicate.  Degrade to the
        # full rewrite, which also MIGRATES the whole table to the
        # current spec; the next merge prunes again.
        mixed_specs = parts_cols and any(
            not self._entry_on_current_spec(e) for e in entries
        )
        if not parts_cols or mixed_specs:
            merged = merge_upsert(
                self._assemble(entries), src, keys, merge_order, policy
            )
            entry = self._write_data(merged, self._new_root())
            return self._commit_snapshot([entry], base_version=base, tag=tag)

        # Partition-pruned COW: collect only the distinct partition
        # VALUES of the batch.  The collect is capped (table property
        # "merge.max-affected-partitions") and fetched via limit(cap+1)
        # so an unexpectedly high-cardinality partition column can never
        # grow driver memory: past the cap, pruning buys nothing — the
        # batch touches most of the table anyway — so the merge degrades
        # to a full-table COW rewrite that never collects values.
        cap = int(
            self.meta.properties.get("merge.max-affected-partitions", 10_000)
        )
        # hidden partitions: derive the batch's transform values the
        # same way the writer will, so pruning matches the layout
        part_rows = (
            self._with_partition_cols(src)
            .select(*parts_cols)
            .distinct()
            .limit(cap + 1)
            .collect()
        )
        if len(part_rows) > cap:
            merged = merge_upsert(
                self._assemble(entries), src, keys, merge_order, policy
            )
            entry = self._write_data(merged, self._new_root())
            return self._commit_snapshot([entry], base_version=base, tag=tag)
        affected = {
            "/".join(f"{c}={_escape_part_value(r[c])}" for c in parts_cols)
            for r in part_rows
        }
        kept_entries: list[dict] = []
        affected_paths: list[tuple[str, str]] = []  # (root, part)
        for e in entries:
            parts = e.get("parts") or []
            hit = [p for p in parts if p in affected]
            kept = [p for p in parts if p not in affected]
            if kept:
                kept_entry = {"root": e["root"], "parts": kept}
                # carry manifest stats forward: entry-level (min, max)
                # stay valid bounds for any subset of the entry's
                # parts — but NOT __rows, which counts the whole entry
                # and would make the metadata-only count_rows()
                # overcount (it falls back to the exact scan instead)
                if e.get("stats"):
                    kept_entry["stats"] = _subset_stats(e["stats"])
                if e.get("spec"):
                    kept_entry["spec"] = e["spec"]
                kept_entries.append(kept_entry)
            for p in hit:
                affected_paths.append((os.path.join(self.path, e["root"]), p))

        if affected_paths:
            roots = {}
            for root, p in affected_paths:
                roots.setdefault(root, []).append(p)
            dfs = []
            for root, ps in roots.items():
                d = self.spark.read.option("basePath", root).parquet(
                    *[os.path.join(root, p) for p in ps]
                )
                dfs.append(align_to_schema(d, self.meta.schema))
            target_affected = dfs[0]
            for d in dfs[1:]:
                target_affected = target_affected.unionByName(d)
        else:
            target_affected = self.spark.createDataFrame([], self.meta.schema)

        merged = merge_upsert(target_affected, src, keys, merge_order, policy)
        new_entry = self._write_data(merged, self._new_root())
        return self._commit_snapshot(
            kept_entries + [new_entry], base_version=base, tag=tag
        )

    # ---------------------------------------------------------- delete
    def delete_where(self, condition) -> int:
        """``DELETE FROM t WHERE cond`` (SQL semantics: rows where the
        predicate is null are KEPT).  ``condition`` is a Column or a
        SQL string.

        MOR: O(matched keys) — the victims' keys land as a TOMBSTONE
        delta; reads drop rows whose winning version predates the
        tombstone, so a later re-insert of the key survives, and
        ``compact()`` folds tombstones away.  COW: the affected hive
        partitions (bounded collect, same cap as merge) are rewritten
        without the victims; unpartitioned or past the cap degrades to
        a full filtered rewrite.

        MOR revival caveat: revive deleted keys with ``merge()`` (which
        stamps the commit sequence), not plain ``append()`` — append
        entries carry seq 0 in MOR resolution and stay masked by any
        tombstone.  Deletes are not surfaced by ``read_changes`` (the
        feed reports upserts only, like a CDC stream without delete
        events).
        """
        cond = F.expr(condition) if isinstance(condition, str) else condition
        match = F.coalesce(cond, F.lit(False))

        if self.meta.table_type.upper() == "MOR":
            keys = self.meta.key_cols
            if not keys:
                raise ValueError("MOR delete requires key columns")
            victims = self.read().filter(match).select(*keys)
            # tombstone rows carry only the keys; attribute columns are
            # null BY CONSTRUCTION (nullability of the contract doesn't
            # apply — these rows mark absence, they never surface).
            # No-match no-op decided by the write itself
            # (``_write_data_probed``) — one execution of the filtered
            # scan instead of probe + write.
            key_set = set(keys)
            tomb = victims.select(
                *[
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    if f.name in key_set
                    else F.lit(None).cast(f.dataType).alias(f.name)
                    for f in self.meta.schema.fields
                ]
            )
            entry, empty = self._write_data_probed(tomb, self._new_root())
            if empty:
                return self._current_version()
            entry["kind"] = "tombstone"
            return self._commit_entry_with_retry(entry, delta_seq=True)

        parts_cols = self.meta.partition_cols
        base = self._current_version()
        entries = self._manifest_at(base)
        # mixed partition specs: old-layout parts can't match the
        # current spec's dir strings — victims in old entries would
        # silently survive the pruned path; full filtered rewrite
        # (which also migrates the layout) is the correct degrade
        if parts_cols and any(
            not self._entry_on_current_spec(e) for e in entries
        ):
            parts_cols = []
        if parts_cols:
            cap = int(
                self.meta.properties.get("merge.max-affected-partitions", 10_000)
            )
            part_rows = (
                self._with_partition_cols(self._assemble(entries).filter(match))
                .select(*parts_cols)
                .distinct().limit(cap + 1).collect()
            )
            if not part_rows:
                return self._current_version()
            if len(part_rows) <= cap:
                affected = {
                    "/".join(
                        f"{c}={_escape_part_value(r[c])}" for c in parts_cols
                    )
                    for r in part_rows
                }
                kept_entries: list[dict] = []
                affected_paths: list[tuple[str, str]] = []
                for e in entries:
                    parts = e.get("parts") or []
                    hit = [p for p in parts if p in affected]
                    kept = [p for p in parts if p not in affected]
                    if kept:
                        kept_entry = {"root": e["root"], "parts": kept}
                        if e.get("stats"):
                            # (min, max) stay valid for any parts
                            # subset; __rows would overcount (see merge)
                            kept_entry["stats"] = _subset_stats(e["stats"])
                        if e.get("spec"):
                            kept_entry["spec"] = e["spec"]
                        kept_entries.append(kept_entry)
                    for p in hit:
                        affected_paths.append(
                            (os.path.join(self.path, e["root"]), p)
                        )
                dfs = []
                roots: dict[str, list[str]] = {}
                for root, p in affected_paths:
                    roots.setdefault(root, []).append(p)
                for root, ps in roots.items():
                    d = self.spark.read.option("basePath", root).parquet(
                        *[os.path.join(root, p) for p in ps]
                    )
                    dfs.append(align_to_schema(d, self.meta.schema))
                if not dfs:
                    return self._current_version()
                target = dfs[0]
                for d in dfs[1:]:
                    target = target.unionByName(d)
                survivors = target.filter(~match)
                if survivors.isEmpty():
                    return self._commit_snapshot(kept_entries, base_version=base)
                new_entry = self._write_data(survivors, self._new_root())
                return self._commit_snapshot(
                    kept_entries + [new_entry], base_version=base
                )

        survivors = self._assemble(entries).filter(~match)
        entry = self._write_data(survivors, self._new_root())
        return self._commit_snapshot([entry], base_version=base)

    def delete_keys(self, keys_df: DataFrame, tag: str | None = None) -> int:
        """Delete by KEY SET — the CDC delete path (a DMS batch's
        ``Op='D'`` rows name keys, not predicates).  MOR: the keys land
        directly as a tombstone delta — O(batch), NO table read at all
        (the whole point: a delete-heavy CDC stream costs the same as
        an insert-heavy one).  COW: anti-join rewrite (pays the usual
        copy-on-write price).  ``tag`` stamps the committing snapshot
        for ``has_commit_tag`` idempotency probes; an empty key set
        no-ops WITHOUT committing the tag."""
        keys = self.meta.key_cols
        if not keys:
            raise ValueError("delete_keys requires key columns")
        types = {f.name: f.dataType for f in self.meta.schema.fields}
        victims = keys_df.select(
            *[F.col(k).cast(types[k]).alias(k) for k in keys]
        ).distinct()
        if self.meta.table_type.upper() == "MOR":
            # an empty key set no-ops without committing its tag — the
            # verdict comes from the tombstone write itself
            # (``_write_data_probed``), not an upfront ``isEmpty()``
            # that re-ran the victims' distinct shuffle per call
            key_set = set(keys)
            tomb = victims.select(
                *[
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    if f.name in key_set
                    else F.lit(None).cast(f.dataType).alias(f.name)
                    for f in self.meta.schema.fields
                ]
            )
            entry, empty = self._write_data_probed(tomb, self._new_root())
            if empty:
                return self._current_version()
            entry["kind"] = "tombstone"
            return self._commit_entry_with_retry(entry, tag=tag, delta_seq=True)
        # COW: the probe stays — it gates the anti-join rewrite below
        if victims.isEmpty():
            return self._current_version()
        base = self._current_version()
        # null-safe anti: a victim naming a null key must remove the
        # null-keyed row (plain equality would silently keep it)
        survivors = join_nullsafe(
            self._assemble(self._manifest_at(base)),
            victims,
            list(keys),
            "left_anti",
        )
        entry = self._write_data(survivors, self._new_root())
        return self._commit_snapshot([entry], base_version=base, tag=tag)

    # --------------------------------------------- write-audit-publish
    # Iceberg's WAP (write-audit-publish) pattern: a writer lands its
    # data files and a STAGED manifest that readers never see, an audit
    # job validates the staged state, and publish is one atomic commit
    # (or the stage is discarded with zero effect on the table).  Same
    # shape as `spark.wap.id` + `cherrypick_snapshot` on Iceberg,
    # expressed over this table's manifest layer.
    #
    # Supported stage modes are the VERSION-INDEPENDENT writes — append,
    # overwrite, and merge on MOR tables (an O(batch) delta whose seq is
    # stamped at publish) — so a publish never goes stale while the
    # audit runs: concurrent commits interleave freely and the publish
    # retries its CAS like any other entry commit.  COW merge is
    # refused loudly: its rewrite is computed AGAINST one base manifest,
    # and any commit landing during the audit window would silently
    # revert it — stage on a MOR table (compact() folds the delta) or
    # run an unstaged merge instead.

    def _staged_path(self, staged_id: str) -> str:
        return os.path.join(self.path, _STAGEDIR, f"{staged_id}.json")

    def _staged_doc(self, staged_id: str) -> dict:
        try:
            with open(self._staged_path(staged_id), encoding="utf-8") as fh:
                return json.load(fh)
        except FileNotFoundError:
            raise KeyError(
                f"no staged snapshot {staged_id!r} at {self.path} — "
                "already published, discarded, or never staged"
            ) from None

    def _staged_roots(self, exclude: str | None = None) -> set[str]:
        """Data roots referenced by live staged docs — protected from
        vacuum/expire GC until published or discarded."""
        roots: set[str] = set()
        for p in glob.glob(os.path.join(self.path, _STAGEDIR, "*.json")):
            if exclude and os.path.basename(p) == f"{exclude}.json":
                continue
            try:
                with open(p, encoding="utf-8") as fh:
                    for e in json.load(fh).get("entries", []):
                        if e.get("root"):
                            roots.add(e["root"])
            except (OSError, ValueError):
                continue
        return roots

    def stage(self, df: DataFrame, mode: str = "append") -> str:
        """Write ``df``'s data files and a staged (reader-invisible)
        manifest; returns the staged id for ``read_staged`` /
        ``publish_staged`` / ``discard_staged``.  The data write runs
        at full cluster parallelism here — publish is a driver-side
        manifest commit, so the audit window adds no data movement."""
        if mode not in ("append", "overwrite", "merge"):
            raise ValueError(f"unknown stage mode: {mode!r}")
        if mode == "merge":
            if self.meta.table_type.upper() != "MOR":
                raise ValueError(
                    "stage(mode='merge') requires a MOR table: a COW "
                    "merge rewrite is computed against one base manifest "
                    "and goes stale if anything commits during the audit "
                    "window — create the table with table_type='MOR' "
                    "(compact() folds the published delta) or merge "
                    "without staging"
                )
            if not self.meta.key_cols:
                raise ValueError("merge staging requires key columns")
            order_col = self.meta.order_column
            if order_col and order_col in df.columns:
                source = dedup_latest(df, self.meta.key_cols, order_col)
            else:
                source = df
            src = align_to_schema(source, self.meta.schema)
        else:
            src = align_to_schema(df, self.meta.schema)
        staged_id = uuid.uuid4().hex[:12]
        entries: list[dict] = []
        root = os.path.join(self.path, "data", f"stg-{staged_id}")
        entry, empty = self._write_data_probed(src, root)
        if not empty:
            if mode == "merge":
                entry["kind"] = "delta"
            entries.append(entry)
        os.makedirs(os.path.join(self.path, _STAGEDIR), exist_ok=True)
        doc = {
            "id": staged_id,
            "mode": mode,
            "base_version": self._current_version(),
            "entries": entries,
        }
        tmp = self._staged_path(staged_id) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(doc, fh, indent=2)
        os.replace(tmp, self._staged_path(staged_id))
        return staged_id

    def read_staged(self, staged_id: str, what: str = "table") -> DataFrame:
        """The audit view: ``what="table"`` (default) assembles the
        table state AS IF the stage were published now — audits see
        post-merge/post-overwrite reality, not just the increment;
        ``what="delta"`` reads only the staged rows (cheaper when the
        rules are batch-local)."""
        doc = self._staged_doc(staged_id)
        staged = [dict(e) for e in doc["entries"]]
        if what == "delta":
            return self._assemble(
                [dict(e, kind=None) for e in staged]
                if doc["mode"] == "merge"
                else staged
            )
        if what != "table":
            raise ValueError(f"unknown staged view: {what!r}")
        if doc["mode"] == "overwrite":
            return self._assemble(staged)
        base = self._current_version()
        entries = list(self._manifest_at(base))
        for e in staged:
            if e.get("kind") == "delta":
                e["seq"] = base + 1  # provisional: as-of-now resolution
        return self._assemble(entries + staged)

    def audit_staged(
        self,
        staged_id: str,
        rules: list[dict],
        refs: dict[str, DataFrame] | None = None,
        what: str = "table",
    ) -> DataFrame:
        """Run the declarative constraint gate over the staged view;
        returns the (rule_id, n_violations) report."""
        from .operators.quality_checks import check_constraints  # noqa: PLC0415

        return check_constraints(self.read_staged(staged_id, what), rules, refs)

    def publish_staged(
        self,
        staged_id: str,
        rules: list[dict] | None = None,
        refs: dict[str, DataFrame] | None = None,
        audit_what: str = "table",
    ) -> int:
        """Atomically publish a staged snapshot, optionally gated on an
        audit: with ``rules``, the constraint report must be violation-
        free or ``AuditFailedError`` raises and the stage stays put
        (inspect / fix / discard).  Publish is idempotent under crash
        replay: the commit is tagged ``wap-<id>``, so a re-publish that
        finds the tag only removes the leftover staged doc."""
        doc = self._staged_doc(staged_id)
        wap_tag = f"wap-{staged_id}"
        # Idempotency probe FIRST: a crash-replay re-publish must not
        # re-audit — the published staged root is already in the live
        # manifest, so auditing (current + staged) would see every
        # staged row twice and e.g. a unique rule would spuriously fail
        # a publish whose only remaining work is removing the doc.
        if not self.has_commit_tag(wap_tag):
            if rules:
                report = [
                    r.asDict()
                    for r in self.audit_staged(
                        staged_id, rules, refs, what=audit_what
                    ).collect()
                ]
                failed = [r for r in report if r["n_violations"] > 0]
                if failed:
                    raise AuditFailedError(
                        f"staged snapshot {staged_id} failed audit: "
                        + "; ".join(
                            f"{r['rule_id']}={r['n_violations']}" for r in failed
                        )
                        + " — stage kept for inspection (read_staged / "
                        "discard_staged)",
                        report,
                    )
            entries = doc["entries"]
            # empty-append stage: publishing nothing is a no-op (no
            # version churn), matching append()'s empty-batch contract
            if entries:
                # One retry loop for all three modes, two properties the
                # generic _commit_entry_with_retry lacks: (a) the wap tag
                # is RE-PROBED per attempt — a concurrent publisher of
                # the SAME staged id that wins the CAS must not be
                # followed by a second commit of the same root (an
                # append would permanently duplicate every row); (b) a
                # terminal conflict NEVER garbage-collects the staged
                # root (the generic helper's terminal cleanup would —
                # only staged docs reference it, and the stage must
                # survive for a later re-publish).
                retries = int(self.meta.properties.get("commit.retries", 3))
                for attempt in range(retries + 1):
                    if attempt > 0 and self.has_commit_tag(wap_tag):
                        break  # racing publisher of this stage won
                    base = self._current_version()
                    if doc["mode"] == "overwrite":
                        new_entries = [dict(e) for e in entries]
                    else:
                        [entry] = entries
                        e = dict(entry)
                        if e.get("kind") == "delta":
                            e["seq"] = base + 1
                        new_entries = self._manifest_at(base) + [e]
                    try:
                        self._commit_snapshot(
                            new_entries,
                            tag=wap_tag,
                            cleanup_on_conflict=False,
                            base_version=base,
                        )
                        break
                    except CommitConflictError:
                        if attempt >= retries:
                            raise
        try:
            os.remove(self._staged_path(staged_id))
        except FileNotFoundError:
            pass
        return self._current_version()

    def discard_staged(self, staged_id: str) -> None:
        """Drop a staged snapshot: remove its doc, then its data roots
        — unless a snapshot manifest or another staged doc references
        them (never the case for roots this stage wrote, which are
        id-unique, but checked anyway: GC here must be provably safe)."""
        import shutil  # noqa: PLC0415

        doc = self._staged_doc(staged_id)
        try:
            os.remove(self._staged_path(staged_id))
        except FileNotFoundError:
            pass
        referenced = self._committed_roots() | self._staged_roots(
            exclude=staged_id
        )
        for e in doc["entries"]:
            if e.get("root") and e["root"] not in referenced:
                shutil.rmtree(
                    os.path.join(self.path, e["root"]), ignore_errors=True
                )

    def list_staged(self) -> list[dict]:
        """Live staged snapshots — (id, mode, base_version, n_entries),
        oldest first by doc mtime.  The operational view behind 'what
        is awaiting audit' and age-based stage cleanup policies."""
        def _mtime(p: str) -> float:
            # a doc published/discarded between glob and sort is not
            # an error — this is the view OF concurrent activity
            try:
                return os.path.getmtime(p)
            except OSError:
                return 0.0

        out = []
        for p in sorted(
            glob.glob(os.path.join(self.path, _STAGEDIR, "*.json")),
            key=_mtime,
        ):
            try:
                with open(p, encoding="utf-8") as fh:
                    doc = json.load(fh)
            except (OSError, ValueError):
                continue
            out.append(
                {
                    "id": doc["id"],
                    "mode": doc["mode"],
                    "base_version": doc["base_version"],
                    "n_entries": len(doc.get("entries", [])),
                }
            )
        return out

    # ------------------------------------------------------------ misc
    def write(self, df: DataFrame, mode: str) -> int:
        """Mode dispatch (reference: spark-job/read.py:229-246) —
        fails loudly on unknown modes."""
        if mode == "append":
            return self.append(df)
        if mode == "overwrite":
            return self.overwrite(df)
        if mode == "merge":
            return self.merge(df)
        raise ValueError(f"unknown write mode: {mode!r}")

    def history(self) -> list[int]:
        snaps = glob.glob(os.path.join(self.path, _SNAPDIR, "v*.json"))
        return sorted(int(os.path.basename(s)[1:-5]) for s in snaps)

    def count_rows(self) -> int:
        """COUNT(*) from manifest statistics alone — zero Spark jobs,
        zero file opens — whenever the count is provable from metadata:
        no delta/tombstone entries pending (MOR resolution can collapse
        or drop rows) and every entry carries its ``__rows`` stat.
        Falls back to the exact scan otherwise.  The same
        metadata-count pushdown Iceberg serves planners; at 100 TB the
        difference is a dict sum vs a full-table scan."""
        entries = self._read_manifest()
        if all(e.get("kind") not in ("delta", "tombstone") for e in entries):
            per_entry = [
                (e.get("stats") or {}).get("__rows") for e in entries
            ]
            if all(n is not None for n in per_entry):
                return int(sum(per_entry))
        return self.read().count()

    def min_max(self, col: str) -> tuple:
        """MIN/MAX of a column from manifest statistics alone — zero
        Spark jobs, zero file opens — whenever the answer is provable
        from metadata (the Iceberg aggregate pushdown): no
        delta/tombstone entries pending (resolution can remove the
        extreme row), every non-empty live entry carries harvested
        stats for ``col`` (key columns and ``write.stats-columns``),
        and the stats are NUMERIC — parquet footer min/max for strings
        may be truncated bounds, exact enough for pruning but not as
        returned VALUES, and date stats are stored re-typed.  Nulls
        are ignored (SQL semantics; footers already exclude them).
        Falls back to the exact scan otherwise."""
        if col not in self.meta.schema.fieldNames():
            raise ValueError(f"unknown column: {col!r}")
        entries = self._read_manifest()
        if all(e.get("kind") not in ("delta", "tombstone") for e in entries):
            per: list[list] = []
            provable = True
            for e in entries:
                stats = e.get("stats") or {}
                if stats.get("__rows") == 0:
                    continue  # provably empty entry contributes nothing
                if stats.get("__rows") is None:
                    # PARTS-SUBSET entries (partition-pruned merge /
                    # delete_where) carry _subset_stats — the ORIGINAL
                    # entry's bounds with __rows dropped.  Valid for
                    # pruning, but the extreme row may have been
                    # rewritten away, so they are not provable VALUES.
                    provable = False
                    break
                s = stats.get(col)
                if not s or not all(
                    isinstance(v, (int, float)) and not isinstance(v, bool)
                    for v in s
                ):
                    provable = False
                    break
                per.append(s)
            if provable:
                if not per:
                    return (None, None)
                return (min(p[0] for p in per), max(p[1] for p in per))
        row = self.read().agg(F.min(col), F.max(col)).collect()[0]
        return (row[0], row[1])

    # ------------------------------------------------------- named refs
    def _ref_path(self, name: str) -> str:
        if not re.fullmatch(r"[A-Za-z0-9._-]{1,64}", name):
            raise ValueError(f"invalid ref name: {name!r}")
        return os.path.join(self.path, "_refs", f"{name}.json")

    def create_ref(
        self, name: str, version: int | None = None, replace: bool = False
    ) -> int:
        """Pin a snapshot under a durable name (Iceberg tag): time
        travel by meaning ('audited-2026-08', 'train-v3') instead of
        by number, and a retention shield — ``expire_snapshots`` never
        drops a ref'd version.  Creation is O_EXCL (two racers can't
        silently swap a ref); ``replace=True`` updates atomically via
        rename."""
        v = self._current_version() if version is None else int(version)
        if v not in self.history():
            raise ValueError(f"version {v} does not exist")
        p = self._ref_path(name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        doc = json.dumps({"version": v})
        if replace:
            tmp = f"{p}.tmp.{uuid.uuid4().hex}"
            with open(tmp, "w", encoding="utf-8") as fh:
                fh.write(doc)
            os.replace(tmp, p)
            return v
        try:
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise ValueError(
                f"ref {name!r} already exists (use replace=True)"
            ) from None
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            fh.write(doc)
        return v

    def drop_ref(self, name: str) -> None:
        try:
            os.remove(self._ref_path(name))
        except FileNotFoundError:
            raise ValueError(f"ref {name!r} does not exist") from None

    def refs(self) -> dict[str, int]:
        out = {}
        for p in glob.glob(os.path.join(self.path, "_refs", "*.json")):
            try:
                with open(p, encoding="utf-8") as fh:
                    out[os.path.basename(p)[:-5]] = int(
                        json.load(fh)["version"]
                    )
            except (OSError, ValueError, KeyError):
                continue
        return out

    def read_ref(self, name: str) -> DataFrame:
        ref = self.refs().get(name)
        if ref is None:
            raise ValueError(f"ref {name!r} does not exist")
        return self.read_version(ref)

    def rollback(self, to: int | str) -> int:
        """Iceberg's rollback-to-snapshot: make the table's current
        state a retained earlier snapshot's — committed as a NEW
        snapshot, so history stays append-only (the rolled-past
        versions remain time-travelable until expired), readers flip
        atomically, and a rollback of a rollback works.  ``to`` is a
        version number or a named ref ('audited-2026-08').

        Downstream change-feed consumers see the rollback window as a
        REWRITE (entries replaced → ``read_changes_cdf``'s full keyed
        diff), which is semantically right: a rollback is a bulk state
        change, not an increment — incremental rollups/join MVs absorb
        it exactly through their retraction/recompute paths.  The
        commit carries ``rollback-<version>``, so a crashed-and-
        redelivered rollback is detectable via ``has_commit_tag``.
        Refuses unknown or expired versions (their data roots may be
        GC'd — restore from a ref instead, refs shield retention)."""
        version = self.refs().get(to) if isinstance(to, str) else int(to)
        if version is None:
            raise ValueError(f"ref {to!r} does not exist")
        if version not in set(self.history()):
            raise ValueError(
                f"version {version} is not a retained snapshot "
                "(expired or never existed)"
            )
        cur = self._current_version()
        if version == cur:
            return cur
        return self._commit_snapshot(
            self._manifest_at(version),
            kind="data",
            tag=f"rollback-{version}",
            base_version=cur,
        )

    def snapshots(self) -> DataFrame:
        """Iceberg-style ``snapshots`` metadata relation: one row per
        retained snapshot — (version, kind, n_entries, n_deltas,
        n_tombstones, tag, committed_at ISO seconds).  The commit time
        is the wall-clock stamped into the manifest at commit (falls
        back to the manifest file's mtime only for manifests written
        before the stamp existed), so it survives a copy/restore of
        the table directory.  Driver-assembled like every manifest
        operation in this table layer; bounded by ``expire_snapshots``.
        The operational audit surface: what committed, when, what
        shape."""
        import datetime as _dt  # noqa: PLC0415

        rows = []
        for v in self.history():
            p = os.path.join(self.path, _SNAPDIR, f"v{v:08d}.json")
            with open(p, encoding="utf-8") as fh:
                doc = json.load(fh)
            entries = doc.get("entries", [])
            kinds = [e.get("kind") for e in entries]
            rows.append((
                v,
                doc.get("kind"),
                len(entries),
                kinds.count("delta"),
                kinds.count("tombstone"),
                doc.get("tag"),
                _dt.datetime.fromtimestamp(
                    doc.get("committed_at", os.path.getmtime(p)),
                    tz=_dt.timezone.utc,
                ).isoformat(timespec="seconds"),
            ))
        return self.spark.createDataFrame(
            rows,
            "version int, kind string, n_entries int, n_deltas int, "
            "n_tombstones int, tag string, committed_at string",
        )

    def _commit_time_stamped(self, version: int) -> tuple[float, bool]:
        """(wall-clock the snapshot committed at, whether it came from
        the manifest's stamp).  Pre-stamp manifests fall back to file
        mtime — a clock a copy/restore rewrites and that is therefore
        NOT trustworthy for monotonicity reasoning; callers that rely
        on monotone commit times must check the flag.  Cached per
        table handle — manifests are immutable once published, so a
        timestamp-travel resolution pays one JSON parse per version
        per handle, not per call."""
        cache = getattr(self, "_commit_time_cache", None)
        if cache is None:
            cache = self._commit_time_cache = {}
        got = cache.get(version)
        if got is not None:
            return got
        p = os.path.join(self.path, _SNAPDIR, f"v{version:08d}.json")
        with open(p, encoding="utf-8") as fh:
            stamp = json.load(fh).get("committed_at")
        got = (
            (float(stamp), True)
            if stamp is not None
            else (os.path.getmtime(p), False)
        )
        cache[version] = got
        return got

    def _commit_time(self, version: int) -> float:
        return self._commit_time_stamped(version)[0]

    def version_as_of(self, ts) -> int:
        """Newest retained snapshot committed at or before ``ts`` —
        Iceberg's ``TIMESTAMP AS OF`` resolution.  ``ts`` is a
        ``datetime`` (naive = local time, like ``FOR TIMESTAMP AS
        OF`` literals), an epoch-seconds number, or an ISO-8601
        string.  Commit times are the wall-clock stamped into each
        manifest at commit (the same clock ``snapshots()`` reports;
        mtime fallback only for pre-stamp manifests) — stable under a
        copy/rsync/restore of the table directory, which rewrites
        every file mtime.  Raises when every retained snapshot is
        newer — the asked-for state is expired or predates the table,
        and silently returning the oldest retained version would
        misrepresent history."""
        import datetime as _dt  # noqa: PLC0415

        if isinstance(ts, str):
            ts = _dt.datetime.fromisoformat(ts)
        if isinstance(ts, _dt.datetime):
            ts = ts.timestamp()
        ts = float(ts)
        # cap at the PUBLISHED pointer: history() globs every
        # v*.json, including a crashed writer's orphan manifest above
        # CURRENT (the documented commit crash window) — a
        # data-serving API must never resolve to an aborted snapshot
        # (read() at the same instant serves CURRENT)
        cur = self._current_version()
        best = None
        for v in self.history():
            if v > cur:
                continue
            try:
                committed, stamped = self._commit_time_stamped(v)
            except OSError:
                continue
            if committed <= ts:
                best = v  # history() is ascending: keep the newest
            elif stamped:
                # commit STAMPS are monotone over the ascending version
                # walk (clamped at commit time) — nothing further can
                # qualify, so stop instead of parsing the rest of the
                # retained history.  An mtime-fallback value must NOT
                # stop the scan: a restore rewrites mtimes to restore
                # time, which can sit ABOVE a later stamped version's
                # genuine commit time.
                break
        if best is None:
            raise ValueError(
                f"no retained snapshot at or before the requested "
                f"timestamp at {self.path} — the state is expired or "
                "predates the table (pin a ref to shield retention)"
            )
        return best

    def read_as_of(self, ts) -> DataFrame:
        """``SELECT ... FOR TIMESTAMP AS OF ts`` — time travel by
        wall-clock instead of version number."""
        try:
            return self.read_version(self.version_as_of(ts))
        except FileNotFoundError:
            # TOCTOU against a concurrent expire_snapshots: the
            # resolved manifest vanished between the mtime scan and
            # the read — surface the documented error, not a raw
            # missing-file crash
            raise ValueError(
                "snapshot expired while resolving the requested "
                f"timestamp at {self.path} — retry, or pin a ref to "
                "shield retention"
            ) from None

    def files(self) -> DataFrame:
        """Iceberg-style ``files`` metadata relation for the CURRENT
        snapshot: one row per live data file — (entry_root, entry_kind,
        file, size_bytes, key_min, key_max from the entry's manifest
        stats).  Driver-assembled (an os.walk over the live roots, no
        Spark job), O(live files) like the manifest layer itself — the
        file-layout audit behind compaction decisions."""
        key = self.meta.key_cols[0] if self.meta.key_cols else None
        rows = []
        for e in self._read_manifest():
            root = os.path.join(self.path, e["root"])
            stats = (e.get("stats") or {}).get(key) if key else None
            for dirpath, _dirs, names in os.walk(root):
                for n in sorted(names):
                    if not n.endswith(".parquet"):
                        continue
                    p = os.path.join(dirpath, n)
                    rows.append((
                        e["root"],
                        e.get("kind") or "base",
                        os.path.relpath(p, self.path),
                        os.path.getsize(p),
                        str(stats[0]) if stats else None,
                        str(stats[1]) if stats else None,
                        int(e.get("spec", 0)),
                    ))
        return self.spark.createDataFrame(
            rows,
            "entry_root string, entry_kind string, file string, "
            "size_bytes long, key_min string, key_max string, "
            "spec_id int",
        )

    def _manifest_at(self, version: int) -> list[dict]:
        with open(
            os.path.join(self.path, _SNAPDIR, f"v{version:08d}.json"), encoding="utf-8"
        ) as fh:
            return json.load(fh)["entries"]

    def read_version(self, version: int) -> DataFrame:
        """Time travel to an earlier snapshot."""
        return self._assemble(self._manifest_at(version))

    def read_changes(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Incremental consumption: the rows added or updated after
        ``from_version`` up to ``to_version`` (default: current) — what
        a downstream pipeline tails instead of re-reading the table.

        Fast path (file-level, cost O(new files)): when every entry of
        the older manifest survives verbatim in the newer one — appends
        and MOR delta merges — the change set is exactly the data in
        the NEW entries, resolved among themselves by the usual MOR
        rules (a key upserted twice in the window emits its latest
        state once).  No diff computation touches the base.

        Fallback (row-level): copy-on-write merges and overwrites
        rewrite entries, so the delta is computed as
        ``to EXCEPT ALL from`` — updated rows differ, inserts appear,
        and unchanged rows in rewritten partitions cancel out.  This
        pays a full-diff shuffle; tables that need cheap change feeds
        should be MOR (the same trade every lakehouse format makes).
        """
        to_version = (
            self._current_version() if to_version is None else to_version
        )
        if from_version > to_version:
            raise ValueError(
                f"from_version {from_version} is newer than {to_version}"
            )
        if from_version == to_version:
            return self.spark.createDataFrame([], self.meta.schema)
        old = self._manifest_at(from_version)
        new = self._manifest_at(to_version)
        if all(e in new for e in old):
            added = [e for e in new if e not in old]
            return self._assemble(added)
        return self._assemble(new).exceptAll(self._assemble(old))

    def read_changes_cdf(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Net-effect change feed WITH row images (Delta-CDF shape):
        each row carries ``_change_type`` in {insert, update_preimage,
        update_postimage, delete} describing how the table's live state
        moved across the window — the feed an incrementally-maintained
        aggregate consumes (pre-images are the retractions additive
        maintenance needs to handle updates and deletes).

        Semantics are WINDOW NET-EFFECT keyed by the table's key
        columns: a key upserted three times in the window emits one
        pre + one post image; a key deleted then re-inserted emits an
        update; an upsert landing a byte-identical row emits nothing.
        (Delta's CDF is per-commit; the windowed net effect is what
        downstream maintenance consumes and is strictly cheaper — no
        per-commit replay.)  Keyed classification assumes the keyed
        contract — one live row per key; append-only windows bypass it
        (plain appends never replace rows, so they are pure inserts
        even when keys repeat).

        Cost on the MOR fast path (old manifest intact; window adds
        only append/delta/tombstone entries): O(window data + matching
        base rows).  Affected keys come from the new entries alone; the
        base is read restricted to those keys — a semi-join pushed
        BELOW the resolution window — over only the entries whose
        first-key-column stats intersect the affected key range
        (manifest min/max skip, the same pruning ``read_where`` rides).
        Rewriting windows (COW merge, overwrite; a compaction's
        content-neutral rewrite cancels out) fall back to a full keyed
        diff — the trade ``read_changes`` already documents; keyless
        tables diff as multisets (``exceptAll`` both ways).
        """
        to_version = (
            self._current_version() if to_version is None else to_version
        )
        if from_version > to_version:
            raise ValueError(
                f"from_version {from_version} is newer than {to_version}"
            )
        schema = self.meta.schema
        cols = schema.fieldNames()
        out_schema = T.StructType(
            list(schema.fields)
            + [T.StructField("_change_type", T.StringType(), False)]
        )
        empty = self.spark.createDataFrame([], out_schema)
        if from_version == to_version:
            return empty
        old = self._manifest_at(from_version)
        new = self._manifest_at(to_version)
        keys = list(self.meta.key_cols)

        def _classify(pre: DataFrame, post: DataFrame) -> DataFrame:
            nonkey = [c for c in cols if c not in keys]

            def _pack(df: DataFrame, name: str) -> DataFrame:
                img = (
                    F.struct(*[F.col(c) for c in nonkey])
                    if nonkey
                    # all-key schema: the key IS the row; any non-null
                    # marker makes presence detectable after the join
                    else F.lit(True)
                )
                return df.select(*keys, img.alias(name))

            # null-safe pairing + coalesced key output: a null-keyed
            # pre/post pair must classify as an UPDATE (or nothing when
            # byte-identical), not a spurious delete+insert — plain
            # equality never pairs NULL with NULL
            j = join_nullsafe(
                _pack(pre, "_pre"), _pack(post, "_post"), keys, "full_outer"
            ).select(
                *[
                    F.coalesce(F.col(f"_l.{k}"), F.col(f"_r.{k}")).alias(k)
                    for k in keys
                ],
                F.col("_l._pre").alias("_pre"),
                F.col("_r._post").alias("_post"),
            )

            def _emit(side: str, ctype: str, frame: DataFrame) -> DataFrame:
                sel = [
                    F.col(c)
                    if c in keys
                    else F.col(side).getField(c).alias(c)
                    for c in cols
                ]
                return frame.select(
                    *sel, F.lit(ctype).alias("_change_type")
                )

            ins = _emit(
                "_post",
                "insert",
                j.filter(F.col("_pre").isNull() & F.col("_post").isNotNull()),
            )
            dels = _emit(
                "_pre",
                "delete",
                j.filter(F.col("_post").isNull() & F.col("_pre").isNotNull()),
            )
            changed = j.filter(
                F.col("_pre").isNotNull()
                & F.col("_post").isNotNull()
                & ~F.col("_pre").eqNullSafe(F.col("_post"))
            )
            return (
                ins.unionByName(_emit("_pre", "update_preimage", changed))
                .unionByName(_emit("_post", "update_postimage", changed))
                .unionByName(dels)
            )

        if all(e in new for e in old):
            added = [e for e in new if e not in old]
            if not added:
                return empty
            if not any(
                e.get("kind") in ("delta", "tombstone") for e in added
            ):
                return self._assemble(added).withColumn(
                    "_change_type", F.lit("insert")
                )
            if not keys:  # deltas/tombstones only exist on keyed tables
                raise RuntimeError(
                    "manifest window contains delta/tombstone entries on a "
                    "keyless table — corrupt metadata"
                )
            kdfs = [self._read_entry(e).select(*keys) for e in added]
            affected = kdfs[0]
            for d in kdfs[1:]:
                affected = affected.unionByName(d)
            # window-bounded frame reused by two semi-joins and a
            # bounds agg: pin it once (and give AQE a known size, so
            # small windows broadcast)
            affected = affected.distinct().localCheckpoint(eager=True)
            k0 = keys[0]
            row = affected.agg(
                F.min(k0),
                F.max(k0),
                # stats bounds exclude nulls on BOTH sides: F.min/F.max
                # ignore a null affected key, and an entry's footer
                # min/max can't prove null ABSENCE — so a null-keyed
                # change disables entry pruning entirely (the null row's
                # pre-image must be readable or its delete/update would
                # silently misclassify)
                F.max(F.col(k0).isNull().cast("int")),
            ).collect()[0]
            lo, hi, has_null = row[0], row[1], bool(row[2])
            pruned_old = [
                e
                for e in old
                if has_null or self._entry_may_contain(e, k0, lo, hi)
            ]
            pruned_new = [
                e
                for e in new
                if has_null or self._entry_may_contain(e, k0, lo, hi)
            ]
            pre = self._assemble(pruned_old, restrict_keys=affected)
            post = self._assemble(pruned_new, restrict_keys=affected)
            return _classify(pre, post)

        pre = self._assemble(old)
        post = self._assemble(new)
        if keys:
            return _classify(pre, post)
        return post.exceptAll(pre).withColumn(
            "_change_type", F.lit("insert")
        ).unionByName(
            pre.exceptAll(post).withColumn("_change_type", F.lit("delete"))
        )

    # ------------------------------------------------ schema evolution
    def _persist_meta(self) -> None:
        """CAS-protected rewrite of the table contract (``_meta.json``).

        The doc carries a ``meta_seq``; each persist creates an O_EXCL
        witness at ``_metalog/m<seq+1>.json`` BEFORE replacing the
        canonical file — of two writers whose in-memory meta derives
        from the same seq, exactly one creates the witness and the
        loser raises ``MetaCommitConflictError`` instead of silently
        clobbering the winner's update.  The witness IS the commit
        point: ``load`` prefers a witness newer than ``_meta.json``,
        so a crash between the two writes loses nothing.  Old
        witnesses are pruned (last 4 kept)."""
        new_seq = int(self.meta.meta_seq) + 1
        logdir = os.path.join(self.path, _METALOG)
        os.makedirs(logdir, exist_ok=True)
        witness = os.path.join(logdir, f"m{new_seq:08d}.json")
        self.meta.meta_seq = new_seq
        doc = json.dumps(self.meta.__dict__, indent=2)
        try:
            with open(witness, "x", encoding="utf-8") as fh:
                fh.write(doc)
        except FileExistsError:
            self.meta.meta_seq = new_seq - 1
            raise MetaCommitConflictError(
                f"metadata seq {new_seq} already committed at "
                f"{witness}: another writer updated the table "
                "metadata concurrently — re-load the table, re-derive "
                "the change, and retry"
            ) from None
        tmp = os.path.join(self.path, f"{_META}.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(doc)
        os.replace(tmp, os.path.join(self.path, _META))
        for old in sorted(glob.glob(os.path.join(logdir, "m*.json")))[:-4]:
            try:
                os.remove(old)
            except OSError:
                pass

    def add_columns(self, new_fields: Sequence[T.StructField]) -> None:
        """Additive schema evolution: append nullable columns to the
        contract.  Existing data files are never rewritten — reads
        align every file onto the current schema and fill missing
        columns with nulls (``align_to_schema``), which is exactly how
        Iceberg serves add-column evolution from old manifests."""
        schema = self.meta.schema
        names = set(schema.fieldNames())
        # collision surface spans every spec with live entries: a new
        # logical column matching an OLD hive dir name would be
        # populated from directory values on old entries (Spark
        # partition discovery) instead of null-filling
        part_names = set()
        for s in self._live_specs():
            part_names.update(s.get("partition_cols") or [])
        for f in new_fields:
            if f.name in names:
                raise ValueError(f"column {f.name!r} already exists")
            if f.name in self.meta.dropped_columns:
                # reads are name-based: a new column under a dropped
                # name would resurrect the old files' values instead
                # of null-filling (Iceberg's field-id problem; we
                # refuse the re-add instead)
                raise ValueError(
                    f"column {f.name!r} was previously dropped — "
                    "re-adding the name would resurrect old file "
                    "values; pick a new name"
                )
            if f.name in part_names:
                # hidden-partition columns are storage-only names; a
                # logical column reusing one would collide in the hive
                # dirs (same refusal as ManagedTable.create)
                raise ValueError(
                    f"column {f.name!r} collides with a partition column "
                    "(current or still-live superseded spec)"
                )
            if not f.nullable:
                raise ValueError(
                    f"new column {f.name!r} must be nullable (old files have no values)"
                )
        new_schema = T.StructType(list(schema.fields) + list(new_fields))
        self.meta.schema_json = json.dumps(new_schema.jsonValue())
        self._persist_meta()

    def widen_column(self, name: str, new_type: T.DataType) -> None:
        """Lossless type widening (int→bigint, float→double, …): the
        contract's type changes, NO data file is rewritten — old files
        keep their narrow physical type and Spark's parquet readers
        promote them at scan time (the schema-explicit ``_read_entry``
        read).  Manifest min/max stats stay valid: they are plain
        values and every comparison happens post-promotion.

        Refused for ``bucket(...)`` transform sources: the bucket dir
        is the JVM hash of the TYPED value and ``hash(1) ≠
        hash(1L)``, so widening would silently split a key's rows
        across buckets and break partition pruning."""
        schema = self.meta.schema
        field_map = {f.name: f for f in schema.fields}
        if name not in field_map:
            raise ValueError(f"column {name!r} does not exist")
        old = field_map[name].dataType
        if old == new_type:
            return
        if not can_widen(old, new_type):
            raise ValueError(
                f"cannot widen {name!r}: {old.simpleString()} → "
                f"{new_type.simpleString()} is not a lossless widening"
            )
        self._check_not_live_bucket_source(name)
        self._set_column_type(name, new_type)

    def _check_not_live_bucket_source(self, name: str) -> None:
        """Refuse a type change on a bucket-transform source: the
        partition value is the JVM hash of the TYPED value, and old
        bucket entries keep pruning by the hash of the NARROW type
        until a compaction migrates them — changing the type
        underneath would make point reads silently miss rows.  Scans
        the CURRENT spec plus still-live superseded ones."""
        for s in self._live_specs():
            for spec in (s.get("partition_transforms") or {}).values():
                kind, _, src = parse_transform(spec)
                if src == name and kind == "bucket":
                    raise ValueError(
                        f"cannot widen {name!r}: it feeds the bucket "
                        f"transform {spec!r} (current or still-live "
                        "superseded spec), whose partition value is "
                        "the hash of the typed value — widening would "
                        "break bucket pruning for existing files; "
                        "compact() first to migrate the layout"
                    )

    def _set_column_type(self, name: str, new_type: T.DataType) -> None:
        schema = self.meta.schema
        new_schema = T.StructType(
            [
                T.StructField(name, new_type, f.nullable, f.metadata)
                if f.name == name
                else f
                for f in schema.fields
            ]
        )
        self.meta.schema_json = json.dumps(new_schema.jsonValue())
        self._persist_meta()

    def drop_column(self, name: str) -> None:
        """Drop a column from the contract — metadata-only, like every
        evolution here: no file is rewritten, the schema-explicit read
        simply stops projecting the column (old files' values become
        unreachable, including via time travel — the Delta behavior,
        where history is served under the CURRENT schema).

        Refused for load-bearing columns: merge keys, the order
        column, and any partition-transform source of a spec that
        still has live entries.  The name is remembered and can never
        be re-added (``add_columns`` refuses it): reads are name-based,
        so a re-add would silently resurrect the old files' values."""
        schema = self.meta.schema
        if name not in schema.fieldNames():
            raise ValueError(f"column {name!r} does not exist")
        if len(schema.fields) == 1:
            raise ValueError("cannot drop the table's only column")
        if name in self.meta.key_cols:
            raise ValueError(f"cannot drop key column {name!r}")
        if name == self.meta.order_column:
            raise ValueError(f"cannot drop order column {name!r}")
        for s in self._live_specs():
            if name in (s.get("partition_cols") or []):
                raise ValueError(
                    f"cannot drop identity partition column {name!r}"
                )
            for spec in (s.get("partition_transforms") or {}).values():
                if parse_transform(spec)[2] == name:
                    raise ValueError(
                        f"cannot drop {name!r}: it feeds the partition "
                        f"transform {spec!r} (current or still-live "
                        "superseded spec)"
                    )
        # table properties naming the column would break every
        # subsequent write (sort) or silently lose their effect
        # (bloom/stats) — make the operator retarget them first
        for prop in (
            "write.sort-columns", "write.bloom-columns",
            "write.stats-columns",
        ):
            cols = self.meta.properties.get(prop, "")
            if name in [c.strip() for c in cols.split(",") if c.strip()]:
                raise ValueError(
                    f"cannot drop {name!r}: it is referenced by table "
                    f"property {prop}={cols!r} — update the property "
                    "first (set_properties)"
                )
        new_schema = T.StructType(
            [f for f in schema.fields if f.name != name]
        )
        self.meta.schema_json = json.dumps(new_schema.jsonValue())
        self.meta.dropped_columns.append(name)
        self._persist_meta()

    def evolve_schema(self, incoming: T.StructType) -> list[str]:
        """Reconcile the contract with an incoming batch schema — the
        ingest-time evolution step (``output_config.schema_evolution``):

        - batch column absent from the table  → ``add_columns`` (nullable)
        - batch type reconcilable via ``merge_types`` — lossless scalar
          widening, decimal precision growth, additive struct fields
          (recursively, arrays included) → the column's type evolves to
          the reconciled (wider/union) type
        - batch type equal or strictly narrower → no-op (the write-path
          ``align_to_schema`` upcasts / struct-rebuilds the batch)
        - anything else (string vs int, double→float, scale changes) →
          loud ``ValueError`` — a silent lossy cast would corrupt data

        Idempotent: replaying the same batch finds nothing to change.
        Returns the applied actions (for logging)."""
        actions: list[str] = []
        current = {f.name: f for f in self.meta.schema.fields}
        adds: list[T.StructField] = []
        for f in incoming.fields:
            have = current.get(f.name)
            if have is None:
                if f.name in self.meta.dropped_columns:
                    # dropping was an explicit operator decision: later
                    # batches (or REPLAYED pre-drop batches — the
                    # idempotency contract) still carrying the column
                    # just have it dropped by the align step, same as
                    # any extra column; re-adding stays refused via the
                    # explicit add_columns API only
                    continue
                adds.append(T.StructField(f.name, f.dataType, True))
                continue
            try:
                merged = merge_types(have.dataType, f.dataType)
            except ValueError as e:
                raise ValueError(
                    f"schema evolution cannot reconcile column "
                    f"{f.name!r}: {e}"
                ) from None
            if merged == have.dataType:
                continue  # equal or narrower batch: write-path aligns
            self._check_not_live_bucket_source(f.name)
            self._set_column_type(f.name, merged)
            actions.append(
                f"evolve {f.name}: {have.dataType.simpleString()} -> "
                f"{merged.simpleString()}"
            )
        if adds:
            self.add_columns(adds)
            actions.extend(
                f"add {f.name} {f.dataType.simpleString()}" for f in adds
            )
        return actions

    def set_partition_spec(
        self,
        partition_cols: Sequence[str] = (),
        partition_transforms: dict[str, str] | None = None,
    ) -> int:
        """Partition-spec EVOLUTION (Iceberg's signature metadata op):
        future writes land under the new layout, existing files stay
        in theirs — NOTHING is rewritten.  Every manifest entry records
        the spec it was written under, so reads prune each entry by its
        own transforms (``_prune_entry_parts``), and the partition-
        pruned COW fast paths (merge / delete_where) detect mixed specs
        and degrade to the full rewrite — which itself MIGRATES every
        row to the current spec, as does ``compact()``.

        The canonical 100 TB scenario: a table partitioned ``day(ts)``
        grows past the point where days are too small (or too big) —
        evolve to ``month(ts)`` (or ``hour(ts)``) and new data lands
        right; old data keeps serving, correctly pruned, until a
        maintenance compaction folds it into the new layout.  Returns
        the new spec id."""
        transforms = _validate_partition_spec(
            self.meta.schema, partition_cols, partition_transforms
        )
        self.meta.partition_specs[str(self.meta.spec_id)] = {
            "partition_cols": list(self.meta.partition_cols),
            "partition_transforms": dict(self.meta.partition_transforms),
        }
        self.meta.spec_id += 1
        self.meta.partition_cols = list(partition_cols)
        self.meta.partition_transforms = transforms
        self._persist_meta()
        return self.meta.spec_id

    def _live_specs(self) -> list[dict]:
        """The CURRENT partition spec plus every superseded spec that
        still owns LIVE manifest entries — the layouts a read can
        actually encounter.  Schema-evolution checks must consider all
        of them: an old spec's hidden dir names and bucket hashes stay
        load-bearing until compaction migrates its entries away."""
        out = [{
            "partition_cols": list(self.meta.partition_cols),
            "partition_transforms": dict(self.meta.partition_transforms),
        }]
        if self.meta.partition_specs:
            live_ids = {
                int(e.get("spec", 0)) for e in self._read_manifest()
            }
            live_ids.discard(self.meta.spec_id)
            for sid in sorted(live_ids):
                hist = self.meta.partition_specs.get(str(sid))
                if hist:
                    out.append(hist)
        return out

    def _entry_spec(self, entry: dict) -> tuple[list[str], dict[str, str]]:
        """The (partition_cols, partition_transforms) the entry was
        WRITTEN under — current spec for current entries, the recorded
        history for superseded ones."""
        sid = int(entry.get("spec", 0))
        if sid != self.meta.spec_id:
            hist = self.meta.partition_specs.get(str(sid))
            if hist is not None:
                return (
                    list(hist.get("partition_cols") or []),
                    dict(hist.get("partition_transforms") or {}),
                )
        return self.meta.partition_cols, self.meta.partition_transforms

    def _entry_on_current_spec(self, entry: dict) -> bool:
        return int(entry.get("spec", 0)) == self.meta.spec_id

    def set_properties(self, **kv: str) -> None:
        """Merge table properties into the persisted metadata — the
        small state slot incremental consumers use (e.g. a rollup's
        last-refreshed source version).

        A lost metadata CAS (``MetaCommitConflictError``) auto-retries
        here: the patch is key-local, so re-reading the fresh meta and
        re-applying it composes with whatever the concurrent writer
        changed (a schema evolution racing a cursor write keeps BOTH)."""
        patch = {k: str(v) for k, v in kv.items()}
        attempts = 4
        for attempt in range(attempts):
            self.meta.properties.update(patch)
            try:
                self._persist_meta()
                return
            except MetaCommitConflictError:
                if attempt >= attempts - 1:
                    raise
                self.meta = ManagedTable.load(self.spark, self.path).meta

    # ----------------------------------------------------- maintenance
    def compact(
        self,
        target_partitions: int | None = None,
        zorder_by: Sequence[str] | None = None,
        zorder_bits: int = 8,
        retries: int | None = None,
        cluster_by: Sequence[str] | None = None,
    ) -> int:
        """Rewrite the current snapshot into one fresh data root
        (bin-packing small files) — the small-files compaction every
        long-running ingest table needs.  Readers are unaffected: the
        rewrite lands as a new snapshot via the same atomic commit.

        ``zorder_by`` additionally clusters the rewrite on the Morton
        curve of those columns (operators/layout.py) — the maintenance
        form of ``OPTIMIZE ... ZORDER BY``: one range shuffle instead of
        the plain repartition, after which parquet min/max stats are
        tight on EVERY clustered column, so selective reads skip most
        files however the table is queried.  Hive partition columns (if
        any) lead the range key, so each hive dir still receives whole
        output tasks and files within it own compact Morton ranges.

        Lost optimistic-commit races (a writer landed between this
        rewrite's read and its commit) RECOMPUTE from the fresh
        manifest and try again up to ``retries`` times (default: table
        property ``commit.retries``, 3) — a rename-retry would silently
        drop the concurrent commit's rows, so compaction must redo the
        read.  This is what makes out-of-band maintenance (a separate
        maintenance job, or the streaming sink's async thread) safe to
        run against a live writer."""
        if retries is None:
            retries = int(self.meta.properties.get("commit.retries", 3))
        for attempt in range(retries + 1):
            try:
                return self._compact_once(
                    target_partitions, zorder_by, zorder_bits, cluster_by
                )
            except CommitConflictError:
                if attempt >= retries:
                    raise
        raise AssertionError("unreachable")  # pragma: no cover

    def _compact_once(
        self,
        target_partitions: int | None,
        zorder_by: Sequence[str] | None,
        zorder_bits: int,
        cluster_by: Sequence[str] | None = None,
    ) -> int:
        # anchor the rewrite to the manifest version it reads — a
        # writer landing in between makes THIS commit conflict (and the
        # retry loop recompute) instead of silently dropping its rows
        base = self._current_version()
        df = self._assemble(self._manifest_at(base))
        # derive hidden (transform) partition columns up front so the
        # clustering repartitions below can name them; partitionBy in
        # _write_data consumes them into hive dirs, never into files
        df = self._with_partition_cols(df)
        if zorder_by:
            from .operators.layout import zorder_key  # noqa: PLC0415

            keyed, key = zorder_key(df, list(zorder_by), bits=zorder_bits)
            n = target_partitions or int(
                self.spark.conf.get("spark.sql.shuffle.partitions", "32")
            )
            lead = list(self.meta.partition_cols or [])
            df = (
                keyed.repartitionByRange(n, *lead, key)
                .sortWithinPartitions(*lead, key)
                .drop(key)
            )
        elif cluster_by:
            # Linear range clustering — the right shape when one
            # column (of any orderable type, strings included)
            # dominates reads: repartitionByRange + sortWithinPartitions
            # makes per-file parquet min/max on that column tight and
            # non-overlapping, so a point/isin filter opens few files.
            # (zorder_by is the multi-column/NUMERIC variant — Morton
            # interleaving needs quantile bucketing, which Spark's
            # approxQuantile only provides for numeric columns.)
            n = target_partitions or int(
                self.spark.conf.get("spark.sql.shuffle.partitions", "32")
            )
            lead = list(self.meta.partition_cols or [])
            cb = [c for c in cluster_by if c not in lead]
            df = df.repartitionByRange(n, *lead, *cb).sortWithinPartitions(
                *lead, *cb
            )
        elif target_partitions:
            df = df.repartition(target_partitions, *(self.meta.partition_cols or []))
        elif self.meta.partition_cols:
            # cluster rows by partition so each hive dir gets few files
            df = df.repartition(*self.meta.partition_cols)
        else:
            df = df.coalesce(max(1, df.rdd.getNumPartitions() // 8))
        entry = self._write_data(
            df, self._new_root(),
            # an explicit clustering IS the layout — the declared
            # write-sort must not re-sort it within tasks
            apply_sort_property=not (zorder_by or cluster_by),
        )
        return self._commit_snapshot([entry], kind="maintenance", base_version=base)

    def binpack_eligible(self, entries: list[dict] | None = None) -> bool:
        """Can ``compact_small`` run safely on the current state?  The
        gates it needs (see its docstring): unpartitioned layout, no
        pending delta/tombstone entries, and — for keyed tables — ONE
        key column with provably pairwise-disjoint entry ranges.
        Callers deciding between partial and full compaction use this
        to tell 'nothing small to fold' (skip entirely) apart from
        'binpack cannot run here' (full compact is the fallback)."""
        if self.meta.partition_cols:
            return False
        if entries is None:
            entries = self._read_manifest()
        if any(e.get("kind") in ("delta", "tombstone") for e in entries):
            return False
        keys = list(self.meta.key_cols)
        if keys and (
            len(keys) != 1 or not self.entries_disjoint_on(keys[0], entries)
        ):
            return False
        return True

    def _entry_bytes(self, entry: dict) -> int:
        total = 0
        for p in glob.glob(
            os.path.join(self.path, entry["root"], "**", "*.parquet"),
            recursive=True,
        ):
            try:
                total += os.path.getsize(p)
            except OSError:
                pass
        return total

    def compact_small(
        self,
        max_entry_bytes: int = 64 << 20,
        min_entries: int = 2,
        retries: int | None = None,
    ) -> int | None:
        """PARTIAL compaction (Iceberg's binpack): rewrite ONLY the
        small append entries into one consolidated root, leaving large
        entries untouched — maintenance cost O(small files), never
        O(table).  ``compact()`` stays the deep optimize (full rewrite,
        optional Z-order); this is the routine cadence move for the
        append-only steady state, where a 100 TB table accumulating a
        root per micro-batch cannot afford full rewrites.

        Correctness gates (returns None — nothing done — when unmet,
        use ``compact()`` instead):
        - no delta/tombstone entries pending: their MOR resolution
          order derives from entry recency, which a rewrite reorders;
        - keyed tables need ONE key column whose stats prove ALL live
          entries pairwise disjoint (the monotone-ingest steady state)
          — then no key has two live versions anywhere and recency
          cannot matter; keyless tables are multisets and always safe;
        - unpartitioned tables only (hive/hidden-partitioned entries
          carry per-dir layout a bare consolidated root would lose).

        Commits as a content-neutral ``maintenance`` snapshot: change
        feeds split around it (rollups/join MVs skip), and the cadence
        counter resets.  Lost commit races recompute and retry."""
        if retries is None:
            retries = int(self.meta.properties.get("commit.retries", 3))
        for attempt in range(retries + 1):
            base = self._current_version()
            entries = self._read_manifest()
            if not self.binpack_eligible(entries):
                return None
            cands = [
                e
                for e in entries
                if not e.get("parts")
                and self._entry_bytes(e) < int(max_entry_bytes)
            ]
            if len(cands) < max(2, int(min_entries)):
                return None
            keep = [e for e in entries if e not in cands]
            roots = [os.path.join(self.path, e["root"]) for e in cands]
            df = self.spark.read.schema(self.meta.schema).parquet(*roots)
            total = sum(self._entry_bytes(e) for e in cands)
            df = df.coalesce(max(1, total // int(max_entry_bytes) + 1))
            entry = self._write_data(df, self._new_root())
            try:
                return self._commit_snapshot(
                    keep + [entry], kind="maintenance", base_version=base
                )
            except CommitConflictError:
                if attempt >= retries:
                    raise
        raise AssertionError("unreachable")  # pragma: no cover

    def vacuum_orphans(self, min_age_seconds: float = 86400.0) -> list[str]:
        """Delete data roots referenced by NO snapshot manifest — the
        leftovers of writers that crashed between writing their data
        and committing (a conflict LOSER cleans itself up via the
        retry/cleanup path; a crashed process cannot).  Keeps every
        snapshot — unlike ``expire_snapshots``, time travel is
        unaffected.

        ``min_age_seconds`` (default 1 day) guards live writers: a
        root younger than the threshold may belong to a commit still
        in flight, so it is kept — the same mtime-grace rule Iceberg's
        ``remove_orphan_files`` applies.  Returns the removed roots."""
        import shutil  # noqa: PLC0415
        import time  # noqa: PLC0415

        # staged-but-unpublished WAP roots are live state, not orphans:
        # their audit window may be arbitrarily long
        referenced = self._committed_roots() | self._staged_roots()
        removed: list[str] = []
        data_dir = os.path.join(self.path, "data")
        now = time.time()
        if os.path.isdir(data_dir):
            for d in sorted(os.listdir(data_dir)):
                rel = f"data/{d}"
                if rel in referenced:
                    continue
                full = os.path.join(data_dir, d)
                try:
                    if now - os.path.getmtime(full) < min_age_seconds:
                        continue
                except OSError:
                    continue
                shutil.rmtree(full, ignore_errors=True)
                removed.append(rel)
        return removed

    def expire_snapshots(self, keep_last: int = 1) -> list[int]:
        """Delete snapshot manifests older than the newest
        ``keep_last`` and garbage-collect data roots no longer
        referenced by any surviving snapshot.  Returns expired
        versions.  (Same contract as Iceberg's expire_snapshots —
        time travel to expired versions stops working.)"""
        import shutil

        versions = self.history()
        keep = set(versions[-max(1, keep_last):])
        keep.add(self._current_version())
        # named refs are retention shields: a tagged snapshot survives
        # expiration however old (drop the ref to release it)
        keep |= {v for v in self.refs().values() if v in versions}
        referenced: set[str] = set()
        for v in keep:
            with open(
                os.path.join(self.path, _SNAPDIR, f"v{v:08d}.json"), encoding="utf-8"
            ) as fh:
                for e in json.load(fh)["entries"]:
                    referenced.add(e["root"])
        referenced |= self._staged_roots()  # WAP stages awaiting publish
        expired = [v for v in versions if v not in keep]
        for v in expired:
            os.remove(os.path.join(self.path, _SNAPDIR, f"v{v:08d}.json"))
        data_dir = os.path.join(self.path, "data")
        if os.path.isdir(data_dir):
            for d in os.listdir(data_dir):
                rel = os.path.join("data", d)
                if rel not in referenced:
                    shutil.rmtree(os.path.join(data_dir, d), ignore_errors=True)
        return expired

"""Incrementally-maintained aggregate tables (materialized rollups).

The lakehouse pattern behind every "hypertable rollup" / continuous
aggregate: a summary ``ManagedTable`` kept in sync with its source by
consuming the source's CHANGE FEED (``read_changes`` file-level fast
path) instead of re-aggregating the world — refresh cost is
O(new data), not O(table).

Supported aggregates: count + sums + second moments + fixed-bin
histograms (the additive family — retraction-exact with zero
rescans; histograms route approximate quantiles, see
``rollup_quantiles``), MIN/MAX (the non-additive extremes, maintained
by bounded affected-group rescan — see ``refresh_rollup``), and exact
COUNT(DISTINCT) (two-level maintenance through a companion per-value
counts table — the classic
IVM decomposition: distinct-count is not retractable directly, but the
per-(group, value) row count IS additive, and the distinct count is
just the companion's surviving-row count per group).  Append-only change windows fold the
plain change feed (weight +1 per row); windows containing merge
deltas, tombstoned deletes, or rewrites consume the CDF
(``read_changes_cdf``) instead, where pre-images and deletes carry
weight -1 — the RETRACTION — so updates move a row's contribution
between groups exactly and emptied groups are deleted.

Scale shape per refresh: one aggregate over the delta (partial,
map-side combined), one semi-join read of the affected rollup groups
(group-key equi-join; rollup tables are group-cardinality-sized), one
keyed merge back.  Crash safety: the fold commits under a tag derived
from the consumed source window (``rollup-<lo>-<hi>``) BEFORE the
consume cursor advances in a separate metadata write — and a retry
does not ASSUME the crashed attempt's window, it RECOVERS it: every
involved table is probed for a fold tagged with the current low
cursor (``find_commit_tag("rollup-<lo>-", ...)``), the recovered high
bound is replayed exactly (tags match, folds skip idempotently), and
only then is anything newer folded as a fresh window.  Without the
recovery, a source commit landing between the crash and the retry
would change the retry's window, its tag would not match, and the
already-absorbed delta would silently fold twice.  Keep
``expire_snapshots``' horizon longer than the restart window or the
tag probe loses its witness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..table import ManagedTable, join_nullsafe

_STATE_KEY = "rollup.src-version"


class ExpiredCursorError(RuntimeError):
    """A change-feed consumer's cursor points below the source's
    oldest retained snapshot: ``expire_snapshots`` dropped history the
    consumer never folded.  Silently starting at the oldest retained
    version would permanently under-count — the only safe remedies
    are rebuilding the rollup/MV from scratch or re-anchoring its
    cursor deliberately."""


def change_segments(src: ManagedTable, lo: int, hi: int) -> list[tuple[int, int]]:
    """Split the consumed window ``(lo, hi]`` at "maintenance" commits
    (compaction: content-neutral rewrites).  A rewrite inside the
    window would push ``read_changes_cdf`` onto its full-diff
    fallback; skipping the neutral step keeps every segment on the
    O(segment) fast path — the same reasoning every lakehouse change
    feed applies to rewrite-only snapshots.  Per-segment deltas
    compose (additively for rollups, by key-set union for join MVs).
    Returns [] for a maintenance-only window.

    Raises ``ExpiredCursorError`` when ``lo`` is no longer a retained
    snapshot: the changes in ``(lo, oldest_retained]`` are gone, and
    quietly starting at the oldest retained version would make every
    consumer (rollup fold, join-MV affected keys) silently lossy —
    the two real ways here are a consumer whose cursor lagged past an
    ``expire_snapshots`` cadence, and a ``consume_from=1`` bootstrap
    on a source that has EVER been expired."""
    vs = [v for v in src.history() if lo <= v <= hi]
    if not vs or vs[0] != lo:
        oldest = min(src.history() or [0])
        raise ExpiredCursorError(
            f"change-feed cursor {lo} predates the source's oldest "
            f"retained snapshot {oldest} at {src.path} — history was "
            "expired past the consume cursor; rebuild the rollup/MV "
            "(or re-anchor its cursor) instead of silently losing the "
            "expired window"
        )
    segments: list[tuple[int, int]] = []
    seg_lo = prev = vs[0]
    for v in vs[1:]:
        if src._snapshot_kind(v) == "maintenance":
            if seg_lo != prev:
                segments.append((seg_lo, prev))
            seg_lo = v
        prev = v
    if seg_lo != vs[-1]:
        segments.append((seg_lo, vs[-1]))
    return segments


def segment_is_pure_append(
    src: ManagedTable, seg_lo: int, seg_hi: int
) -> bool:
    """Does the segment add only plain data entries (no merge deltas,
    tombstones, or rewrites)?  Pure-append segments ride the cheap
    change feed (weight +1 / _change_type='insert'); anything else
    needs the CDF.  Shared by the fold consumers and the CDC exporter
    — they must agree on the classification."""
    old_entries = src._manifest_at(seg_lo)
    new_entries = src._manifest_at(seg_hi)
    return all(e in new_entries for e in old_entries) and not any(
        e not in old_entries and e.get("kind") in ("delta", "tombstone")
        for e in new_entries
    )


def window_weighted_changes(
    src: ManagedTable, segments: list[tuple[int, int]]
) -> tuple[DataFrame, bool]:
    """The consumed window's changes as one signed-weight frame
    (``_w`` = +1 inserts/post-images, -1 deletes/pre-images), unioned
    across the maintenance-split segments.  Pure-append segments ride
    the plain change feed (no CDF cost); any segment containing merge
    deltas, tombstones, or rewrites consumes ``read_changes_cdf``.
    Returns (frame, any_cdf) — consumers use ``any_cdf`` to decide
    whether retraction handling is needed at all.  Shared by the
    rollup fold and the top-k materialization."""
    any_cdf = False

    def _segment_delta(seg_lo: int, seg_hi: int) -> DataFrame:
        nonlocal any_cdf
        if segment_is_pure_append(src, seg_lo, seg_hi):
            return src.read_changes(seg_lo, seg_hi).withColumn(
                "_w", F.lit(1)
            )
        any_cdf = True
        return (
            src.read_changes_cdf(seg_lo, seg_hi)
            .withColumn(
                "_w",
                F.when(
                    F.col("_change_type").isin(
                        "insert", "update_postimage"
                    ),
                    1,
                ).otherwise(-1),
            )
            .drop("_change_type")
        )

    delta = _segment_delta(*segments[0])
    for seg in segments[1:]:
        delta = delta.unionByName(_segment_delta(*seg))
    return delta, any_cdf


class ChangeWindowCache:
    """Per-batch memo of a source window's change frames, shared
    across the maintenance families.

    In a declarative job every declared rollup, join MV, and top-k MV
    re-derives the SAME ``(lo, hi]`` window from the target table's
    feed after each batch — without sharing, one batch pays one
    window scan (plus the CDF classification) PER FAMILY.  The cache
    keys on ``(source path, lo, hi)``: families whose cursors sit at
    the same version (the steady state — they were all created in the
    same batch and refresh every batch) share ONE pinned frame; a
    lagging family (different ``lo``) misses and pays its own read,
    which is exactly the correct fallback.  The pinned frame is a
    ``localCheckpoint`` — window-bounded by contract, same pin the
    top-k refresh already paid for its own consumers.

    Lifetime is ONE batch (the source must not gain commits while the
    cache is live — ``process_files`` runs its maintenance families
    strictly after the batch's table commits, so the window frames
    stay valid across them).  Purely an optimization: every consumer
    treats the cache as optional and falls back to its own read.

    THREAD-SAFE: the maintenance families refresh CONCURRENTLY from
    separate driver threads (job._maintain_derived), all hitting the
    same window in the common case — population is serialized PER KEY
    so each window frame is derived and pinned exactly once (the first
    caller of a key pays its pin job, same-key callers block briefly
    and reuse it; DataFrames themselves are immutable and safe to
    share across driver threads).  Locks are per ``(source, lo, hi)``
    key, held via a short meta-lock: families at DIFFERENT cursors
    (a bootstrapping MV vs an established rollup, or a join MV's
    right-table window) pin their windows concurrently instead of
    serializing on one cache-wide lock across a Spark job.
    """

    def __init__(self) -> None:
        import threading  # noqa: PLC0415

        self._meta_lock = threading.Lock()  # guards the dicts only
        self._key_locks: dict[tuple[str, int, int], "threading.Lock"] = {}
        self._threading = threading
        self._segments: dict[tuple[str, int, int], list[tuple[int, int]]] = {}
        self._weighted: dict[
            tuple[str, int, int], tuple[DataFrame, bool]
        ] = {}

    def _key_lock(self, key: tuple[str, int, int]) -> "threading.Lock":
        with self._meta_lock:
            lock = self._key_locks.get(key)
            if lock is None:
                lock = self._key_locks[key] = self._threading.Lock()
            return lock

    def segments(
        self, src: ManagedTable, lo: int, hi: int
    ) -> list[tuple[int, int]]:
        """Memoized ``change_segments`` (metadata-only, but one
        history walk + per-version kind probe per family adds up)."""
        key = (src.path, int(lo), int(hi))
        with self._key_lock(key):
            return self._segments_for(key, src)

    def _segments_for(
        self, key: tuple[str, int, int], src: ManagedTable
    ) -> list[tuple[int, int]]:
        """Segment lookup for a caller already holding ``key``'s lock
        (per-key locks are not reentrant).  Dict reads/writes are
        meta-locked so concurrent DIFFERENT-key callers never race the
        dict itself."""
        with self._meta_lock:
            got = self._segments.get(key)
        if got is None:
            got = change_segments(src, key[1], key[2])
            with self._meta_lock:
                self._segments[key] = got
        return got

    def weighted_changes(
        self, src: ManagedTable, lo: int, hi: int
    ) -> tuple[DataFrame, bool]:
        """Memoized, PINNED ``window_weighted_changes`` for a window
        with data segments (callers check ``segments`` first — a
        maintenance-only window never reaches here).  The derive +
        eager pin job runs under the KEY's lock only — a concurrent
        family pinning a DIFFERENT window proceeds in parallel."""
        key = (src.path, int(lo), int(hi))
        with self._key_lock(key):
            with self._meta_lock:
                got = self._weighted.get(key)
            if got is None:
                delta, any_cdf = window_weighted_changes(
                    src, self._segments_for(key, src)
                )
                got = (delta.localCheckpoint(eager=True), any_cdf)
                with self._meta_lock:
                    self._weighted[key] = got
            return got


def rollup_schema(
    group_fields: list[T.StructField],
    sum_cols: list[str],
    extreme_fields: list[T.StructField] | None = None,
    distinct_cols: list[str] | None = None,
    sumsq_cols: list[str] | None = None,
    hist_cols: dict[str, tuple[float, float, int]] | None = None,
) -> T.StructType:
    fields = list(group_fields) + [T.StructField("n_rows", T.LongType(), True)]
    fields += [T.StructField(f"sum_{c}", T.DoubleType(), True) for c in sum_cols]
    fields += [
        T.StructField(f"sumsq_{c}", T.DoubleType(), True)
        for c in (sumsq_cols or [])
    ]
    fields += list(extreme_fields or [])
    fields += [
        T.StructField(f"n_distinct_{c}", T.LongType(), True)
        for c in (distinct_cols or [])
    ]
    fields += [
        T.StructField(f"hist_{c}", T.ArrayType(T.LongType(), True), True)
        for c in (hist_cols or {})
    ]
    return T.StructType(fields)


def _validate_hist_spec(
    hist_cols: dict[str, tuple[float, float, int]] | None,
) -> dict[str, tuple[float, float, int]]:
    out: dict[str, tuple[float, float, int]] = {}
    for c, spec in (hist_cols or {}).items():
        if len(spec) != 3:
            raise ValueError(
                f"hist spec for {c!r} must be (lo, hi, n_bins), got {spec!r}"
            )
        lo, hi, nb = float(spec[0]), float(spec[1]), int(spec[2])
        if not (hi > lo) or nb < 1:
            raise ValueError(
                f"hist spec for {c!r} needs hi > lo and n_bins >= 1, "
                f"got ({lo}, {hi}, {nb})"
            )
        out[c] = (lo, hi, nb)
    return out


def hist_bin_expr(col: str, lo: float, hi: float, n_bins: int) -> F.Column:
    """Bin index for ``col`` under a fixed-width binning: 0 =
    underflow (x < lo), 1..n_bins = the equal-width bins over
    [lo, hi), n_bins+1 = overflow (x >= hi); NULL stays NULL (nulls
    don't count, matching SQL aggregates).  The ``least`` clamp guards
    the one float edge case where ``floor((x-lo)/w)`` rounds up to
    ``n_bins`` for x just under ``hi``.  The arithmetic is plain IEEE
    double ops, so an oracle mirroring the same expression
    (``LEAST(n, 1 + CAST(FLOOR((x - lo)/w) AS INT))``) bins
    identically."""
    w = (hi - lo) / n_bins
    x = F.col(col).cast("double")
    return (
        F.when(x.isNull(), F.lit(None).cast("int"))
        .when(x < F.lit(lo), F.lit(0))
        .when(x >= F.lit(hi), F.lit(n_bins + 1))
        .otherwise(
            F.least(
                F.lit(n_bins),
                (F.floor((x - F.lit(lo)) / F.lit(w)) + F.lit(1)).cast("int"),
            )
        )
    )


def _hist_delta_array(
    c: str, spec: tuple[float, float, int], weight: F.Column
) -> F.Column:
    """Per-group histogram delta as ONE array aggregate: element i sums
    the (signed) weights of rows landing in bin i.  n_bins+2 scalar sum
    aggregates — all JVM-side, map-side combined like any other sum."""
    lo, hi, nb = spec
    b = hist_bin_expr(c, lo, hi, nb)
    return F.array(
        *[
            F.coalesce(
                F.sum(F.when(b == F.lit(i), weight).otherwise(F.lit(0))),
                F.lit(0),
            ).cast("long")
            for i in range(nb + 2)
        ]
    )


def _hist_zeros(nb: int) -> F.Column:
    return F.array(*[F.lit(0).cast("long") for _ in range(nb + 2)])


def _probe_total_and_zero(df: DataFrame) -> tuple[int, int]:
    """ONE driver action over a pinned frame answering the fold's two
    branch questions: (total rows, rows with ``n_rows <= 0``) — the
    merge guard and the zero-row sweep guard, previously two
    isEmpty() jobs (same shave as the top-k refresh's touched-frame
    probe)."""
    row = df.agg(
        F.count(F.lit(1)).alias("nt"),
        F.coalesce(
            F.sum(F.when(F.col("n_rows") <= 0, 1).otherwise(0)), F.lit(0)
        ).alias("nz"),
    ).first()
    return int(row.nt), int(row.nz)


def companion_path(rollup_path: str, col: str) -> str:
    """Location of the per-value counts table backing an exact
    COUNT(DISTINCT col) — a sibling of the rollup, not nested inside
    it (the rollup's own directory layout is the snapshot store's)."""
    return f"{rollup_path.rstrip('/')}__distinct_{col}"


def _extreme_fields(
    src: ManagedTable, min_cols: list[str], max_cols: list[str]
) -> list[T.StructField]:
    """min_/max_ columns carry the SOURCE column's type (a min of
    timestamps is a timestamp, not a double)."""
    by_name = {f.name: f for f in src.meta.schema.fields}
    out: list[T.StructField] = []
    for prefix, cols in (("min", min_cols), ("max", max_cols)):
        for c in cols:
            if c not in by_name:
                raise ValueError(
                    f"{prefix} column {c!r} missing from source schema"
                )
            out.append(T.StructField(f"{prefix}_{c}", by_name[c].dataType, True))
    return out


def create_rollup(
    src: ManagedTable,
    path: str,
    group_cols: list[str],
    sum_cols: list[str],
    consume_from: int | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    distinct_cols: list[str] | None = None,
    sumsq_cols: list[str] | None = None,
    hist_cols: dict[str, tuple[float, float, int]] | None = None,
) -> ManagedTable:
    """DDL for the summary table: keyed by the group columns, MOR so
    refreshes are O(delta) appends.

    ``hist_cols`` maintains a fixed-bin HISTOGRAM per group
    (``{col: (lo, hi, n_bins)}``): an ``array<long>`` of n_bins+2
    counts (underflow + bins + overflow) that is PURELY ADDITIVE —
    retractions subtract bin counts exactly like sums, so
    updates/deletes never trigger a rescan — and mergeable across
    groups, so it re-aggregates at any coarser granularity
    (``reaggregate_rollup``) and answers approximate quantiles
    (``rollup_quantiles``) without touching the base table.  The
    fixed-bin trade is stated honestly: resolution is the declared bin
    width (pick bounds from domain knowledge or a one-time profile);
    out-of-range values land in the underflow/overflow counts rather
    than being lost.

    ``sumsq_cols`` maintains the SECOND MOMENT (Σx²) next to Σx — the
    purely-additive decomposition behind AVG/VARIANCE/STDDEV routing
    (``rollup_stats``): retractions subtract exactly like sums, so no
    rescan is ever needed.  Precision bound, stated honestly: the
    moments live in doubles, exact while |Σx²| stays under 2^53 for
    integer inputs — scale the measure (cents, bucketed units) when
    the raw column would overflow that.

    ``consume_from`` anchors the change-feed cursor: default = the
    source's CURRENT version (track new data only); pass ``1`` (the
    empty created snapshot) to have the first refresh bootstrap the
    rollup from the source's existing content via the same feed.

    Each ``distinct_cols`` entry also provisions a COMPANION table
    (``companion_path(path, col)``): per-(group, value) row counts,
    keyed so refreshes are O(delta) merges.  The companion is the
    retractable form of COUNT(DISTINCT): value-count transitions
    through zero are what create/destroy distinct values."""
    group_fields = [
        f for f in src.meta.schema.fields if f.name in set(group_cols)
    ]
    if len(group_fields) != len(group_cols):
        missing = set(group_cols) - {f.name for f in group_fields}
        raise ValueError(f"group columns missing from source schema: {missing}")
    distinct_cols = list(distinct_cols or [])
    hist_cols = _validate_hist_spec(hist_cols)
    src_fields = {f.name: f for f in src.meta.schema.fields}
    for c in hist_cols:
        if c not in src_fields:
            raise ValueError(f"hist column {c!r} missing from source schema")
    for c in sumsq_cols or []:
        if c not in src_fields:
            raise ValueError(f"sumsq column {c!r} missing from source schema")
    for c in distinct_cols:
        if c not in src_fields:
            raise ValueError(f"distinct column {c!r} missing from source schema")
        if c in group_cols:
            raise ValueError(
                f"distinct column {c!r} is a group column — its distinct "
                "count per group is identically 1"
            )
    dst = ManagedTable.create(
        src.spark,
        path,
        rollup_schema(
            group_fields,
            sum_cols,
            _extreme_fields(src, list(min_cols or []), list(max_cols or [])),
            distinct_cols,
            sumsq_cols,
            hist_cols,
        ),
        key_cols=list(group_cols),
        table_type="MOR",
        # refresh folds are O(changed groups) but arrive with shuffle
        # fan-out — bound each delta commit's file count (table.py
        # "write.max-delta-files")
        properties={"write.max-delta-files": "4"},
    )
    for c in distinct_cols:
        ManagedTable.create(
            src.spark,
            companion_path(path, c),
            T.StructType(
                list(group_fields)
                + [
                    T.StructField(c, src_fields[c].dataType, True),
                    T.StructField("n_rows", T.LongType(), True),
                ]
            ),
            key_cols=list(group_cols) + [c],
            table_type="MOR",
            properties={"write.max-delta-files": "4"},
        )
    dst.set_properties(
        **{
            _STATE_KEY: (
                src._current_version()
                if consume_from is None
                else int(consume_from)
            ),
            # the binning is part of the table's identity: refreshes
            # and routing validate against it (a changed spec would
            # silently null-pad the arrays under zip_with)
            **{
                f"rollup.hist.{c}": f"{lo!r},{hi!r},{nb}"
                for c, (lo, hi, nb) in hist_cols.items()
            },
        }
    )
    return dst


def _check_hist_spec(
    dst: ManagedTable, hist_cols: dict[str, tuple[float, float, int]]
) -> None:
    """The declared binning must match the spec persisted at create —
    a drifted spec would fold differently-shaped arrays (``zip_with``
    null-pads the shorter side and ``null + n = null``), silently
    corrupting bins instead of erroring like every other aggregate
    mismatch."""
    for c, (lo, hi, nb) in hist_cols.items():
        stored = dst.meta.properties.get(f"rollup.hist.{c}")
        want = f"{lo!r},{hi!r},{nb}"
        if stored != want:
            raise ValueError(
                f"hist spec for {c!r} is ({lo}, {hi}, {nb}) but the "
                f"rollup was created with "
                f"{stored or 'no histogram on this column'} — the "
                "binning is immutable; rebuild the rollup to re-bin"
            )


def _rescan_base(
    src: ManagedTable,
    cur: int,
    group_cols: list[str],
    rescan_keys: DataFrame,
    cap: int,
) -> DataFrame:
    """The affected-group slice of the source pinned at ``cur``.
    Single group column with a bounded value set → ``isin`` (reaches
    the parquet row groups when the pinned version is delta-free; sits
    above MOR resolution otherwise — see refresh_rollup); wider keys
    or an oversized set → broadcast semi-join.

    NULL group values are legitimate (SQL GROUP BY keeps them) and
    need explicit handling on both paths: ``IN`` never matches NULL
    (an ``isNull()`` disjunct covers it) and a plain equi-semi-join
    drops null keys (``join_nullsafe`` pairs them)."""
    from ..table import isin_column  # noqa: PLC0415

    base = src.read_version(cur)
    if len(group_cols) == 1:
        vals = [r[0] for r in rescan_keys.limit(cap + 1).collect()]
        if len(vals) <= cap and vals:
            col = group_cols[0]
            nn = [v for v in vals if v is not None]
            cond = isin_column(col, sorted(nn)) if nn else F.lit(False)
            if len(nn) < len(vals):  # the null group was retracted too
                cond = cond | F.col(col).isNull()
            return base.filter(cond)
    return join_nullsafe(
        base, F.broadcast(rescan_keys), list(group_cols), "left_semi"
    )


def reaggregate_rollup(
    dst: ManagedTable,
    subset_cols: list[str],
    sum_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    distinct_cols: list[str] | None = None,
    sumsq_cols: list[str] | None = None,
    hist_cols: dict[str, tuple[float, float, int]] | None = None,
) -> DataFrame:
    """Answer a COARSER-granularity aggregate query from the rollup
    instead of the base table — the MV-routing move behind continuous
    aggregates: a rollup grouped by (a, b) serves any GROUP BY over a
    subset of {a, b} without touching the source.

    Exactness per family: counts and sums RE-ADD (additive), extremes
    RE-FOLD (min/max are associative), and COUNT(DISTINCT) — which is
    NOT re-aggregatable from per-group counts (values are shared
    across fine groups) — is recounted exactly from the companion
    per-(group, value) table, which is (groups × values)-sized, still
    never the base table.  Output column names match the rollup's
    (``n_rows``/``sum_*``/``min_*``/``max_*``/``n_distinct_*``), so a
    query written against the rollup works at any granularity."""
    subset = list(subset_cols)
    missing = set(subset) - set(dst.meta.key_cols)
    if missing:
        raise ValueError(
            f"subset columns {sorted(missing)} are not rollup group "
            f"columns {dst.meta.key_cols}"
        )
    aggs = [F.sum("n_rows").cast("long").alias("n_rows")]
    aggs += [
        F.sum(f"sum_{c}").alias(f"sum_{c}") for c in (sum_cols or [])
    ]
    aggs += [
        # second moments re-add like first moments (both additive)
        F.sum(f"sumsq_{c}").alias(f"sumsq_{c}") for c in (sumsq_cols or [])
    ]
    aggs += [F.min(f"min_{c}").alias(f"min_{c}") for c in (min_cols or [])]
    aggs += [F.max(f"max_{c}").alias(f"max_{c}") for c in (max_cols or [])]
    hist_cols = _validate_hist_spec(hist_cols)
    _check_hist_spec(dst, hist_cols)
    aggs += [
        # histograms re-add element-wise (each bin count is additive)
        F.array(
            *[
                F.sum(F.element_at(f"hist_{c}", i + 1)).cast("long")
                for i in range(nb + 2)
            ]
        ).alias(f"hist_{c}")
        for c, (_lo, _hi, nb) in hist_cols.items()
    ]
    out = dst.read().groupBy(*subset).agg(*aggs)
    for c in distinct_cols or []:
        comp = ManagedTable.load(dst.spark, companion_path(dst.path, c))
        dc = (
            comp.read()
            .filter(F.col("n_rows") > 0)
            .groupBy(*subset)
            .agg(F.countDistinct(c).alias(f"n_distinct_{c}"))
        )
        if subset:
            # null-safe: a null group value is a real group at every
            # granularity — plain equality would strand its distinct
            # count at 0
            out = join_nullsafe(out, dc, subset, "left").select(
                "_l.*", f"_r.n_distinct_{c}"
            )
        else:
            # global granularity: both sides are 1-row aggregates (a
            # global agg always yields exactly one row)
            out = out.crossJoin(dc)
        out = out.withColumn(
            f"n_distinct_{c}",
            F.coalesce(F.col(f"n_distinct_{c}"), F.lit(0)).cast("long"),
        )
    return out


def rollup_stats(frame: DataFrame, cols: list[str]) -> DataFrame:
    """Derive AVG / population VARIANCE / STDDEV for each maintained
    second-moment column: avg = Σx/n, var = Σx²/n − (Σx/n)², std =
    √var — computable from ANY frame carrying ``n_rows``/``sum_<c>``/
    ``sumsq_<c>`` (a rollup read, or a ``reaggregate_rollup`` result
    at any coarser granularity), so the statistics route through the
    summary tables without ever touching the base.  The subtraction
    form can go microscopically negative on constant columns (float
    cancellation) — clamped at zero so std never NaNs."""
    out = frame
    for c in cols:
        n = F.col("n_rows").cast("double")
        avg = F.col(f"sum_{c}") / n
        var = F.greatest(
            F.col(f"sumsq_{c}") / n - avg * avg, F.lit(0.0)
        )
        out = (
            out.withColumn(f"avg_{c}", avg)
            .withColumn(f"var_{c}", var)
            .withColumn(f"std_{c}", F.sqrt(var))
        )
    return out


def rollup_quantiles(
    frame: DataFrame,
    col: str,
    spec: tuple[float, float, int],
    qs: list[float],
    group_cols: list[str],
) -> DataFrame:
    """Approximate quantiles routed through a maintained histogram —
    computable from ANY frame carrying ``hist_<col>`` (a rollup read or
    a ``reaggregate_rollup`` result), so percentile queries never touch
    the base table.  Estimator: the classic binned-quantile
    interpolation — walk the cumulative counts to the first bin whose
    cumulative reaches ``q·n``, then linearly interpolate inside it;
    the underflow/overflow bins clamp to the declared ``lo``/``hi``
    (their interior distribution is unknown by construction).  Error
    bound: one bin width.  Deterministic: same counts → same estimate,
    and every step is plain IEEE arithmetic, so an oracle mirroring
    the expression agrees bitwise.  Groups whose histogram is empty
    (all values NULL) yield NULL.  Scale shape: one posexplode over a
    group-cardinality-sized frame, one window cumsum partitioned by
    the group key — never the base table."""
    from pyspark.sql import Window  # noqa: PLC0415

    lo, hi, nb = _validate_hist_spec({col: spec})[col]
    w = (hi - lo) / nb
    # empty group_cols = the GLOBAL quantile (a reaggregate_rollup([])
    # result is one row) — partition on a constant internally
    parts = group_cols if group_cols else [F.lit(1).alias("_all")]
    # structural guard: the caller-supplied n_bins must agree with the
    # hist_<col> arrays actually in the frame — a spec that disagrees
    # (stale bounds after a rebuild under a different spec) would
    # silently mis-scale every estimate.  Array length is checkable in
    # the plan (bounds are not: equal-length specs with different
    # lo/hi remain the caller's contract, persisted on the rollup's
    # properties and drift-refused at refresh/reaggregate time).  The
    # guard wraps the exploded array itself so column pruning cannot
    # optimize it away.
    arr = F.col(f"hist_{col}")
    checked = F.when(arr.isNull() | (F.size(arr) == nb + 2), arr).otherwise(
        F.raise_error(
            F.lit(
                f"rollup_quantiles spec mismatch: hist_{col} arrays do "
                f"not have n_bins+2 = {nb + 2} elements — the supplied "
                "(lo, hi, n_bins) disagrees with the maintained "
                "histogram; use the spec persisted on the rollup's "
                "properties"
            )
        )
    )
    e = frame.select(
        *parts, F.posexplode(checked).alias("_bin", "_cnt")
    )
    pcols = group_cols or ["_all"]
    win = Window.partitionBy(*pcols).orderBy("_bin")
    e = e.withColumn("_cum", F.sum("_cnt").over(win)).withColumn(
        "_total", F.sum("_cnt").over(Window.partitionBy(*pcols))
    )
    aggs = []
    for q in qs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile {q} outside [0, 1]")
        target = F.lit(float(q)) * F.col("_total").cast("double")
        qualifies = (F.col("_cum").cast("double") >= target) & (
            F.col("_cnt") > 0
        )
        est = (
            F.when(F.col("_bin") == 0, F.lit(lo))
            .when(F.col("_bin") == nb + 1, F.lit(hi))
            .otherwise(
                F.lit(lo)
                + (F.col("_bin") - F.lit(1)).cast("double") * F.lit(w)
                + F.lit(w)
                * (target - (F.col("_cum") - F.col("_cnt")).cast("double"))
                / F.col("_cnt").cast("double")
            )
        )
        name = f"p{q * 100:g}".replace(".", "_") + f"_{col}"
        # first qualifying bin = min over (bin, est) structs (struct
        # ordering is field-order lexicographic, so min picks the
        # lowest bin and carries its estimate)
        aggs.append(
            F.min(F.when(qualifies, F.struct(F.col("_bin"), est.alias("_e"))))
            .getField("_e")
            .alias(name)
        )
    out = e.groupBy(*pcols).agg(*aggs)
    return out.drop("_all") if not group_cols else out


def rebuild_rollup(
    src: ManagedTable,
    dst: ManagedTable,
    group_cols: list[str],
    sum_cols: list[str],
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    distinct_cols: list[str] | None = None,
    sumsq_cols: list[str] | None = None,
    hist_cols: dict[str, tuple[float, float, int]] | None = None,
) -> int:
    """Recompute the rollup (and its distinct companions) from the
    source's CURRENT state in one full pass and re-anchor the consume
    cursor — the remedy ``ExpiredCursorError`` prescribes when history
    was expired past a lagging cursor, and the general escape hatch
    for any state an operator no longer trusts.

    One full aggregate (map-side combined) per table, one overwrite
    commit each, cursor last.  NOT crash-atomic against an
    interleaved ``refresh_rollup``: a crash between the overwrite and
    the cursor write leaves a rebuilt table with a stale cursor, and a
    refresh run at that moment would fold the stale window onto
    already-absorbed content — the remedy for a crashed rebuild is to
    RETRY THE REBUILD (it is idempotent: same pinned source version →
    same overwrite), not to refresh."""
    distinct_cols = list(distinct_cols or [])
    min_cols = list(min_cols or [])
    max_cols = list(max_cols or [])
    sumsq_cols = list(sumsq_cols or [])
    hist_cols = _validate_hist_spec(hist_cols)
    _check_hist_spec(dst, hist_cols)
    cur = src._current_version()
    base = src.read_version(cur)
    full = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(F.col(c).cast("double")).alias(f"sum_{c}") for c in sum_cols],
        *[
            F.sum(F.col(c).cast("double") * F.col(c).cast("double")).alias(
                f"sumsq_{c}"
            )
            for c in sumsq_cols
        ],
        *[F.min(c).alias(f"min_{c}") for c in min_cols],
        *[F.max(c).alias(f"max_{c}") for c in max_cols],
        *[
            _hist_delta_array(c, spec, F.lit(1)).alias(f"hist_{c}")
            for c, spec in hist_cols.items()
        ],
    )
    for c in distinct_cols:
        comp = ManagedTable.load(src.spark, companion_path(dst.path, c))
        cagg = (
            base.filter(F.col(c).isNotNull())
            .groupBy(*group_cols, c)
            .agg(F.count(F.lit(1)).alias("n_rows"))
        )
        comp.overwrite(cagg)
        dc = cagg.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias(f"n_distinct_{c}")
        )
        full = (
            join_nullsafe(full, dc, list(group_cols), "left")
            .select("_l.*", f"_r.n_distinct_{c}")
            .withColumn(
                f"n_distinct_{c}",
                F.coalesce(F.col(f"n_distinct_{c}"), F.lit(0)).cast("long"),
            )
        )
    dst.overwrite(full)
    dst.set_properties(**{_STATE_KEY: cur})
    return dst._current_version()


def refresh_rollup(
    src: ManagedTable,
    dst: ManagedTable,
    group_cols: list[str],
    sum_cols: list[str],
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    distinct_cols: list[str] | None = None,
    sumsq_cols: list[str] | None = None,
    hist_cols: dict[str, tuple[float, float, int]] | None = None,
    window_cache: "ChangeWindowCache | None" = None,
) -> int:
    """Fold the source changes since the last refresh into the rollup;
    returns the new rollup version (current version when there was
    nothing to consume).  ``window_cache`` (optional) shares the
    consumed window's pinned change frame with the batch's other
    maintenance families — see ``ChangeWindowCache``.

    Append-only windows consume the plain change feed (one aggregate
    over the new files, weight +1 per row).  Windows containing merge
    deltas, tombstoned deletes, or rewrites consume the CDF instead
    (``read_changes_cdf``): pre-images and deletes contribute weight
    -1 — the retraction — and post-images/inserts +1, so updates move
    a row's contribution between groups exactly.  Groups whose count
    reaches zero are deleted from the rollup, not left as zero rows.
    Refresh cost stays O(window + matching base keys + affected
    groups).

    The fold is exactly-once under crash replay: the combined frame
    (INCLUDING emptied groups, at count 0) merges under a
    window-derived commit tag, then the emptied groups are deleted,
    then the cursor advances.  A replayed window whose tag is already
    live skips straight to the (idempotent) emptied-group sweep and
    the cursor write — never re-folding a delta the rollup already
    absorbed.

    MIN/MAX (``min_cols``/``max_cols``) extend the rollup beyond the
    additive family.  Inserts fold incrementally (``least``/
    ``greatest`` against the stored extreme — idempotent, so the same
    tag machinery covers them); RETRACTIONS cannot fold (deleting the
    stored minimum says nothing about the runner-up), so every group
    touched by a retraction is RESCANNED: all its aggregates are
    recomputed from the source pinned at the window's high version
    (``read_version(cur)`` — the pin keeps a concurrent append out of
    this fold; it will be consumed by the next window).  The rescan
    OUTPUT is bounded by the window's retraction-touched groups;
    single-group-column rescans collect the affected values
    driver-side (capped) and apply an ``isin``, wider keys a broadcast
    semi-join.  Where the filter lands is resolution-bounded: the
    group predicate cannot soundly cross the MOR latest-per-key
    resolution (an entry with no matching group rows can still carry
    the newest version of a key whose OLD row matches — pruning it
    would resurrect the stale row), so with deltas pending the filter
    sits above resolution; once the source is compacted the pinned
    read is a plain scan and the ``isin`` reaches the parquet row
    groups.  Keep a compaction cadence on retraction-heavy sources.

    COUNT(DISTINCT) (``distinct_cols``) maintains exactly through the
    companion per-(group, value) counts table: the value-count IS
    additive (the delta folds into it under the same window tag,
    exactly-once on ITS table), and each group's distinct count is
    read back ABSOLUTE from the post-fold companion — so the rollup's
    ``n_distinct_*`` columns are correct whichever side of a crash the
    replay lands on (companion folded or not: its own tag decides;
    rollup folded or not: the rollup's tag decides).  Null values
    don't count, matching SQL.  Cost: one O(delta) keyed merge on the
    companion plus an affected-group-restricted count over it.

    The replayed window is RECOVERED, not assumed: a crash between a
    tagged fold and the cursor write, followed by the source gaining
    a commit before the retry (the job path re-commits the
    redelivered batch before maintenance re-runs), would otherwise
    change the retry's window — its tag would not match and the
    already-absorbed delta would fold AGAIN.  So each pass first
    probes every involved table for a fold tagged with the CURRENT
    low cursor (``find_commit_tag("rollup-<lo>-", …)``, structurally
    bounded: the probe stops at the previous fold's tag), completes
    that exact window when found, and only then folds the remainder
    as a fresh window.  NULL group values flow through every join
    here null-safely (``join_nullsafe``) — SQL GROUP BY keeps null
    groups, so must the rollup."""
    out = None
    while True:
        out, done = _refresh_rollup_window(
            src,
            dst,
            group_cols,
            sum_cols,
            min_cols,
            max_cols,
            distinct_cols,
            sumsq_cols,
            hist_cols,
            window_cache,
        )
        if done:
            return out


def _refresh_rollup_window(
    src: ManagedTable,
    dst: ManagedTable,
    group_cols: list[str],
    sum_cols: list[str],
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
    distinct_cols: list[str] | None = None,
    sumsq_cols: list[str] | None = None,
    hist_cols: dict[str, tuple[float, float, int]] | None = None,
    window_cache: "ChangeWindowCache | None" = None,
) -> tuple[int, bool]:
    """One fold pass: complete a recovered crashed window, or fold a
    fresh one up to the source's current version.  Returns (rollup
    version, done) — done=False when the pass completed a TRUNCATED
    recovered window and the caller must loop for the remainder."""
    distinct_cols = list(distinct_cols or [])
    min_cols = list(min_cols or [])
    max_cols = list(max_cols or [])
    sumsq_cols = list(sumsq_cols or [])
    hist_cols = _validate_hist_spec(hist_cols)
    extremes = bool(min_cols or max_cols)
    have = set(dst.meta.schema.fieldNames())
    lacking = [
        n
        for n in (
            [f"min_{c}" for c in min_cols]
            + [f"max_{c}" for c in max_cols]
            + [f"n_distinct_{c}" for c in distinct_cols]
            + [f"sumsq_{c}" for c in sumsq_cols]
            + [f"hist_{c}" for c in hist_cols]
        )
        if n not in have
    ]
    if lacking:
        raise ValueError(
            f"rollup table lacks aggregate columns {lacking}; create it "
            "with the same min_cols/max_cols/distinct_cols it is "
            "refreshed with"
        )
    _check_hist_spec(dst, hist_cols)
    last = int(dst.meta.properties.get(_STATE_KEY, 1))
    actual = src._current_version()
    cur = actual
    if cur <= last:
        return dst._current_version(), True

    # Window recovery: any table that committed a fold tagged with
    # THIS low cursor pins the crashed attempt's high bound — replay
    # that exact window (the tags then match and each table's fold
    # skips idempotently) before folding anything newer.  The probe
    # stops at the previous fold's tag, so it is structurally bounded
    # regardless of how many maintenance/sweep commits stacked on top.
    recovered = [dst.find_commit_tag(f"rollup-{last}-", stop_prefix="rollup-")]
    comp_tags: dict[str, str | None] = {}
    # one metadata load per companion per pass: the handles are reused
    # by the fold loop and the replay sweep below (per-micro-batch hot
    # path — re-loading re-reads _meta.json and the metalog each time)
    comps: dict[str, ManagedTable] = {
        c: ManagedTable.load(src.spark, companion_path(dst.path, c))
        for c in distinct_cols
    }
    for c in distinct_cols:
        comp_tags[c] = comps[c].find_commit_tag(
            f"rollup-{last}-", stop_prefix="rollup-"
        )
        recovered.append(comp_tags[c])
    his = [int(t.rsplit("-", 1)[1]) for t in recovered if t]
    if his:
        cur = max(his)  # at most one window per low cursor ever commits

    window_tag = f"rollup-{last}-{cur}"
    # Crash replay (died between the tagged fold commit and the cursor
    # write): the delta is already in the rollup.  Finish the
    # idempotent sweeps (rollup AND companions) and advance.
    if recovered[0] == window_tag:
        # delete_keys probes emptiness via its own tombstone write
        # (r13) — no isEmpty pre-probes on the replay sweeps
        for c in distinct_cols:
            comp = comps[c]
            comp.delete_keys(
                comp.read().filter(F.col("n_rows") <= 0).select(*group_cols, c)
            )
        dst.delete_keys(
            dst.read().filter(F.col("n_rows") <= 0).select(*group_cols)
        )
        dst.set_properties(**{_STATE_KEY: cur})
        return dst._current_version(), cur >= actual

    segments = (
        window_cache.segments(src, last, cur)
        if window_cache is not None
        else change_segments(src, last, cur)
    )
    if not segments:  # maintenance-only window: nothing to fold
        dst.set_properties(**{_STATE_KEY: cur})
        return dst._current_version(), cur >= actual

    if window_cache is not None:
        # shared-and-pinned by the cache — never re-pin
        delta, any_cdf = window_cache.weighted_changes(src, last, cur)
    else:
        # no pin: the grouping-sets pass below is the window frame's
        # ONLY consumer (companion deltas are slices of its output),
        # so the old per-companion re-read that justified pinning here
        # is gone
        delta, any_cdf = window_weighted_changes(src, segments)
    extra_aggs = [
        F.min(F.when(F.col("_w") == 1, F.col(c))).alias(f"_ins_min_{c}")
        for c in min_cols
    ] + [
        F.max(F.when(F.col("_w") == 1, F.col(c))).alias(f"_ins_max_{c}")
        for c in max_cols
    ]
    if extremes:
        # does this group need a rescan? (any retracted row at all —
        # comparing the retracted value against the stored extreme
        # would narrow it further, at the cost of a pre-read; the
        # group set is window-bounded either way)
        extra_aggs.append(
            F.max(F.when(F.col("_w") == -1, F.lit(1)).otherwise(F.lit(0)))
            .alias("_retract")
        )
    main_aggs = [
        F.sum("_w").alias("_d_n"),
        *[
            F.sum(F.col("_w") * F.col(c).cast("double")).alias(f"_d_{c}")
            for c in sum_cols
        ],
        *[
            # second moment: Σ(w·x²) — additive, so retractions fold
            # exactly like sums (no rescan)
            F.sum(
                F.col("_w")
                * F.col(c).cast("double")
                * F.col(c).cast("double")
            ).alias(f"_d_sq_{c}")
            for c in sumsq_cols
        ],
        *[
            # fixed-bin histograms: signed per-bin counts — additive,
            # so retractions fold exactly like sums (no rescan)
            _hist_delta_array(c, spec, F.col("_w")).alias(f"_d_hist_{c}")
            for c, spec in hist_cols.items()
        ],
        *extra_aggs,
    ]
    dagg_slices: dict[str, DataFrame] = {}
    if distinct_cols:
        # ONE grouped pass feeds the main fold AND every companion
        # fold: GROUPING SETS ((G), (G, c1), …) computes the group-
        # level delta and each per-(group, value) count delta in a
        # single shuffle over the pinned window frame, where the old
        # shape paid one aggregation job per companion PLUS the main
        # one (measured ~1.7 s of the kitchen-sink's rollups hook).
        # Set membership is read off F.grouping(c) — never c IS NULL,
        # which a genuinely-null VALUE row would forge.
        sets = [list(group_cols)] + [
            list(group_cols) + [c] for c in distinct_cols
        ]
        g = (
            delta.groupingSets(sets, *group_cols, *distinct_cols)
            .agg(
                *main_aggs,
                *[F.grouping(c).alias(f"_g_{c}") for c in distinct_cols],
            )
            # group-cardinality + value-cardinality bounded; consumed
            # by the main fold, the rescan filter, and every
            # companion's merge — pin ONCE (replaces the old agg pin)
            .localCheckpoint(eager=True)
        )
        coarse = F.lit(True)
        for c in distinct_cols:
            coarse = coarse & (F.col(f"_g_{c}") == 1)
        agg = g.filter(coarse).drop(
            *distinct_cols, *[f"_g_{c}" for c in distinct_cols]
        )
        for c in distinct_cols:
            fine = (F.col(f"_g_{c}") == 0) & F.col(c).isNotNull()
            for other in distinct_cols:
                if other != c:
                    fine = fine & (F.col(f"_g_{other}") == 1)
            # the (G, c)-level _d_n IS the companion's count delta
            # (nulls excluded above, matching COUNT(DISTINCT)'s rule)
            dagg_slices[c] = g.filter(fine).select(
                *group_cols, c, F.col("_d_n").alias("_d")
            )
    else:
        agg = delta.groupBy(*group_cols).agg(*main_aggs)
        if extremes:
            # group-cardinality-bounded and reused by the rescan — pin
            agg = agg.localCheckpoint(eager=True)

    # COUNT(DISTINCT) companions: fold the per-(group, value) count
    # delta into each companion (exactly-once on ITS table via the
    # same window tag), sweep zeroed values, then read each affected
    # group's distinct count back ABSOLUTE — correct on every side of
    # a crash, because the companion state after its tagged fold is
    # deterministic whether this call did the fold or a replay skipped
    # it.
    dcount_frames: dict[str, DataFrame] = {}

    def _fold_companion(c: str) -> None:
        comp = comps[c]
        ckeys = list(group_cols) + [c]
        # the recovery probe already scanned this companion; a match
        # means the (recovered) window is exactly what it absorbed
        if comp_tags.get(c) != window_tag:
            dagg = dagg_slices[c]  # the shared grouped pass's slice
            cexist = join_nullsafe(
                comp.read(), dagg.select(*ckeys), ckeys, "left_semi"
            )
            newc = (
                join_nullsafe(dagg, cexist, ckeys, "left")
                .select(
                    *[F.col(f"_l.{k}").alias(k) for k in ckeys],
                    (
                        F.coalesce(F.col("_r.n_rows"), F.lit(0))
                        + F.col("_l._d")
                    ).alias("n_rows"),
                )
                .localCheckpoint(eager=True)
            )
            cnt, czn = _probe_total_and_zero(newc)
            if cnt:
                # non-emptiness just proven — skip merge's own probe
                comp.merge(newc, tag=window_tag, assume_nonempty=True)
            if czn:
                comp.delete_keys(
                    newc.filter(F.col("n_rows") <= 0).select(*ckeys)
                )
        else:
            # replay path (rare): the companion already absorbed the
            # window — only the idempotent sweep remains (delete_keys
            # itself no-ops on an empty victim set)
            comp.delete_keys(
                comp.read().filter(F.col("n_rows") <= 0).select(*ckeys)
            )
        dcount_frames[c] = (
            join_nullsafe(
                comp.read().filter(F.col("n_rows") > 0),
                F.broadcast(agg.select(*group_cols)),
                list(group_cols),
                "left_semi",
            )
            .groupBy(*group_cols)
            .agg(F.count(F.lit(1)).alias(f"n_distinct_{c}"))
        )

    if len(distinct_cols) >= 2:
        # the companion chains are independent per column — each folds
        # into its OWN table off shared read-only pinned frames (the
        # grouping-sets checkpoint), so overlap them (guide §2.6): the
        # serial shape paid one merge→sweep→read-back chain per column.
        # Same settle-then-raise contract as the family pools; each
        # companion's fold is tagged on ITS table, so a redelivery
        # re-runs completed companions idempotently.
        from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

        with ThreadPoolExecutor(
            max_workers=len(distinct_cols),
            thread_name_prefix="rollup-companion",
        ) as pool:
            futs = [(c, pool.submit(_fold_companion, c)) for c in distinct_cols]
            first_err: Exception | None = None
            for c, fut in futs:
                try:
                    fut.result()
                except Exception as e:  # noqa: BLE001
                    if first_err is None:
                        first_err = e
        if first_err is not None:
            raise first_err
    else:
        for c in distinct_cols:
            _fold_companion(c)

    # current values of ONLY the affected groups (rollup tables are
    # group-cardinality-sized; the join is on the rollup's key)
    existing = join_nullsafe(
        dst.read(), agg.select(*group_cols), list(group_cols), "left_semi"
    )
    combined = (
        join_nullsafe(agg, existing, list(group_cols), "left")
        .select(
            *[F.col(f"_l.{c}").alias(c) for c in group_cols],
            (
                F.coalesce(F.col("_r.n_rows"), F.lit(0)) + F.col("_l._d_n")
            ).alias("n_rows"),
            *[
                (
                    F.coalesce(F.col(f"_r.sum_{c}"), F.lit(0.0))
                    + F.coalesce(F.col(f"_l._d_{c}"), F.lit(0.0))
                ).alias(f"sum_{c}")
                for c in sum_cols
            ],
            *[
                (
                    F.coalesce(F.col(f"_r.sumsq_{c}"), F.lit(0.0))
                    + F.coalesce(F.col(f"_l._d_sq_{c}"), F.lit(0.0))
                ).alias(f"sumsq_{c}")
                for c in sumsq_cols
            ],
            # insert-side extremes fold incrementally; least/greatest
            # skip nulls, so a group absent from either side keeps the
            # other side's value
            *[
                F.least(F.col(f"_r.min_{c}"), F.col(f"_l._ins_min_{c}"))
                .alias(f"min_{c}")
                for c in min_cols
            ],
            *[
                F.greatest(F.col(f"_r.max_{c}"), F.col(f"_l._ins_max_{c}"))
                .alias(f"max_{c}")
                for c in max_cols
            ],
            *[
                # element-wise add; a group new to the rollup folds
                # against an all-zeros baseline
                F.zip_with(
                    F.coalesce(
                        F.col(f"_r.hist_{c}"), _hist_zeros(spec[2])
                    ),
                    F.col(f"_l._d_hist_{c}"),
                    lambda a, b: a + b,
                ).alias(f"hist_{c}")
                for c, spec in hist_cols.items()
            ],
        )
    )
    if extremes and any_cdf:
        # retraction-touched groups: the fold can't know the new
        # extreme (deleting the minimum says nothing about the
        # runner-up) — recompute ALL their aggregates from the source
        # pinned at the window's high version.  Bounded by the
        # window's affected groups, never O(table).
        rescan_keys = (
            agg.filter(F.col("_retract") == 1)
            .select(*group_cols)
            .localCheckpoint(eager=True)
        )
        if not rescan_keys.isEmpty():
            cap = int(
                dst.meta.properties.get("rollup.max-rescan-groups", "4096")
            )
            base = _rescan_base(src, cur, group_cols, rescan_keys, cap)
            recomputed = base.groupBy(*group_cols).agg(
                F.count(F.lit(1)).alias("n_rows"),
                *[
                    F.sum(F.col(c).cast("double")).alias(f"sum_{c}")
                    for c in sum_cols
                ],
                *[
                    F.sum(
                        F.col(c).cast("double") * F.col(c).cast("double")
                    ).alias(f"sumsq_{c}")
                    for c in sumsq_cols
                ],
                *[F.min(c).alias(f"min_{c}") for c in min_cols],
                *[F.max(c).alias(f"max_{c}") for c in max_cols],
                *[
                    _hist_delta_array(c, spec, F.lit(1)).alias(f"hist_{c}")
                    for c, spec in hist_cols.items()
                ],
            )
            # fully-emptied groups yield no slice rows — keep their
            # count-0 markers so the tagged-merge + sweep semantics
            # hold for them too
            recomputed = join_nullsafe(
                rescan_keys, recomputed, list(group_cols), "left"
            ).select(
                *[F.col(f"_l.{c}").alias(c) for c in group_cols],
                F.coalesce(F.col("_r.n_rows"), F.lit(0)).alias("n_rows"),
                *[
                    F.coalesce(F.col(f"_r.sum_{c}"), F.lit(0.0)).alias(
                        f"sum_{c}"
                    )
                    for c in sum_cols
                ],
                *[
                    F.coalesce(F.col(f"_r.sumsq_{c}"), F.lit(0.0)).alias(
                        f"sumsq_{c}"
                    )
                    for c in sumsq_cols
                ],
                *[F.col(f"_r.min_{c}").alias(f"min_{c}") for c in min_cols],
                *[F.col(f"_r.max_{c}").alias(f"max_{c}") for c in max_cols],
                *[
                    F.coalesce(
                        F.col(f"_r.hist_{c}"), _hist_zeros(spec[2])
                    ).alias(f"hist_{c}")
                    for c, spec in hist_cols.items()
                ],
            )
            combined = join_nullsafe(
                combined, rescan_keys, list(group_cols), "left_anti"
            ).unionByName(recomputed)
    # distinct counts join AFTER the rescan union so folded and
    # rescanned rows get them uniformly (they're absolute either way)
    for c in distinct_cols:
        combined = (
            join_nullsafe(combined, dcount_frames[c], list(group_cols), "left")
            .select("_l.*", f"_r.n_distinct_{c}")
            .withColumn(
                f"n_distinct_{c}",
                F.coalesce(F.col(f"n_distinct_{c}"), F.lit(0)).cast("long"),
            )
        )
    # group-cardinality-bounded frame read twice (upsert + the
    # emptied-group delete) — pin it once
    combined = combined.localCheckpoint(eager=True)
    mnt, mnz = _probe_total_and_zero(combined)
    # Emptied groups (count 0) are INCLUDED in the tagged merge so a
    # crash before their delete leaves a visible marker the replay
    # sweep can finish from — excluding them would strand their stale
    # pre-fold rows if the delete never ran.
    version = dst._current_version()
    if mnt:
        # non-emptiness just proven — skip merge's own probe.  (An
        # all-retraction window still yields zero-MARKER rows per
        # affected group, so the merge and its tag DO run; zero
        # combined rows — and a skipped tag, like the old empty-merge
        # no-op — occur only when the weighted-change frame itself is
        # empty, e.g. a window of no-op delete commits.)
        version = dst.merge(combined, tag=window_tag, assume_nonempty=True)
    if mnz:
        version = dst.delete_keys(
            combined.filter(F.col("n_rows") <= 0).select(*group_cols)
        )
    dst.set_properties(**{_STATE_KEY: cur})
    return version, cur >= actual

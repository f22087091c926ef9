"""MERGE INTO compatibility shim.

The reference executes a verbatim ``MERGE INTO`` statement against an
Iceberg V2 catalog (reference: spark-job/mergeSQL.sql:1-43, run at
spark-job/read.py:173-180 after registering the batch as the
``source_table`` view).  This environment ships no V2 catalog, so
``ManagedTable`` re-implements the merge semantics — and this module
lets a reference user's ``.sql`` file run AS-IS: it parses the
statement's structure, executes the ``USING (...)`` subquery (plain
Spark SQL) over the registered batch view, validates that the ON keys
and WHEN clauses express the full-row upsert ``ManagedTable.merge``
implements, and routes the deduped source into the table-level merge.

Anything the shim cannot faithfully translate fails loudly with a
message naming both the unsupported construct and the V2-catalog
requirement for verbatim execution — never a silent semantic drift.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_MERGE_RE = re.compile(r"^\s*MERGE\s+INTO\b", re.IGNORECASE)

_V2_HINT = (
    "verbatim MERGE INTO execution needs a V2 catalog (e.g. the Iceberg "
    "runtime jar + spark.sql.catalog.* config, reference "
    "spark-job/job.json:5-10); this environment translates the statement "
    "onto ManagedTable.merge instead"
)


def is_merge_into(sql: str | None) -> bool:
    """True when the text is a MERGE INTO statement (vs a plain
    SELECT transform, which runs through ``apply_transform_query``)."""
    return bool(sql) and bool(_MERGE_RE.match(sql))


@dataclass(frozen=True)
class MergeIntoSpec:
    target: str              # catalog-qualified target name (informational)
    target_alias: str
    using_sql: str           # the USING(...) subquery, Spark-executable
    source_alias: str
    keys: list[str]          # equi-join key columns from the ON clause
    matched_guard: str | None  # raw text of a WHEN MATCHED AND ... guard


class MergeSqlError(ValueError):
    """A MERGE INTO construct the shim cannot translate."""


def _err(what: str) -> MergeSqlError:
    return MergeSqlError(f"{what}; {_V2_HINT}")


def _balanced(sql: str, open_idx: int) -> int:
    """Index just past the ``)`` matching the ``(`` at ``open_idx``."""
    depth = 0
    for i in range(open_idx, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise _err("unbalanced parentheses in USING clause")


def parse_merge_into(sql: str) -> MergeIntoSpec:
    """Parse the reference-shaped MERGE INTO statement.

    Supported shape (exactly what mergeSQL.sql uses):
    ``MERGE INTO <tbl> [AS t] USING (<subquery>) [AS s]
    ON <t.k = s.k [AND ...]> WHEN MATCHED [AND <guard>] THEN UPDATE
    SET <t.c = s.c, ...>|* WHEN NOT MATCHED THEN INSERT (...) VALUES
    (...)|*``.  A bare view name after USING is also accepted.
    """
    head = re.match(
        r"\s*MERGE\s+INTO\s+(?P<target>[\w.$]+)\s+(?:AS\s+)?(?P<talias>\w+)?\s*USING\s*",
        sql,
        re.IGNORECASE | re.DOTALL,
    )
    if not head:
        raise _err("could not parse MERGE INTO header")
    target = head.group("target")
    target_alias = head.group("talias") or target.split(".")[-1]
    pos = head.end()
    if sql[pos] == "(":
        end = _balanced(sql, pos)
        using_sql = sql[pos + 1 : end - 1]
    else:
        m = re.match(r"([\w.$]+)", sql[pos:])
        if not m:
            raise _err("could not parse USING clause")
        using_sql = f"SELECT * FROM {m.group(1)}"
        end = pos + m.end()
    tail = sql[end:]
    m = re.match(r"\s*(?:AS\s+)?(?P<salias>\w+)?\s*\bON\b(?P<rest>.*)", tail,
                 re.IGNORECASE | re.DOTALL)
    if not m:
        raise _err("could not parse source alias / ON clause")
    source_alias = m.group("salias") or "source"
    rest = m.group("rest")

    on_m = re.match(r"(?P<on>.*?)\bWHEN\b(?P<when>.*)", rest, re.IGNORECASE | re.DOTALL)
    if not on_m:
        raise _err("MERGE INTO without WHEN clauses")
    keys = _parse_on_keys(on_m.group("on"), target_alias, source_alias)
    guard = _validate_when_clauses("WHEN" + on_m.group("when"), target_alias, source_alias)
    return MergeIntoSpec(
        target=target,
        target_alias=target_alias,
        using_sql=using_sql,
        source_alias=source_alias,
        keys=keys,
        matched_guard=guard,
    )


def _parse_on_keys(on_clause: str, t_alias: str, s_alias: str) -> list[str]:
    keys = []
    for part in re.split(r"\bAND\b", on_clause, flags=re.IGNORECASE):
        m = re.match(r"\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$", part.strip())
        if not m:
            raise _err(f"unsupported ON predicate {part.strip()!r} "
                       "(only alias.col = alias.col equi-keys)")
        a_al, a_col, b_al, b_col = m.groups()
        aliases = {a_al.lower(): a_col, b_al.lower(): b_col}
        if set(aliases) != {t_alias.lower(), s_alias.lower()}:
            raise _err(f"ON predicate {part.strip()!r} does not join target to source")
        if a_col.lower() != b_col.lower():
            raise _err(f"ON key column names differ ({a_col!r} vs {b_col!r}); "
                       "ManagedTable keys are shared-name columns")
        keys.append(aliases[t_alias.lower()])
    if not keys:
        raise _err("empty ON clause")
    return keys


def _validate_when_clauses(when_text: str, t_alias: str, s_alias: str) -> str | None:
    """Check the WHEN clauses express a full-row upsert; return the
    MATCHED guard text (or None)."""
    matched = re.search(
        r"WHEN\s+MATCHED\s*(?:AND\s+(?P<guard>.*?))?\s*THEN\s+UPDATE\s+SET\s+"
        r"(?P<set>.*?)(?=WHEN\s+NOT\s+MATCHED|;|\Z)",
        when_text, re.IGNORECASE | re.DOTALL,
    )
    not_matched = re.search(
        r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\b", when_text, re.IGNORECASE
    )
    if re.search(r"WHEN\s+MATCHED\s+(?:AND\s+.*?)?THEN\s+DELETE", when_text,
                 re.IGNORECASE | re.DOTALL):
        raise _err("WHEN MATCHED THEN DELETE is not supported")
    if not matched or not not_matched:
        raise _err("only the upsert shape (WHEN MATCHED UPDATE + "
                   "WHEN NOT MATCHED INSERT) is supported")
    set_text = matched.group("set").strip()
    if set_text != "*":
        for assign in set_text.split(","):
            m = re.match(
                r"\s*(?:(\w+)\.)?(\w+)\s*=\s*(?:(\w+)\.)?(\w+)\s*$", assign
            )
            if not m:
                raise _err(f"unsupported UPDATE SET assignment {assign.strip()!r}")
            _, t_col, _, s_col = m.groups()
            if t_col.lower() != s_col.lower():
                raise _err(
                    f"UPDATE SET {assign.strip()!r} is not an identity "
                    "assignment; ManagedTable.merge replaces whole rows"
                )
    return matched.group("guard")


def execute_merge_into(
    spark: SparkSession,
    table,  # ManagedTable (kept untyped to avoid an import cycle)
    batch: DataFrame,
    sql: str,
    source_view: str = "source_table",
) -> int:
    """Run a reference-style MERGE INTO against a ManagedTable.

    Registers ``batch`` as the view the statement's subquery reads
    (the reference uses ``source_table``, spark-job/read.py:176),
    evaluates the USING subquery with Spark SQL (dedup-by-recency and
    all — the full SQL surface is available there), validates the
    upsert shape against the table contract, and commits via
    ``ManagedTable.merge``.  Returns the new snapshot version.
    """
    spec = parse_merge_into(sql)
    if spec.matched_guard is not None:
        # A recency guard (e.g. AND source.seq >= target.seq) is the
        # latest_wins policy; require the table to be configured so,
        # rather than guessing the guard's semantics from text.
        if table.meta.merge_policy != "latest_wins" or not table.meta.order_column:
            raise _err(
                f"WHEN MATCHED AND {spec.matched_guard.strip()!r} needs "
                "merge_policy='latest_wins' with an order_column on the table"
            )
    table_keys = [k.lower() for k in (table.meta.key_cols or [])]
    if sorted(k.lower() for k in spec.keys) != sorted(table_keys):
        raise _err(
            f"MERGE ON keys {spec.keys} do not match the table's "
            f"key_columns {table.meta.key_cols}"
        )
    batch.createOrReplaceTempView(source_view)
    try:
        src = spark.sql(spec.using_sql)
    finally:
        spark.catalog.dropTempView(source_view)
    return table.merge(src)

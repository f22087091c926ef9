"""Declarative data-quality constraint checking for ingest pipelines.

The validation gate a production CDC ingest runs before (or while)
committing a batch: a JSON-able rule list — the same declarative shape
as ``job.json`` — evaluated in as few passes as possible, returning a
compact per-rule violation summary instead of failing row-by-row.

Rule kinds:
- ``not_null``:        {"rule": "not_null", "column": c}
- ``unique``:          {"rule": "unique", "columns": [c, ...]}
- ``range``:           {"rule": "range", "column": c, "min": x, "max": y}
  (either bound optional; violations are non-null values outside)
- ``accepted_values``: {"rule": "accepted_values", "column": c,
                        "values": [...]}
- ``foreign_key``:     {"rule": "foreign_key", "columns": [c, ...],
                        "ref": name, "ref_columns": [r, ...]}
  (``refs[name]`` supplies the referenced DataFrame; null keys are
  not violations, matching SQL FK semantics)

Scale shape: every ROW-LOCAL rule (not_null / range / accepted_values)
folds into ONE conditional-sum aggregate over a single scan — adding
rules adds columns to one projection, not passes.  ``unique`` is one
hash aggregate on the key (excess-row count = rows − distinct keys);
``foreign_key`` is one anti-join (dims broadcast under AQE).  The
result is rule-count-sized — trivially collectable at any data scale.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rule_id(rule: dict) -> str:
    kind = rule["rule"]
    if kind == "unique":
        return f"unique({','.join(rule['columns'])})"
    if kind == "foreign_key":
        return (
            f"foreign_key({','.join(rule['columns'])}->"
            f"{rule['ref']}.{','.join(rule['ref_columns'])})"
        )
    if kind == "range":
        return f"range({rule['column']})"
    if kind == "accepted_values":
        return f"accepted_values({rule['column']})"
    return f"{kind}({rule['column']})"


def _row_local_indicator(rule: dict):
    kind = rule["rule"]
    if kind == "not_null":
        return F.col(rule["column"]).isNull().cast("long")
    if kind == "range":
        c = F.col(rule["column"])
        cond = F.lit(False)
        if rule.get("min") is not None:
            cond = cond | (c < F.lit(rule["min"]))
        if rule.get("max") is not None:
            cond = cond | (c > F.lit(rule["max"]))
        return (c.isNotNull() & cond).cast("long")
    if kind == "accepted_values":
        c = F.col(rule["column"])
        return (c.isNotNull() & ~c.isin(list(rule["values"]))).cast("long")
    return None


def check_constraints(
    df: DataFrame,
    rules: list[dict],
    refs: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Evaluate ``rules`` against ``df``; returns
    (rule_id, n_violations) with one row per rule, zero-violation rules
    included (the gate's contract is a complete report, not an error
    channel).  Unknown rule kinds and missing ``refs`` fail loudly at
    plan time."""
    refs = refs or {}
    spark = df.sparkSession
    row_local: list[tuple[str, object]] = []
    others: list[DataFrame] = []
    for rule in rules:
        kind = rule["rule"]
        rid = _rule_id(rule)
        ind = _row_local_indicator(rule)
        if ind is not None:
            row_local.append((rid, ind))
            continue
        if kind == "unique":
            keys = [F.col(c) for c in rule["columns"]]
            others.append(
                df.agg(
                    (
                        F.count(F.lit(1)) - F.count_distinct(F.struct(*keys))
                    ).alias("n_violations")
                ).select(F.lit(rid).alias("rule_id"), "n_violations")
            )
        elif kind == "foreign_key":
            ref_name = rule["ref"]
            if ref_name not in refs:
                raise ValueError(
                    f"foreign_key rule references unknown table {ref_name!r}"
                )
            cols, ref_cols = rule["columns"], rule["ref_columns"]
            src = df.select(
                *[F.col(c).alias(r) for c, r in zip(cols, ref_cols)]
            ).na.drop(subset=list(ref_cols))
            missing = src.join(
                refs[ref_name].select(*ref_cols).distinct(), list(ref_cols), "left_anti"
            )
            others.append(
                missing.agg(F.count(F.lit(1)).alias("n_violations")).select(
                    F.lit(rid).alias("rule_id"), "n_violations"
                )
            )
        else:
            raise ValueError(f"unknown constraint rule kind: {kind!r}")

    parts: list[DataFrame] = []
    if row_local:
        # all row-local rules in ONE aggregate over one scan
        agg = df.agg(
            *[F.sum(ind).alias(f"_v{i}") for i, (_, ind) in enumerate(row_local)]
        )
        stacked = agg.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(rid).alias("rule_id"),
                            F.coalesce(F.col(f"_v{i}"), F.lit(0)).alias(
                                "n_violations"
                            ),
                        )
                        for i, (rid, _) in enumerate(row_local)
                    ]
                )
            ).alias("r")
        ).select("r.rule_id", "r.n_violations")
        parts.append(stacked)
    parts.extend(others)
    if not parts:
        return spark.createDataFrame([], "rule_id string, n_violations long")
    return reduce(lambda a, b: a.unionByName(b), parts)


def profile_table(df, columns=None):
    """Generic per-column data profile: (column, n_rows, n_null,
    n_distinct) — the schema-drift / completeness report a pipeline
    runs on every new table version.

    Scale shape: one two-phase aggregation PER COLUMN over a
    single-column projection (column-pruned scan, map-side partials),
    results unioned — deliberately NOT one multi-distinct aggregate,
    which Catalyst plans as an Expand that replicates every row once
    per distinct column (measured 36 s vs ~1 s on two distincts at
    sf0.1, see q_approx_distinct_sketch's docstring).  k cheap
    column-pruned passes ≈ one full-table pass in scanned bytes.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    cols = list(columns) if columns is not None else df.columns
    parts = []
    for c in cols:
        one = df.select(F.col(c).alias("v")).agg(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("v").isNull().cast("long")).alias("n_null"),
            F.countDistinct("v").alias("n_distinct"),
        )
        parts.append(one)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
